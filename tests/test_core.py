"""Tests for transforms, joint maps, Grasps pytree, and hard negatives."""
import numpy as np
from scipy.spatial.transform import Rotation as ScipyRot

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.core import (
    Grasps,
    full_joint_conf_from_partial,
    hand_cfg_map,
    hard_negative_from_positive,
    hom_from_pos_quat,
    hom_from_transl_rot,
    reduce_joint_conf,
    transform_points,
    translate_along_axis,
)
from dexgangrasp_tpu.core.rotations import mat_to_euler

rng = np.random.default_rng(1)


def ref_reduce_joint_conf(jc_full):
    """Oracle: reference utils.py:356-377 scalar loop."""
    idx = 0
    jc_red = np.zeros((15,))
    for i in range(15):
        if (i + 1) % 3 == 0:
            jc_red[i] = max(jc_full[idx], jc_full[idx + 1])
            idx += 2
        else:
            jc_red[i] = jc_full[idx]
            idx += 1
    return jc_red


def ref_full_from_partial(partial):
    """Oracle: reference utils.py:164-185 scalar loop."""
    full = 20 * [0]
    ix = 0
    for i, val in enumerate(partial):
        if (i + 1) % 3 == 0:
            full[ix] = val
            full[ix + 1] = val
            ix += 2
        else:
            full[ix] = val
            ix += 1
    return np.array(full)


def test_reduce_joint_conf_matches_reference():
    jc = rng.uniform(0, 1, size=(8, 20))
    ours = np.asarray(reduce_joint_conf(jnp.asarray(jc)))
    for b in range(8):
        np.testing.assert_allclose(ours[b], ref_reduce_joint_conf(jc[b]), atol=1e-7)


def test_full_joint_conf_matches_reference():
    jc = rng.uniform(0, 1, size=(8, 15))
    ours = np.asarray(full_joint_conf_from_partial(jnp.asarray(jc)))
    for b in range(8):
        np.testing.assert_allclose(ours[b], ref_full_from_partial(jc[b]), atol=1e-7)


def test_reduce_expand_roundtrip():
    jc15 = rng.uniform(0, 1, size=(4, 15))
    jc20 = full_joint_conf_from_partial(jnp.asarray(jc15))
    back = reduce_joint_conf(jc20)
    np.testing.assert_allclose(np.asarray(back), jc15, atol=1e-7)


def test_hand_cfg_map():
    m12 = hand_cfg_map(np.arange(12.0))
    assert len(m12) == 12 and list(m12.keys()) == sorted(m12.keys())
    m15 = hand_cfg_map(np.arange(20.0))
    assert len(m15) == 20


def test_hom_from_pos_quat():
    q_xyzw = ScipyRot.random(16, rng=rng).as_quat()
    pos = rng.normal(size=(16, 3))
    pq = np.concatenate([pos, q_xyzw], axis=1)
    T = np.asarray(hom_from_pos_quat(jnp.asarray(pq)))
    np.testing.assert_allclose(T[:, :3, :3], ScipyRot.from_quat(q_xyzw).as_matrix(),
                               atol=1e-6)
    np.testing.assert_allclose(T[:, :3, 3], pos, atol=1e-7)
    np.testing.assert_allclose(T[:, 3], np.tile([0, 0, 0, 1.0], (16, 1)), atol=0)


def test_translate_along_axis_matches_reference_loop():
    """Oracle: reference utils.py:19-48 per-pose loop."""
    n = 10
    R = ScipyRot.random(n, rng=rng).as_matrix()
    t = rng.normal(size=(n, 3))
    offset = 0.025
    ours = np.asarray(translate_along_axis(jnp.asarray(t), jnp.asarray(R), 0, offset))
    for i in range(n):
        z_translation = np.array([offset, 0.0, 0.0])
        expect = t[i] - R[i] @ z_translation
        np.testing.assert_allclose(ours[i], expect, atol=1e-7)


def test_transform_points():
    T = np.asarray(hom_from_transl_rot(
        jnp.asarray(rng.normal(size=(3,))),
        jnp.asarray(ScipyRot.random(rng=rng).as_matrix())))
    pts = rng.normal(size=(50, 3))
    ours = np.asarray(transform_points(jnp.asarray(T), jnp.asarray(pts)))
    expect = (T[:3, :3] @ pts.T).T + T[:3, 3]
    np.testing.assert_allclose(ours, expect, atol=1e-6)


def test_grasps_pytree():
    g = Grasps(
        transl=jnp.zeros((5, 3)),
        rot_matrix=jnp.tile(jnp.eye(3), (5, 1, 1)),
        joint_conf=jnp.zeros((5, 12)),
        score=jnp.arange(5.0),
    )
    assert len(g) == 5
    # pytree: mappable by jax
    g2 = jax.tree.map(lambda x: x * 2, g)
    assert float(g2.score[4]) == 8.0
    # take
    g3 = g.take(jnp.array([4, 0]))
    assert float(g3.score[0]) == 4.0
    # dict round-trip
    d = g.to_dict(numpy=True)
    assert set(d) == {"rot_matrix", "transl", "joint_conf", "score"}
    g4 = Grasps.from_dict(d)
    np.testing.assert_allclose(np.asarray(g4.transl), np.asarray(g.transl))


def test_hard_negative_perturbation_magnitudes():
    """Each pose component must move by exactly ±[0.03]*3 / ±[0.6]*3."""
    n = 64
    R = ScipyRot.random(n, rng=rng).as_matrix()
    t = rng.normal(size=(n, 3)) * 0.1
    key = jax.random.PRNGKey(0)
    t_neg, R_neg = hard_negative_from_positive(key, jnp.asarray(t), jnp.asarray(R))
    dt = np.abs(np.asarray(t_neg) - t)
    np.testing.assert_allclose(dt, 0.03, atol=1e-6)
    # Euler deltas: each axis moved by exactly 0.6 (mod sign)
    r0 = np.stack(ScipyRot.from_matrix(R).as_euler("xyz"))
    r1, p1, y1 = mat_to_euler(R_neg)
    # rebuild euler of original through our own mat_to_euler for consistency
    r0_, p0_, y0_ = mat_to_euler(jnp.asarray(R))
    deul = np.stack([np.asarray(r1) - np.asarray(r0_),
                     np.asarray(p1) - np.asarray(p0_),
                     np.asarray(y1) - np.asarray(y0_)], axis=1)
    # the new euler angles are original ± 0.6 *before* renormalization into
    # principal ranges, so compare against ±0.6 modulo 2π wrap
    deul = np.abs((deul + np.pi) % (2 * np.pi) - np.pi)
    # p (pitch) can fold: arctan2(sp, |cp|) keeps p in [-π/2, π/2]; folding maps
    # p ± 0.6 to ±(π - p ∓ 0.6) which changes the apparent delta. Accept either.
    ok = np.isclose(deul, 0.6, atol=1e-4)
    folded = np.isclose(np.abs(deul[:, 1]), np.abs(np.pi - 2 * np.abs(np.asarray(p0_)) - 0.6), atol=0.61) | \
        np.isclose(np.abs(deul[:, 1]), np.abs(np.pi - 2 * np.abs(np.asarray(p0_)) + 0.6), atol=0.61)
    assert ok[:, 0].mean() > 0.9  # roll mostly exact (wraps aside)
    assert (ok[:, 1] | folded).mean() > 0.9
    assert np.isfinite(np.asarray(R_neg)).all()
