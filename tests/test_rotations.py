"""Golden tests for core rotation math against independent oracles.

Oracles: the reference formulas re-derived in torch/numpy (for
rot_matrix_from_ortho6d / geodesic distance) and scipy.spatial.transform
(for quaternion / Euler conversions, same conventions as the reference's
transforms3d usage).
"""
import numpy as np
import pytest
import torch
from scipy.spatial.transform import Rotation as ScipyRot

import jax.numpy as jnp

from dexgangrasp_tpu.core import (
    euler_to_mat,
    geodesic_distance,
    mat_to_euler,
    normalize_vector,
    ortho6d_from_rot_matrix,
    quat_wxyz_to_mat,
    quat_xyzw_to_mat,
    rot_matrix_from_ortho6d,
)
from dexgangrasp_tpu.core.rotations import (
    geodesic_distance_pairwise,
    mat_to_quat_wxyz,
)

rng = np.random.default_rng(0)


def torch_rot_from_ortho6d(ortho6d):
    """Oracle: the reference construction (utils.py:380-394) in torch."""
    x_raw, y_raw = ortho6d[:, 0:3], ortho6d[:, 3:6]

    def norm(v):
        mag = torch.sqrt(v.pow(2).sum(1))
        mag = torch.max(mag, torch.tensor([1e-8]))
        return v / mag.view(-1, 1)

    x = norm(x_raw)
    z = norm(torch.cross(x, y_raw, dim=1))
    y = torch.cross(z, x, dim=1)
    return torch.cat([x.view(-1, 3, 1), y.view(-1, 3, 1), z.view(-1, 3, 1)], 2)


def test_rot6d_matches_reference_formula():
    o6 = rng.normal(size=(256, 6)).astype(np.float32)
    ours = np.asarray(rot_matrix_from_ortho6d(jnp.asarray(o6)))
    ref = torch_rot_from_ortho6d(torch.from_numpy(o6)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_rot6d_tiny_vectors_clamped():
    o6 = np.zeros((4, 6), np.float32)
    o6[:, 0] = 1e-12  # below the 1e-8 clamp
    out = np.asarray(rot_matrix_from_ortho6d(jnp.asarray(o6)))
    assert np.isfinite(out).all()


def test_rot6d_produces_valid_rotations():
    o6 = rng.normal(size=(128, 6))
    R = np.asarray(rot_matrix_from_ortho6d(jnp.asarray(o6)))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), R.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_ortho6d_roundtrip():
    R = ScipyRot.random(64, rng=rng).as_matrix()
    o6 = ortho6d_from_rot_matrix(jnp.asarray(R))
    R2 = np.asarray(rot_matrix_from_ortho6d(o6))
    np.testing.assert_allclose(R2, R, atol=1e-6)


def test_normalize_vector():
    v = rng.normal(size=(32, 3))
    out = np.asarray(normalize_vector(jnp.asarray(v)))
    np.testing.assert_allclose(out, v / np.linalg.norm(v, axis=1, keepdims=True),
                               atol=1e-6)


def test_geodesic_distance_matches_reference():
    r1 = ScipyRot.random(20, rng=rng).as_matrix()
    r2 = ScipyRot.random(30, rng=rng).as_matrix()
    # Oracle: reference eval.py:48-60 einsum formula
    rot_rot_t = np.einsum("aij,bkj->abik", r1, r2, optimize=True)
    tr = np.trace(rot_rot_t, axis1=-2, axis2=-1)
    ref = np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0))
    ours = np.asarray(geodesic_distance_pairwise(jnp.asarray(r1), jnp.asarray(r2)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # elementwise variant
    d = np.asarray(geodesic_distance(jnp.asarray(r1), jnp.asarray(r1)))
    np.testing.assert_allclose(d, 0.0, atol=1e-3)


def test_quat_to_mat_matches_scipy():
    q_xyzw = ScipyRot.random(100, rng=rng).as_quat()  # scipy gives xyzw
    ref = ScipyRot.from_quat(q_xyzw).as_matrix()
    ours = np.asarray(quat_xyzw_to_mat(jnp.asarray(q_xyzw)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    q_wxyz = np.concatenate([q_xyzw[:, 3:4], q_xyzw[:, :3]], axis=1)
    ours2 = np.asarray(quat_wxyz_to_mat(jnp.asarray(q_wxyz)))
    np.testing.assert_allclose(ours2, ref, atol=1e-6)


def test_quat_to_mat_unnormalized_and_zero():
    q = np.array([[2.0, 0, 0, 0], [0, 0, 0, 0]])  # wxyz
    out = np.asarray(quat_wxyz_to_mat(jnp.asarray(q)))
    np.testing.assert_allclose(out[0], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(out[1], np.eye(3), atol=1e-6)  # zero → identity


def test_mat_to_quat_roundtrip():
    R = ScipyRot.random(200, rng=rng).as_matrix()
    q = np.asarray(mat_to_quat_wxyz(jnp.asarray(R)))
    R2 = np.asarray(quat_wxyz_to_mat(jnp.asarray(q)))
    np.testing.assert_allclose(R2, R, atol=1e-5)
    assert (q[:, 0] >= 0).all()


def test_euler_roundtrip_matches_scipy():
    rpy = rng.uniform(-1.4, 1.4, size=(100, 3))
    ref = ScipyRot.from_euler("xyz", rpy).as_matrix()
    ours = np.asarray(euler_to_mat(rpy[:, 0], rpy[:, 1], rpy[:, 2]))
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    r, p, y = mat_to_euler(jnp.asarray(ref))
    back = np.stack([np.asarray(r), np.asarray(p), np.asarray(y)], axis=1)
    ref_back = ScipyRot.from_matrix(ref).as_euler("xyz")
    np.testing.assert_allclose(back, ref_back, atol=1e-5)
