"""Engine tests: folding exactness vs the unfolded networks, fused pipeline
behavior, and the reference filter contract."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.core.rotations import rot_matrix_from_ortho6d
from dexgangrasp_tpu.core.transforms import translate_along_axis
from dexgangrasp_tpu.engine import folding
from dexgangrasp_tpu.engine.pipeline import GraspEngine, sample_and_score
from dexgangrasp_tpu.models.networks import init_dexgan, init_evaluator

rng = np.random.default_rng(11)


@pytest.fixture(scope="module")
def nets():
    (gen, gp, gs), (disc, dp, ds) = init_dexgan(jax.random.PRNGKey(0))
    eva, ep, es = init_evaluator(jax.random.PRNGKey(1))
    # randomize BN running stats so eval-mode folding is non-trivial
    def jitter(state, key):
        leaves, treedef = jax.tree.flatten(state)
        ks = jax.random.split(key, len(leaves))
        out = []
        for leaf, k in zip(leaves, ks):
            out.append(leaf + 0.1 * jax.random.uniform(k, leaf.shape,
                                                       leaf.dtype, 0.5, 1.5))
        return jax.tree.unflatten(treedef, out)

    gs = jitter(gs, jax.random.PRNGKey(2))
    ds = jitter(ds, jax.random.PRNGKey(3))
    es = jitter(es, jax.random.PRNGKey(4))
    return (gen, gp, gs), (disc, dp, ds), (eva, ep, es)


@pytest.fixture(scope="module")
def bps_row():
    return jnp.asarray(rng.uniform(0, 0.2, size=(4096,)).astype(np.float32))


def test_generator_folding_exact(nets, bps_row):
    (gen, gp, gs), _, _ = nets
    n = 64
    z = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    # unfolded: tile bps like the reference does
    bps_tiled = jnp.tile(bps_row[None, :], (n, 1))
    ref_out, _ = gen.apply(gp, gs, z, bps_tiled, train=False)
    folded = folding.fold_generator(gp, gs)
    ctx = folding.generator_object_context(folded, bps_row)
    rot6, transl, joints = folding.generator_apply_folded(folded, ctx, z)
    np.testing.assert_allclose(np.asarray(rot6), np.asarray(ref_out.rot_6d),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(transl), np.asarray(ref_out.transl),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(joints), np.asarray(ref_out.joint_conf),
                               atol=2e-5)


def test_evaluator_folding_exact(nets, bps_row):
    _, _, (eva, ep, es) = nets
    n = 64
    rot = jnp.asarray(rng.normal(size=(n, 9)).astype(np.float32))
    transl = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.1)
    bps_tiled = jnp.tile(bps_row[None, :], (n, 1))
    ref_p, _ = eva.apply(ep, es, bps_tiled, rot, transl, train=False)
    folded = folding.fold_evaluator(ep, es)
    ctx = folding.evaluator_object_context(folded, bps_row)
    pose = jnp.concatenate([rot, transl], axis=1)
    p = folding.evaluator_apply_folded(folded, ctx, pose)
    np.testing.assert_allclose(np.asarray(p), np.asarray(ref_p)[:, 0], atol=2e-5)


def test_discriminator_folding_exact(nets, bps_row):
    _, (disc, dp, ds), _ = nets
    n = 32
    rot = jnp.asarray(rng.normal(size=(n, 9)).astype(np.float32))
    transl = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.1)
    joints = jnp.asarray(rng.uniform(0, 1, size=(n, 12)).astype(np.float32))
    bps_tiled = jnp.tile(bps_row[None, :], (n, 1))
    ref_p, _ = disc.apply(dp, ds, bps_tiled, rot, transl, joints, train=False)
    folded = folding.fold_discriminator(dp, ds)
    ctx = folding.discriminator_object_context(folded, bps_row)
    pose = jnp.concatenate([rot, transl, joints], axis=1)
    p = folding.discriminator_apply_folded(folded, ctx, pose)
    np.testing.assert_allclose(np.asarray(p), np.asarray(ref_p)[:, 0], atol=2e-5)


def test_sample_and_score_pipeline(nets, bps_row):
    (gen, gp, gs), _, (eva, ep, es) = nets
    gen_folded = folding.fold_generator(gp, gs)
    eva_folded = folding.fold_evaluator(ep, es)
    n = 128
    g = sample_and_score(gen_folded, eva_folded, bps_row,
                         jax.random.PRNGKey(0), n)
    assert g.transl.shape == (n, 3)
    assert g.rot_matrix.shape == (n, 3, 3)
    assert g.joint_conf.shape == (n, 12)
    score = np.asarray(g.score)
    assert (np.diff(score) <= 1e-7).all()  # sorted desc
    assert (score >= 0).all() and (score <= 1).all()
    # rotations valid
    R = np.asarray(g.rot_matrix)
    np.testing.assert_allclose(np.einsum("bij,bkj->bik", R, R),
                               np.broadcast_to(np.eye(3), R.shape), atol=1e-4)
    # deterministic for fixed key
    g2 = sample_and_score(gen_folded, eva_folded, bps_row,
                          jax.random.PRNGKey(0), n)
    np.testing.assert_allclose(np.asarray(g2.transl), np.asarray(g.transl),
                               atol=0)


def test_z_offset_backoff(nets, bps_row):
    """z_offset shifts each grasp along its own -x column (reference
    utils.py:19-48 via networks.py:254)."""
    (gen, gp, gs), _, (eva, ep, es) = nets
    gen_folded = folding.fold_generator(gp, gs)
    eva_folded = folding.fold_evaluator(ep, es)
    g0 = sample_and_score(gen_folded, eva_folded, bps_row,
                          jax.random.PRNGKey(5), 16, z_offset=0.0, sort=False)
    g1 = sample_and_score(gen_folded, eva_folded, bps_row,
                          jax.random.PRNGKey(5), 16, z_offset=0.025, sort=False)
    shift = np.asarray(g0.transl) - np.asarray(g1.transl)
    expect = 0.025 * np.asarray(g0.rot_matrix)[:, :, 0]
    np.testing.assert_allclose(shift, expect, atol=1e-6)


def test_engine_facade_and_filter_contract(nets, bps_row):
    (gen, gp, gs), (disc, dp, ds), (eva, ep, es) = nets
    engine = GraspEngine(gp, gs, ep, es, disc_params=dp, disc_state=ds)
    out = engine.generate_grasps(np.asarray(bps_row), 64)
    assert out["rot_matrix"].shape == (64, 3, 3)
    assert out["transl"].shape == (64, 3)
    assert out["joint_conf"].shape == (64, 12)

    scores = engine.evaluate_grasps(np.asarray(bps_row), out)
    assert scores.shape == (64,)

    # filter keeps only grasps above thresh, sorted desc
    med = float(np.median(scores))
    filt = engine.filter_grasps(np.asarray(bps_row), out, thresh=med)
    assert (filt["score"] > med).all()
    assert (np.diff(filt["score"]) <= 1e-7).all()
    assert filt["rot_matrix"].shape[0] == int((scores > med).sum())

    # reference ValueError contract when best < thresh
    with pytest.raises(ValueError):
        engine.filter_grasps(np.asarray(bps_row), out, thresh=1.1)

    # discriminator filter path runs
    filt_d = engine.filter_grasps(np.asarray(bps_row), out, thresh=-1.0,
                                  use_discriminator=True)
    assert filt_d["rot_matrix"].shape[0] == 64


def test_engine_unfolded_consistency(nets, bps_row):
    """The engine's fused path must equal the plain eval-mode network path
    (tile-BPS + forward + rot6d→mat + back-off + evaluator)."""
    (gen, gp, gs), _, (eva, ep, es) = nets
    engine = GraspEngine(gp, gs, ep, es)
    n = 32
    g = engine.generate(np.asarray(bps_row), n, seed=123)
    # replay: same key path → same z
    z = g.z
    bps_tiled = jnp.tile(bps_row[None, :], (n, 1))
    ref_out, _ = gen.apply(gp, gs, z, bps_tiled, train=False)
    R = rot_matrix_from_ortho6d(ref_out.rot_6d)
    t = translate_along_axis(ref_out.transl, R, 0, 0.025)
    p_ref, _ = eva.apply(ep, es, bps_tiled, R.reshape(n, 9), t, train=False)
    order = jnp.argsort(-p_ref[:, 0])
    np.testing.assert_allclose(np.asarray(g.transl), np.asarray(t[order]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(g.score),
                               np.asarray(p_ref[order, 0]), atol=2e-5)


def test_bf16_serving_mode_numerics(nets, bps_row):
    """cast_folded bf16 serving mode (VERDICT r4 #4 — HBM-bound f32 chain):
    score error must stay far below a filter band (5e-3), transl within a
    millimeter, with f32 islands for rot6d Gram-Schmidt + back-off."""
    (gen, gp, gs), _, (eva, ep, es) = nets
    gf = folding.fold_generator(gp, gs)
    ef = folding.fold_evaluator(ep, es)
    gb = folding.cast_folded(gf, jnp.bfloat16)
    eb = folding.cast_folded(ef, jnp.bfloat16)
    # only float leaves cast
    assert all(jnp.asarray(l).dtype == jnp.bfloat16
               for l in jax.tree.leaves(gb))

    n = 256
    z = jax.random.normal(jax.random.PRNGKey(5), (n, 5), jnp.float32)

    def run(gfold, efold, dt):
        bps = bps_row.astype(dt)
        gctx = folding.generator_object_context(gfold, bps)
        ectx = folding.evaluator_object_context(efold, bps)
        r6, t, j = folding.generator_apply_folded(gfold, gctx, z.astype(dt))
        rot = rot_matrix_from_ortho6d(r6.astype(jnp.float32))
        t = translate_along_axis(t.astype(jnp.float32), rot, 0, 0.025)
        pose = jnp.concatenate([rot.reshape(n, 9), t], axis=1).astype(dt)
        s = folding.evaluator_apply_folded(efold, ectx, pose)
        return t, s.astype(jnp.float32)

    t32, s32 = run(gf, ef, jnp.float32)
    t16, s16 = run(gb, eb, jnp.bfloat16)
    assert float(jnp.mean(jnp.abs(s16 - s32))) < 5e-3
    assert float(jnp.max(jnp.abs(t16 - t32))) < 1e-3


def test_engine_bf16_mode(nets, bps_row):
    """GraspEngine(bf16=True): generate/filter/evaluate surfaces work, the
    sample path scores within the bf16 gate of the f32 engine on the SAME
    z draw, refine+evaluate run through the f32 copy."""
    (gen, gp, gs), _, (eva, ep, es) = nets
    e32 = GraspEngine(gp, gs, ep, es, cloud_pad=2048)
    e16 = GraspEngine(gp, gs, ep, es, cloud_pad=2048, bf16=True)
    assert e16.gen_folded["rb1"]["w2"].dtype == jnp.bfloat16
    assert e16.eva_folded_f32["rb1"]["w2"].dtype == jnp.float32

    g32 = e32.generate_grasps(bps_row, 64, seed=3)
    g16 = e16.generate_grasps(bps_row, 64, seed=3)
    # same f32 z draw in both modes → same candidates, bounded drift
    np.testing.assert_allclose(g16["z"], g32["z"])
    assert float(np.mean(np.abs(g16["score"] - g32["score"]))) < 5e-3
    assert float(np.max(np.abs(g16["transl"] - g32["transl"]))) < 1e-3
    assert g16["rot_matrix"].dtype == np.float32

    # reference-compat filter + evaluate surfaces stay functional (f32)
    s = e16.evaluate_grasps(bps_row, g16)
    assert s.shape == (64,) and s.dtype == np.float32
    out = e16.filter_grasps(bps_row, g16, thresh=-1.0)
    assert out["rot_matrix"].shape[0] == 64

    # refine tail (f32 copy) composes with the bf16 sampler
    e16.refine_steps = 2
    gr = e16.generate_grasps(bps_row, 32, seed=4)
    assert gr["transl"].shape == (32, 3)
    assert np.isfinite(gr["score"]).all()
