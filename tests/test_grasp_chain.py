"""Fused per-grasp-chain Pallas kernel: parity with the XLA folded path
(CPU interpret mode; the on-chip run + bench live in tools/chain_bench.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.core.rotations import rot_matrix_from_ortho6d
from dexgangrasp_tpu.core.transforms import translate_along_axis
from dexgangrasp_tpu.engine import folding
from dexgangrasp_tpu.models.networks import (
    init_dexgan,
    init_evaluator,
)
from dexgangrasp_tpu.ops.grasp_chain import grasp_chain_pallas

rng = np.random.default_rng(77)


def _setup(n_resblocks=3):
    from dexgangrasp_tpu.models.networks import DexEvaluator

    (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
    eva = DexEvaluator(n_resblocks=n_resblocks)
    ep, es = eva.init(jax.random.PRNGKey(1), "xavier", 0.02)
    gen_folded = folding.fold_generator(gp, gs)
    eva_folded = folding.fold_evaluator(ep, es)
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    gen_ctx = folding.generator_object_context(gen_folded, bps)
    eva_ctx = folding.evaluator_object_context(eva_folded, bps)
    return gen_folded, eva_folded, gen_ctx, eva_ctx


def _xla_chain(gen_folded, eva_folded, gen_ctx, eva_ctx, z,
               z_offset=0.025):
    n = z.shape[0]
    rot6, transl, joints = folding.generator_apply_folded(
        gen_folded, gen_ctx, z)
    rot = rot_matrix_from_ortho6d(rot6)
    transl = translate_along_axis(transl, rot, 0, z_offset)
    pose = jnp.concatenate([rot.reshape(n, 9), transl], axis=1)
    score = folding.evaluator_apply_folded(eva_folded, eva_ctx, pose)
    return rot, transl, joints, score


@pytest.mark.parametrize("n", [64, 200])  # 200 exercises the pad path
def test_chain_kernel_matches_xla_path(n):
    gen_folded, eva_folded, gen_ctx, eva_ctx = _setup()
    z = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    ref = _xla_chain(gen_folded, eva_folded, gen_ctx, eva_ctx, z)
    out = grasp_chain_pallas(gen_folded, eva_folded, gen_ctx, eva_ctx, z,
                             tile=64, interpret=True)
    for a, b, tol in zip(out, ref, (1e-5, 1e-6, 1e-5, 1e-6)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol)


def test_chain_kernel_variable_depth_evaluator():
    """The kernel unrolls the evaluator's rb2..rbK tail from the folded
    tree — the 2-ResBlock ablation variant must also match."""
    gen_folded, eva_folded, gen_ctx, eva_ctx = _setup(n_resblocks=2)
    z = jnp.asarray(rng.normal(size=(64, 5)).astype(np.float32))
    ref = _xla_chain(gen_folded, eva_folded, gen_ctx, eva_ctx, z)
    out = grasp_chain_pallas(gen_folded, eva_folded, gen_ctx, eva_ctx, z,
                             tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(ref[3]),
                               atol=1e-6)


def test_pipeline_flag_matches_default_path():
    """sample_and_score(use_chain_kernel=True) must reproduce the default
    path (same key → same z → same grasps/scores/sort order)."""
    from dexgangrasp_tpu.engine.pipeline import sample_and_score
    from dexgangrasp_tpu.models.networks import init_evaluator as _ie

    (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
    _, ep, es = _ie(jax.random.PRNGKey(1))
    gen_folded = folding.fold_generator(gp, gs)
    eva_folded = folding.fold_evaluator(ep, es)
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    key = jax.random.PRNGKey(4)
    a = sample_and_score(gen_folded, eva_folded, bps, key, 128)
    b = sample_and_score(gen_folded, eva_folded, bps, key, 128,
                         use_chain_kernel=True)
    np.testing.assert_allclose(np.asarray(b.score), np.asarray(a.score),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.transl), np.asarray(a.transl),
                               atol=1e-5)


def test_chain_kernel_z_offset_and_scores_sane():
    gen_folded, eva_folded, gen_ctx, eva_ctx = _setup()
    z = jnp.asarray(rng.normal(size=(64, 5)).astype(np.float32))
    _, t0, _, s = grasp_chain_pallas(gen_folded, eva_folded, gen_ctx,
                                     eva_ctx, z, z_offset=0.0, tile=64,
                                     interpret=True)
    rot, t1, _, _ = grasp_chain_pallas(gen_folded, eva_folded, gen_ctx,
                                       eva_ctx, z, z_offset=0.025, tile=64,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(t1),
                               np.asarray(t0 - 0.025 * rot[:, :, 0]),
                               atol=1e-6)
    s = np.asarray(s)
    assert ((s >= 0) & (s <= 1)).all()
