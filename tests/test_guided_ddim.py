"""Whole guided-DDIM-sampler Pallas kernel: parity with the XLA scan
path (CPU interpret; the on-chip A/B lives in tools/guided_bench.py).

The guided recursion amplifies precision noise chaotically on-chip, but
at IDENTICAL (CPU f32) precision the kernel must track the XLA sampler
tightly — same judging rule as tests/test_ddim_chain.py."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.engine import folding
from dexgangrasp_tpu.engine.diffusion_pipeline import (
    sample_and_score_guided,
)
from dexgangrasp_tpu.models.diffusion import DexDiffuser, GraspNormalizer
from dexgangrasp_tpu.models.networks import DexEvaluator
from dexgangrasp_tpu.ops.guided_ddim import guided_sample_pallas

rng = np.random.default_rng(17)


def _setup(n_blocks=2, hidden=128, cond_dim=64, n_resblocks=2):
    model = DexDiffuser(n_blocks=n_blocks, hidden=hidden, cond_dim=cond_dim)
    params = model.init(jax.random.PRNGKey(3))
    eva = DexEvaluator(n_resblocks=n_resblocks)
    ep, es = eva.init(jax.random.PRNGKey(4))
    ef = folding.fold_evaluator(ep, es)
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    normalizer = GraspNormalizer(
        mean=jnp.asarray(rng.normal(0, 0.1, model.g_dim), jnp.float32),
        std=jnp.asarray(rng.uniform(0.5, 1.5, model.g_dim), jnp.float32))
    return model, params, ef, bps, normalizer


@pytest.mark.parametrize("n,steps,scale", [(64, 6, 10.0), (100, 4, 2.0)])
def test_guided_kernel_matches_xla_scan(n, steps, scale):
    model, params, ef, bps, normalizer = _setup()
    key = jax.random.PRNGKey(5)
    ref = sample_and_score_guided(model, params, ef, normalizer, bps, key,
                                  n, steps=steps, guidance_scale=scale)
    rot, transl, joints, score, g = guided_sample_pallas(
        model, params, ef, normalizer, bps, key, n, steps=steps,
        guidance_scale=scale, tile=64)
    # ref.z is the DENORMALIZED grasp vector (sample_and_score_guided
    # denormalizes before packing); the kernel returns normalized g
    gd = np.asarray(g) * np.asarray(normalizer.std) + np.asarray(
        normalizer.mean)
    np.testing.assert_allclose(gd, np.asarray(ref.z), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(transl), np.asarray(ref.transl),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(rot), np.asarray(ref.rot_matrix),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(score), np.asarray(ref.score),
                               atol=2e-3, rtol=1e-3)


def test_guided_kernel_scale_zero_is_plain_ddim():
    """guidance_scale=0 must reduce to the plain DDIM sampler (the same
    algebraic-identity property the XLA path has)."""
    model, params, ef, bps, normalizer = _setup()
    key = jax.random.PRNGKey(9)
    plain = model.sample(params, bps, key, 48, steps=5)
    *_, g = guided_sample_pallas(model, params, ef, normalizer, bps, key,
                                 48, steps=5, guidance_scale=0.0, tile=48)
    np.testing.assert_allclose(np.asarray(g), np.asarray(plain),
                               atol=5e-4, rtol=1e-4)


def test_engine_guided_kernel_flag():
    """DiffusionEngine(use_guided_kernel=True) reproduces the XLA guided
    engine path at the same seed (Grasps contract incl. denormalized z)."""
    from dexgangrasp_tpu.engine.diffusion_pipeline import DiffusionEngine

    model, params, ef, bps, normalizer = _setup()
    eva = DexEvaluator(n_resblocks=2)
    ep, es = eva.init(jax.random.PRNGKey(4))
    kw = dict(normalizer=normalizer, model=model, ddim_steps=4,
              guidance_scale=5.0)
    a = DiffusionEngine(params, ep, es, **kw).generate(bps, 32, seed=7)
    b = DiffusionEngine(params, ep, es, use_guided_kernel=True,
                        **kw).generate(bps, 32, seed=7)
    np.testing.assert_allclose(np.asarray(b.score), np.asarray(a.score),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(b.z), np.asarray(a.z),
                               atol=2e-3, rtol=1e-3)


def test_guided_kernel_no_normalizer_and_deep_evaluator():
    """normalizer=None identity path + 3-ResBlock (reference-depth)
    evaluator both flow through the kernel."""
    model, params, ef, bps, _ = _setup(n_resblocks=3)
    key = jax.random.PRNGKey(11)
    ref = sample_and_score_guided(model, params, ef, None, bps, key, 32,
                                  steps=4, guidance_scale=5.0)
    rot, transl, joints, score, g = guided_sample_pallas(
        model, params, ef, None, bps, key, 32, steps=4,
        guidance_scale=5.0, tile=32)
    np.testing.assert_allclose(np.asarray(score), np.asarray(ref.score),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(joints), np.asarray(ref.joint_conf),
                               atol=2e-3, rtol=1e-3)
