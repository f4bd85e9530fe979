"""Whole-DDIM-sampler Pallas kernel: parity with the XLA scan sampler
(CPU interpret; the on-chip A/B lives in tools/ddim_bench.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.models.diffusion import DexDiffuser
from dexgangrasp_tpu.ops.ddim_chain import (
    ddim_sample_pallas,
    precompute_step_constants,
)

rng = np.random.default_rng(91)


@pytest.mark.parametrize("n,steps", [(64, 10), (100, 6)])  # 100: pad path
def test_ddim_kernel_matches_scan_sampler(n, steps):
    model = DexDiffuser(n_blocks=2, hidden=128, cond_dim=64)
    params = model.init(jax.random.PRNGKey(3))
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    key = jax.random.PRNGKey(5)
    ref = model.sample(params, bps, key, n, steps=steps)
    out = ddim_sample_pallas(model, params, bps, key, n, steps=steps,
                             tile=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)


def test_engine_path_flag():
    """sample_and_score_diffusion(use_ddim_kernel=True) reproduces the
    scan-sampler path at the same key."""
    from dexgangrasp_tpu.engine import folding
    from dexgangrasp_tpu.engine.diffusion_pipeline import (
        sample_and_score_diffusion,
    )
    from dexgangrasp_tpu.models.networks import init_evaluator

    model = DexDiffuser(n_blocks=2, hidden=128, cond_dim=64)
    params = model.init(jax.random.PRNGKey(3))
    _, ep, es = init_evaluator(jax.random.PRNGKey(4))
    ef = folding.fold_evaluator(ep, es)
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    key = jax.random.PRNGKey(8)
    a = sample_and_score_diffusion(model, params, ef, None, bps, key, 32,
                                   steps=6)
    b = sample_and_score_diffusion(model, params, ef, None, bps, key, 32,
                                   steps=6, use_ddim_kernel=True)
    np.testing.assert_allclose(np.asarray(b.transl), np.asarray(a.transl),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(b.score), np.asarray(a.score),
                               atol=1e-4)


def test_step_constants_reproduce_eps():
    """The per-step constant fold must be algebraically exact: eps built
    from (c_inp, film scale/shift) equals model.eps at that step."""
    model = DexDiffuser(n_blocks=3, hidden=64, cond_dim=32, t_dim=16)
    params = model.init(jax.random.PRNGKey(0))
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    steps = 8
    inputs, _, n_blocks = precompute_step_constants(model, params, bps,
                                                    steps)
    w_g, c_inp = inputs[0], inputs[1]
    blocks = [inputs[2 + 6 * b: 2 + 6 * (b + 1)] for b in range(n_blocks)]
    w_out, b_out = inputs[2 + 6 * n_blocks], inputs[3 + 6 * n_blocks]

    g = jnp.asarray(rng.normal(size=(16, model.g_dim)).astype(np.float32))
    s = 3
    t_now = jnp.linspace(1.0, 0.0, steps + 1)[s]
    cond = model.embed_object(params, bps)
    ref = model.eps(params, cond, g, jnp.full((16,), t_now))

    def leaky(x):
        return jnp.where(x >= 0, x, 0.2 * x)

    h = leaky(g @ w_g + c_inp[s])
    for (fc1, b1, fc2, b2, scale, shift) in blocks:
        u = leaky(h * (1.0 + scale[s]) + shift[s])
        u = leaky(u @ fc1 + b1[0])
        u = u @ fc2 + b2[0]
        h = h + u
    ours = h @ w_out + b_out[0]
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=1e-5)
