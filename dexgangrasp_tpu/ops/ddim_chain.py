"""Whole-DDIM-sampler Pallas TPU kernel for the diffusion grasp family.

``DexDiffuser.sample`` (models/diffusion.py) is a ``lax.scan`` over S
denoising steps; as XLA each step's (N, 512) activations round-trip HBM
between the ε-net's matmuls, and the ε-net weights are re-read every
step.  This kernel runs ALL S steps for a grasp tile with the weights
and every intermediate resident in VMEM — the inter-step HBM traffic
drops to one read of the initial noise and one write of the result.

The kernel exploits a structural property of the denoiser: the FiLM
conditioning tower and the timestep-embedding half of the input layer
depend only on (object, step) — not on the grasp — so they collapse to
per-step constant vectors precomputed OUTSIDE the kernel with plain XLA
(``precompute_step_constants``):

    c_inp[s]      = temb_s @ W_inp[t-rows] + b_inp           (S, H)
    scale_b[s], shift_b[s] = split(concat(cond, temb_s) @ W_film + b)

leaving per grasp and step only: g @ W_g, 2 matmuls per ResBlock-FiLM
block, and the output head — all MXU work on (tile, 512) operands.

The DDIM update uses the same explicit form as the XLA sampler
(x0-estimate then re-interpolation) with the per-step √ᾱ scalars
precomputed host-side, so results match the scan path bit-near
(tests/test_ddim_chain.py; on-chip A/B in tools/ddim_bench.py).

Reference workload: the serving-default diverse sampler
(docs/RESULTS.md diffusion family; reference has no counterpart).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dexgangrasp_tpu.models.diffusion import (
    DexDiffuser,
    cosine_alpha_bar,
    timestep_embedding,
)
from dexgangrasp_tpu.models.layers import LRELU_SLOPE


def _leaky(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def precompute_step_constants(model: DexDiffuser, params: dict,
                              bps: jax.Array, steps: int):
    """XLA-side fold of everything that is per-(object, step).

    Returns (inputs list for the kernel, n_blocks)."""
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    cond = model.embed_object(params, f32(bps))          # (cond_dim,)
    ts = jnp.linspace(1.0, 0.0, steps + 1, dtype=jnp.float32)
    t_now = ts[:-1]                                      # (S,)
    temb = timestep_embedding(t_now, model.t_dim)        # (S, t_dim)

    w_inp, b_inp = f32(params["inp"]["w"]), f32(params["inp"]["b"])
    w_g = w_inp[: model.g_dim]                           # (g_dim, H)
    w_t = w_inp[model.g_dim:]                            # (t_dim, H)
    c_inp = temb @ w_t + b_inp                           # (S, H)

    ct = jnp.concatenate(
        [jnp.broadcast_to(cond, (steps, model.cond_dim)), temb], axis=1)
    per_block = []
    for blk in params["blocks"]:
        film = ct @ f32(blk["film"]["w"]) + f32(blk["film"]["b"])  # (S, 2H)
        scale, shift = jnp.split(film, 2, axis=-1)
        per_block.append((f32(blk["fc1"]["w"]),
                          f32(blk["fc1"]["b"]).reshape(1, -1),
                          f32(blk["fc2"]["w"]),
                          f32(blk["fc2"]["b"]).reshape(1, -1),
                          scale, shift))

    ab_now = cosine_alpha_bar(t_now)
    ab_next = cosine_alpha_bar(ts[1:])
    # same explicit x0-estimate form as the XLA scan (bit-near parity)
    sq_now = jnp.sqrt(ab_now).reshape(1, steps)
    sq1m_now = jnp.sqrt(1 - ab_now).reshape(1, steps)
    sq_next = jnp.sqrt(ab_next).reshape(1, steps)
    sq1m_next = jnp.sqrt(1 - ab_next).reshape(1, steps)

    inputs = [w_g, c_inp]
    for parts in per_block:
        inputs.extend(parts)
    inputs += [f32(params["out"]["w"]),
               f32(params["out"]["b"]).reshape(1, -1)]
    scalars = [sq_now, sq1m_now, sq_next, sq1m_next]
    return inputs, scalars, len(params["blocks"])


def _make_kernel(n_blocks: int, steps: int):
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    def kernel(g_ref, sq_now, sq1m_now, sq_next, sq1m_next, *refs):
        out_ref = refs[-1]
        it = iter(refs[:-1])
        nxt = lambda: next(it)
        # static weights read once; per-step tables stay refs (pl.ds)
        w_g, c_inp_ref = nxt()[:], nxt()
        blocks = []
        for _ in range(n_blocks):
            fc1, b1, fc2, b2 = nxt()[:], nxt()[:], nxt()[:], nxt()[:]
            blocks.append((fc1, b1, fc2, b2, nxt(), nxt()))
        w_out, b_out = nxt()[:], nxt()[:]

        def step(s, g):
            x = dot(g, w_g) + c_inp_ref[pl.ds(s, 1), :]
            h = _leaky(x)
            for (fc1, b1, fc2, b2, scale_ref, shift_ref) in blocks:
                sc = scale_ref[pl.ds(s, 1), :]
                sh = shift_ref[pl.ds(s, 1), :]
                u = _leaky(h * (1.0 + sc) + sh)
                u = _leaky(dot(u, fc1) + b1)
                u = dot(u, fc2) + b2
                h = h + u
            e = dot(h, w_out) + b_out
            g0_hat = (g - sq1m_now[0, s] * e) / sq_now[0, s]
            return sq_next[0, s] * g0_hat + sq1m_next[0, s] * e

        out_ref[:] = jax.lax.fori_loop(0, steps, step, g_ref[:])

    return kernel


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnames=("model", "n", "steps", "tile",
                                             "interpret"))
def ddim_sample_pallas(model: DexDiffuser, params: dict, bps: jax.Array,
                       key: jax.Array, n: int, steps: int = 50,
                       tile: int = 256, interpret: bool = False
                       ) -> jax.Array:
    """Drop-in for ``model.sample``: (4096,) bps → (n, g_dim) normalized
    grasps, whole sampler as one Pallas kernel."""
    interpret = interpret or jax.default_backend() != "tpu"
    g = jax.random.normal(key, (n, model.g_dim), jnp.float32)
    inputs, scalars, n_blocks = precompute_step_constants(
        model, params, bps, steps)
    t = min(tile, _round_up(n, 8))
    n_pad = _round_up(n, t)
    if n_pad != n:
        g = jnp.pad(g, ((0, n_pad - n), (0, 0)))

    kernel = _make_kernel(n_blocks, steps)
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    sm = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
    flops_w = sum(int(a.shape[0]) * int(a.shape[1])
                  for a in inputs if a.shape[0] > 1 and a.shape[0] != steps)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // t,),
        in_specs=[pl.BlockSpec((t, model.g_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [sm(s) for s in scalars]
        + [const(a) for a in inputs],
        out_specs=pl.BlockSpec((t, model.g_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, model.g_dim), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * steps * flops_w,
            bytes_accessed=4 * (2 * n_pad * model.g_dim
                                + sum(int(a.size) for a in inputs)),
            transcendentals=0),
        interpret=interpret,
    )(g, *scalars, *inputs)
    return out[:n]
