"""Whole GUIDED-DDIM sampler + scorer as ONE Pallas TPU kernel.

The production serving recipe (docs/RESULTS.md: guided DDIM-10 + filter,
0.98 true success) runs ``engine/diffusion_pipeline.sample_guided`` — an
XLA scan whose every step is (a) the denoiser forward and (b) a
reverse-mode sweep through denormalize → 6D-rot Gram-Schmidt → palm
back-off → folded evaluator to get the classifier-guidance gradient
∇ log p_success.  As HLO, each step's (N, 512) activations round-trip
HBM between every matmul of both the forward and the transposed chain,
and the denoiser + evaluator weights are re-read from HBM every step.

This kernel runs ALL S guided steps for a grasp tile with the denoiser
weights, the folded evaluator weights, and every intermediate resident
in VMEM, then finishes with the serving epilogue (denormalize →
Gram-Schmidt → back-off → evaluator score) in the same kernel — one read
of the initial noise in, one (tile, 13+J+1+g_dim) result out.  The
guidance VJP is not hand-written: the kernel body is traced JAX, so
``jax.grad`` of the in-kernel evaluator closure emits the transposed
matmul chain into the same Mosaic program (weights captured from VMEM).

Structure shared with the unguided kernel (ops/ddim_chain.py): the FiLM
tower + timestep-embedding rows fold to per-step constants computed in
XLA (``precompute_step_constants``); the per-object evaluator context
folds (engine/folding.py) enter as (1, 512) rows exactly as in the
per-grasp chain kernel (ops/grasp_chain.py), whose in-kernel
Gram-Schmidt/back-off/evaluator forms are reused verbatim here.

Numerics follow the DDIM-kernel judging rule (CLAUDE.md): the guided
recursion chaotically amplifies matmul-precision noise, so on-chip
kernel-vs-XLA drift is judged against the XLA sampler's own
default-vs-HIGHEST-precision envelope; CPU-interpret parity at identical
precision is tight (tests/test_guided_ddim.py).

Reference anchor: the serving loop this accelerates is the rebuild's
flagship path (reference ``dexgangrasp_real_robot.py:143-150`` serves
its flagship generator per frame; ours is guided diffusion).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dexgangrasp_tpu.models.diffusion import DexDiffuser, cosine_alpha_bar
from dexgangrasp_tpu.models.layers import LRELU_SLOPE
from dexgangrasp_tpu.ops.ddim_chain import precompute_step_constants
from dexgangrasp_tpu.ops.grasp_chain import _eva_rb_names, _row


def _leaky(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def pack_eva_inputs(eva_folded: dict, eva_ctx: dict) -> tuple:
    """Evaluator per-grasp weights + per-object context rows, flattened in
    the same order as ops/grasp_chain.pack_inputs' evaluator half."""
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    names = _eva_rb_names(eva_folded)
    e1 = eva_folded[names[0]]
    inputs = [
        f32(e1["w1_pose"]), f32(e1["w2"]), _row(e1["b2"]), f32(e1["w3_pose"]),
        _row(eva_ctx[names[0]]["c1"]), _row(eva_ctx[names[0]]["c3"]),
    ]
    for nm in names[1:]:
        rb = eva_folded[nm]
        inputs += [
            f32(rb["w1_x"]), f32(rb["w1_pose"]), f32(rb["w2"]), _row(rb["b2"]),
            f32(rb["w3_x"]), f32(rb["w3_pose"]),
            _row(eva_ctx[nm]["c1"]), _row(eva_ctx[nm]["c3"]),
        ]
    inputs += [f32(eva_folded["out"]["w"]), _row(eva_folded["out"]["b"])]
    return inputs, len(names)


def _make_kernel(n_blocks: int, n_eva_rb: int, n_joints: int, steps: int,
                 g_dim: int):
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    def kernel(g_ref, sq_now, sq1m_now, sq_next, sq1m_next, w_guid,
               zo_clip, *refs):
        out_ref = refs[-1]
        it = iter(refs[:-1])
        nxt = lambda: next(it)
        # ---- denoiser statics (ops/ddim_chain layout) --------------------
        w_g, c_inp_ref = nxt()[:], nxt()
        blocks = []
        for _ in range(n_blocks):
            fc1, b1, fc2, b2 = nxt()[:], nxt()[:], nxt()[:], nxt()[:]
            blocks.append((fc1, b1, fc2, b2, nxt(), nxt()))
        w_out, b_out = nxt()[:], nxt()[:]
        # ---- normalizer + evaluator statics ------------------------------
        mean, std = nxt()[:], nxt()[:]
        e_first = tuple(nxt()[:] for _ in range(6))
        e_rest = [tuple(nxt()[:] for _ in range(8))
                  for _ in range(n_eva_rb - 1)]
        e_out_w, e_out_b = nxt()[:], nxt()[:]
        z_offset = zo_clip[0, 0]
        grad_clip = zo_clip[0, 1]

        def pose_and_p(g0n):
            """Normalized grasp tile → (rot9, backed-off transl, joints, p).

            Same math as engine/diffusion_pipeline.sample_guided's logp path
            (denormalize → split → Gram-Schmidt w/ 1e-8 clamp → back-off →
            folded evaluator → sigmoid); the Gram-Schmidt / evaluator forms
            are the parity-tested ones from ops/grasp_chain.py."""
            gd = g0n * std + mean
            rot6 = gd[:, 0:6]
            transl = gd[:, 6:9]
            joints = gd[:, 9:9 + n_joints]

            def _norm3(v):
                mag = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
                return v / jnp.maximum(mag, 1e-8)

            def _cross3(a, b):
                return jnp.concatenate([
                    a[:, 1:2] * b[:, 2:3] - a[:, 2:3] * b[:, 1:2],
                    a[:, 2:3] * b[:, 0:1] - a[:, 0:1] * b[:, 2:3],
                    a[:, 0:1] * b[:, 1:2] - a[:, 1:2] * b[:, 0:1],
                ], axis=1)

            xa = _norm3(rot6[:, 0:3])
            za = _norm3(_cross3(xa, rot6[:, 3:6]))
            ya = _cross3(za, xa)
            rot9 = jnp.concatenate([
                xa[:, 0:1], ya[:, 0:1], za[:, 0:1],
                xa[:, 1:2], ya[:, 1:2], za[:, 1:2],
                xa[:, 2:3], ya[:, 2:3], za[:, 2:3],
            ], axis=1)
            transl_b = transl - z_offset * xa
            pose = jnp.concatenate([rot9, transl_b], axis=1)

            w1_p, ew2, eb2, w3_p, ec1, ec3 = e_first
            h = _leaky(dot(pose, w1_p) + ec1)
            u = dot(h, ew2) + eb2
            xin = _leaky(dot(pose, w3_p) + ec3)
            xx = _leaky(xin + u)
            for (w1_x, w1_p, ew2, eb2, w3_x, w3_p, ec1, ec3) in e_rest:
                h = _leaky(dot(xx, w1_x) + dot(pose, w1_p) + ec1)
                u = dot(h, ew2) + eb2
                xin = _leaky(dot(xx, w3_x) + dot(pose, w3_p) + ec3)
                xx = _leaky(xin + u)
            p = jax.nn.sigmoid(dot(xx, e_out_w) + e_out_b)  # (T, 1)
            return rot9, transl_b, joints, p

        def logp_sum(g0n):
            p = pose_and_p(g0n)[3]
            return jnp.sum(jnp.log(p + 1e-6))

        grad_logp = jax.grad(logp_sum)

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
            grad = grad_logp(g0_hat)
            nrm = jnp.sqrt(jnp.sum(grad * grad, axis=-1, keepdims=True))
            grad = grad * jnp.minimum(1.0, grad_clip / jnp.maximum(nrm,
                                                                   1e-12))
            g0_hat = g0_hat + w_guid[0, s] * grad
            e_adj = (g - sq_now[0, s] * g0_hat) / sq1m_now[0, s]
            return sq_next[0, s] * g0_hat + sq1m_next[0, s] * e_adj

        g = jax.lax.fori_loop(0, steps, step, g_ref[:])
        rot9, transl, joints, p = pose_and_p(g)
        out_ref[:] = jnp.concatenate([rot9, transl, joints, p, g], axis=1)

    return kernel


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnames=("model", "n", "steps", "tile",
                                             "interpret"))
def guided_sample_pallas(model: DexDiffuser, diff_params: dict,
                         eva_folded: dict, normalizer, bps: jax.Array,
                         key: jax.Array, n: int, steps: int = 10,
                         guidance_scale: float = 10.0,
                         grad_clip: float = 1.0, z_offset: float = 0.025,
                         tile: int = 128, interpret: bool = False):
    """Drop-in for the guided serving chain: (4096,) bps → (rot (n,3,3),
    transl (n,3), joints (n,J), score (n,), g_normalized (n, g_dim)) —
    the whole evaluator-guided DDIM sampler + final scoring as one Pallas
    kernel.  ``guidance_scale``/``grad_clip``/``z_offset`` may be traced.
    """
    from dexgangrasp_tpu.engine import folding

    interpret = interpret or jax.default_backend() != "tpu"
    g = jax.random.normal(key, (n, model.g_dim), jnp.float32)
    inputs, scalars, n_blocks = precompute_step_constants(
        model, diff_params, bps, steps)
    # guidance weight per step: scale * (1 - alpha_bar_now)
    ts = jnp.linspace(1.0, 0.0, steps + 1, dtype=jnp.float32)
    ab_now = cosine_alpha_bar(ts[:-1])
    w_guid = (jnp.asarray(guidance_scale, jnp.float32)
              * (1 - ab_now)).reshape(1, steps)
    zo_clip = jnp.stack([jnp.asarray(z_offset, jnp.float32),
                         jnp.asarray(grad_clip, jnp.float32)]).reshape(1, 2)

    if normalizer is not None:
        norm_rows = [_row(jnp.asarray(normalizer.mean, jnp.float32)),
                     _row(jnp.asarray(normalizer.std, jnp.float32))]
    else:
        norm_rows = [_row(jnp.zeros(model.g_dim)), _row(jnp.ones(model.g_dim))]
    ectx = folding.evaluator_object_context(eva_folded,
                                            jnp.asarray(bps, jnp.float32))
    eva_inputs, n_eva_rb = pack_eva_inputs(eva_folded, ectx)
    inputs = inputs + norm_rows + eva_inputs

    t = min(tile, _round_up(n, 8))
    n_pad = _round_up(n, t)
    if n_pad != n:
        g = jnp.pad(g, ((0, n_pad - n), (0, 0)))
    out_dim = 9 + 3 + model.n_joints + 1 + model.g_dim

    kernel = _make_kernel(n_blocks, n_eva_rb, model.n_joints, steps,
                          model.g_dim)
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    sm = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
    denoiser_w = sum(int(a.shape[0]) * int(a.shape[1])
                     for a in inputs if a.shape[0] > 1 and a.shape[0] != steps)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // t,),
        in_specs=[pl.BlockSpec((t, model.g_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [sm(s) for s in scalars]
        + [sm(w_guid), sm(zo_clip)]
        + [const(a) for a in inputs],
        out_specs=pl.BlockSpec((t, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_dim), jnp.float32),
        cost_estimate=pl.CostEstimate(
            # fwd denoiser + ~3x evaluator (fwd + transposed chain) per step
            flops=2 * n_pad * (steps + 1) * 3 * denoiser_w,
            bytes_accessed=4 * (2 * n_pad * model.g_dim
                                + sum(int(a.size) for a in inputs)),
            transcendentals=4 * n_pad * steps),
        # denoiser + evaluator weights + AD residuals exceed the 16 MiB
        # default scoped-vmem budget (~21.5 MiB at tile 128); v5e has
        # 128 MiB physical VMEM, so raise the Mosaic cap for this kernel
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(g, *scalars, w_guid, zo_clip, *inputs)

    out = out[:n]
    J = model.n_joints
    rot = out[:, :9].reshape(n, 3, 3)
    transl = out[:, 9:12]
    joints = out[:, 12:12 + J]
    score = out[:, 12 + J]
    g_final = out[:, 13 + J:]
    return rot, transl, joints, score, g_final
