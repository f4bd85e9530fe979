"""Fused per-grasp chain as ONE Pallas TPU kernel.

The serving hot path after folding (engine/folding.py) is a chain of small
per-grasp layers: latents → folded generator (2 ResBlocks + 3 heads) →
6D-rotation Gram-Schmidt → palm back-off → folded evaluator (K ResBlocks
→ sigmoid).  As XLA HLO each layer's (N, 256/512) intermediate round-trips
HBM between dots — at N = 16k that's ~hundreds of MB of traffic for ~m
FLOPs, i.e. the chain is bandwidth-bound, not MXU-bound.

This kernel runs the WHOLE chain per grasp-tile with every intermediate
held in VMEM: one read of the latent tile + one (pipeline-cached) copy of
the folded weights in, one (tile, 13+J) result out.  The per-object parts
(BPS context folds c1/c3) are computed outside and enter as small vectors.

Semantics are bit-compatible with the XLA path
(``folding.generator_apply_folded`` → ``rot_matrix_from_ortho6d`` →
``translate_along_axis`` → ``folding.evaluator_apply_folded``); parity is
enforced in tests/test_grasp_chain.py (CPU interpret) and on-chip by
tools/chain_bench.py.  Reference workload being replaced:
``dexgangrasp.py:495-514`` (generate) + ``:393-442`` (evaluate/filter).
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dexgangrasp_tpu.models.layers import LRELU_SLOPE


def _leaky(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def _row(v) -> jax.Array:
    """Biases / context folds as (1, d) rows (2-D for TPU layout)."""
    v = jnp.asarray(v, jnp.float32)
    assert v.ndim == 1, ("grasp_chain is single-object: context must be 1-D,"
                         f" got {v.shape}")
    return v.reshape(1, -1)


def _eva_rb_names(eva_folded: dict) -> List[str]:
    return sorted((k for k in eva_folded if k.startswith("rb")),
                  key=lambda k: int(k[2:]))


def pack_inputs(gen_folded: dict, eva_folded: dict, gen_ctx: dict,
                eva_ctx: dict, dtype=jnp.float32) -> Tuple[list, int]:
    """Flatten the folded weights + per-object contexts into the kernel's
    positional input list.  Returns (inputs, n_eva_resblocks).

    ``dtype=bfloat16`` stores the MATMUL operands (weight matrices) in
    bf16 — the serving mixed-precision mode: the MXU runs bf16 at ~2× the
    f32 rate and the weights' VMEM footprint halves.  Bias/context rows
    and all adds stay f32 (they feed the f32 accumulators)."""
    f32 = lambda a: jnp.asarray(a, dtype)
    g1, g2 = gen_folded["rb1"], gen_folded["rb2"]
    inputs = [
        f32(g1["w1_z"]), f32(g1["w2"]), _row(g1["b2"]), f32(g1["w3_z"]),
        _row(gen_ctx["rb1"]["c1"]), _row(gen_ctx["rb1"]["c3"]),
        f32(g2["w1_z"]), f32(g2["w1_x"]), f32(g2["w2"]), _row(g2["b2"]),
        f32(g2["w3_z"]), f32(g2["w3_x"]),
        _row(gen_ctx["rb2"]["c1"]), _row(gen_ctx["rb2"]["c3"]),
        f32(gen_folded["rot"]["w"]), _row(gen_folded["rot"]["b"]),
        f32(gen_folded["transl"]["w"]), _row(gen_folded["transl"]["b"]),
        f32(gen_folded["joint_conf"]["w"]), _row(gen_folded["joint_conf"]["b"]),
    ]
    names = _eva_rb_names(eva_folded)
    e1 = eva_folded[names[0]]
    inputs += [
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


def _make_kernel(n_eva_rb: int, n_joints: int, cdt=jnp.float32):
    # matmul operands cast to cdt (bf16 serving mode); accumulation f32
    dot = lambda a, w: jnp.dot(a.astype(cdt), w,
                               preferred_element_type=jnp.float32)

    def kernel(z_ref, zo_ref, *refs):
        z_offset = zo_ref[0, 0]
        out_ref = refs[-1]
        w = [r[:] for r in refs[:-1]]
        it = iter(w)
        nxt = lambda: next(it)

        z = z_ref[:]
        # --- folded generator (folding.generator_apply_folded) -----------
        w1_z, w2, b2, w3_z, c1, c3 = (nxt() for _ in range(6))
        h = _leaky(dot(z, w1_z) + c1)
        u = dot(h, w2) + b2
        xin = _leaky(dot(z, w3_z) + c3)
        x = _leaky(xin + u)

        w1_z2, w1_x2, w2_2, b2_2, w3_z2, w3_x2, c1_2, c3_2 = (
            nxt() for _ in range(8))
        h2 = _leaky(dot(z, w1_z2) + dot(x, w1_x2) + c1_2)
        u2 = dot(h2, w2_2) + b2_2
        xin2 = _leaky(dot(z, w3_z2) + dot(x, w3_x2) + c3_2)
        x2 = _leaky(xin2 + u2)

        rot_w, rot_b, tr_w, tr_b, j_w, j_b = (nxt() for _ in range(6))
        rot6 = dot(x2, rot_w) + rot_b
        transl = dot(x2, tr_w) + tr_b
        joints = dot(x2, j_w) + j_b

        # --- 6D → rotation matrix (core.rotations.rot_matrix_from_ortho6d,
        # reference utils.py:380-394 incl. the 1e-8 norm clamp) -----------
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
        # row-major flatten of R whose COLUMNS are (x, y, z)
        rot9 = jnp.concatenate([
            xa[:, 0:1], ya[:, 0:1], za[:, 0:1],
            xa[:, 1:2], ya[:, 1:2], za[:, 1:2],
            xa[:, 2:3], ya[:, 2:3], za[:, 2:3],
        ], axis=1)
        # palm back-off (core.transforms.translate_along_axis, axis 0)
        transl = transl - z_offset * xa
        pose = jnp.concatenate([rot9, transl], axis=1)

        # --- folded evaluator (folding.evaluator_apply_folded) -----------
        w1_p, ew2, eb2, w3_p, ec1, ec3 = (nxt() for _ in range(6))
        h = _leaky(dot(pose, w1_p) + ec1)
        u = dot(h, ew2) + eb2
        xin = _leaky(dot(pose, w3_p) + ec3)
        xx = _leaky(xin + u)
        for _ in range(n_eva_rb - 1):
            w1_x, w1_p, ew2, eb2, w3_x, w3_p, ec1, ec3 = (
                nxt() for _ in range(8))
            h = _leaky(dot(xx, w1_x) + dot(pose, w1_p) + ec1)
            u = dot(h, ew2) + eb2
            xin = _leaky(dot(xx, w3_x) + dot(pose, w3_p) + ec3)
            xx = _leaky(xin + u)
        out_w, out_b = nxt(), nxt()
        score = jax.nn.sigmoid(dot(xx, out_w) + out_b)  # (T, 1)

        out_ref[:] = jnp.concatenate([rot9, transl, joints, score], axis=1)

    return kernel


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnames=("n_joints", "tile", "interpret",
                                             "bf16"))
def grasp_chain_pallas(gen_folded: dict, eva_folded: dict, gen_ctx: dict,
                       eva_ctx: dict, z: jax.Array,
                       z_offset=0.025, n_joints: int = 12,
                       tile: int = 512, interpret: bool = False,
                       bf16: bool = False):
    """z (N, L) latents → (rot (N,3,3), transl (N,3), joints (N,J),
    score (N,)) via the single fused kernel.  ``z_offset`` may be traced.

    ``bf16=True`` = serving mixed precision: matmul operands bf16 (2×
    MXU rate, half the weight VMEM), f32 accumulation/adds/Gram-Schmidt/
    sigmoid.  Opt-in; ranking fidelity study in tools/chain_bench.py."""
    n = z.shape[0]
    # Mosaic is TPU-only; off-TPU (CPU test meshes) fall back to the
    # interpreter so the flag is usable everywhere
    interpret = interpret or jax.default_backend() != "tpu"
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    inputs, n_eva_rb = pack_inputs(gen_folded, eva_folded, gen_ctx, eva_ctx,
                                   dtype=cdt)
    t = min(tile, _round_up(n, 8))
    n_pad = _round_up(n, t)
    if n_pad != n:
        z = jnp.pad(z, ((0, n_pad - n), (0, 0)))
    out_dim = 9 + 3 + n_joints + 1
    zo = jnp.asarray(z_offset, jnp.float32).reshape(1, 1)

    kernel = _make_kernel(n_eva_rb, n_joints, cdt)
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    flops_w = sum(int(a.shape[0]) * int(a.shape[1])
                  for a in inputs if a.shape[0] > 1)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // t,),
        in_specs=[pl.BlockSpec((t, z.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)]
        + [const(a) for a in inputs],
        out_specs=pl.BlockSpec((t, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_dim), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * flops_w,
            bytes_accessed=4 * (n_pad * (z.shape[1] + out_dim)
                                + flops_w),
            transcendentals=2 * n_pad),
        interpret=interpret,
    )(z.astype(jnp.float32), zo, *inputs)

    out = out[:n]
    rot = out[:, :9].reshape(n, 3, 3)
    transl = out[:, 9:12]
    joints = out[:, 12:12 + n_joints]
    score = out[:, 12 + n_joints]
    return rot, transl, joints, score
