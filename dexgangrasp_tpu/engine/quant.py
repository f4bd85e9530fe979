"""int8 (W8A8) quantized serving path for the folded networks.

The serving roofline (docs/RESULTS.md) puts the fused sample→score
pipeline at ~26% MFU against the v5e's bf16 peak, bound by the serial
per-grasp matmul chain; bf16 operands were measured a no-op because the
MXU already multiplies f32 operands at bf16 rate.  int8 is the next
rung: the v5e MXU runs int8×int8→int32 at ~2× the bf16 rate, so
quantizing the chain's wide matmuls attacks the bound directly — a
TPU-native optimization with no reference analogue (the reference
serves f32 torch MLPs, ``dexgangrasp.py:495-514``).

Scheme (chosen for zero calibration data and exact reproducibility):

- **Weights**: symmetric per-output-channel int8, precomputed once at
  fold time (``quantize_folded``).  Only the wide body matmuls
  (``w1_x``, ``w2``, ``w3_x`` — K ∈ {256, 512}) are quantized: they
  carry ~95% of the per-grasp FLOPs.  The skinny z/pose matmuls
  (K ∈ {5, 12, 15}) and the output heads (rot/transl/joints/score —
  pose-precision-critical, FLOP-negligible) stay f32.
- **Activations**: dynamic symmetric per-row int8 (scale = row-max/127,
  computed on the VPU per layer).  No calibration set needed, and the
  quantization error is bounded per row.
- **Accumulation**: int32 (``preferred_element_type``), dequantized with
  the rank-1 outer product of row/column scales, then bias/context adds
  in f32 — so the BN-folding and object-context algebra is untouched.

Fidelity on trained checkpoints is measured by tools/quant_study.py
(top-k overlap + score/pose error vs the f32 path); exactness bounds are
unit-tested in tests/test_quant.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.engine.folding import _eva_rb_names
from dexgangrasp_tpu.models.layers import leaky_relu

# the wide per-grasp matmuls (K >= 256); everything else stays f32
QUANT_KEYS = ("w1_x", "w2", "w3_x")


def quantize_weight(w: jax.Array) -> dict:
    """f32 (K, N) → {'q': int8 (K, N), 's': f32 (N,)} symmetric
    per-output-channel."""
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    s = jnp.maximum(s, 1e-12)
    return {"q": jnp.round(w / s).astype(jnp.int8), "s": s}


def quantize_folded(folded: dict) -> dict:
    """Quantize a folded generator/evaluator/discriminator param tree's
    wide body matmuls in place of their f32 weights (heads, biases,
    skinny matmuls, and the bps context weights stay f32)."""
    out = {}
    for name, sub in folded.items():
        if isinstance(sub, dict) and name.startswith("rb"):
            q = {}
            for k, v in sub.items():
                q[k] = quantize_weight(v) if k in QUANT_KEYS else v
            out[name] = q
        else:
            out[name] = sub
    return out


def qmm(x: jax.Array, qw: dict) -> jax.Array:
    """Dynamic W8A8 matmul: per-row activation scale, int32 accumulate,
    rank-1 dequant.  x (N, K) f32 × qw int8 (K, M) → (N, M) f32."""
    s_x = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    s_x = jnp.maximum(s_x, 1e-12)
    x_q = jnp.round(x / s_x).astype(jnp.int8)
    acc = jax.lax.dot_general(x_q, qw["q"], (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(x.dtype) * (s_x * qw["s"])


def generator_apply_folded_q(qfolded: dict, ctx: dict, z: jax.Array):
    """int8 twin of ``folding.generator_apply_folded`` (same ctx)."""
    rb1, rb2 = qfolded["rb1"], qfolded["rb2"]
    h = leaky_relu(z @ rb1["w1_z"] + ctx["rb1"]["c1"])
    u = qmm(h, rb1["w2"]) + rb1["b2"]
    xin = leaky_relu(z @ rb1["w3_z"] + ctx["rb1"]["c3"])
    x = leaky_relu(xin + u)

    h2 = leaky_relu(z @ rb2["w1_z"] + qmm(x, rb2["w1_x"]) + ctx["rb2"]["c1"])
    u2 = qmm(h2, rb2["w2"]) + rb2["b2"]
    xin2 = leaky_relu(z @ rb2["w3_z"] + qmm(x, rb2["w3_x"])
                      + ctx["rb2"]["c3"])
    x2 = leaky_relu(xin2 + u2)

    rot6 = x2 @ qfolded["rot"]["w"] + qfolded["rot"]["b"]
    transl = x2 @ qfolded["transl"]["w"] + qfolded["transl"]["b"]
    joints = x2 @ qfolded["joint_conf"]["w"] + qfolded["joint_conf"]["b"]
    return rot6, transl, joints


def evaluator_apply_folded_q(qfolded: dict, ctx: dict, pose: jax.Array,
                             sigmoid: bool = True) -> jax.Array:
    """int8 twin of ``folding.evaluator_apply_folded`` (same ctx)."""
    rb1 = qfolded["rb1"]
    h = leaky_relu(pose @ rb1["w1_pose"] + ctx["rb1"]["c1"])
    u = qmm(h, rb1["w2"]) + rb1["b2"]
    xin = leaky_relu(pose @ rb1["w3_pose"] + ctx["rb1"]["c3"])
    x = leaky_relu(xin + u)

    for name in _eva_rb_names(qfolded)[1:]:
        rb = qfolded[name]
        h = leaky_relu(qmm(x, rb["w1_x"]) + pose @ rb["w1_pose"]
                       + ctx[name]["c1"])
        u = qmm(h, rb["w2"]) + rb["b2"]
        xin = leaky_relu(qmm(x, rb["w3_x"]) + pose @ rb["w3_pose"]
                         + ctx[name]["c3"])
        x = leaky_relu(xin + u)

    score = (x @ qfolded["out"]["w"] + qfolded["out"]["b"])[..., 0]
    return jax.nn.sigmoid(score) if sigmoid else score
