"""Inference-time network folding — the TPU-first redesign of the hot path.

The reference scores N candidate grasps by tiling the object's 4096-dim BPS
encoding N times and pushing (N, 4096+pose) batches through the MLPs
(``dexgangrasp.py:495-514``, ``:393-442``).  That wastes ~95% of the FLOPs:
the BPS half of every first-layer and skip matmul is *identical across the
N grasps*.

This module restructures inference into two exact algebraic passes:

1. **BN folding** (once per weights load): eval-mode BatchNorm is an affine
   map, so it is folded into the adjacent Linear layers.  The network
   becomes pure Linear+LeakyReLU+add.

2. **Object-context folding** (once per object): every weight matrix that
   consumes the network input is split into its BPS rows and its small
   per-grasp rows (latent z for the generator; rot9+transl3[+joints] for the
   evaluator/discriminator).  The BPS-row products are computed once per
   object; per-grasp work shrinks to tiny dense layers
   (z→256, 512→256, 256→512, 512→512 …), ~20× fewer FLOPs per grasp.

Both passes are exact (associativity of affine maps), verified against the
unfolded forward in tests/test_engine.py.  Folded layouts:

- generator: rb1{w1_z, w2, w3_z}, rb2{w1_z, w1_x, w2, w3_z, w3_x}, heads.
  Context: rb1{c1(256), c3(512)}, rb2{c1, c3}  (c = bps @ W_bps + b).
- evaluator/discriminator: same shape with pose instead of z; rb3 for the
  evaluator; concat order differs per reference ([X0, X] disc, [X, X0] eval).
"""
from __future__ import annotations

import jax

from dexgangrasp_tpu.models.layers import batchnorm_affine, leaky_relu

IN_BPS = 4096


def _fold_post_bn(w, b, bn_p, bn_s):
    """Linear followed by eval-mode BN → single affine."""
    k, c = batchnorm_affine(bn_p, bn_s)
    return w * k[None, :], b * k + c


def _split_rows(w, b, segments, bn_affine=None, bps_name="bps"):
    """Split a Linear's weight rows into named segments; fold an input BN
    affine (k, c) into the ``bps`` segment (weight scaled by k rows, bias
    absorbing c @ W_bps)."""
    out = {}
    bias = b
    start = 0
    for name, size in segments:
        rows = w[start:start + size]
        if name == bps_name and bn_affine is not None:
            k, c = bn_affine
            bias = bias + c @ rows
            rows = k[:, None] * rows
        out[name] = rows
        start += size
    assert start == w.shape[0], (start, w.shape)
    out["bias"] = bias
    return out


def _fold_resblock(p, s, segments, bn_affine):
    """Fold one ResBlock whose input is the concatenation described by
    ``segments`` (list of (name, size)); returns folded dict with keys
    w1_<seg>, w2, w3_<seg>, b1, b2, b3."""
    w1, b1 = _fold_post_bn(p["fc1"]["w"], p["fc1"]["b"], p["bn1"], s["bn1"])
    w2, b2 = _fold_post_bn(p["fc2"]["w"], p["fc2"]["b"], p["bn2"], s["bn2"])
    s1 = _split_rows(w1, b1, segments, bn_affine)
    s3 = _split_rows(p["fc3"]["w"], p["fc3"]["b"], segments, bn_affine)
    out = {"w2": w2, "b2": b2, "b1": s1.pop("bias"), "b3": s3.pop("bias")}
    for name, rows in s1.items():
        out[f"w1_{name}"] = rows
    for name, rows in s3.items():
        out[f"w3_{name}"] = rows
    return out


# ---------------------------------------------------------------- generator


def fold_generator(params: dict, state: dict) -> dict:
    """Generator (networks.py:58-103 topology) → BN-free folded params.

    Input X0 = [z(L), bps_bn(4096)]; rb2 consumes [X0, X]."""
    latent = params["rb1"]["fc1"]["w"].shape[0] - IN_BPS
    bn0 = batchnorm_affine(params["bn0"], state["bn0"])
    segs1 = [("z", latent), ("bps", IN_BPS)]
    segs2 = [("z", latent), ("bps", IN_BPS), ("x", params["rb1"]["fc2"]["w"].shape[1])]
    return {
        "rb1": _fold_resblock(params["rb1"], state["rb1"], segs1, bn0),
        "rb2": _fold_resblock(params["rb2"], state["rb2"], segs2, bn0),
        "rot": dict(params["rot"]),
        "transl": dict(params["transl"]),
        "joint_conf": dict(params["joint_conf"]),
    }


def generator_object_context(folded: dict, bps: jax.Array) -> dict:
    """Precompute the per-object constants: c = bps @ W_bps + b.

    bps may be (4096,) or (O, 4096); context entries broadcast accordingly.
    """
    rb1, rb2 = folded["rb1"], folded["rb2"]
    return {
        "rb1": {"c1": bps @ rb1["w1_bps"] + rb1["b1"],
                "c3": bps @ rb1["w3_bps"] + rb1["b3"]},
        "rb2": {"c1": bps @ rb2["w1_bps"] + rb2["b1"],
                "c3": bps @ rb2["w3_bps"] + rb2["b3"]},
    }


def generator_apply_folded(folded: dict, ctx: dict, z: jax.Array):
    """Per-grasp generator forward: (N, L) z → (rot6d, transl, joints).

    Exact equivalent of eval-mode DexGenerator.apply on tiled BPS rows."""
    rb1, rb2 = folded["rb1"], folded["rb2"]
    h = leaky_relu(z @ rb1["w1_z"] + ctx["rb1"]["c1"])
    u = h @ rb1["w2"] + rb1["b2"]
    xin = leaky_relu(z @ rb1["w3_z"] + ctx["rb1"]["c3"])
    x = leaky_relu(xin + u)

    h2 = leaky_relu(z @ rb2["w1_z"] + x @ rb2["w1_x"] + ctx["rb2"]["c1"])
    u2 = h2 @ rb2["w2"] + rb2["b2"]
    xin2 = leaky_relu(z @ rb2["w3_z"] + x @ rb2["w3_x"] + ctx["rb2"]["c3"])
    x2 = leaky_relu(xin2 + u2)

    rot6 = x2 @ folded["rot"]["w"] + folded["rot"]["b"]
    transl = x2 @ folded["transl"]["w"] + folded["transl"]["b"]
    joints = x2 @ folded["joint_conf"]["w"] + folded["joint_conf"]["b"]
    return rot6, transl, joints


def cast_folded(folded: dict, dtype) -> dict:
    """Cast every float leaf of a folded layout (weights/biases/contexts)
    to ``dtype`` — the bf16 serving mode.  At serving batch sizes the
    folded 512-wide chain is HBM-bandwidth-bound in f32 (each
    (N,512)@(512,512) step streams ~2 B/FLOP more than the v5e's
    ~240 FLOP/byte balance point); bf16 halves the traffic.  MXU
    accumulation stays f32 (hardware); precision-sensitive tails (rot6d
    Gram-Schmidt, top-k ordering) are the caller's job to keep in f32."""
    import jax.numpy as jnp

    def cast(x):
        x = jnp.asarray(x)
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) \
            else x

    return jax.tree.map(cast, folded)


# ------------------------------------------------------- evaluator / critic


def _fold_pose_network(params: dict, state: dict, bn_key: str,
                       rb_names, x_first: bool) -> dict:
    """Shared folding for the pose-scoring networks (evaluator and
    discriminator differ only in their input BN key, ResBlock count, and
    skip-concat order: evaluator rb2/rb3 consume [X, X0], discriminator rb2
    consumes [X0, X] — reference networks.py:330-332 vs :154)."""
    n = params["rb1"]["fc2"]["w"].shape[1]
    pose = params["rb1"]["fc1"]["w"].shape[0] - IN_BPS
    k, c = batchnorm_affine(params[bn_key], state[bn_key])
    # input BN spans [bps, pose]; split the affine accordingly
    bn_bps = (k[:IN_BPS], c[:IN_BPS])
    bn_pose = (k[IN_BPS:], c[IN_BPS:])
    segs1 = [("bps", IN_BPS), ("pose", pose)]
    segs2 = ([("x", n), ("bps", IN_BPS), ("pose", pose)] if x_first
             else [("bps", IN_BPS), ("pose", pose), ("x", n)])

    def fold_rb(p, s, segs):
        out = _fold_resblock(p, s, segs, bn_bps)
        # also fold the pose part of the input BN into the pose rows
        for wk in ("w1_pose", "w3_pose"):
            bk = "b1" if wk.startswith("w1") else "b3"
            kp, cp = bn_pose
            out[bk] = out[bk] + cp @ out[wk]
            out[wk] = kp[:, None] * out[wk]
        return out

    folded = {"out": dict(params["out"])}
    for i, name in enumerate(rb_names):
        folded[name] = fold_rb(params[name], state[name],
                               segs1 if i == 0 else segs2)
    return folded


def _eva_rb_names(tree: dict):
    """rb1..rbN in depth order (variable-depth evaluator,
    networks.py n_resblocks)."""
    return sorted((k for k in tree if k.startswith("rb")),
                  key=lambda k: int(k[2:]))


def fold_evaluator(params: dict, state: dict) -> dict:
    """DexEvaluator (networks.py:278-337) → folded.  Input X0 =
    [bps(4096), pose(12)]; rb2+ consume [X, X0] (X first!)."""
    return _fold_pose_network(params, state, "bn1",
                              _eva_rb_names(params), x_first=True)


def evaluator_object_context(folded: dict, bps: jax.Array) -> dict:
    ctx = {}
    for name in _eva_rb_names(folded):
        rb = folded[name]
        ctx[name] = {"c1": bps @ rb["w1_bps"] + rb["b1"],
                     "c3": bps @ rb["w3_bps"] + rb["b3"]}
    return ctx


def evaluator_apply_folded(folded: dict, ctx: dict, pose: jax.Array,
                           sigmoid: bool = True) -> jax.Array:
    """(N, 12) pose = [rot9, transl3] → (N,) success probability.

    Dropout is eval-mode (identity).  Exact equivalent of eval-mode
    DexEvaluator.apply on tiled BPS rows."""
    rb1 = folded["rb1"]
    h = leaky_relu(pose @ rb1["w1_pose"] + ctx["rb1"]["c1"])
    u = h @ rb1["w2"] + rb1["b2"]
    xin = leaky_relu(pose @ rb1["w3_pose"] + ctx["rb1"]["c3"])
    x = leaky_relu(xin + u)

    for name in _eva_rb_names(folded)[1:]:
        rb = folded[name]
        h = leaky_relu(x @ rb["w1_x"] + pose @ rb["w1_pose"] + ctx[name]["c1"])
        u = h @ rb["w2"] + rb["b2"]
        xin = leaky_relu(x @ rb["w3_x"] + pose @ rb["w3_pose"] + ctx[name]["c3"])
        x = leaky_relu(xin + u)

    score = (x @ folded["out"]["w"] + folded["out"]["b"])[..., 0]
    return jax.nn.sigmoid(score) if sigmoid else score


# ------------------------------------------------------------ discriminator


def fold_discriminator(params: dict, state: dict) -> dict:
    """DexDiscriminator (networks.py:105-159) → folded.  Input X0 =
    [bps(4096), pose(24)]; rb2 consumes [X0, X] (X0 first)."""
    return _fold_pose_network(params, state, "bn0", ("rb1", "rb2"),
                              x_first=False)


def discriminator_object_context(folded: dict, bps: jax.Array) -> dict:
    ctx = {}
    for name in ("rb1", "rb2"):
        rb = folded[name]
        ctx[name] = {"c1": bps @ rb["w1_bps"] + rb["b1"],
                     "c3": bps @ rb["w3_bps"] + rb["b3"]}
    return ctx


def discriminator_apply_folded(folded: dict, ctx: dict, pose: jax.Array,
                               sigmoid: bool = True) -> jax.Array:
    """(N, 24) pose = [rot9, transl3, joints12] → (N,) realness score."""
    rb1, rb2 = folded["rb1"], folded["rb2"]
    h = leaky_relu(pose @ rb1["w1_pose"] + ctx["rb1"]["c1"])
    u = h @ rb1["w2"] + rb1["b2"]
    xin = leaky_relu(pose @ rb1["w3_pose"] + ctx["rb1"]["c3"])
    x = leaky_relu(xin + u)

    h = leaky_relu(x @ rb2["w1_x"] + pose @ rb2["w1_pose"] + ctx["rb2"]["c1"])
    u = h @ rb2["w2"] + rb2["b2"]
    xin = leaky_relu(x @ rb2["w3_x"] + pose @ rb2["w3_pose"] + ctx["rb2"]["c3"])
    x = leaky_relu(xin + u)

    score = (x @ folded["out"]["w"] + folded["out"]["b"])[..., 0]
    return jax.nn.sigmoid(score) if sigmoid else score
