"""Set-prediction grasp transformer — the DGTR-style generator family.

Dexterous Grasp Transformer (arXiv:2404.18135) frames grasp synthesis as
DETR-style set prediction: a fixed set of learned queries cross-attends
to the object encoding and each query decodes ONE grasp + a confidence
logit.  The whole diverse grasp set comes out of a single forward pass —
no latent sampling, no iterative denoising — which makes it the cheapest
serving family per returned grasp and a natural coverage play (queries
specialize to modes; mode collapse is structural for the cGAN,
docs/RESULTS.md).

TPU-first shape choices:
- the 4096-dim BPS encoding (reference ``bps_encoder.py:23``) is reshaped
  into 32 tokens x 128 dims and linearly projected — attention then runs
  over a (32 + n_queries)-row matrix: tiny, static, pure MXU matmuls;
- pre-LN transformer blocks, all weights in one flat pytree (repo
  convention: raw param pytrees + pure apply fns, models/layers.py);
- batched over views with ``vmap``/leading batch dims; no dynamic shapes.

Training (Hungarian matching + matched regression/BCE) lives in
train/set_transformer.py.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.models.layers import linear_init


def _layer_norm(x: jax.Array, p: dict) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return p["g"] * (x - mu) * jax.lax.rsqrt(var + 1e-6) + p["b"]


def _ln_init(dim: int) -> dict:
    return {"g": jnp.ones((dim,)), "b": jnp.zeros((dim,))}


def _attention(q: jax.Array, k: jax.Array, v: jax.Array,
               n_heads: int) -> jax.Array:
    """Multi-head attention on (Nq, d) queries / (Nk, d) keys+values."""
    nq, d = q.shape
    nk = k.shape[0]
    dh = d // n_heads
    qh = q.reshape(nq, n_heads, dh).transpose(1, 0, 2)
    kh = k.reshape(nk, n_heads, dh).transpose(1, 0, 2)
    vh = v.reshape(nk, n_heads, dh).transpose(1, 0, 2)
    att = jax.nn.softmax(
        jnp.einsum("hqd,hkd->hqk", qh, kh) / jnp.sqrt(dh), axis=-1)
    out = jnp.einsum("hqk,hkd->hqd", att, vh)
    return out.transpose(1, 0, 2).reshape(nq, d)


@dataclasses.dataclass(frozen=True)
class GraspTransformer:
    """Learned-query set decoder over tokenized BPS."""

    n_joints: int = 12
    n_queries: int = 16
    d_model: int = 128
    n_heads: int = 4
    n_layers: int = 3
    n_tokens: int = 32
    ffn_mult: int = 4

    @property
    def g_dim(self) -> int:
        return 6 + 3 + self.n_joints

    @property
    def token_dim(self) -> int:
        return 4096 // self.n_tokens

    def init(self, key: jax.Array) -> dict:
        ks = iter(jax.random.split(key, 8 + 8 * self.n_layers))
        d, h = self.d_model, self.d_model * self.ffn_mult
        params = {
            "tok_proj": linear_init(next(ks), self.token_dim, d, "kaiming"),
            "tok_pos": 0.02 * jax.random.normal(
                next(ks), (self.n_tokens, d)),
            "queries": 0.02 * jax.random.normal(
                next(ks), (self.n_queries, d)),
            "layers": [],
            "out_ln": _ln_init(d),
            "head_grasp": linear_init(next(ks), d, self.g_dim, "xavier",
                                      0.02),
            "head_logit": linear_init(next(ks), d, 1, "xavier", 0.02),
        }
        for _ in range(self.n_layers):
            params["layers"].append({
                "ln1": _ln_init(d), "ln2": _ln_init(d), "ln3": _ln_init(d),
                # fused qkv for self-attention, separate q / kv for cross
                "self_qkv": linear_init(next(ks), d, 3 * d, "kaiming"),
                "self_out": linear_init(next(ks), d, d, "kaiming"),
                "cross_q": linear_init(next(ks), d, d, "kaiming"),
                "cross_kv": linear_init(next(ks), d, 2 * d, "kaiming"),
                "cross_out": linear_init(next(ks), d, d, "kaiming"),
                "ffn1": linear_init(next(ks), d, h, "kaiming"),
                "ffn2": linear_init(next(ks), h, d, "kaiming"),
            })
        return params

    # ------------------------------------------------------------ forward

    def tokens(self, params: dict, bps: jax.Array) -> jax.Array:
        """(4096,) BPS → (n_tokens, d_model) encoder tokens (computed once
        per object — the only place the 4096-dim input is touched)."""
        t = bps.reshape(self.n_tokens, self.token_dim)
        p = params["tok_proj"]
        return t @ p["w"] + p["b"] + params["tok_pos"]

    def decode(self, params: dict, toks: jax.Array):
        """(n_tokens, d) tokens → ((n_q, g_dim) grasp vectors,
        (n_q,) confidence logits)."""
        x = params["queries"]
        for lp in params["layers"]:
            # self-attention among queries
            h = _layer_norm(x, lp["ln1"])
            qkv = h @ lp["self_qkv"]["w"] + lp["self_qkv"]["b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            a = _attention(q, k, v, self.n_heads)
            x = x + a @ lp["self_out"]["w"] + lp["self_out"]["b"]
            # cross-attention to the object tokens
            h = _layer_norm(x, lp["ln2"])
            q = h @ lp["cross_q"]["w"] + lp["cross_q"]["b"]
            kv = toks @ lp["cross_kv"]["w"] + lp["cross_kv"]["b"]
            k, v = jnp.split(kv, 2, axis=-1)
            a = _attention(q, k, v, self.n_heads)
            x = x + a @ lp["cross_out"]["w"] + lp["cross_out"]["b"]
            # feed-forward
            h = _layer_norm(x, lp["ln3"])
            h = jax.nn.gelu(h @ lp["ffn1"]["w"] + lp["ffn1"]["b"])
            x = x + h @ lp["ffn2"]["w"] + lp["ffn2"]["b"]
        x = _layer_norm(x, params["out_ln"])
        g = x @ params["head_grasp"]["w"] + params["head_grasp"]["b"]
        logit = (x @ params["head_logit"]["w"]
                 + params["head_logit"]["b"])[:, 0]
        return g, logit

    def apply(self, params: dict, bps: jax.Array):
        """(4096,) → ((n_q, g_dim), (n_q,) logits); batched via vmap."""
        return self.decode(params, self.tokens(params, bps))

    def apply_batch(self, params: dict, bps: jax.Array):
        """(B, 4096) → ((B, n_q, g_dim), (B, n_q))."""
        return jax.vmap(lambda b: self.apply(params, b))(bps)
