"""Diffusion grasp generator — a beyond-the-reference model family.

A DDPM over the grasp parameterization g = [rot6d(6), transl(3),
joints(J)] conditioned on the BPS encoding, in the spirit of DexDiffuser
(arXiv:2402.02989), which shows diffusion samplers outperform the cGAN
family on dexterous grasp quality.  Kept TPU-first:

- the BPS condition is embedded ONCE per object (same folding idea as the
  cGAN engine: the heavy 4096-dim work is per-object, not per-grasp/step),
- the denoiser is a small residual MLP with FiLM-style conditioning on
  (object embedding, timestep embedding) — pure matmuls, static shapes,
- sampling is a ``lax.scan`` over T DDIM steps, batched over N grasps.

Interface mirrors the cGAN path: ``sample()`` returns (rot6d, transl,
joints) ready for ``rot_matrix_from_ortho6d`` + back-off + evaluator
scoring, so the engine/apps can swap generators.
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.models.layers import leaky_relu, linear_init


def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal embeddings; t in [0, 1], shape (...,) → (..., dim)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(1000.0) * jnp.arange(half) / half)
    ang = t[..., None] * freqs * 1000.0
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def cosine_alpha_bar(t: jax.Array) -> jax.Array:
    """Nichol & Dhariwal cosine schedule; t ∈ [0,1] → ᾱ(t)."""
    s = 0.008
    ab = jnp.cos((t + s) / (1 + s) * jnp.pi / 2) ** 2 / \
        jnp.cos(jnp.asarray(s / (1 + s) * jnp.pi / 2)) ** 2
    # floor keeps the DDIM x0-estimate division stable at t→1
    return jnp.clip(ab, 1e-4, 1.0)


@dataclasses.dataclass(frozen=True)
class DexDiffuser:
    """ε-prediction denoiser for grasp vectors."""

    n_joints: int = 12
    in_bps: int = 4096
    cond_dim: int = 256
    hidden: int = 512
    t_dim: int = 64
    n_blocks: int = 3

    @property
    def g_dim(self) -> int:
        return 6 + 3 + self.n_joints

    def init(self, key: jax.Array, gain: float = 1.0) -> dict:
        ks = jax.random.split(key, 4 + 3 * self.n_blocks)
        params = {
            # object conditioning tower (per-object, folded at inference)
            "cond1": linear_init(ks[0], self.in_bps, self.cond_dim,
                                 "kaiming", gain),
            "cond2": linear_init(ks[1], self.cond_dim, self.cond_dim,
                                 "kaiming", gain),
            # input proj: [g, t_emb] → hidden
            "inp": linear_init(ks[2], self.g_dim + self.t_dim, self.hidden,
                               "kaiming", gain),
            "blocks": [],
            "out": linear_init(ks[3], self.hidden, self.g_dim,
                               "xavier", 0.02),
        }
        for i in range(self.n_blocks):
            k1, k2, k3 = jax.random.split(ks[4 + i], 3)
            params["blocks"].append({
                "film": linear_init(k1, self.cond_dim + self.t_dim,
                                    2 * self.hidden, "kaiming", gain),
                "fc1": linear_init(k2, self.hidden, self.hidden,
                                   "kaiming", gain),
                "fc2": linear_init(k3, self.hidden, self.hidden,
                                   "kaiming", gain),
            })
        return params

    # ------------------------------------------------------------- pieces

    def embed_object(self, params: dict, bps: jax.Array) -> jax.Array:
        """(4096,) or (B, 4096) BPS → condition embedding (computed once
        per object; everything downstream is per-grasp-cheap)."""
        h = leaky_relu(bps @ params["cond1"]["w"] + params["cond1"]["b"])
        return leaky_relu(h @ params["cond2"]["w"] + params["cond2"]["b"])

    def eps(self, params: dict, cond: jax.Array, g: jax.Array,
            t: jax.Array) -> jax.Array:
        """Denoiser: (N, g_dim) noisy grasps + (N,) t + cond (cond_dim or
        (N, cond_dim)) → predicted noise (N, g_dim)."""
        temb = timestep_embedding(t, self.t_dim)
        x = jnp.concatenate([g, temb], axis=-1)
        h = leaky_relu(x @ params["inp"]["w"] + params["inp"]["b"])
        cond = jnp.broadcast_to(cond, (g.shape[0], self.cond_dim))
        ct = jnp.concatenate([cond, temb], axis=-1)
        for blk in params["blocks"]:
            film = ct @ blk["film"]["w"] + blk["film"]["b"]
            scale, shift = jnp.split(film, 2, axis=-1)
            u = leaky_relu(h * (1.0 + scale) + shift)
            u = leaky_relu(u @ blk["fc1"]["w"] + blk["fc1"]["b"])
            u = u @ blk["fc2"]["w"] + blk["fc2"]["b"]
            h = h + u
        return h @ params["out"]["w"] + params["out"]["b"]

    # ----------------------------------------------------------- training

    def loss(self, params: dict, key: jax.Array, bps: jax.Array,
             g0: jax.Array, compute_dtype=None,
             cfg_dropout: float = 0.0) -> jax.Array:
        """ε-prediction MSE on one batch: (B, 4096) bps, (B, g_dim) clean
        grasps (normalized — see GraspNormalizer).

        ``compute_dtype=jnp.bfloat16`` runs the denoiser forward (and hence
        the backward matmuls) in bf16 — the mixed-precision mode: the
        noising process, the residual, and the MSE reduction stay f32, and
        the caller keeps f32 master params (the cast is inside the loss so
        gradients flow back to f32 leaves).  Halves HBM traffic per step on
        TPU; quality study in docs/RESULTS.md.

        ``cfg_dropout`` > 0 = classifier-free-guidance training (Ho &
        Salimans, arXiv:2207.12598): each sample's condition embedding is
        zeroed with that probability, so the net also learns the
        unconditional score and ``sample_cfg`` can extrapolate between
        them at inference."""
        kt, kn, kd = jax.random.split(key, 3)
        n = g0.shape[0]
        t = jax.random.uniform(kt, (n,))
        ab = cosine_alpha_bar(t)[:, None]
        noise = jax.random.normal(kn, g0.shape, g0.dtype)
        g_t = jnp.sqrt(ab) * g0 + jnp.sqrt(1 - ab) * noise
        if compute_dtype is not None and compute_dtype != g0.dtype:
            cast = lambda tree: jax.tree.map(
                lambda a: a.astype(compute_dtype), tree)
            params, bps, g_t, t = (cast(params), cast(bps), cast(g_t),
                                   cast(t))
        cond = self.embed_object(params, bps)
        if cfg_dropout:
            keep = jax.random.bernoulli(kd, 1.0 - cfg_dropout, (n,))
            cond = jnp.broadcast_to(cond, (n, self.cond_dim))
            cond = jnp.where(keep[:, None], cond, 0.0)
        pred = self.eps(params, cond, g_t, t)
        return jnp.mean((pred.astype(noise.dtype) - noise) ** 2)

    # ----------------------------------------------------- one-step student

    def student_x0(self, params: dict, cond: jax.Array,
                   z: jax.Array) -> jax.Array:
        """One-step distilled sampler: (N, g_dim) Gaussian noise → clean
        normalized grasps in a single denoiser pass.

        The same backbone as ``eps`` evaluated at the noise end (t = 1)
        with the output head re-interpreted as an x0-prediction — a
        distilled student (train/distill.py) regresses this map onto the
        teacher's deterministic DDIM trajectory endpoint (Luhman & Luhman,
        arXiv:2101.02388), so serving pays 1 denoiser eval instead of a
        ``steps``-deep scan."""
        return self.eps(params, cond, z,
                        jnp.ones(z.shape[:-1], z.dtype))

    # ----------------------------------------------------------- sampling

    @functools.partial(jax.jit, static_argnames=("self", "n", "steps"))
    def sample(self, params: dict, bps: jax.Array, key: jax.Array, n: int,
               steps: int = 50) -> jax.Array:
        """DDIM sampling: (4096,) bps → (n, g_dim) normalized grasps.

        One fused program: object embedded once, then a scan over ``steps``
        denoising iterations for all n grasps simultaneously.
        """
        cond = self.embed_object(params, bps)
        g = jax.random.normal(key, (n, self.g_dim), bps.dtype)
        ts = jnp.linspace(1.0, 0.0, steps + 1, dtype=bps.dtype)

        def body(g, i):
            t_now, t_next = ts[i], ts[i + 1]
            ab_now = cosine_alpha_bar(t_now)
            ab_next = cosine_alpha_bar(t_next)
            e = self.eps(params, cond, g,
                         jnp.full((n,), t_now, g.dtype))
            g0_hat = (g - jnp.sqrt(1 - ab_now) * e) / jnp.sqrt(ab_now)
            g = jnp.sqrt(ab_next) * g0_hat + jnp.sqrt(1 - ab_next) * e
            return g, None

        g, _ = jax.lax.scan(body, g, jnp.arange(steps))
        return g

    @functools.partial(jax.jit, static_argnames=("self", "n", "steps"))
    def sample_cfg(self, params: dict, bps: jax.Array, key: jax.Array,
                   n: int, steps: int = 50, w: float = 2.0) -> jax.Array:
        """Classifier-free-guided DDIM: ε̂ = ε_u + w·(ε_c − ε_u).

        Requires a model trained with ``cfg_dropout`` > 0 (the zero
        embedding is the unconditional branch).  ``w = 1`` reduces exactly
        to the plain conditional sampler (one extra ε eval per step is
        still paid)."""
        cond = self.embed_object(params, bps)
        uncond = jnp.zeros_like(cond)
        g = jax.random.normal(key, (n, self.g_dim), bps.dtype)
        ts = jnp.linspace(1.0, 0.0, steps + 1, dtype=bps.dtype)

        def body(g, i):
            t_now, t_next = ts[i], ts[i + 1]
            ab_now = cosine_alpha_bar(t_now)
            ab_next = cosine_alpha_bar(t_next)
            tv = jnp.full((n,), t_now, g.dtype)
            e_c = self.eps(params, cond, g, tv)
            e_u = self.eps(params, uncond, g, tv)
            e = e_u + w * (e_c - e_u)
            g0_hat = (g - jnp.sqrt(1 - ab_now) * e) / jnp.sqrt(ab_now)
            g = jnp.sqrt(ab_next) * g0_hat + jnp.sqrt(1 - ab_next) * e
            return g, None

        g, _ = jax.lax.scan(body, g, jnp.arange(steps))
        return g


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GraspNormalizer:
    """Per-dimension affine normalization of grasp vectors (diffusion works
    in a standardized space; stats come from the training set)."""

    mean: jax.Array
    std: jax.Array

    @staticmethod
    def fit(g: jax.Array) -> "GraspNormalizer":
        return GraspNormalizer(mean=jnp.mean(g, axis=0),
                               std=jnp.maximum(jnp.std(g, axis=0), 1e-6))

    def normalize(self, g: jax.Array) -> jax.Array:
        return (g - self.mean) / self.std

    def denormalize(self, g: jax.Array) -> jax.Array:
        return g * self.std + self.mean


def grasp_vector(rot6d: jax.Array, transl: jax.Array, joints: jax.Array
                 ) -> jax.Array:
    return jnp.concatenate([rot6d, transl, joints], axis=-1)


def split_grasp_vector(g: jax.Array, n_joints: int = 12):
    return g[..., :6], g[..., 6:9], g[..., 9:9 + n_joints]
