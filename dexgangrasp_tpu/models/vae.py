"""FFHNet-style conditional VAE grasp generator.

The reference descends from FFHNet (the cVAE whose artifacts it still
carries: ``kl_divergence`` in losses.py:54, ``kl_coef`` in the config, the
``model: ffhnet`` option, legacy ``ffh*`` checkpoint keys, "30 vae" epoch
comments).  Its checked-in networks only implement the GAN; this module
restores the cVAE family so the framework offers all three generators
(GAN / VAE / diffusion) behind the same engine.

Architecture mirrors the generator topology (BN'd BPS condition, ResBlock
trunk, three heads):

- encoder: [grasp(rot6+transl3+joints), bps_bn] → ResBlock ×2 → (μ, logσ²)
- decoder: [z, bps_bn] → ResBlock ×2 (skip concat) → rot6d/transl/joints
  (identical to DexGenerator, so the decoder reuses its folding fast path)

Loss: recon (100/1/10-weighted like the GAN) + kl_coef·KL (reference
kl_coef 0.005).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.models.layers import (
    batchnorm_apply,
    batchnorm_init,
    linear_init,
    linear_apply,
    resblock_init,
    resblock_apply,
)
from dexgangrasp_tpu.models.networks import IN_BPS, DexGenerator, GeneratorOutput


@dataclasses.dataclass(frozen=True)
class DexVAE:
    latent_dim: int = 5
    n_joints: int = 12
    n_neurons: int = 512
    in_bps: int = IN_BPS

    @property
    def g_dim(self) -> int:
        return 6 + 3 + self.n_joints

    def init(self, key: jax.Array, init: str = "xavier", gain: float = 0.02
             ) -> Tuple[dict, dict]:
        ke, kd, kb, k1, k2, km, kv = jax.random.split(key, 7)
        enc_in = self.g_dim + self.in_bps
        bn0_p, bn0_s = batchnorm_init(self.in_bps, gain, kb)
        rb1_p, rb1_s = resblock_init(k1, enc_in, self.n_neurons,
                                     init=init, gain=gain)
        rb2_p, rb2_s = resblock_init(k2, self.n_neurons + enc_in,
                                     self.n_neurons, init=init, gain=gain)
        decoder = DexGenerator(latent_dim=self.latent_dim,
                               n_joints=self.n_joints,
                               n_neurons=self.n_neurons)
        dec_p, dec_s = decoder.init(kd, init, gain)
        params = {
            "enc_bn0": bn0_p, "enc_rb1": rb1_p, "enc_rb2": rb2_p,
            "mu": linear_init(km, self.n_neurons, self.latent_dim, init, gain),
            "logvar": linear_init(kv, self.n_neurons, self.latent_dim,
                                  init, gain),
            "decoder": dec_p,
        }
        state = {"enc_bn0": bn0_s, "enc_rb1": rb1_s, "enc_rb2": rb2_s,
                 "decoder": dec_s}
        return params, state

    @property
    def decoder(self) -> DexGenerator:
        return DexGenerator(latent_dim=self.latent_dim,
                            n_joints=self.n_joints,
                            n_neurons=self.n_neurons)

    def encode(self, params: dict, state: dict, grasp_vec: jax.Array,
               bps: jax.Array, train: bool = False):
        """(B, g_dim) grasp + (B, 4096) bps → (μ, logvar, new_state)."""
        o_bps, bn0_s = batchnorm_apply(params["enc_bn0"], state["enc_bn0"],
                                       bps, train)
        x0 = jnp.concatenate([grasp_vec, o_bps], axis=1)
        x, rb1_s = resblock_apply(params["enc_rb1"], state["enc_rb1"], x0,
                                  train)
        x, rb2_s = resblock_apply(params["enc_rb2"], state["enc_rb2"],
                                  jnp.concatenate([x0, x], axis=1), train)
        mu = linear_apply(params["mu"], x)
        logvar = linear_apply(params["logvar"], x)
        new_state = {"enc_bn0": bn0_s, "enc_rb1": rb1_s, "enc_rb2": rb2_s,
                     "decoder": state["decoder"]}
        return mu, logvar, new_state

    def decode(self, params: dict, state: dict, z: jax.Array,
               bps: jax.Array, train: bool = False
               ) -> Tuple[GeneratorOutput, dict]:
        out, dec_s = self.decoder.apply(params["decoder"], state["decoder"],
                                        z, bps, train)
        return out, {**state, "decoder": dec_s}

    def forward(self, params: dict, state: dict, key: jax.Array,
                grasp_vec: jax.Array, bps: jax.Array, train: bool = True):
        """Full VAE pass: encode → reparameterize → decode.

        Returns (out: GeneratorOutput, mu, logvar, new_state)."""
        mu, logvar, st = self.encode(params, state, grasp_vec, bps, train)
        eps = jax.random.normal(key, mu.shape, mu.dtype)
        z = mu + jnp.exp(0.5 * logvar) * eps
        out, st = self.decode(params, st, z, bps, train)
        return out, mu, logvar, st
