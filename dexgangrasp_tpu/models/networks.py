"""DexGenerator / DexDiscriminator / DexEvaluator networks.

Architecture matches the reference (``DexGanGrasp/models/networks.py``):

- Generator  (:58-103): BN(4096) on the BPS → X0=[z, bps_bn] → ResBlock(
  latentD+4096→512) → ResBlock(512+latentD+4096→512, skip-concat of X0) →
  heads joint_conf(J) / rot_6D(6) / transl(3).
- Discriminator (:105-159): BN(4096+in_pose) on [bps, rot9, transl, joints]
  → ResBlock → ResBlock(skip-concat) → Linear(512→1) → sigmoid.
  in_pose = 9 + 3 + n_hand_joints (:166,:173).
- DexEvaluator (:278-337): input [bps, rot9, transl] — **joint_conf is
  deliberately NOT consumed** (reference quirk at :307-325, load-bearing for
  checkpoint parity) → BN → RB → Dropout(0.3) → RB(skip) → Dropout → RB(skip)
  → Dropout → Linear → sigmoid.

All classes here are thin namespaces over pure functions; params/state are
pytrees built by ``init_*`` and consumed by ``apply``.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.models.layers import (
    batchnorm_apply,
    batchnorm_init,
    dropout,
    linear_apply,
    linear_init,
    resblock_apply,
    resblock_init,
)

IN_BPS = 4096
N_NEURONS = 512
DROPOUT_RATE = 0.3


class GeneratorOutput(NamedTuple):
    rot_6d: jax.Array   # (N, 6)
    transl: jax.Array   # (N, 3)
    joint_conf: jax.Array  # (N, J)
    z: jax.Array        # (N, latentD)


@dataclasses.dataclass(frozen=True)
class DexGenerator:
    """cGAN generator: (z, bps) → grasp parameterization."""

    latent_dim: int = 5
    n_joints: int = 12
    n_neurons: int = N_NEURONS
    in_bps: int = IN_BPS

    def init(self, key: jax.Array, init: str = "xavier", gain: float = 0.02
             ) -> Tuple[dict, dict]:
        ks = jax.random.split(key, 6)
        in0 = self.latent_dim + self.in_bps
        bn0_p, bn0_s = batchnorm_init(self.in_bps, gain, ks[0])
        rb1_p, rb1_s = resblock_init(ks[1], in0, self.n_neurons, init=init, gain=gain)
        rb2_p, rb2_s = resblock_init(ks[2], self.n_neurons + in0,
                                     self.n_neurons, init=init, gain=gain)
        params = {
            "bn0": bn0_p,
            "rb1": rb1_p,
            "rb2": rb2_p,
            "joint_conf": linear_init(ks[3], self.n_neurons, self.n_joints, init, gain),
            "rot": linear_init(ks[4], self.n_neurons, 6, init, gain),
            "transl": linear_init(ks[5], self.n_neurons, 3, init, gain),
        }
        state = {"bn0": bn0_s, "rb1": rb1_s, "rb2": rb2_s}
        return params, state

    def apply(self, params: dict, state: dict, z: jax.Array, bps: jax.Array,
              train: bool = False) -> Tuple[GeneratorOutput, dict]:
        o_bps, bn0_s = batchnorm_apply(params["bn0"], state["bn0"], bps, train)
        x0 = jnp.concatenate([z, o_bps], axis=1)
        x, rb1_s = resblock_apply(params["rb1"], state["rb1"], x0, train)
        x, rb2_s = resblock_apply(params["rb2"], state["rb2"],
                                  jnp.concatenate([x0, x], axis=1), train)
        out = GeneratorOutput(
            rot_6d=linear_apply(params["rot"], x),
            transl=linear_apply(params["transl"], x),
            joint_conf=linear_apply(params["joint_conf"], x),
            z=z,
        )
        return out, {"bn0": bn0_s, "rb1": rb1_s, "rb2": rb2_s}


@dataclasses.dataclass(frozen=True)
class DexDiscriminator:
    """Real/fake grasp scorer. in_pose = 9 + 3 + n_joints."""

    n_joints: int = 12
    n_neurons: int = N_NEURONS
    in_bps: int = IN_BPS
    sigmoid: bool = True  # BCE-GAN uses sigmoid; WGAN critic uses raw score

    @property
    def in_pose(self) -> int:
        return 9 + 3 + self.n_joints

    def init(self, key: jax.Array, init: str = "xavier", gain: float = 0.02
             ) -> Tuple[dict, dict]:
        ks = jax.random.split(key, 4)
        in0 = self.in_bps + self.in_pose
        bn0_p, bn0_s = batchnorm_init(in0, gain, ks[0])
        rb1_p, rb1_s = resblock_init(ks[1], in0, self.n_neurons, init=init, gain=gain)
        rb2_p, rb2_s = resblock_init(ks[2], self.n_neurons + in0,
                                     self.n_neurons, init=init, gain=gain)
        params = {
            "bn0": bn0_p, "rb1": rb1_p, "rb2": rb2_p,
            "out": linear_init(ks[3], self.n_neurons, 1, init, gain),
        }
        state = {"bn0": bn0_s, "rb1": rb1_s, "rb2": rb2_s}
        return params, state

    def apply(self, params: dict, state: dict, bps: jax.Array,
              rot_flat: jax.Array, transl: jax.Array, joint_conf: jax.Array,
              train: bool = False, return_logits: bool = False
              ) -> Tuple[jax.Array, dict]:
        """rot_flat: (N, 9) row-major flattened rotation (or rot_6d padded —
        the reference feeds the generator's 6D straight in during the G step;
        callers choose).  Returns ((N, 1) score, new_state).

        ``return_logits`` skips the sigmoid so training losses can use the
        numerically stable fused sigmoid+BCE (identical math)."""
        x = jnp.concatenate([bps, rot_flat, transl, joint_conf], axis=1)
        x0, bn0_s = batchnorm_apply(params["bn0"], state["bn0"], x, train)
        x, rb1_s = resblock_apply(params["rb1"], state["rb1"], x0, train)
        x, rb2_s = resblock_apply(params["rb2"], state["rb2"],
                                  jnp.concatenate([x0, x], axis=1), train)
        score = linear_apply(params["out"], x)
        if self.sigmoid and not return_logits:
            score = jax.nn.sigmoid(score)
        return score, {"bn0": bn0_s, "rb1": rb1_s, "rb2": rb2_s}


@dataclasses.dataclass(frozen=True)
class DexEvaluator:
    """Grasp success classifier.  NOTE: consumes only (bps, rot9, transl);
    joint_conf is ignored by design parity with the reference (:307-325).

    ``n_resblocks`` parameterizes depth: the reference's ablation grid
    (``utils/experiments.py:3-56``) compares 2/3/4-block variants; its
    shipped network is the 3-block default."""

    n_neurons: int = N_NEURONS
    in_bps: int = IN_BPS
    n_resblocks: int = 3

    @property
    def in_pose(self) -> int:
        return 9 + 3

    @property
    def rb_names(self) -> Tuple[str, ...]:
        return tuple(f"rb{i + 1}" for i in range(self.n_resblocks))

    def init(self, key: jax.Array, init: str = "xavier", gain: float = 0.02
             ) -> Tuple[dict, dict]:
        assert self.n_resblocks >= 1
        ks = jax.random.split(key, self.n_resblocks + 2)
        in0 = self.in_bps + self.in_pose
        bn1_p, bn1_s = batchnorm_init(in0, gain, ks[0])
        params = {"bn1": bn1_p}
        state = {"bn1": bn1_s}
        for i, name in enumerate(self.rb_names):
            rb_in = in0 if i == 0 else in0 + self.n_neurons
            params[name], state[name] = resblock_init(
                ks[i + 1], rb_in, self.n_neurons, init=init, gain=gain)
        params["out"] = linear_init(ks[-1], self.n_neurons, 1, init, gain)
        return params, state

    def apply(self, params: dict, state: dict, bps: jax.Array,
              rot_flat: jax.Array, transl: jax.Array, train: bool = False,
              dropout_key: Optional[jax.Array] = None,
              return_logits: bool = False) -> Tuple[jax.Array, dict]:
        """Returns ((N, 1) success probability, new_state)."""
        names = self.rb_names
        x = jnp.concatenate([bps, rot_flat, transl], axis=1)
        x0, bn1_s = batchnorm_apply(params["bn1"], state["bn1"], x, train)
        dk = (jax.random.split(dropout_key, len(names))
              if dropout_key is not None else (None,) * len(names))
        new_state = {"bn1": bn1_s}
        x = x0
        for i, name in enumerate(names):
            # NOTE reference order: cat([X, X0]) for rb2+ (networks.py:
            # 330-332), opposite of the discriminator's cat([X0, X]).
            rb_in = x0 if i == 0 else jnp.concatenate([x, x0], axis=1)
            x, new_state[name] = resblock_apply(params[name], state[name],
                                                rb_in, train)
            x = dropout(dk[i], x, DROPOUT_RATE, train)
        p = linear_apply(params["out"], x)
        if not return_logits:
            p = jax.nn.sigmoid(p)
        return p, new_state


def init_dexgan(key: jax.Array, latent_dim: int = 5, n_joints: int = 12,
                init: str = "xavier", gain: float = 0.02):
    """Build generator+discriminator (the DexGANGrasp pair,
    reference networks.py:161-221)."""
    kg, kd = jax.random.split(key)
    gen = DexGenerator(latent_dim=latent_dim, n_joints=n_joints)
    disc = DexDiscriminator(n_joints=n_joints)
    gp, gs = gen.init(kg, init, gain)
    dp, ds = disc.init(kd, init, gain)
    return (gen, gp, gs), (disc, dp, ds)


def init_evaluator(key: jax.Array, init: str = "xavier", gain: float = 0.02):
    eva = DexEvaluator()
    p, s = eva.init(key, init, gain)
    return eva, p, s


def param_count(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
