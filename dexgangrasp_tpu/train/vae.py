"""Training step for the cVAE grasp generator (FFHNet-style)."""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from dexgangrasp_tpu.models.vae import DexVAE
from dexgangrasp_tpu.train.gan import make_optimizer
from dexgangrasp_tpu.train.losses import kl_divergence, transl_rot_6d_l2_loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VaeTrainState:
    params: Any
    state: Any
    opt: Any
    step: jax.Array


class VaeTrainer:
    """Recon (100·transl + 1·rot + 10·joint) + kl_coef·KL (reference
    hypers: kl_coef 0.005, lr 1e-4, Adam β1 0.9, wd 5e-4)."""

    def __init__(self, model: DexVAE = DexVAE(), lr: float = 1e-4,
                 beta1: float = 0.9, weight_decay: float = 5e-4,
                 kl_coef: float = 0.005, transl_coef: float = 100.0,
                 rot_coef: float = 1.0, conf_coef: float = 10.0):
        self.model = model
        self.tx = make_optimizer(lr, beta1, weight_decay)
        self.kl_coef = kl_coef
        self.transl_coef = transl_coef
        self.rot_coef = rot_coef
        self.conf_coef = conf_coef

    def init_state(self, key: jax.Array, init: str = "xavier",
                   gain: float = 0.02) -> VaeTrainState:
        p, s = self.model.init(key, init, gain)
        return VaeTrainState(params=p, state=s, opt=self.tx.init(p),
                             step=jnp.zeros((), jnp.int32))

    @functools.partial(jax.jit, static_argnames=("self",))
    def train_step(self, ts: VaeTrainState, batch: Dict[str, jax.Array],
                   key: jax.Array) -> Tuple[VaeTrainState, Dict]:
        return self.train_step_body(ts, batch, key)

    def train_step_body(self, ts: VaeTrainState, batch: Dict[str, jax.Array],
                        key: jax.Array) -> Tuple[VaeTrainState, Dict]:
        """Unjitted step body — traced inline by ``train_step`` per batch
        or by ``train/fast.vae_train_chunk``'s lax.scan (the device-
        resident multi-step path)."""
        from dexgangrasp_tpu.core.rotations import ortho6d_from_rot_matrix

        bps = batch["bps_object"].astype(jnp.float32)
        n = bps.shape[0]
        rot_mat = batch["rot_matrix"].astype(jnp.float32)
        real_rot_flat = rot_mat.reshape(n, 9)
        real_transl = batch["transl"].astype(jnp.float32)
        real_joints = batch["joint_conf"].astype(jnp.float32)
        grasp_vec = jnp.concatenate(
            [ortho6d_from_rot_matrix(rot_mat), real_transl, real_joints],
            axis=1)

        def loss_fn(params):
            out, mu, logvar, st = self.model.forward(
                params, ts.state, key, grasp_vec, bps, train=True)
            transl_l2, rot_l2 = transl_rot_6d_l2_loss(
                out.rot_6d, out.transl, real_rot_flat, real_transl)
            conf_l2 = jnp.mean((out.joint_conf - real_joints) ** 2)
            kl = kl_divergence(mu, logvar)
            total = (self.transl_coef * transl_l2 + self.rot_coef * rot_l2
                     + self.conf_coef * conf_l2 + self.kl_coef * kl)
            logs = {"total_loss_vae": total,
                    "transl_loss": self.transl_coef * transl_l2,
                    "rot_loss": self.rot_coef * rot_l2,
                    "conf_loss": self.conf_coef * conf_l2,
                    "kl_loss": self.kl_coef * kl}
            return total, (st, logs)

        (grads, (new_state, logs)) = jax.grad(loss_fn, has_aux=True)(ts.params)
        updates, opt = self.tx.update(grads, ts.opt, ts.params)
        params = optax.apply_updates(ts.params, updates)
        return (VaeTrainState(params=params, state=new_state, opt=opt,
                              step=ts.step + 1), logs)
