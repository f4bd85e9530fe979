"""Training step for the PointNet evaluator (raw-cloud grasp scoring).

Completes the reference's configured-but-absent PointNet path
(``cfg['model'] == 'pointnet'`` + ``DexEvaluatorPCDDataSet``): BCE on
success labels from (normalized 1024-pt cloud, rot9, transl3) batches.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from dexgangrasp_tpu.models.pointnet import PointNetEvaluator
from dexgangrasp_tpu.train.gan import make_optimizer
from dexgangrasp_tpu.train.losses import bce_logits


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PointNetTrainState:
    params: Any
    state: Any
    opt: Any
    step: jax.Array


class PointNetTrainer:
    def __init__(self, model: PointNetEvaluator = PointNetEvaluator(),
                 lr: float = 1e-4, beta1: float = 0.9,
                 weight_decay: float = 5e-4, bce_weight: float = 1.0):
        self.model = model
        self.tx = make_optimizer(lr, beta1, weight_decay)
        self.bce_weight = bce_weight

    def init_state(self, key: jax.Array) -> PointNetTrainState:
        p, s = self.model.init(key)
        return PointNetTrainState(params=p, state=s, opt=self.tx.init(p),
                                  step=jnp.zeros((), jnp.int32))

    @functools.partial(jax.jit, static_argnames=("self",))
    def train_step(self, ts: PointNetTrainState, batch: Dict[str, jax.Array]
                   ) -> Tuple[PointNetTrainState, Dict]:
        return self.train_step_body(ts, batch)

    def train_step_body(self, ts: PointNetTrainState,
                        batch: Dict[str, jax.Array]
                        ) -> Tuple[PointNetTrainState, Dict]:
        """Unjitted step body — traced by ``train_step`` per batch or by
        ``train/fast.pointnet_train_chunk``'s lax.scan."""
        pts = batch["pcd_array"].astype(jnp.float32)
        n = pts.shape[0]
        rot = batch["rot_matrix"].astype(jnp.float32).reshape(n, 9)
        tr = batch["transl"].astype(jnp.float32)
        label = batch["label"].astype(jnp.float32).reshape(n, 1)

        def loss_fn(params):
            logits, s = self.model.apply(params, ts.state, pts, rot, tr,
                                         train=True, return_logits=True)
            return self.bce_weight * bce_logits(logits, label), s

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params)
        updates, opt = self.tx.update(grads, ts.opt, ts.params)
        params = optax.apply_updates(ts.params, updates)
        return (PointNetTrainState(params=params, state=new_state, opt=opt,
                                   step=ts.step + 1),
                {"total_loss_eva": loss, "bce_loss": loss})
