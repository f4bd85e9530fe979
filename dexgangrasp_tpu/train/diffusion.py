"""Training loop pieces for the diffusion grasp generator."""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from dexgangrasp_tpu.core.rotations import ortho6d_from_rot_matrix
from dexgangrasp_tpu.models.diffusion import (
    DexDiffuser,
    GraspNormalizer,
    grasp_vector,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DiffusionTrainState:
    params: Any
    opt: Any
    step: jax.Array


class DiffusionTrainer:
    def __init__(self, model: DexDiffuser = DexDiffuser(), lr: float = 3e-4,
                 normalizer: GraspNormalizer = None, compute_dtype=None,
                 cfg_dropout: float = 0.0):
        """``compute_dtype=jnp.bfloat16`` = mixed precision: f32 master
        params + Adam state, bf16 denoiser fwd/bwd (models/diffusion.py
        loss).  ``cfg_dropout`` > 0 trains the unconditional branch for
        classifier-free guidance (``model.sample_cfg``)."""
        self.model = model
        self.tx = optax.adam(lr)
        self.normalizer = normalizer
        self.compute_dtype = compute_dtype
        self.cfg_dropout = cfg_dropout

    def init_state(self, key: jax.Array) -> DiffusionTrainState:
        params = self.model.init(key)
        return DiffusionTrainState(params=params, opt=self.tx.init(params),
                                   step=jnp.zeros((), jnp.int32))

    def batch_to_g0(self, batch: Dict) -> Tuple[jax.Array, jax.Array]:
        """Dataset batch → (bps (B,4096), normalized grasp vectors)."""
        rot6 = ortho6d_from_rot_matrix(
            jnp.asarray(batch["rot_matrix"], jnp.float32))
        g = grasp_vector(rot6, jnp.asarray(batch["transl"], jnp.float32),
                         jnp.asarray(batch["joint_conf"], jnp.float32))
        if self.normalizer is not None:
            g = self.normalizer.normalize(g)
        return jnp.asarray(batch["bps_object"], jnp.float32), g

    @functools.partial(jax.jit, static_argnames=("self",))
    def train_step(self, ts: DiffusionTrainState, bps: jax.Array,
                   g0: jax.Array, key: jax.Array
                   ) -> Tuple[DiffusionTrainState, jax.Array]:
        return self.train_step_body(ts, bps, g0, key)

    def train_step_body(self, ts: DiffusionTrainState, bps: jax.Array,
                        g0: jax.Array, key: jax.Array
                        ) -> Tuple[DiffusionTrainState, jax.Array]:
        """Un-jitted step body (scanned by train/fast.py)."""
        loss, grads = jax.value_and_grad(
            lambda p: self.model.loss(p, key, bps, g0,
                                      compute_dtype=self.compute_dtype,
                                      cfg_dropout=self.cfg_dropout)
        )(ts.params)
        updates, opt = self.tx.update(grads, ts.opt, ts.params)
        params = optax.apply_updates(ts.params, updates)
        return DiffusionTrainState(params=params, opt=opt,
                                   step=ts.step + 1), loss
