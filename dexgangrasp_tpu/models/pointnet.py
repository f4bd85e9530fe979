"""PointNet-style grasp evaluator — the model the reference configures but
never ships (``cfg['model'] == 'pointnet'``, ``DexEvaluatorPCDDataSet``).

Architecture (TPU-friendly: all ops are batched matmuls + max-pool, static
shapes):

  per-point shared MLP 3→64→128→256 (Linear+BN+ReLU over the point axis)
  → global max-pool (256) → concat grasp pose [rot9, transl3] → MLP
  256+12→256→128→1 → sigmoid.

Consumes DexEvaluatorPCDDataSet batches {'pcd_array' (B,1024,3),
'rot_matrix', 'transl', 'label'}.  BatchNorm uses the same torch-parity
layers as the MLP stack; per-point BN normalizes over (batch × points).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.models.layers import (
    batchnorm_apply,
    batchnorm_init,
    linear_apply,
    linear_init,
)


@dataclasses.dataclass(frozen=True)
class PointNetEvaluator:
    point_dims: Tuple[int, ...] = (64, 128, 256)
    head_dims: Tuple[int, ...] = (256, 128)
    in_pose: int = 12  # rot9 + transl3

    def init(self, key: jax.Array, init: str = "xavier", gain: float = 0.02
             ) -> Tuple[dict, dict]:
        ks = jax.random.split(key, 2 * (len(self.point_dims)
                                        + len(self.head_dims)) + 1)
        params, state = {"point": [], "head": []}, {"point": [], "head": []}
        d = 3
        ki = 0
        for out in self.point_dims:
            lin = linear_init(ks[ki], d, out, init, gain)
            bn_p, bn_s = batchnorm_init(out, gain, ks[ki + 1])
            params["point"].append({"lin": lin, "bn": bn_p})
            state["point"].append({"bn": bn_s})
            d = out
            ki += 2
        d = self.point_dims[-1] + self.in_pose
        for out in self.head_dims:
            lin = linear_init(ks[ki], d, out, init, gain)
            bn_p, bn_s = batchnorm_init(out, gain, ks[ki + 1])
            params["head"].append({"lin": lin, "bn": bn_p})
            state["head"].append({"bn": bn_s})
            d = out
            ki += 2
        params["out"] = linear_init(ks[ki], d, 1, init, gain)
        return params, state

    def apply(self, params: dict, state: dict, points: jax.Array,
              rot_flat: jax.Array, transl: jax.Array, train: bool = False,
              return_logits: bool = False) -> Tuple[jax.Array, dict]:
        """points (B, P, 3) normalized clouds → (B, 1) success prob."""
        b, p, _ = points.shape
        x = points.reshape(b * p, 3)
        new_state = {"point": [], "head": []}
        for layer_p, layer_s in zip(params["point"], state["point"]):
            x = linear_apply(layer_p["lin"], x)
            x, bn_s = batchnorm_apply(layer_p["bn"], layer_s["bn"], x, train)
            x = jax.nn.relu(x)
            new_state["point"].append({"bn": bn_s})
        x = x.reshape(b, p, -1).max(axis=1)  # global max-pool
        x = jnp.concatenate([x, rot_flat, transl], axis=1)
        for layer_p, layer_s in zip(params["head"], state["head"]):
            x = linear_apply(layer_p["lin"], x)
            x, bn_s = batchnorm_apply(layer_p["bn"], layer_s["bn"], x, train)
            x = jax.nn.relu(x)
            new_state["head"].append({"bn": bn_s})
        logits = linear_apply(params["out"], x)
        out = logits if return_logits else jax.nn.sigmoid(logits)
        return out, new_state
