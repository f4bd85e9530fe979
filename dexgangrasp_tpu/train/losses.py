"""Training losses.

Parity targets (reference ``DexGanGrasp/models/losses.py`` and the loss
methods on ``dexgangrasp.py``):

- BCE with mean reduction and torch's log clamp at -100 (torch BCELoss).
- transl_rot_6D_l2: MSE on the 6D→9 rotation matrix + MSE on translation
  (losses.py:61-77).
- evaluator accuracy: TP/TN rates + total accuracy (losses.py:5-16 — the
  reference calls these pos/neg "accuracy"; they are class-conditional true
  rates, kept numerically identical).
- kl_divergence: legacy FFHNet VAE loss (losses.py:54-58).
- control_point_l1: L1 between FK'd palm control points (losses.py:19-51);
  vestigial in the reference but kept functional here.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.core.rotations import rot_matrix_from_ortho6d


def bce(pred_p: jax.Array, target: jax.Array) -> jax.Array:
    """Binary cross entropy on probabilities, mean reduction; log terms
    clamped at -100 like torch.nn.BCELoss."""
    log_p = jnp.clip(jnp.log(pred_p), -100.0, None)
    log_1mp = jnp.clip(jnp.log1p(-pred_p), -100.0, None)
    return -jnp.mean(target * log_p + (1.0 - target) * log_1mp)


def bce_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Fused sigmoid+BCE (torch BCEWithLogitsLoss): same math as
    ``bce(sigmoid(l), t)`` but stable for saturated logits — used inside
    training steps so large logits give bounded gradients instead of NaNs."""
    return jnp.mean(jnp.maximum(logits, 0.0) - logits * target
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean((a - b) ** 2)


def transl_rot_6d_l2_loss(pred_rot_6d: jax.Array, pred_transl: jax.Array,
                          gt_rot_flat: jax.Array, gt_transl: jax.Array
                          ) -> Tuple[jax.Array, jax.Array]:
    """Returns (transl_l2, rot_l2); rot compared as flattened 3×3."""
    pred_rot = rot_matrix_from_ortho6d(pred_rot_6d).reshape(
        pred_rot_6d.shape[0], 9)
    return mse(pred_transl, gt_transl), mse(pred_rot, gt_rot_flat)


def kl_divergence(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    return jnp.mean(
        -0.5 * jnp.sum(1.0 + logvar - mu ** 2 - jnp.exp(logvar), axis=-1))


def control_point_l1_loss(pred_rot_6d: jax.Array, pred_transl: jax.Array,
                          gt_rot_6d: jax.Array, gt_transl: jax.Array,
                          control_points: jax.Array) -> jax.Array:
    """L1 between transformed hand control points (losses.py:19-51).

    control_points: (P, 3) palm-frame sample points."""
    def fk(rot6, transl):
        R = rot_matrix_from_ortho6d(rot6)
        return jnp.einsum("bij,pj->bpi", R, control_points) + transl[:, None, :]

    err = jnp.abs(fk(pred_rot_6d, pred_transl) - fk(gt_rot_6d, gt_transl))
    return jnp.mean(jnp.mean(jnp.sum(err, -1), -1))


def accuracy_evaluator(pred_label: jax.Array, gt_label: jax.Array):
    """Returns (tp_rate, tn_rate, accuracy) exactly as the reference's
    accuracy_evaluator (losses.py:5-16)."""
    correct = (pred_label == gt_label).astype(jnp.float32)
    gt = gt_label.astype(jnp.float32)
    tp_rate = jnp.sum(correct * gt) / jnp.maximum(jnp.sum(gt), 1e-12)
    tn_rate = jnp.sum(correct * (1 - gt)) / jnp.maximum(jnp.sum(1 - gt), 1e-12)
    acc = jnp.mean(correct)
    return tp_rate, tn_rate, acc


def class_labels_from_logits(p: jax.Array, thresh: float = 0.5) -> jax.Array:
    """Pure version of reference utils.py:60-64 (which mutates in place —
    documented bug; here we return a new array)."""
    return (p >= thresh).astype(p.dtype)
