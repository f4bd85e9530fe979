"""Training logger/metrics writer.

Functional superset of the reference ``Writer`` (``utils/writer.py``):
plain-text loss/eval logs + optional tensorboardX scalars + param
histograms.  Fixes the reference bug where histograms silently no-op
(hasattr checks against renamed attributes, ``writer.py:89-105``).
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np

try:
    import tensorboardX

    _HAS_TB = True
except Exception:  # pragma: no cover
    _HAS_TB = False


class Writer:
    def __init__(self, save_dir: str, to_tensorboard: bool = True):
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)
        self.loss_log = os.path.join(save_dir, "loss_log.txt")
        self.eval_log = os.path.join(save_dir, "eval_log.txt")
        self.acc_log = os.path.join(save_dir, "testacc_log.txt")
        now = time.strftime("%c")
        for p, title in ((self.loss_log, "Training Loss"),
                         (self.eval_log, "Eval Loss"),
                         (self.acc_log, "Acc")):
            with open(p, "a") as f:
                f.write(f"=== {title} ({now}) ===\n")
        self.tb = (tensorboardX.SummaryWriter(os.path.join(save_dir, "tb"))
                   if (to_tensorboard and _HAS_TB) else None)

    @staticmethod
    def _fmt(d: Dict) -> str:
        return ", ".join(f"{k}: {float(v):.5f}" for k, v in d.items()
                         if np.ndim(v) == 0)

    def print_current_train_loss(self, epoch: int, iters: int,
                                 losses: Dict, t_batch: float = 0.0,
                                 t_data: float = 0.0) -> None:
        msg = (f"(epoch: {epoch}, iters: {iters}, time batch: {t_batch:.3f}, "
               f"time data: {t_data:.3f}) {self._fmt(losses)}")
        print(msg)
        with open(self.loss_log, "a") as f:
            f.write(msg + "\n")

    def print_current_eval_loss(self, epoch: int, losses: Dict) -> None:
        msg = f"(eval epoch: {epoch}) {self._fmt(losses)}"
        print(msg)
        with open(self.eval_log, "a") as f:
            f.write(msg + "\n")

    def print_acc(self, epoch: int, pos_acc: float, neg_acc: float) -> None:
        msg = f"epoch: {epoch}, tp_rate: {pos_acc:.4f}, tn_rate: {neg_acc:.4f}"
        with open(self.acc_log, "a") as f:
            f.write(msg + "\n")

    def plot_train_loss(self, losses: Dict, global_step: int) -> None:
        if self.tb:
            for k, v in losses.items():
                if np.ndim(v) == 0:
                    self.tb.add_scalar(f"train/{k}", float(v), global_step)

    def plot_eval_loss(self, losses: Dict, epoch: int) -> None:
        if self.tb:
            for k, v in losses.items():
                if np.ndim(v) == 0:
                    self.tb.add_scalar(f"eval/{k}", float(v), epoch)

    def plot_model_weights(self, params, global_step: int,
                           prefix: str = "weights") -> None:
        """Histograms of every param leaf (works, unlike the reference's)."""
        if not self.tb:
            return
        import jax

        flat, _ = jax.tree_util.tree_flatten_with_path(params)
        for path, leaf in flat:
            name = prefix + jax.tree_util.keystr(path).replace("'", "")
            self.tb.add_histogram(name, np.asarray(leaf), global_step)

    def close(self) -> None:
        if self.tb:
            self.tb.close()
