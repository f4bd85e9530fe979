"""Evaluator-ablation experiment harness.

The reference checks ablation *results* into ``utils/experiments.py:3-56``
(hardcoded eval-split class-rate tables for 2/3/4-ResBlock ×
256/512/1024-neuron evaluators; it picked 3 × 512).  This module provides
the *capability*: train each variant — the depth axis is a real
``DexEvaluator(n_resblocks=...)`` architecture change, not a recorded
label — with the device-resident fast trainer and tabulate per-epoch
positive/negative class rates, reproducing those tables for any dataset.
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import List, Sequence

import numpy as np

import jax


@dataclasses.dataclass
class AblationResult:
    n_resblocks: int
    n_neurons: int
    epochs: List[int]
    tp_rates: List[float]
    tn_rates: List[float]

    def best_epoch(self) -> int:
        acc = np.asarray(self.tp_rates) + np.asarray(self.tn_rates)
        return self.epochs[int(np.argmax(acc))]


def run_evaluator_ablation(data_dir: str,
                           n_resblocks_grid: Sequence[int] = (2, 3, 4),
                           n_neurons_grid: Sequence[int] = (256, 512, 1024),
                           epochs: int = 6, eval_every: int = 2,
                           batch_size: int = 64,
                           seed: int = 0) -> List[AblationResult]:
    """Train each (depth × width) variant, record eval-split class rates
    every ``eval_every`` epochs (one epoch = len(train_index)/batch_size
    steps of the device-resident trainer)."""
    from dexgangrasp_tpu.data.datasets import DexEvaluatorDataSet
    from dexgangrasp_tpu.train.fast import (
        build_evaluator_table,
        evaluator_metrics,
        evaluator_scores,
        evaluator_train_chunk,
        put_table,
    )
    from dexgangrasp_tpu.train.gan import GanTrainer, TrainConfig

    train_tab = put_table(build_evaluator_table(
        DexEvaluatorDataSet(data_dir, "train", seed=seed), seed=seed))
    eval_np = build_evaluator_table(
        DexEvaluatorDataSet(data_dir, "eval", seed=seed), seed=seed)
    eval_tab = put_table(eval_np)
    steps_per_epoch = max(
        1, int(train_tab["bps_idx"].shape[0]) // batch_size)

    results = []
    for n_rb, n_neu in itertools.product(n_resblocks_grid, n_neurons_grid):
        trainer = GanTrainer(TrainConfig(eva_n_resblocks=n_rb,
                                         eva_n_neurons=n_neu))
        ts = trainer.init_evaluator_state(jax.random.PRNGKey(seed))
        key = jax.random.PRNGKey(seed + 1)
        res = AblationResult(n_rb, n_neu, [], [], [])
        for epoch in range(1, epochs + 1):
            key, k = jax.random.split(key)
            ts, _ = evaluator_train_chunk(trainer, ts, train_tab, k,
                                          steps_per_epoch, batch_size)
            if epoch % eval_every == 0:
                probs = np.asarray(evaluator_scores(
                    trainer, ts.params, ts.state, eval_tab,
                    batch_size=min(4096, eval_np["bps_idx"].shape[0])))
                m = evaluator_metrics(probs, eval_np["label"])
                res.epochs.append(epoch)
                res.tp_rates.append(m["tp_rate"])
                res.tn_rates.append(m["tn_rate"])
        results.append(res)
    return results


def tabulate(results: List[AblationResult]) -> str:
    lines = ["resblocks  neurons  best_epoch  tp_rate  tn_rate"]
    for r in results:
        i = r.epochs.index(r.best_epoch())
        lines.append(f"{r.n_resblocks:>9d}  {r.n_neurons:>7d}  "
                     f"{r.best_epoch():>10d}  {r.tp_rates[i]:.3f}    "
                     f"{r.tn_rates[i]:.3f}")
    return "\n".join(lines)
