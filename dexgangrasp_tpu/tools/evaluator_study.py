"""Evaluator-quality study — the reference-grade class-rate run.

Reproduces the *regime* of the reference's evaluator training (90 epochs
over a simulation-labeled dataset; published eval-split class rates
tp 0.85-0.92 / tn 0.89-0.93, ``DexGanGrasp/utils/experiments.py:3-56``)
on the oracle-labeled synthetic dataset, with the device-resident fast
trainer (train/fast.py).  Produces:

- a trained evaluator checkpoint (``.npz``, train/checkpoints.py format),
- a JSON report: metric history + final eval-split tp/tn/acc/AUC,
- an optional pose-only control (BPS zeroed) quantifying how much of the
  signal requires shape — the round-1 forensics control, now expected to
  show a large gap (labels are no longer pose-separable).

Usage:
    python -m dexgangrasp_tpu.tools.evaluator_study --data-dir /tmp/dexgg_big \
        --steps 35000 [--control] [--out runs/eval_study]
"""
from __future__ import annotations

import argparse
import json
import os
import time


def build_big_dataset(data_dir: str, n_objects: int = 64,
                      views_per_object: int = 4,
                      grasps_per_object: int = 150,
                      points_per_cloud: int = 2048,
                      seed: int = 42) -> None:
    from dexgangrasp_tpu.data.synthetic import build_synthetic_dataset

    if os.path.isfile(os.path.join(data_dir, "metadata.csv")):
        print(f"dataset exists at {data_dir}")
        return
    t0 = time.time()
    build_synthetic_dataset(data_dir, n_objects=n_objects,
                            views_per_object=views_per_object,
                            grasps_per_object=grasps_per_object,
                            points_per_cloud=points_per_cloud, seed=seed)
    print(f"built {data_dir} in {time.time() - t0:.0f}s")


def run_study(data_dir: str, steps: int, batch_size: int = 256,
              out_dir: str = "runs/eval_study", seed: int = 0,
              control: bool = False, chunk: int = 500,
              eval_every: int = 2500, use_plateau: bool = False) -> dict:
    # NOTE use_plateau defaults OFF for the study: the architecture sits in
    # a ~10k-step loss plateau before breaking through (BN + 4096 noisy-ish
    # input dims — same slow-convergence regime the torch reference shows,
    # docs/RESULTS.md forensics); a plateau LR scheduler would anneal the
    # LR *during* the stall and can prevent the breakthrough entirely.
    import numpy as np

    import jax

    from dexgangrasp_tpu.data.datasets import DexEvaluatorDataSet
    from dexgangrasp_tpu.train.checkpoints import save_evaluator
    from dexgangrasp_tpu.train.fast import (
        build_evaluator_table,
        train_evaluator_fast,
    )
    from dexgangrasp_tpu.train.gan import GanTrainer, TrainConfig

    os.makedirs(out_dir, exist_ok=True)
    print("building tables ...")
    t0 = time.time()
    train_tab = build_evaluator_table(
        DexEvaluatorDataSet(data_dir, "train", seed=seed), seed=seed)
    eval_tab = build_evaluator_table(
        DexEvaluatorDataSet(data_dir, "eval", seed=seed), seed=seed)
    print(f"tables: train {train_tab['bps_idx'].shape[0]} rows / "
          f"{train_tab['bps'].shape[0]} views, eval "
          f"{eval_tab['bps_idx'].shape[0]} rows ({time.time()-t0:.0f}s)")

    report = {"data_dir": data_dir, "steps": steps,
              "batch_size": batch_size,
              "train_rows": int(train_tab["bps_idx"].shape[0]),
              "eval_rows": int(eval_tab["bps_idx"].shape[0]),
              "device": str(jax.devices()[0])}

    def one_run(tag, ttab, etab):
        trainer = GanTrainer(TrainConfig())
        ts = trainer.init_evaluator_state(jax.random.PRNGKey(seed))
        t1 = time.time()
        ts, history = train_evaluator_fast(
            trainer, ts, ttab, etab, total_steps=steps,
            batch_size=batch_size, chunk=chunk, eval_every=eval_every,
            seed=seed, use_plateau=use_plateau,
            log=lambda s: print(f"[{tag}] {s}", flush=True))
        dt = time.time() - t1
        best = max(history, key=lambda m: m["tp_rate"] + m["tn_rate"])
        print(f"[{tag}] {steps} steps in {dt:.0f}s "
              f"({steps * batch_size / dt:.0f} samples/s) best: "
              f"tp {best['tp_rate']:.3f} tn {best['tn_rate']:.3f} "
              f"auc {best['auc']:.3f}")
        return ts, {"history": history, "best": best, "train_seconds": dt,
                    "steps_per_sec": steps / dt,
                    "samples_per_sec": steps * batch_size / dt}

    ts, rep = one_run("full", train_tab, eval_tab)
    report["full"] = rep
    report["checkpoint"] = save_evaluator(out_dir, steps, ts)

    if control:
        zt = dict(train_tab)
        ze = dict(eval_tab)
        zt["bps"] = np.zeros_like(train_tab["bps"])
        ze["bps"] = np.zeros_like(eval_tab["bps"])
        _, rep0 = one_run("pose-only", zt, ze)
        report["pose_only_control"] = rep0

    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", os.path.join(out_dir, "report.json"))
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/dexgg_big")
    ap.add_argument("--steps", type=int, default=35000)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--out", default="runs/eval_study")
    ap.add_argument("--control", action="store_true")
    ap.add_argument("--n-objects", type=int, default=64)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (default: session platform)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    build_big_dataset(args.data_dir, n_objects=args.n_objects)
    run_study(args.data_dir, args.steps, args.batch_size, args.out,
              control=args.control)


if __name__ == "__main__":
    main()
