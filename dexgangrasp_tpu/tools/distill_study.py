"""Distillation study: guided-DDIM-10 teacher → one-step student.

Pipeline: load the trained diffusion + evaluator checkpoints, pre-generate
deterministic (noise → endpoint) teacher pairs on every train view
(train/distill.py), regress the student, save a ``family='distill'``
checkpoint servable by every CLI/app (``--model student``), then measure
the oracle quality ladder with tools/best_pipeline (student raw /
+3-stage filter / +fused refinement) next to the teacher's own numbers.

The claim under test: the 10-denoiser-eval + 10-evaluator-VJP teacher
sampler can collapse to ONE denoiser eval at serving time with the
frontier recipe (refine + filter, reference ``dexgangrasp.py:619-660`` /
``eval.py:274-276``) recovering any lost quality.

Usage:
    python -m dexgangrasp_tpu.tools.distill_study \
        --data-dir /tmp/dexgg_big \
        --diff runs/diffusion_study/40000_diffusion_net.npz \
        --eva runs/eval_study/150000_eva_net.npz \
        --out runs/distill_study
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def run_distill_study(data_dir: str, diff_ckpt: str, eva_ckpt: str,
                      out_dir: str = "runs/distill_study",
                      steps: int = 8000, pairs_per_view: int = 128,
                      batch_size: int = 256, lr: float = 1e-4,
                      teacher_steps: int = 10, scale: float = 10.0,
                      n_eval: int = 200, refine_steps: int = 10,
                      seed: int = 0, max_views: int = 0) -> dict:
    import jax
    import jax.numpy as jnp

    from dexgangrasp_tpu.data.datasets import DexGeneratorDataSet
    from dexgangrasp_tpu.engine import folding
    from dexgangrasp_tpu.models.diffusion import DexDiffuser, GraspNormalizer
    from dexgangrasp_tpu.tools.best_pipeline import run as run_bp
    from dexgangrasp_tpu.train import checkpoints as ckpt
    from dexgangrasp_tpu.train.distill import (
        DistillTrainer,
        build_teacher_pairs,
        train_distill,
    )

    os.makedirs(out_dir, exist_ok=True)
    trees, _ = ckpt.load_pytrees(diff_ckpt)
    normalizer = GraspNormalizer(mean=jnp.asarray(trees["normalizer_mean"]),
                                 std=jnp.asarray(trees["normalizer_std"]))
    etrees, _ = ckpt.load_pytrees(eva_ckpt)
    eva_folded = folding.fold_evaluator(etrees["params"], etrees["state"])
    model = DexDiffuser()

    def view_bps(split):
        ds = DexGeneratorDataSet(data_dir, split)
        paths = sorted(set(ds.bps_paths))
        if max_views:  # smoke/pilot runs
            paths = paths[:max_views]
        return np.stack([np.load(p).ravel() for p in paths])

    report = {"data_dir": data_dir, "diff_ckpt": diff_ckpt,
              "eva_ckpt": eva_ckpt, "steps": steps,
              "pairs_per_view": pairs_per_view,
              "teacher": f"guided DDIM-{teacher_steps} (scale {scale})",
              "device": str(jax.devices()[0])}

    print("generating teacher pairs ...", flush=True)
    t0 = time.time()
    train_pairs = build_teacher_pairs(
        model, trees["params"], eva_folded, normalizer, view_bps("train"),
        jax.random.PRNGKey(seed), pairs_per_view=pairs_per_view,
        steps=teacher_steps, guidance_scale=scale,
        log=lambda s: print(s, flush=True))
    eval_pairs = build_teacher_pairs(
        model, trees["params"], eva_folded, normalizer, view_bps("eval"),
        jax.random.PRNGKey(seed + 1), pairs_per_view=max(16,
                                                         pairs_per_view // 4),
        steps=teacher_steps, guidance_scale=scale)
    report["pair_seconds"] = round(time.time() - t0, 1)
    report["train_views"] = int(train_pairs["bps"].shape[0])
    report["eval_views"] = int(eval_pairs["bps"].shape[0])
    print(f"pairs: {report['train_views']} train views x {pairs_per_view}, "
          f"{report['eval_views']} eval views "
          f"({report['pair_seconds']:.0f}s)", flush=True)

    trainer = DistillTrainer(model, lr=lr)
    ts = trainer.init_state(trees["params"])
    t1 = time.time()
    ts, history = train_distill(
        trainer, ts, train_pairs, steps, batch_size=batch_size, seed=seed,
        eval_pairs=eval_pairs, eval_every=max(1, steps // 10),
        log=lambda s: print(f"[distill] {s}", flush=True))
    report["train_seconds"] = round(time.time() - t1, 1)
    report["history"] = history

    student_path = os.path.join(out_dir, f"{steps}_student_net.npz")
    ckpt.save_pytrees(student_path,
                      {"params": ts.params, "step": ts.step,
                       "normalizer_mean": normalizer.mean,
                       "normalizer_std": normalizer.std},
                      {"family": "distill", "steps": steps,
                       "teacher": diff_ckpt})
    report["checkpoint"] = student_path
    print("saved", student_path, flush=True)

    print("oracle quality ladder (student) ...", flush=True)
    report["student_quality"] = run_bp(
        data_dir, student_path, eva_ckpt,
        os.path.join(out_dir, "best_pipeline_student.json"),
        n=n_eval, refine_steps=refine_steps, model="student", seed=seed)

    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", os.path.join(out_dir, "report.json"), flush=True)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/dexgg_big")
    ap.add_argument("--diff", required=True, help="teacher diffusion ckpt")
    ap.add_argument("--eva", required=True)
    ap.add_argument("--out", default="runs/distill_study")
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--pairs-per-view", type=int, default=128)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--teacher-steps", type=int, default=10)
    ap.add_argument("--scale", type=float, default=10.0)
    ap.add_argument("--n-eval", type=int, default=200)
    ap.add_argument("--refine-steps", type=int, default=10)
    ap.add_argument("--max-views", type=int, default=0,
                    help="cap pair-generation views (smoke runs)")
    args = ap.parse_args()
    run_distill_study(args.data_dir, args.diff, args.eva, out_dir=args.out,
                      steps=args.steps, pairs_per_view=args.pairs_per_view,
                      batch_size=args.batch_size, lr=args.lr,
                      teacher_steps=args.teacher_steps, scale=args.scale,
                      n_eval=args.n_eval, refine_steps=args.refine_steps,
                      max_views=args.max_views)


if __name__ == "__main__":
    main()
