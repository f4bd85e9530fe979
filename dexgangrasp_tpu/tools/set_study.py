"""Set-prediction transformer study: train the DGTR-style family and
measure it on the oracle + MAGD axes next to the sampling families.

The family's pitch (arXiv:2404.18135): the whole diverse grasp set in ONE
deterministic forward — n_queries grasps with confidences, no latent
sampling or denoising scan.  This study reports, per eval view:

- oracle true success of the predicted set (data/grasp_geometry.py),
- MAGD sums + coverage vs the view's full GT positive set (the reference
  protocol, ``eval.py:98-137``),
- the same after the fused evaluator-gradient refinement tail and after
  the reference 3-stage filter (composability with the shared quality
  machinery).

Usage:
    python -m dexgangrasp_tpu.tools.set_study --data-dir /tmp/dexgg_big \
        --eva runs/eval_study/150000_eva_net.npz --out runs/set_study
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def run_set_study(data_dir: str, eva_ckpt: str,
                  out_dir: str = "runs/set_study", steps: int = 6000,
                  n_queries: int = 16, lr: float = 1e-4,
                  batch_views: int = 32, max_grasps: int = 32,
                  refine_steps: int = 10, thresh=(0.5, 0.75, 0.90),
                  seed: int = 0, matcher: str = "host") -> dict:
    import jax
    import jax.numpy as jnp

    from dexgangrasp_tpu.cli import load_engine, run_filter
    from dexgangrasp_tpu.core.rotations import ortho6d_from_rot_matrix
    from dexgangrasp_tpu.data.datasets import DexGeneratorDataSet
    from dexgangrasp_tpu.data.grasp_geometry import grasp_outcomes
    from dexgangrasp_tpu.eval.magd import magd_for_grasp_distribution
    from dexgangrasp_tpu.models.diffusion import (
        GraspNormalizer,
        grasp_vector,
    )
    from dexgangrasp_tpu.models.grasp_transformer import GraspTransformer
    from dexgangrasp_tpu.train import checkpoints as ckpt
    from dexgangrasp_tpu.train.set_transformer import (
        SetTrainer,
        build_set_table,
        train_set_transformer,
    )

    os.makedirs(out_dir, exist_ok=True)
    ds = DexGeneratorDataSet(data_dir, "train")
    ds_eval = DexGeneratorDataSet(data_dir, "eval")
    big = ds.sample_batch(min(4096, len(ds)))
    g_all = grasp_vector(
        ortho6d_from_rot_matrix(jnp.asarray(big["rot_matrix"], jnp.float32)),
        jnp.asarray(big["transl"], jnp.float32),
        jnp.asarray(big["joint_conf"], jnp.float32))
    normalizer = GraspNormalizer.fit(g_all)

    print("building set tables ...", flush=True)
    t0 = time.time()
    table = build_set_table(ds, max_grasps=max_grasps, seed=seed)
    etable = build_set_table(ds_eval, max_grasps=max_grasps, seed=seed)
    print(f"tables: {table['bps'].shape[0]} train / "
          f"{etable['bps'].shape[0]} eval views "
          f"({table['n_truncated']} truncated; {time.time()-t0:.0f}s)",
          flush=True)

    model = GraspTransformer(n_queries=n_queries)
    trainer = SetTrainer(model, lr=lr, normalizer=normalizer)
    ts = trainer.init_state(jax.random.PRNGKey(seed))
    t1 = time.time()
    ts, history = train_set_transformer(
        trainer, ts, table, steps, batch_views=batch_views, seed=seed,
        eval_table=etable, eval_every=max(1, steps // 10),
        log=lambda s: print(f"[set] {s}", flush=True), matcher=matcher)
    train_seconds = time.time() - t1

    set_path = os.path.join(out_dir, f"{steps}_set_net.npz")
    ckpt.save_pytrees(set_path,
                      {"params": ts.params, "step": ts.step,
                       "normalizer_mean": normalizer.mean,
                       "normalizer_std": normalizer.std},
                      {"family": "set", "steps": steps})
    print("saved", set_path, flush=True)

    # ------------------------------------------------------ quality sweep
    engine = load_engine(set_path, eva_ckpt,
                         os.path.join(data_dir, "basis_point_set.npy"),
                         model="set")
    views = sorted(set(ds_eval.bps_paths))
    rows = {k: [] for k in ("succ", "conf", "cov", "transl_mean",
                            "rot_mean", "joint_mean", "rsucc", "rcov",
                            "fsucc", "fpass")}
    for bp in views:
        stem = os.path.split(bp)[1].replace("bps", "pcd").replace(".npy", "")
        full = np.load(os.path.join(data_dir, "full_pcd", stem + ".npy"))
        gt = ds_eval.get_grasps_from_pcd_path(bp.replace("bps", "pcd"))
        bps = np.load(bp).ravel()

        g = engine.generate_grasps(bps)
        rows["succ"].append(float(grasp_outcomes(
            full, g["transl"], g["rot_matrix"])["success"].mean()))
        rows["conf"].append(float(g["z"][:, -1].mean()))
        tl, rl, jl, cov = magd_for_grasp_distribution(g, gt)
        n = g["transl"].shape[0]
        rows["cov"].append(cov)
        rows["transl_mean"].append(tl / n)
        rows["rot_mean"].append(rl / n)
        rows["joint_mean"].append(jl / n)

        engine.refine_steps = refine_steps
        rg = engine.generate_grasps(bps)
        engine.refine_steps = 0
        rows["rsucc"].append(float(grasp_outcomes(
            full, rg["transl"], rg["rot_matrix"])["success"].mean()))
        _, _, _, rcov = magd_for_grasp_distribution(rg, gt)
        rows["rcov"].append(rcov)
        try:
            f, _ = run_filter(engine, bps, rg, n, list(thresh), False,
                              verbose=False)
            rows["fsucc"].append(float(grasp_outcomes(
                full, np.asarray(f["transl"]),
                np.asarray(f["rot_matrix"]))["success"].mean()))
            rows["fpass"].append(f["transl"].shape[0] / float(n))
        except ValueError:
            rows["fpass"].append(0.0)

    fmean = lambda xs: round(float(np.mean(xs)), 4) if xs else 0.0
    report = {"data_dir": data_dir, "eva_ckpt": eva_ckpt, "steps": steps,
              "n_queries": n_queries, "train_seconds": round(train_seconds, 1),
              "history": history, "checkpoint": set_path,
              "n_views": len(views),
              "set_oracle": fmean(rows["succ"]),
              "set_confidence": fmean(rows["conf"]),
              "set_coverage": fmean(rows["cov"]),
              "magd_transl_mean": fmean(rows["transl_mean"]),
              "magd_rot_mean": fmean(rows["rot_mean"]),
              "magd_joint_mean": fmean(rows["joint_mean"]),
              "refined_oracle": fmean(rows["rsucc"]),
              "refined_coverage": fmean(rows["rcov"]),
              "refined_filtered_oracle": fmean(rows["fsucc"]),
              "refined_filter_pass": fmean(rows["fpass"]),
              "filtered_views": len(rows["fsucc"])}
    print(json.dumps({k: v for k, v in report.items() if k != "history"}),
          flush=True)
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", os.path.join(out_dir, "report.json"), flush=True)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/dexgg_big")
    ap.add_argument("--eva", required=True)
    ap.add_argument("--out", default="runs/set_study")
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--n-queries", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--refine-steps", type=int, default=10)
    ap.add_argument("--matcher", default="host",
                    choices=("host", "device"),
                    help="host scipy Hungarian (exact) or the fused "
                         "device auction (one program/step, dp-clean)")
    args = ap.parse_args()
    run_set_study(args.data_dir, args.eva, out_dir=args.out,
                  steps=args.steps, n_queries=args.n_queries, lr=args.lr,
                  refine_steps=args.refine_steps, matcher=args.matcher)


if __name__ == "__main__":
    main()
