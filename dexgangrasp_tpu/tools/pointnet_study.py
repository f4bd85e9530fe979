"""PointNet-evaluator study (VERDICT r2 next-7): train the raw-cloud
evaluator the reference configures but never ships
(``dexevaluator_data_set.py:177-316``, ``cfg['model'] == 'pointnet'``) and
compare tp/tn/AUC + serving cost against the BPS evaluator on the same
objects/splits.

Steps:
1. generate ``*_dspcd*.pcd`` files (1024-pt downsample of each view cloud,
   reference naming) if absent,
2. device-resident scan training (train/fast.pointnet_train_chunk),
3. eval-split tp/tn/AUC (same thresholds as the BPS evaluator study),
4. serving-cost microbench: scored grasps/s for PointNet vs folded BPS
   evaluator on one object.

Usage:
    python -m dexgangrasp_tpu.tools.pointnet_study --data-dir /tmp/dexgg_big \
        --steps 30000
"""
from __future__ import annotations

import argparse
import json
import os
import time


def make_dspcd_files(data_dir: str, n_points: int = 1024,
                     seed: int = 0) -> int:
    """Create ``<obj>_dspcd<NNN>.pcd`` (exactly n_points) next to each
    ``<obj>_pcd<NNN>.pcd`` view cloud — the downsample step the reference
    runs offline before PointNet training.  Idempotent."""
    import numpy as np

    from dexgangrasp_tpu.utils.pcd import load_pcd, save_pcd

    rng = np.random.default_rng(seed)
    made = 0
    for split in ("train", "eval"):
        pcd_root = os.path.join(data_dir, split, "pcd")
        if not os.path.isdir(pcd_root):
            continue
        for obj in sorted(os.listdir(pcd_root)):
            for f in sorted(os.listdir(os.path.join(pcd_root, obj))):
                if "_dspcd" in f or not f.endswith(".pcd"):
                    continue
                out = os.path.join(pcd_root, obj,
                                   f.replace("_pcd", "_dspcd"))
                if os.path.isfile(out):
                    continue
                pts = load_pcd(os.path.join(pcd_root, obj, f))
                n = pts.shape[0]
                idx = rng.choice(n, n_points, replace=n < n_points)
                save_pcd(out, pts[np.sort(idx)].astype(np.float32))
                made += 1
    return made


def run_pointnet_study(data_dir: str, steps: int = 30000,
                       batch_size: int = 256,
                       out_dir: str = "runs/pointnet_study",
                       seed: int = 0, repeats: int = 50,
                       eval_repeats: int = 10) -> dict:
    import numpy as np

    import jax

    from dexgangrasp_tpu.data.pcd_dataset import DexEvaluatorPCDDataSet
    from dexgangrasp_tpu.models.pointnet import PointNetEvaluator
    from dexgangrasp_tpu.train import checkpoints as ckpt
    from dexgangrasp_tpu.train.fast import (
        build_pointnet_table,
        evaluator_metrics,
        pointnet_scores,
        pointnet_train_chunk,
        put_table,
    )
    from dexgangrasp_tpu.train.pointnet import PointNetTrainer

    os.makedirs(out_dir, exist_ok=True)
    n_new = make_dspcd_files(data_dir)
    print(f"dspcd files created: {n_new}")

    t0 = time.time()
    train_tab = build_pointnet_table(
        DexEvaluatorPCDDataSet(data_dir, "train", seed=seed),
        repeats=repeats, seed=seed)
    eval_tab = build_pointnet_table(
        DexEvaluatorPCDDataSet(data_dir, "eval", seed=seed),
        repeats=eval_repeats, seed=seed + 1)
    print(f"tables: train {train_tab['cloud_idx'].shape[0]} rows / "
          f"{train_tab['clouds'].shape[0]} clouds, eval "
          f"{eval_tab['cloud_idx'].shape[0]} rows ({time.time()-t0:.0f}s)")

    trainer = PointNetTrainer(PointNetEvaluator())
    ts = trainer.init_state(jax.random.PRNGKey(seed))
    dev_train = put_table(train_tab)
    dev_eval = put_table(eval_tab)

    report = {"data_dir": data_dir, "steps": steps,
              "batch_size": batch_size, "repeats": repeats,
              "train_rows": int(train_tab["cloud_idx"].shape[0]),
              "eval_rows": int(eval_tab["cloud_idx"].shape[0]),
              "device": str(jax.devices()[0])}

    t1 = time.time()
    done = 0
    key = jax.random.PRNGKey(seed + 3)
    history = []
    while done < steps:
        n = min(2000, steps - done)
        key, k = jax.random.split(key)
        ts, losses = pointnet_train_chunk(trainer, ts, dev_train, k, n,
                                          batch_size)
        done += n
        probs = np.asarray(pointnet_scores(trainer, ts.params, ts.state,
                                           dev_eval))
        m = evaluator_metrics(probs, eval_tab["label"])
        m.update(step=done,
                 train_loss=float(np.asarray(losses)[-50:].mean()))
        history.append(m)
        print(f"step {done}: train_bce {m['train_loss']:.4f} "
              f"eval_bce {m['bce']:.4f} auc {m['auc']:.3f} "
              f"tp {m['tp_rate']:.3f} tn {m['tn_rate']:.3f}", flush=True)
    dt = time.time() - t1
    best = max(history, key=lambda m: m["tp_rate"] + m["tn_rate"])
    path = os.path.join(out_dir, f"{steps}_pointnet_eva_net.npz")
    ckpt.save_pytrees(path, {"params": ts.params, "state": ts.state,
                             "opt": ts.opt, "step": ts.step},
                      {"epoch": steps, "family": "pointnet"})
    report.update(history=history, best=best, train_seconds=dt,
                  steps_per_sec=steps / dt, checkpoint=path)
    print(f"{steps} steps in {dt:.0f}s ({steps/dt:.0f}/s); best: "
          f"tp {best['tp_rate']:.3f} tn {best['tn_rate']:.3f} "
          f"auc {best['auc']:.3f}")

    # serving-cost microbench: grasps scored per second, PointNet (cloud
    # input re-used across grasps) vs the folded BPS evaluator
    import jax.numpy as jnp

    cloud = jnp.asarray(eval_tab["clouds"][0])
    n_g = 2048
    rng2 = np.random.default_rng(0)
    from scipy.spatial.transform import Rotation

    rot9 = jnp.asarray(Rotation.random(n_g, rng=rng2).as_matrix()
                       .reshape(n_g, 9).astype(np.float32))
    transl = jnp.asarray(
        (rng2.normal(size=(n_g, 3)) * 0.1).astype(np.float32))

    @jax.jit
    def pn_chain(_):
        def body(i, acc):
            pts = jnp.broadcast_to(cloud + acc * 1e-12, (n_g, 1024, 3))
            p, _s = trainer.model.apply(ts.params, ts.state, pts, rot9,
                                        transl, train=False)
            return acc + p[0, 0]
        return jax.lax.fori_loop(0, 10, body, 0.0)

    float(np.asarray(pn_chain(0)))
    t2 = time.perf_counter()
    float(np.asarray(pn_chain(0)))
    pn_rate = 10 * n_g / (time.perf_counter() - t2)
    report["pointnet_scored_grasps_per_sec"] = round(pn_rate, 1)
    print(f"pointnet serving: {pn_rate:.0f} grasps/s "
          f"(BPS-evaluator comparison: see bench.py grasps_per_sec)")

    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", os.path.join(out_dir, "report.json"))
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/dexgg_big")
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--out", default="runs/pointnet_study")
    ap.add_argument("--repeats", type=int, default=50)
    args = ap.parse_args()
    run_pointnet_study(args.data_dir, args.steps, args.batch_size,
                       args.out, repeats=args.repeats)


if __name__ == "__main__":
    main()
