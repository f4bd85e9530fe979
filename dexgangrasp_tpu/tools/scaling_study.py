"""Data-scaling curve (VERDICT r2 next-8): evaluator AUC/tp/tn and
diffusion MAGD vs dataset size (1×/2×/4×/8× object counts), grounding the
round-2 conclusion "data-limited, not architecture-limited" beyond its
single 2× point.

Each scale trains the SAME architectures with the SAME step budgets on a
larger oracle dataset (unseen-object eval split per scale), so the curve
isolates data volume.

Usage:
    python -m dexgangrasp_tpu.tools.scaling_study \
        --scales 64:/tmp/dexgg_big 128:/tmp/dexgg_xl 256:/tmp/dexgg_4x \
                 512:/tmp/dexgg_8x --out runs/scaling_study
"""
from __future__ import annotations

import argparse
import json
import os
import time


def run_scale(data_dir: str, n_objects: int, eva_steps: int,
              diff_steps: int, out_dir: str, seed: int = 0) -> dict:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dexgangrasp_tpu.cli import magd_protocol
    from dexgangrasp_tpu.core.rotations import ortho6d_from_rot_matrix
    from dexgangrasp_tpu.data.datasets import (
        DexEvaluatorDataSet,
        DexGeneratorDataSet,
    )
    from dexgangrasp_tpu.engine.diffusion_pipeline import DiffusionEngine
    from dexgangrasp_tpu.models.diffusion import (
        DexDiffuser,
        GraspNormalizer,
        grasp_vector,
    )
    from dexgangrasp_tpu.train.diffusion import DiffusionTrainer
    from dexgangrasp_tpu.train.fast import (
        build_diffusion_table,
        build_evaluator_table,
        build_generator_table,
        diffusion_train_chunk,
        put_table,
        train_evaluator_fast,
    )
    from dexgangrasp_tpu.train.gan import GanTrainer, TrainConfig

    rec = {"n_objects": n_objects, "data_dir": data_dir,
           "eva_steps": eva_steps, "diff_steps": diff_steps}

    # ---- evaluator
    t0 = time.time()
    train_tab = build_evaluator_table(
        DexEvaluatorDataSet(data_dir, "train", seed=seed), seed=seed)
    eval_tab = build_evaluator_table(
        DexEvaluatorDataSet(data_dir, "eval", seed=seed), seed=seed)
    rec["train_rows"] = int(train_tab["bps_idx"].shape[0])
    rec["eval_rows"] = int(eval_tab["bps_idx"].shape[0])
    print(f"[{n_objects}] tables {rec['train_rows']}/{rec['eval_rows']} "
          f"rows ({time.time()-t0:.0f}s)", flush=True)

    trainer = GanTrainer(TrainConfig())
    ts = trainer.init_evaluator_state(jax.random.PRNGKey(seed))
    t1 = time.time()
    ts, history = train_evaluator_fast(
        trainer, ts, train_tab, eval_tab, total_steps=eva_steps,
        batch_size=256, chunk=1000, eval_every=5000, seed=seed,
        use_plateau=False,
        log=lambda s: print(f"[{n_objects} eva] {s}", flush=True))
    best = max(history, key=lambda m: m["tp_rate"] + m["tn_rate"])
    rec["evaluator"] = {"best": best, "train_seconds": time.time() - t1}
    del train_tab, eval_tab

    # ---- diffusion generator + MAGD (same recipe as diffusion_study)
    ds = DexGeneratorDataSet(data_dir, "train", seed=seed)
    raw = build_generator_table(ds)
    g_all = grasp_vector(
        ortho6d_from_rot_matrix(jnp.asarray(raw["rot9"].reshape(-1, 3, 3))),
        jnp.asarray(raw["transl"]), jnp.asarray(raw["joint_conf"]))
    normalizer = GraspNormalizer.fit(g_all)
    dtr = DiffusionTrainer(DexDiffuser(), lr=3e-4, normalizer=normalizer)
    table = build_diffusion_table(None, dtr, table=raw)
    dev = put_table(table)
    dts = dtr.init_state(jax.random.PRNGKey(seed))
    t2 = time.time()
    done = 0
    key = jax.random.PRNGKey(seed + 3)
    while done < diff_steps:
        n = min(2000, diff_steps - done)
        key, k = jax.random.split(key)
        dts, losses = diffusion_train_chunk(dtr, dts, dev, k, n, 256)
        done += n
    rec["diffusion"] = {"eps_mse": float(np.asarray(losses)[-50:].mean()),
                        "train_seconds": time.time() - t2}
    del dev, table, raw

    basis = os.path.join(data_dir, "basis_point_set.npy")
    eng = DiffusionEngine(dts.params, ts.params, ts.state,
                          normalizer=normalizer,
                          basis=np.load(basis) if os.path.isfile(basis)
                          else None, ddim_steps=50)
    keys = ("coverage_mean", "transl_mean", "rot_mean", "joint_mean",
            "n_pred", "num_nan")
    unf = magd_protocol(eng, data_dir, seed=seed, verbose=False)
    fil = magd_protocol(eng, data_dir, seed=seed, is_filter=True,
                        verbose=False)
    rec["magd_unfiltered"] = {k: unf[k] for k in keys}
    rec["magd_filtered"] = {k: fil[k] for k in keys}
    print(f"[{n_objects}] eva auc {best['auc']:.3f} tp "
          f"{best['tp_rate']:.3f} tn {best['tn_rate']:.3f} | "
          f"diff cov {unf['coverage_mean']:.3f}->"
          f"{fil['coverage_mean']:.3f} (filtered)", flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", nargs="+",
                    default=["64:/tmp/dexgg_big", "128:/tmp/dexgg_xl",
                             "256:/tmp/dexgg_4x", "512:/tmp/dexgg_8x"])
    ap.add_argument("--eva-steps", type=int, default=60000)
    ap.add_argument("--diff-steps", type=int, default=40000)
    ap.add_argument("--out", default="runs/scaling_study")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    rows = []
    for spec in args.scales:
        n, path = spec.split(":")
        if not os.path.isfile(os.path.join(path, "metadata.csv")):
            print(f"skip {spec}: no dataset")
            continue
        rows.append(run_scale(path, int(n), args.eva_steps,
                              args.diff_steps, args.out))
        with open(os.path.join(args.out, "report.json"), "w") as f:
            json.dump({"rows": rows}, f, indent=1)
    print("wrote", os.path.join(args.out, "report.json"))


if __name__ == "__main__":
    main()
