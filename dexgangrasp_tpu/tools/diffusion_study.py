"""Diffusion-family study: train at scale, MAGD + evaluator filter study.

The diffusion family is this framework's strongest generator (round-1
family comparison, docs/RESULTS.md) and — unlike the mode-collapsed cGAN —
emits a *diverse* grasp set, so the trained evaluator's 3-stage filter has
something to reject: this is where "filtering improves MAGD" (VERDICT r1
next-1 done-criterion) is demonstrated.

Usage:
    python -m dexgangrasp_tpu.tools.diffusion_study --data-dir /tmp/dexgg_big \
        --steps 30000 --eva runs/eval_study/150000_eva_net.npz
"""
from __future__ import annotations

import argparse
import json
import os
import time


def run_diffusion_study(data_dir: str, steps: int = 30000,
                        batch_size: int = 256,
                        out_dir: str = "runs/diffusion_study",
                        eva_ckpt=None, seed: int = 0,
                        ddim_steps: int = 50, bf16: bool = False,
                        cfg_dropout: float = 0.0) -> dict:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dexgangrasp_tpu.cli import magd_protocol
    from dexgangrasp_tpu.data.datasets import DexGeneratorDataSet
    from dexgangrasp_tpu.engine.diffusion_pipeline import DiffusionEngine
    from dexgangrasp_tpu.models.diffusion import (
        DexDiffuser,
        GraspNormalizer,
        grasp_vector,
    )
    from dexgangrasp_tpu.train import checkpoints as ckpt
    from dexgangrasp_tpu.train.diffusion import DiffusionTrainer
    from dexgangrasp_tpu.train.fast import (
        build_diffusion_table,
        diffusion_train_chunk,
        put_table,
    )

    os.makedirs(out_dir, exist_ok=True)
    basis = os.path.join(data_dir, "basis_point_set.npy")
    basis = basis if os.path.isfile(basis) else None

    ds = DexGeneratorDataSet(data_dir, "train", seed=seed)
    # normalizer from the full table (families.py fits on a 4k sample; the
    # table is exact)
    from dexgangrasp_tpu.core.rotations import ortho6d_from_rot_matrix
    from dexgangrasp_tpu.train.fast import build_generator_table

    raw = build_generator_table(ds)
    g_all = grasp_vector(
        ortho6d_from_rot_matrix(jnp.asarray(raw["rot9"].reshape(-1, 3, 3))),
        jnp.asarray(raw["transl"]), jnp.asarray(raw["joint_conf"]))
    normalizer = GraspNormalizer.fit(g_all)
    trainer = DiffusionTrainer(
        DexDiffuser(), lr=3e-4, normalizer=normalizer,
        compute_dtype=jnp.bfloat16 if bf16 else None,
        cfg_dropout=cfg_dropout)
    table = build_diffusion_table(None, trainer, table=raw)
    dev = put_table(table)
    print(f"table: {table['bps_idx'].shape[0]} rows")

    ts = trainer.init_state(jax.random.PRNGKey(seed))
    t0 = time.time()
    done = 0
    key = jax.random.PRNGKey(seed + 3)
    loss = None
    while done < steps:
        n = min(2000, steps - done)
        key, k = jax.random.split(key)
        ts, losses = diffusion_train_chunk(trainer, ts, dev, k, n,
                                           batch_size)
        done += n
        loss = float(np.asarray(losses)[-50:].mean())
        print(f"step {done}: eps_mse {loss:.4f}", flush=True)
    dt = time.time() - t0
    path = os.path.join(out_dir, f"{steps}_diffusion_net.npz")
    ckpt.save_pytrees(path, {"params": ts.params, "opt": ts.opt,
                             "step": ts.step,
                             "normalizer_mean": normalizer.mean,
                             "normalizer_std": normalizer.std},
                      {"epoch": steps, "family": "diffusion"})
    report = {"steps": steps, "eps_mse": loss, "train_seconds": dt,
              "steps_per_sec": steps / dt, "checkpoint": path,
              "ddim_steps": ddim_steps, "bf16": bf16}
    print(f"{steps} steps in {dt:.0f}s ({steps/dt:.0f}/s) -> {path}")

    # MAGD + filter study with the trained evaluator
    if eva_ckpt:
        etrees, _ = ckpt.load_pytrees(eva_ckpt)
        ep, es = etrees["params"], etrees["state"]
    else:
        from dexgangrasp_tpu.models.networks import init_evaluator

        _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    eng = DiffusionEngine(ts.params, ep, es, normalizer=normalizer,
                          basis=np.load(basis) if basis else None,
                          ddim_steps=ddim_steps)
    keys = ("transl", "rot", "joint", "coverage_mean", "transl_mean",
            "rot_mean", "joint_mean", "n_pred", "num_nan")
    unf = magd_protocol(eng, data_dir, seed=seed, verbose=False)
    fil = magd_protocol(eng, data_dir, seed=seed, is_filter=True,
                        verbose=False)
    report["magd_unfiltered"] = {k: unf[k] for k in keys}
    report["magd_filtered"] = {k: fil[k] for k in keys}
    print("unfiltered:", {k: round(unf[k], 4) for k in keys})
    print("filtered:  ", {k: round(fil[k], 4) for k in keys})

    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", os.path.join(out_dir, "report.json"))
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/dexgg_big")
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--out", default="runs/diffusion_study")
    ap.add_argument("--eva", default=None)
    ap.add_argument("--ddim-steps", type=int, default=50)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 mixed-precision training (f32 masters)")
    ap.add_argument("--cfg-dropout", type=float, default=0.0,
                    help="classifier-free-guidance training dropout")
    args = ap.parse_args()
    run_diffusion_study(args.data_dir, args.steps, args.batch_size,
                        args.out, eva_ckpt=args.eva,
                        ddim_steps=args.ddim_steps, bf16=args.bf16,
                        cfg_dropout=args.cfg_dropout)


if __name__ == "__main__":
    main()
