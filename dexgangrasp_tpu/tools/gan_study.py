"""cGAN training study — make the reference's flagship family win.

Round-1 left the reference-architecture cGAN *worse than untrained init*
on the synthetic MAGD benchmark (docs/RESULTS.md).  This study trains it
with the device-resident fast trainer over a config sweep
(gen_train_freq / WGAN-GP / LR anneal — VERDICT r1 next-3) on the
oracle-labeled dataset and scores every run with the MAGD protocol
(cli.magd_protocol == reference eval.py semantics).  Also runs the
filter study (VERDICT r1 next-1): MAGD with the trained evaluator's
3-stage filter vs unfiltered — per-grasp means are the comparable metric.

Usage:
    python -m dexgangrasp_tpu.tools.gan_study --data-dir /tmp/dexgg_big \
        --steps 20000 --eva runs/eval_study/150000_eva_net.npz
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from typing import Dict, Optional


def _magd(engine, data_dir, **kw):
    from dexgangrasp_tpu.cli import magd_protocol

    s = magd_protocol(engine, data_dir, verbose=False, **kw)
    return {k: s[k] for k in ("transl", "rot", "joint", "coverage_mean",
                              "transl_mean", "rot_mean", "joint_mean",
                              "n_pred", "num_nan")}


def _engine(gen_params, gen_state, eva, basis, data_dir):
    import numpy as np

    from dexgangrasp_tpu.engine.pipeline import GraspEngine

    ep, es = eva
    return GraspEngine(gen_params, gen_state, ep, es,
                       basis=np.load(basis) if basis else None)


def run_gan_study(data_dir: str, steps: int = 20000, batch_size: int = 256,
                  out_dir: str = "runs/gan_study",
                  eva_ckpt: Optional[str] = None, seed: int = 0,
                  configs: Optional[Dict[str, dict]] = None,
                  magd_every: int = 0) -> dict:
    import numpy as np

    import jax

    from dexgangrasp_tpu.data.datasets import DexGeneratorDataSet
    from dexgangrasp_tpu.train import checkpoints as ckpt
    from dexgangrasp_tpu.train.fast import (
        build_generator_table,
        gan_train_chunk,
        put_table,
    )
    from dexgangrasp_tpu.train.gan import GanTrainer, TrainConfig, set_lr

    os.makedirs(out_dir, exist_ok=True)
    basis = os.path.join(data_dir, "basis_point_set.npy")
    if not os.path.isfile(basis):
        basis = None

    if eva_ckpt:
        trees, _ = ckpt.load_pytrees(eva_ckpt)
        eva = (trees["params"], trees["state"])
    else:
        from dexgangrasp_tpu.models.networks import init_evaluator

        _, ep, es = init_evaluator(jax.random.PRNGKey(1))
        eva = (ep, es)

    print("building generator table ...")
    table = build_generator_table(DexGeneratorDataSet(data_dir, "train",
                                                      seed=seed))
    dev = put_table(table)
    print(f"table: {table['bps_idx'].shape[0]} rows / "
          f"{table['bps'].shape[0]} views")

    if configs is None:
        configs = {
            "base": {},
            "freq2": {"gen_train_freq": 2},
            "wgan_gp": {"is_wgan": True},
            "anneal": {"_anneal": 0.3},  # lr × 0.3 at 60% of training
        }

    report = {"data_dir": data_dir, "steps": steps,
              "batch_size": batch_size, "eva_ckpt": eva_ckpt, "runs": {}}

    # baseline: untrained init through the same protocol
    from dexgangrasp_tpu.models.networks import init_dexgan

    (_, gp0, gs0), _ = init_dexgan(jax.random.PRNGKey(0))
    base = _magd(_engine(gp0, gs0, eva, basis, data_dir), data_dir,
                 seed=seed)
    report["untrained"] = base
    print("untrained init:", {k: round(v, 3) for k, v in base.items()})

    best_name, best_params = None, None
    for name, overrides in configs.items():
        anneal = overrides.pop("_anneal", None)
        cfg = dataclasses.replace(TrainConfig(), **overrides)
        trainer = GanTrainer(cfg)
        ts = trainer.init_gan_state(jax.random.PRNGKey(seed))
        freq = cfg.gen_train_freq
        t0 = time.time()
        chunk = 1000
        done = 0
        key = jax.random.PRNGKey(seed + 7)
        while done < steps:
            n = min(chunk, steps - done)
            key, k = jax.random.split(key)
            ts, logs = gan_train_chunk(trainer, ts, dev, k, n, batch_size,
                                       gen_train_freq=freq)
            done += n
            if anneal and done == int(steps * 0.6) // chunk * chunk:
                ts = dataclasses.replace(
                    ts, gen_opt=set_lr(ts.gen_opt, cfg.lr_gen * anneal),
                    disc_opt=set_lr(ts.disc_opt, cfg.lr_dis * anneal))
            if magd_every and done % magd_every < chunk:
                m = _magd(_engine(ts.gen_params, ts.gen_state, eva, basis,
                                  data_dir), data_dir, seed=seed)
                print(f"[{name}] step {done}: "
                      f"gen {float(np.asarray(logs['total_loss_gen']).mean()):.3f} "
                      f"transl {m['transl']:.2f} cov {m['coverage_mean']:.3f}",
                      flush=True)
        dt = time.time() - t0
        m = _magd(_engine(ts.gen_params, ts.gen_state, eva, basis, data_dir),
                  data_dir, seed=seed)
        m["train_seconds"] = dt
        m["gan_steps_per_sec"] = steps * freq / dt
        report["runs"][name] = m
        print(f"[{name}] {steps} gen-steps in {dt:.0f}s:",
              {k: round(v, 3) for k, v in m.items()}, flush=True)
        beats = all(m[k] < base[k] for k in ("transl", "rot", "joint")) \
            and m["coverage_mean"] >= base["coverage_mean"]
        if beats and (best_name is None
                      or m["transl"] < report["runs"][best_name]["transl"]):
            best_name = name
            best_params = ts
    report["best"] = best_name

    if best_params is not None:
        path = ckpt.save_gan(out_dir, steps, best_params)
        report["checkpoint"] = path
        print("saved best run", best_name, "->", path)
        # filter study: trained evaluator 3-stage filter vs unfiltered
        eng = _engine(best_params.gen_params, best_params.gen_state, eva,
                      basis, data_dir)
        unf = _magd(eng, data_dir, seed=seed)
        fil = _magd(eng, data_dir, seed=seed, is_filter=True)
        report["filter_study"] = {"unfiltered": unf, "filtered": fil}
        print("filter study: unfiltered means "
              f"t {unf['transl_mean']:.4f} r {unf['rot_mean']:.3f} "
              f"j {unf['joint_mean']:.3f} | filtered means "
              f"t {fil['transl_mean']:.4f} r {fil['rot_mean']:.3f} "
              f"j {fil['joint_mean']:.3f}")

    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", os.path.join(out_dir, "report.json"))
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/dexgg_big")
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--out", default="runs/gan_study")
    ap.add_argument("--eva", default=None, help="trained evaluator .npz")
    ap.add_argument("--magd-every", type=int, default=0)
    ap.add_argument("--bf16-rescue", action="store_true",
                    help="VERDICT r2 next-9 sweep: f32 vs full-bf16 vs "
                         "partial precision (G-only / D-only bf16), "
                         "identical steps/data, MAGD-compared")
    args = ap.parse_args()
    configs = None
    if args.bf16_rescue:
        configs = {
            "f32": {},
            "bf16": {"compute_dtype": "bfloat16"},
            "bf16_gen_only": {"compute_dtype": "bfloat16_gen"},
            "bf16_disc_only": {"compute_dtype": "bfloat16_disc"},
        }
    run_gan_study(args.data_dir, args.steps, args.batch_size, args.out,
                  eva_ckpt=args.eva, magd_every=args.magd_every,
                  configs=configs)


if __name__ == "__main__":
    main()
