"""cVAE-family study (VERDICT r2 next-6): train the FFHNet-style cVAE at
scale with the device-resident scan trainer, serve its decoder through the
STANDARD folded engine (the PARITY claim made concrete: ``fold_generator(
params['decoder'], state['decoder'])`` feeds GraspEngine unchanged), and
tabulate MAGD + coverage next to untrained/cGAN/diffusion.

The reference carries the cVAE as its FFHNet heritage (``losses.py:54``
``kl_divergence`` + the ``models/ffh*`` configs) but never ships a trained
one; this study does.

Usage:
    python -m dexgangrasp_tpu.tools.vae_study --data-dir /tmp/dexgg_big \
        --steps 30000 --eva runs/eval_study_xl/300000_eva_net.npz
"""
from __future__ import annotations

import argparse
import json
import os
import time


def run_vae_study(data_dir: str, steps: int = 30000, batch_size: int = 256,
                  out_dir: str = "runs/vae_study", eva_ckpt=None,
                  seed: int = 0, kl_coef: float = 0.005) -> dict:
    import numpy as np

    import jax

    from dexgangrasp_tpu.cli import magd_protocol
    from dexgangrasp_tpu.data.datasets import DexGeneratorDataSet
    from dexgangrasp_tpu.engine.pipeline import GraspEngine
    from dexgangrasp_tpu.models.vae import DexVAE
    from dexgangrasp_tpu.train import checkpoints as ckpt
    from dexgangrasp_tpu.train.fast import (
        build_generator_table,
        put_table,
        vae_train_chunk,
    )
    from dexgangrasp_tpu.train.vae import VaeTrainer

    os.makedirs(out_dir, exist_ok=True)
    basis = os.path.join(data_dir, "basis_point_set.npy")
    basis = basis if os.path.isfile(basis) else None

    ds = DexGeneratorDataSet(data_dir, "train", seed=seed)
    table = build_generator_table(ds)
    dev = put_table(table)
    print(f"table: {table['bps_idx'].shape[0]} rows")

    trainer = VaeTrainer(DexVAE(), kl_coef=kl_coef)
    ts = trainer.init_state(jax.random.PRNGKey(seed))
    t0 = time.time()
    done = 0
    key = jax.random.PRNGKey(seed + 3)
    loss = None
    while done < steps:
        n = min(2000, steps - done)
        key, k = jax.random.split(key)
        ts, losses = vae_train_chunk(trainer, ts, dev, k, n, batch_size)
        done += n
        loss = float(np.asarray(losses)[-50:].mean())
        print(f"step {done}: vae_loss {loss:.4f}", flush=True)
    dt = time.time() - t0
    path = os.path.join(out_dir, f"{steps}_vae_net.npz")
    ckpt.save_pytrees(path, {"params": ts.params, "state": ts.state,
                             "opt": ts.opt, "step": ts.step},
                      {"epoch": steps, "family": "vae"})
    report = {"steps": steps, "vae_loss": loss, "train_seconds": dt,
              "steps_per_sec": steps / dt, "checkpoint": path,
              "kl_coef": kl_coef}
    print(f"{steps} steps in {dt:.0f}s ({steps/dt:.0f}/s) -> {path}")

    # serve the DECODER through the standard folded engine + MAGD rows
    if eva_ckpt:
        etrees, _ = ckpt.load_pytrees(eva_ckpt)
        ep, es = etrees["params"], etrees["state"]
    else:
        from dexgangrasp_tpu.models.networks import init_evaluator

        _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    eng = GraspEngine(ts.params["decoder"], ts.state["decoder"], ep, es,
                      basis=np.load(basis) if basis else None)
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
    ap.add_argument("--out", default="runs/vae_study")
    ap.add_argument("--eva", default=None)
    ap.add_argument("--kl-coef", type=float, default=0.005)
    args = ap.parse_args()
    run_vae_study(args.data_dir, args.steps, args.batch_size, args.out,
                  eva_ckpt=args.eva, kl_coef=args.kl_coef)


if __name__ == "__main__":
    main()
