"""Training throughput on one chip — BASELINE config #3 (VERDICT r1 next-6).

Times warm, dependency-chained multi-step train programs (train/fast.py)
for every family on the real dataset shapes:

- whole-GAN step (D update + G update) at the reference's bs=1000, both
  with the default transl_rot_6d_l2 recon loss and with the chamfer
  control-point loss (the BASELINE "chamfer losses" config; Pallas/XLA
  chamfer reduction over FK'd palm points),
- evaluator BCE step at bs=256,
- diffusion ε-MSE step at bs=256,
- host input share: one-time table build vs device train time (the host
  pipeline feeds HBM-resident tables, so steady-state host cost is ~0 —
  reported as the build-amortization fraction for an N-step run).

Methodology: one warm-up chunk (compile), then a timed chunk whose final
losses are materialized with np.asarray (axon-relay-safe, see CLAUDE.md).

Usage:
    python -m dexgangrasp_tpu.tools.train_bench --data-dir /tmp/dexgg_big
"""
from __future__ import annotations

import argparse
import json
import time


def run_train_bench(data_dir: str, steps: int = 300, out_path=None) -> dict:
    import numpy as np

    import jax

    from dexgangrasp_tpu.data.datasets import (
        DexEvaluatorDataSet,
        DexGeneratorDataSet,
    )
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
        evaluator_train_chunk,
        gan_train_chunk,
        put_table,
    )
    from dexgangrasp_tpu.train.gan import GanTrainer, TrainConfig

    t0 = time.time()
    gen_ds = DexGeneratorDataSet(data_dir, "train", seed=0)
    gen_table = build_generator_table(gen_ds)
    eva_table = build_evaluator_table(
        DexEvaluatorDataSet(data_dir, "train", seed=0), seed=0)
    host_build_s = time.time() - t0
    gen_dev = put_table(gen_table)
    eva_dev = put_table(eva_table)

    out = {"device": str(jax.devices()[0]),
           "train_rows_gen": int(gen_table["bps_idx"].shape[0]),
           "train_rows_eva": int(eva_table["bps_idx"].shape[0]),
           "host_table_build_s": round(host_build_s, 2)}

    def timed(label, fn, *args):
        _, warm = fn(*args)  # compile + warm
        np.asarray(jax.tree.leaves(warm)[0])
        t1 = time.perf_counter()
        _, losses = fn(*args)
        np.asarray(jax.tree.leaves(losses)[0])
        dt = time.perf_counter() - t1
        out[label] = round(steps / dt, 1)
        print(f"{label}: {steps / dt:.1f} steps/s "
              f"({dt * 1e3 / steps:.2f} ms/step)", flush=True)

    key = jax.random.PRNGKey(0)

    # whole-GAN step, reference bs=1000 ("ffhgan_lr_0.0001_bs_1000")
    tr = GanTrainer(TrainConfig())
    ts = tr.init_gan_state(jax.random.PRNGKey(0))
    timed("gan_l2_bs1000_steps_per_sec",
          lambda *a: gan_train_chunk(tr, ts, gen_dev, key, steps, 1000), 0)

    # bf16 mixed precision on the same flagship config
    tr16 = GanTrainer(TrainConfig(compute_dtype="bfloat16"))
    ts16 = tr16.init_gan_state(jax.random.PRNGKey(0))
    timed("gan_l2_bf16_bs1000_steps_per_sec",
          lambda *a: gan_train_chunk(tr16, ts16, gen_dev, key, steps, 1000),
          0)

    # chamfer control-point recon (BASELINE config #3)
    trc = GanTrainer(TrainConfig(recon_loss="control_point_chamfer"))
    tsc = trc.init_gan_state(jax.random.PRNGKey(0))
    timed("gan_chamfer_bs1000_steps_per_sec",
          lambda *a: gan_train_chunk(trc, tsc, gen_dev, key, steps, 1000), 0)

    # evaluator step, bs=256
    tse = tr.init_evaluator_state(jax.random.PRNGKey(0))
    timed("evaluator_bs256_steps_per_sec",
          lambda *a: evaluator_train_chunk(tr, tse, eva_dev, key, steps,
                                           256), 0)

    # diffusion step, bs=256
    import jax.numpy as jnp

    from dexgangrasp_tpu.core.rotations import ortho6d_from_rot_matrix

    g_all = grasp_vector(
        ortho6d_from_rot_matrix(
            jnp.asarray(gen_table["rot9"].reshape(-1, 3, 3))),
        jnp.asarray(gen_table["transl"]),
        jnp.asarray(gen_table["joint_conf"]))
    dtr = DiffusionTrainer(DexDiffuser(), lr=3e-4,
                           normalizer=GraspNormalizer.fit(g_all))
    diff_dev = put_table(build_diffusion_table(None, dtr, table=gen_table))
    dts = dtr.init_state(jax.random.PRNGKey(0))
    timed("diffusion_bs256_steps_per_sec",
          lambda *a: diffusion_train_chunk(dtr, dts, diff_dev, key, steps,
                                           256), 0)

    # mixed precision: bf16 denoiser fwd/bwd, f32 masters (ROADMAP r2-4)
    dtr16 = DiffusionTrainer(DexDiffuser(), lr=3e-4,
                             normalizer=dtr.normalizer,
                             compute_dtype=jnp.bfloat16)
    timed("diffusion_bf16_bs256_steps_per_sec",
          lambda *a: diffusion_train_chunk(dtr16, dts, diff_dev, key, steps,
                                           256), 0)
    timed("diffusion_bs2048_steps_per_sec",
          lambda *a: diffusion_train_chunk(dtr, dts, diff_dev, key, steps,
                                           2048), 0)
    timed("diffusion_bf16_bs2048_steps_per_sec",
          lambda *a: diffusion_train_chunk(dtr16, dts, diff_dev, key, steps,
                                           2048), 0)

    # set-prediction family: the fused DETR chunk (device auction
    # matcher, ops/assignment.py) at the real bs=32-views shape
    from dexgangrasp_tpu.models.grasp_transformer import GraspTransformer
    from dexgangrasp_tpu.train.fast import set_train_chunk
    from dexgangrasp_tpu.train.set_transformer import (
        SetTrainer,
        build_set_table,
    )

    set_table = build_set_table(gen_ds)
    strainer = SetTrainer(GraspTransformer(),
                          normalizer=GraspNormalizer.fit(g_all))
    set_dev = put_table({"bps": set_table["bps"],
                         "gt": np.asarray(strainer.normalizer.normalize(
                             jnp.asarray(set_table["gt"]))),
                         "mask": set_table["mask"]})
    sts = strainer.init_state(jax.random.PRNGKey(0))
    set_steps = min(steps, 60)  # auction while_loop steps are heavier
    _, warm = set_train_chunk(strainer, sts, set_dev, key, set_steps, 32)
    np.asarray(warm)
    t1 = time.perf_counter()
    _, losses = set_train_chunk(strainer, sts, set_dev, key, set_steps, 32)
    np.asarray(losses)
    dt = time.perf_counter() - t1
    out["set_fused_bs32_steps_per_sec"] = round(set_steps / dt, 1)
    print(f"set_fused_bs32_steps_per_sec: {set_steps / dt:.1f} steps/s "
          f"({dt * 1e3 / set_steps:.2f} ms/step)", flush=True)

    # host share for a nominal 100k-step run: tables built once, device
    # does everything else (contrast: the reference pays per-sample h5
    # reopens inside the hot loop, train.py:194)
    dev_s_100k = 1e5 / out["gan_l2_bs1000_steps_per_sec"]
    out["host_input_fraction_100k_steps"] = round(
        host_build_s / (host_build_s + dev_s_100k), 4)

    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", out_path)
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/dexgg_big")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--out", default="runs/train_bench.json")
    args = ap.parse_args()
    run_train_bench(args.data_dir, steps=args.steps, out_path=args.out)


if __name__ == "__main__":
    main()
