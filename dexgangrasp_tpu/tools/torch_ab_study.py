"""Equal-budget torch-reference vs JAX cGAN head-to-head (VERDICT r4 #3).

One-step parity (tests/test_train_step_parity.py) proves our jitted
``gan_step`` reproduces the reference's ``update_dexgangrasp`` exactly for
a single update.  This study proves the claim that matters for users: at a
MATCHED training budget on the SAME synthetic dataset, the two stacks
reach the same training *dynamics* — per-axis MAGD, coverage, and (because
mode collapse is the cGAN's defining behavior) the same collapse
signature.

Protocol
--------
1. Build (or reuse) the synthetic dataset.
2. Materialize the exact same batch sequence (numpy) for every epoch, and
   the exact same per-step latents z — both trainers consume identical
   inputs in identical order.  After the first step f32 drift decorrelates
   the trajectories (chaotic), so OUTCOMES are the comparison, not
   weights.
3. Train A: our ``GanTrainer.gan_step`` (jit).  Train B: a torch loop
   replicating the reference's ``update_dexgangrasp``
   (``/root/reference/DexGanGrasp/models/dexgangrasp.py:757-823``, BCE
   coefs 100/1/10, Adam(1e-4, wd 5e-4) — the torch nets come from
   ``tests/torch_oracle.py``, the same oracle the parity test trusts).
4. Import B's final weights into our stack (``models/torch_import.py``)
   and run BOTH generators through the IDENTICAL MAGD protocol
   (``cli.magd_protocol``) + a latent-diversity probe.

Usage:
    python -m dexgangrasp_tpu.tools.torch_ab_study \
        --synthetic /tmp/ab_synth --epochs 30 --out runs/torch_ab
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def materialize_batches(data_dir: str, epochs: int, batch_size: int,
                        seed: int):
    """The shared batch/latent schedule: list over epochs of lists of
    (batch dict, z) — both trainers consume these verbatim."""
    from dexgangrasp_tpu.data.datasets import DexGeneratorDataSet

    dset = DexGeneratorDataSet(data_dir, "train")
    dset.rng = np.random.default_rng(seed)  # pin the shuffle stream
    zrng = np.random.default_rng(seed + 1)
    sched = []
    for _ in range(epochs):
        ep = []
        for batch in dset.epoch_batches(batch_size, drop_last=True,
                                        shuffle=True):
            b = {k: np.asarray(v, np.float32) for k, v in batch.items()
                 if isinstance(v, np.ndarray)}
            z = zrng.normal(size=(b["bps_object"].shape[0], 5)) \
                .astype(np.float32)
            ep.append((b, z))
        sched.append(ep)
    return sched


def train_jax(sched, lr: float, wd: float, seed: int):
    import jax
    import jax.numpy as jnp

    from dexgangrasp_tpu.train.gan import GanTrainer, TrainConfig

    trainer = GanTrainer(TrainConfig(lr_gen=lr, lr_dis=lr,
                                     weight_decay=wd))
    ts = trainer.init_gan_state(jax.random.PRNGKey(seed))
    key = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    last = {}
    for ei, epoch in enumerate(sched):
        for b, z in epoch:
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            jb["z"] = jnp.asarray(z)
            key, k = jax.random.split(key)
            ts, logs = trainer.gan_step(ts, jb, k)
            last = logs
        print(f"[jax] epoch {ei + 1}/{len(sched)} "
              f"loss_g={float(last['total_loss_gen']):.4f} "
              f"loss_d={float(last['total_loss_disc']):.4f}")
    dt = time.time() - t0
    return ts, dt


def train_torch(sched, lr: float, wd: float, seed: int):
    """The reference's update loop, verbatim semantics (one generator
    forward reused for D-fake + G steps; D sees the rot MATRIX detached;
    BCE(real,1)+BCE(fake,0))/2; G loss adv + 100/1/10 L2s)."""
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                    "..", "..", "tests"))
    from torch_oracle import TorchDiscriminator, TorchGenerator

    torch.manual_seed(seed)
    torch.set_num_threads(max(1, os.cpu_count() or 1))
    gen = TorchGenerator()
    disc = TorchDiscriminator()
    opt_g = torch.optim.Adam(gen.parameters(), lr=lr, betas=(0.9, 0.999),
                             weight_decay=wd)
    opt_d = torch.optim.Adam(disc.parameters(), lr=lr, betas=(0.9, 0.999),
                             weight_decay=wd)
    bce = torch.nn.BCELoss()
    mse = torch.nn.MSELoss()

    def rot_from_ortho6d(o6):
        x_raw, y_raw = o6[:, 0:3], o6[:, 3:6]

        def norm(v):
            mag = torch.sqrt(v.pow(2).sum(1))
            return v / torch.max(mag, torch.tensor([1e-8])).view(-1, 1)

        x = norm(x_raw)
        z = norm(torch.cross(x, y_raw, dim=1))
        y = torch.cross(z, x, dim=1)
        return torch.cat([x.view(-1, 3, 1), y.view(-1, 3, 1),
                          z.view(-1, 3, 1)], 2)

    t0 = time.time()
    last_d = last_g = float("nan")
    for ei, epoch in enumerate(sched):
        gen.train()
        disc.train()
        for b, z in epoch:
            B = z.shape[0]
            bps = torch.from_numpy(b["bps_object"])
            real_rot = torch.from_numpy(b["rot_matrix"].reshape(B, 9))
            real_transl = torch.from_numpy(b["transl"])
            real_joints = torch.from_numpy(b["joint_conf"])

            rot6, transl, joints = gen(torch.from_numpy(z), bps)
            rot_flat = rot_from_ortho6d(rot6).reshape(B, 9)

            real_score = disc(bps, real_rot, real_transl, real_joints)
            fake_score = disc(bps, rot_flat.detach(), transl.detach(),
                              joints.detach())
            loss_d = (bce(real_score, torch.ones_like(real_score))
                      + bce(fake_score, torch.zeros_like(fake_score))) / 2
            opt_d.zero_grad()
            loss_d.backward(retain_graph=True)
            opt_d.step()

            fake_score_g = disc(bps, rot_flat, transl, joints)
            adv = bce(fake_score_g, torch.ones_like(fake_score_g))
            loss_g = (adv + 100.0 * mse(transl, real_transl)
                      + 1.0 * mse(rot_flat, real_rot)
                      + 10.0 * mse(joints, real_joints))
            opt_g.zero_grad()
            loss_g.backward()
            opt_g.step()
            last_d, last_g = float(loss_d), float(loss_g)
        print(f"[torch] epoch {ei + 1}/{len(sched)} "
              f"loss_g={last_g:.4f} loss_d={last_d:.4f}")
    dt = time.time() - t0
    return gen, disc, dt


def diversity_probe(engine, bps: np.ndarray, n: int = 256,
                    seed: int = 0) -> dict:
    """Mode-collapse probe: spread of n samples for ONE conditioning —
    per-axis std of transl (meters) and of joint_conf."""
    out = engine.generate_grasps(bps, n_samples=n, seed=seed)
    return {
        "transl_std_mean_m": float(np.mean(np.std(out["transl"], axis=0))),
        "joint_std_mean": float(np.mean(np.std(out["joint_conf"], axis=0))),
    }


def evaluate(tag: str, gen_params, gen_state, data_dir: str) -> dict:
    import jax

    from dexgangrasp_tpu.cli import magd_protocol
    from dexgangrasp_tpu.data.datasets import DexGeneratorDataSet
    from dexgangrasp_tpu.engine.pipeline import GraspEngine
    from dexgangrasp_tpu.models.networks import init_evaluator

    _, ep, es = init_evaluator(jax.random.PRNGKey(1))  # unused by MAGD gen
    engine = GraspEngine(gen_params, gen_state, ep, es)
    res = magd_protocol(engine, data_dir, verbose=False)
    dset = DexGeneratorDataSet(data_dir, "eval")
    bps0 = np.load(sorted(set(dset.bps_paths))[0]).ravel()
    res.update(diversity_probe(engine, bps0))
    res["tag"] = tag
    return res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", required=True,
                    help="synthetic dataset dir (built if absent)")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--wd", type=float, default=5e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="runs/torch_ab")
    args = ap.parse_args(argv)

    import jax

    # torch is CPU-only here; keep the comparison same-host.  Must be set
    # before ANY backend query (default_backend() would commit axon).
    jax.config.update("jax_platforms", "cpu")

    if not os.path.isfile(os.path.join(args.synthetic, "metadata.csv")):
        from dexgangrasp_tpu.data.synthetic import build_synthetic_dataset

        print(f"Building synthetic dataset at {args.synthetic} ...")
        build_synthetic_dataset(args.synthetic, n_objects=8,
                                views_per_object=2, grasps_per_object=24)

    sched = materialize_batches(args.synthetic, args.epochs,
                                args.batch_size, args.seed)
    n_steps = sum(len(e) for e in sched)
    print(f"budget: {args.epochs} epochs x {len(sched[0])} steps "
          f"= {n_steps} updates, batch {args.batch_size}")

    ts, dt_jax = train_jax(sched, args.lr, args.wd, args.seed)
    gen_t, _, dt_torch = train_torch(sched, args.lr, args.wd, args.seed)

    from dexgangrasp_tpu.models.torch_import import generator_from_torch_sd

    gp_t, gs_t = generator_from_torch_sd(gen_t.state_dict(), prefix="")

    res_jax = evaluate("jax", ts.gen_params, ts.gen_state, args.synthetic)
    res_torch = evaluate("torch", gp_t, gs_t, args.synthetic)

    os.makedirs(args.out, exist_ok=True)
    report = {
        "budget": {"epochs": args.epochs, "steps": n_steps,
                   "batch_size": args.batch_size, "lr": args.lr,
                   "wd": args.wd, "seed": args.seed},
        "train_seconds": {"jax": round(dt_jax, 1),
                          "torch": round(dt_torch, 1)},
        "jax": res_jax,
        "torch": res_torch,
    }
    path = os.path.join(args.out, "torch_ab.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))

    hdr = ("| stack | transl_mean | rot_mean | joint_mean | coverage "
           "| transl σ (m) | joint σ |")
    print(hdr)
    print("|---|---|---|---|---|---|---|")
    for r in (res_jax, res_torch):
        print(f"| {r['tag']} | {r['transl_mean']:.4f} "
              f"| {r['rot_mean']:.4f} | {r['joint_mean']:.4f} "
              f"| {r['coverage_mean']:.4f} | {r['transl_std_mean_m']:.4f} "
              f"| {r['joint_std_mean']:.4f} |")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
