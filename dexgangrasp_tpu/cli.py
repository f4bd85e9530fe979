"""Training CLI — counterpart of reference ``train.py``.

Usage:
    python train.py --config configs/dexgangrasp.yaml
    python train.py --synthetic /tmp/synth --epochs 5   # self-contained demo

Trains the DexGANGrasp generator/discriminator and/or the DexEvaluator
(flags ``train_ffhgenerator`` / ``train_ffhevaluator`` in the YAML, names
kept reference-compatible) on a dataset following the reference on-disk
contract.  ``--synthetic DIR`` builds a synthetic dataset there first so the
whole pipeline runs without the proprietary robotiq data.
"""
# This module hosts both console entry points (pyproject [project.scripts]);
# the repo-root train.py / eval.py are thin shims over it.

"""MAGD evaluation CLI — counterpart of reference ``eval.py`` (the parity
gate).

Per eval object: generate as many grasps as there are ground-truth
positives (optionally 5× + 3-stage evaluator filtering), then compute the
Mean Absolute Grasp Deviation sums + coverage (reference eval.py:98-137
semantics, vectorized).

Modes:
  --data-dir DIR          dataset following the reference contract (uses its
                          eval split; with --eval-batch, the frozen fixture
                          supplies the BPS rows like the reference)
  --synthetic DIR         build/use a synthetic dataset (self-contained)
  --gen/--eva PATH        checkpoints (.npz native, or reference .pt)

Fixes reference eval.py:322 (undefined z_offset when is_filter=True — here
z_offset is an explicit flag).
"""

import argparse
import os


def train_main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="YAML config path")
    ap.add_argument("--synthetic", default=None,
                    help="build+use a synthetic dataset at this dir")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--train-evaluator", action="store_true")
    ap.add_argument("--model", default="gan",
                    choices=["gan", "vae", "diffusion", "set"],
                    help="generator family (gan = reference architecture; "
                         "set = DGTR-style set-prediction transformer)")
    ap.add_argument("--dp", action="store_true",
                    help="data-parallel over all visible devices")
    ap.add_argument("--fast", action="store_true",
                    help="device-resident scan trainer (train/fast.py): "
                         "whole dataset in HBM, K optimizer steps per XLA "
                         "program; with --dp the scan interior shards over "
                         "the mesh (the multi-chip workhorse path)")
    ap.add_argument("--steps", type=int, default=None,
                    help="--fast: total optimizer steps (default: "
                         "num_epochs x rows / batch_size)")
    args = ap.parse_args()

    from dexgangrasp_tpu.utils.config import Config

    overrides = {}
    if args.synthetic:
        from dexgangrasp_tpu.data.synthetic import build_synthetic_dataset

        if not os.path.isfile(os.path.join(args.synthetic, "metadata.csv")):
            print(f"Building synthetic dataset at {args.synthetic} ...")
            build_synthetic_dataset(args.synthetic, n_objects=8,
                                    views_per_object=2,
                                    grasps_per_object=24)
        overrides["data_dir"] = args.synthetic
    if args.epochs:
        overrides["num_epochs"] = args.epochs
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.train_evaluator:
        overrides["train_ffhevaluator"] = True

    cfg = Config(args.config, overrides=overrides).parse()
    print(f"save_dir: {cfg['save_dir']}")

    if args.model == "vae":
        from dexgangrasp_tpu.train.families import train_vae

        print("final:", train_vae(cfg))
        return
    if args.model == "diffusion":
        from dexgangrasp_tpu.train.families import train_diffusion

        print("final:", train_diffusion(cfg))
        return
    if args.model == "set":
        from dexgangrasp_tpu.train.families import train_set

        print("final:", train_set(cfg))
        return

    mesh = None
    if args.dp:
        from dexgangrasp_tpu.parallel.mesh import data_parallel_mesh

        mesh = data_parallel_mesh()
        print(f"data-parallel mesh over {mesh.devices.size} devices")

    if args.fast:
        _fast_train(cfg, mesh, args.steps)
        return

    from dexgangrasp_tpu.train.trainer import TrainDriver

    driver = TrainDriver(cfg, mesh=mesh)
    final = driver.run()
    print("final eval:", final)


def _fast_train(cfg: dict, mesh, steps):
    """Device-resident chunked training from the product CLI (the path
    every study tool uses; VERDICT r2 next-1 made it mesh-shardable)."""
    import numpy as np

    import jax

    from dexgangrasp_tpu.data.datasets import (
        DexEvaluatorDataSet,
        DexGeneratorDataSet,
    )
    from dexgangrasp_tpu.train import checkpoints as ckpt
    from dexgangrasp_tpu.train.fast import (
        build_evaluator_table,
        build_generator_table,
        gan_train_chunk,
        put_table,
        train_evaluator_fast,
    )
    from dexgangrasp_tpu.train.gan import GanTrainer
    from dexgangrasp_tpu.train.trainer import train_config_from_cfg

    trainer = GanTrainer(train_config_from_cfg(cfg))
    data_dir = cfg["data_dir"]
    bs = int(cfg.get("batch_size", 256))
    seed = int(cfg.get("seed", 0))
    save_dir = cfg["save_dir"]

    if cfg.get("train_ffhgenerator", True):
        table = build_generator_table(
            DexGeneratorDataSet(data_dir, "train", seed=seed))
        n_steps = steps or max(
            1, int(cfg.get("num_epochs", 10))
            * table["bps_idx"].shape[0] // bs)
        dev = put_table(table, mesh)
        ts = trainer.init_gan_state(jax.random.PRNGKey(seed))
        if mesh is not None:
            from dexgangrasp_tpu.parallel.sharding import replicate

            ts = replicate(ts, mesh)
        key = jax.random.PRNGKey(seed + 7)
        done = 0
        while done < n_steps:
            n = min(2000, n_steps - done)
            key, k = jax.random.split(key)
            ts, logs = gan_train_chunk(
                trainer, ts, dev, k, n, bs,
                gen_train_freq=trainer.cfg.gen_train_freq, mesh=mesh)
            done += n
            print(f"[gan] step {done}/{n_steps}: "
                  f"G {float(np.asarray(logs['total_loss_gen']).mean()):.4f}"
                  f" D {float(np.asarray(logs['total_loss_disc']).mean()):.4f}",
                  flush=True)
        print("saved", ckpt.save_gan(save_dir, n_steps, ts))

    if cfg.get("train_ffhevaluator", False):
        train_tab = build_evaluator_table(
            DexEvaluatorDataSet(data_dir, "train", seed=seed), seed=seed)
        eval_tab = build_evaluator_table(
            DexEvaluatorDataSet(data_dir, "eval", seed=seed), seed=seed)
        n_steps = steps or max(
            1, int(cfg.get("num_epochs", 10))
            * train_tab["bps_idx"].shape[0] // bs)
        ts = trainer.init_evaluator_state(jax.random.PRNGKey(seed + 1))
        ts, history = train_evaluator_fast(
            trainer, ts, train_tab, eval_tab, total_steps=n_steps,
            batch_size=bs, seed=seed, mesh=mesh)
        print("saved", ckpt.save_evaluator(save_dir, n_steps, ts))


import math

import numpy as np


def load_engine(gen_path, eva_path, basis_path=None, model: str = "gan",
                guidance_scale: float = 0.0, refine_steps: int = 0,
                bf16: bool = False):
    """Thin wrapper over the engine loaders (kept as the CLI's loading
    seam; apps import it by this name).  ``model``: 'gan'/'vae' checkpoints
    serve through GraspEngine (the VAE decoder is generator-shaped);
    'diffusion' through DiffusionEngine (same serving surface);
    'student' through DiffusionEngine with the distilled one-step sampler
    (train/distill.py — distill checkpoints also auto-detect via their
    family='distill' metadata under model='diffusion'); 'set' through
    SetEngine (the DGTR-style set-prediction transformer,
    train/set_transformer.py).
    ``guidance_scale`` > 0 (diffusion only) turns on evaluator-guided DDIM
    (engine/diffusion_pipeline.sample_guided).  ``bf16`` selects the bf16
    serving mode (GraspEngine-served families only, i.e. gan/vae — the
    HBM-bound folded chain runs with bf16 operands and f32 islands;
    ignored for diffusion/student/set)."""
    if model in ("diffusion", "student"):
        from dexgangrasp_tpu.engine.diffusion_pipeline import DiffusionEngine

        kw = {"student": True} if model == "student" else {}
        return DiffusionEngine.from_checkpoints(
            gen_path, eva_path, basis_path,
            guidance_scale=guidance_scale, refine_steps=refine_steps, **kw)
    if model == "set":
        from dexgangrasp_tpu.engine.set_pipeline import SetEngine

        return SetEngine.from_checkpoints(gen_path, eva_path, basis_path,
                                          refine_steps=refine_steps)
    from dexgangrasp_tpu.engine.pipeline import GraspEngine

    return GraspEngine.from_checkpoints(gen_path, eva_path, basis_path,
                                        refine_steps=refine_steps,
                                        bf16=bf16)


def load_vae_bench_engine(refine_steps: int = 0):
    """Shared bench/serving factory for the cVAE family rows
    (bench_closed_loop / tools/serve_bench): loads the committed VAE
    study checkpoint resolved relative to the REPO ROOT (so benches work
    from any cwd), warning loudly when it falls back to fresh-initialized
    decoder weights instead of silently mislabeling the row."""
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(root, "runs", "vae_study", "30000_vae_net.npz")
    if not os.path.exists(ckpt):
        print("warning: VAE study checkpoint missing at "
              f"{ckpt}; benching fresh-initialized decoder weights",
              file=sys.stderr)
        ckpt = None
    return load_engine(ckpt, None, model="vae", refine_steps=refine_steps)


def load_distill_bench_engine(refine_steps: int = 0):
    """Bench/serving factory for the distilled one-step student family:
    loads the committed distill-study checkpoint (teacher = guided
    DDIM-10; train/distill.py) resolved relative to the repo root, with a
    loud fallback to fresh default weights so a missing artifact can't
    silently mislabel a bench row (same contract as
    ``load_vae_bench_engine``)."""
    import glob
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hits = sorted(glob.glob(os.path.join(root, "runs", "distill_study",
                                         "*_student_net.npz")))
    ckpt = hits[-1] if hits else None
    if ckpt is None:
        print("warning: distill study checkpoint missing under "
              f"{root}/runs/distill_study; benching fresh-initialized "
              "student weights", file=sys.stderr)
    return load_engine(ckpt, None, model="student",
                       refine_steps=refine_steps)


def load_set_bench_engine(refine_steps: int = 0):
    """Bench/serving factory for the set-prediction transformer family
    (DGTR-style, models/grasp_transformer.py): loads the committed
    set-study checkpoint resolved relative to the repo root, with a loud
    fallback to fresh default weights so a missing artifact can't
    silently mislabel a bench row (same contract as
    ``load_vae_bench_engine``)."""
    import glob
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hits = sorted(glob.glob(os.path.join(root, "runs", "set_study",
                                         "*_set_net.npz")))
    ckpt = hits[-1] if hits else None
    if ckpt is None:
        print("warning: set study checkpoint missing under "
              f"{root}/runs/set_study; benching fresh-initialized "
              "set-transformer weights", file=sys.stderr)
    return load_engine(ckpt, None, model="set", refine_steps=refine_steps)


def run_filter(engine, bps, grasps, n_samples, thresh_list, use_disc,
               verbose=True):
    """Reference 3-stage filter (eval.py:139-204)."""
    out = grasps
    n_filt = len(grasps["rot_matrix"])
    for thresh in thresh_list:
        out = engine.filter_grasps(bps, grasps, thresh=thresh,
                                   use_discriminator=use_disc)
        n_filt = out["rot_matrix"].shape[0]
        if verbose:
            print(f"n_grasps after filtering: {n_filt} "
                  f"({n_filt / max(n_samples, 1):.2f} pass)")
    return out, n_filt


def eval_main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--synthetic", default=None)
    ap.add_argument("--gen", default=None, help="generator ckpt (.npz/.pt)")
    ap.add_argument("--eva", default=None, help="evaluator ckpt (.npz/.pt)")
    ap.add_argument("--basis", default=None)
    ap.add_argument("--filter", action="store_true", dest="is_filter")
    ap.add_argument("--discriminator", action="store_true")
    ap.add_argument("--model", default="gan",
                    choices=["gan", "vae", "diffusion", "student", "set"],
                    help="generator family of --gen (vae decoders serve "
                         "through the standard engine; student = distilled "
                         "one-step sampler, train/distill.py)")
    ap.add_argument("--z-offset", type=float, default=0.025)
    ap.add_argument("--refine-steps", type=int, default=0,
                    help="diffusion only: evaluator-gradient refinement "
                         "steps fused after sampling (composed-frontier "
                         "recipe)")
    ap.add_argument("--guidance-scale", type=float, default=0.0,
                    help="diffusion only: evaluator-guided DDIM strength "
                         "(0 = off)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sweep-dir", default=None,
                    help="run-dir of checkpoints: evaluate every saved epoch "
                         "and write <sweep-dir>_metrics.csv (reference "
                         "eval.py:407-426)")
    args = ap.parse_args()

    if args.sweep_dir:
        return sweep(args)
    return _run_single(args)


def magd_protocol(engine, data_dir, is_filter=False, thresh_list=None,
                  use_discriminator=False, z_offset=0.025, seed=0,
                  sample_mult=5, verbose=True):
    """The MAGD protocol over a dataset's eval split (reference
    eval.py:236-359 semantics): per eval view, generate |GT| grasps
    (``sample_mult``×|GT| + 3-stage filter when ``is_filter``), then MAGD
    sums + coverage.  Also reports per-grasp means ('transl_mean', ...) —
    sums scale with prediction count, so means are the comparable quantity
    between filtered (variable-n) and unfiltered runs."""
    from dexgangrasp_tpu.data.datasets import DexGeneratorDataSet
    from dexgangrasp_tpu.eval.magd import magd_for_grasp_distribution

    if thresh_list is None:
        thresh_list = ([0.15, 0.175, 0.20] if use_discriminator
                       else [0.5, 0.75, 0.90])
    dset = DexGeneratorDataSet(data_dir, "eval")
    # enumerate every eval-split view (the reference iterates its frozen
    # 64-row eval_batch; here each unique bps file is an eval row)
    unique_bps = sorted(set(dset.bps_paths))

    sums = {"transl": 0.0, "rot": 0.0, "joint": 0.0, "coverage": 0.0}
    n_pred_total = 0
    num_nan = 0
    for bps_path in unique_bps:
        pcd_path = bps_path.replace("bps", "pcd").replace(".npy", ".pcd")
        grasps_gt = dset.get_grasps_from_pcd_path(pcd_path)
        n_gt = grasps_gt["joint_conf"].shape[0]
        bps = np.load(bps_path).ravel()
        if is_filter:
            out = engine.generate_grasps(bps, n_samples=n_gt * sample_mult,
                                         z_offset=z_offset, seed=seed)
            try:
                out, _ = run_filter(engine, bps, out, n_gt, thresh_list,
                                    use_discriminator, verbose=verbose)
            except ValueError as e:
                if verbose:
                    print("filter rejected all grasps:", e)
        else:
            out = engine.generate_grasps(bps, n_samples=n_gt,
                                         z_offset=z_offset, seed=seed)
        t, r, j, cov = magd_for_grasp_distribution(out, grasps_gt)
        if not any(map(math.isnan, (t, r, j))):
            sums["transl"] += t
            sums["rot"] += r
            sums["joint"] += j
            n_pred_total += out["transl"].shape[0]
        else:
            num_nan += 1
        sums["coverage"] += cov

    n = len(unique_bps)
    sums["n"] = n
    sums["num_nan"] = num_nan
    sums["n_pred"] = n_pred_total
    sums["coverage_mean"] = sums["coverage"] / n
    for k in ("transl", "rot", "joint"):
        sums[k + "_mean"] = sums[k] / max(n_pred_total, 1)
    return sums


def _run_single(args):
    data_dir = args.data_dir or args.synthetic
    if args.synthetic and not os.path.isfile(
            os.path.join(args.synthetic, "metadata.csv")):
        from dexgangrasp_tpu.data.synthetic import build_synthetic_dataset

        build_synthetic_dataset(args.synthetic, n_objects=8,
                                views_per_object=2, grasps_per_object=24)
    basis = args.basis or (os.path.join(data_dir, "basis_point_set.npy")
                           if args.synthetic else None)
    if basis and not os.path.isfile(basis):
        basis = None
    engine = load_engine(args.gen, args.eva, basis,
                         model=getattr(args, "model", "gan"),
                         guidance_scale=getattr(args, "guidance_scale", 0.0))

    sums = magd_protocol(engine, data_dir, is_filter=args.is_filter,
                         use_discriminator=args.discriminator,
                         z_offset=args.z_offset, seed=args.seed)
    print("transl_loss_sum:", sums["transl"])
    print("rot_loss_sum:", sums["rot"])
    print("joint_loss_sum:", sums["joint"])
    print("coverage", sums["coverage_mean"])
    print("per-grasp means: transl %.5f rot %.4f joint %.4f (n_pred=%d)"
          % (sums["transl_mean"], sums["rot_mean"], sums["joint_mean"],
             sums["n_pred"]))
    print(f"invalid output is: {sums['num_nan']}/{sums['n']}")
    return sums


def sweep(args):
    """Multi-epoch CSV sweep (reference eval.py:407-426): re-run the MAGD
    protocol for every ``{epoch}_gen_net.npz`` in a run dir."""
    import csv
    import glob
    
    epochs = sorted(
        int(os.path.basename(p).split("_")[0])
        for p in glob.glob(os.path.join(args.sweep_dir, "*_gen_net.npz")))
    eva_epochs = sorted(
        int(os.path.basename(p).split("_")[0])
        for p in glob.glob(os.path.join(args.sweep_dir, "*_eva_net.npz")))
    eva_path = (os.path.join(args.sweep_dir, f"{eva_epochs[-1]}_eva_net.npz")
                if eva_epochs else None)
    out_csv = args.sweep_dir.rstrip("/") + "_metrics.csv"
    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["epoch", "transl_loss_sum", "rot_loss_sum",
                    "joint_loss_sum", "coverage_mean"])
        for epoch in epochs:
            print("Evaluating epoch:", epoch)
            sub = argparse.Namespace(**vars(args))
            sub.gen = os.path.join(args.sweep_dir, f"{epoch}_gen_net.npz")
            sub.eva = eva_path
            sub.sweep_dir = None
            sums = _run_single(sub)
            w.writerow([epoch, sums["transl"], sums["rot"], sums["joint"],
                        sums["coverage"] / max(sums["n"], 1)])
    print("wrote", out_csv)



