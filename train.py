#!/usr/bin/env python3
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
import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="YAML config path")
    ap.add_argument("--synthetic", default=None,
                    help="build+use a synthetic dataset at this dir")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--train-evaluator", action="store_true")
    ap.add_argument("--dp", action="store_true",
                    help="data-parallel over all visible devices")
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

    mesh = None
    if args.dp:
        from dexgangrasp_tpu.parallel.mesh import data_parallel_mesh

        mesh = data_parallel_mesh()
        print(f"data-parallel mesh over {mesh.devices.size} devices")

    from dexgangrasp_tpu.train.trainer import TrainDriver

    driver = TrainDriver(cfg, mesh=mesh)
    final = driver.run()
    print("final eval:", final)


if __name__ == "__main__":
    main()
