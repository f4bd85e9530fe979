"""Production-recipe study: guided DDIM + the reference's 3-stage filter,
true-success measured against the geometric oracle on every eval view.

This is the reproducible form of the round-2 study behind
runs/best_pipeline.json (docs/RESULTS.md "Production recipe"): sample
``--n`` guided grasps per eval view, measure oracle success of the raw
guided set and of the 3-stage-filtered set ([0.5, 0.75, 0.90] — reference
``eval.py:274-276`` / ``dexgangrasp_offline.py:190``), and record yield.

Usage:
    python -m dexgangrasp_tpu.tools.best_pipeline \
        --data-dir /tmp/dexgg_4x \
        --diff runs/flagship_4x/40000_diffusion_net.npz \
        --eva runs/flagship_4x/60000_eva_net.npz \
        --out runs/flagship_4x/best_pipeline.json
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def run(data_dir: str, diff_ckpt: str, eva_ckpt: str, out_path: str,
        n: int = 200, steps: int = 10, scale: float = 10.0,
        thresh=(0.5, 0.75, 0.90), use_guided_kernel: bool = False,
        refine_steps: int = 0, seed: int = 0, model: str = "diffusion"):
    """``model='diffusion'`` (default) measures the guided-DDIM frontier;
    ``model='vae'`` / ``'gan'`` measures the same recipe with the cVAE
    decoder / cGAN generator as the sampler (no guidance — their one-shot
    samplers have no score-ascent hook; refinement + filter still apply),
    giving the head-to-head serving-default comparison (VERDICT r3
    next-4).  ``model='student'`` measures the distilled one-step sampler
    (train/distill.py) the same one-shot way."""
    from dexgangrasp_tpu.cli import load_engine, run_filter
    from dexgangrasp_tpu.data.datasets import DexGeneratorDataSet
    from dexgangrasp_tpu.data.grasp_geometry import grasp_outcomes

    engine = load_engine(diff_ckpt, eva_ckpt,
                         os.path.join(data_dir, "basis_point_set.npy"),
                         model=model,
                         guidance_scale=scale if model == "diffusion"
                         else 0.0)
    if model == "diffusion":
        engine.ddim_steps = steps
        engine.use_ddim_kernel = False
        engine.use_guided_kernel = use_guided_kernel

    dset = DexGeneratorDataSet(data_dir, "eval")
    views = sorted(set(dset.bps_paths))
    rates, frates, passes, rrates, rfrates, rpasses = [], [], [], [], [], []
    for bp in views:
        stem = os.path.split(bp)[1].replace("bps", "pcd").replace(".npy", "")
        full = np.load(os.path.join(data_dir, "full_pcd", stem + ".npy"))
        bps = np.load(bp).ravel()
        g = engine.generate_grasps(bps, n_samples=n, seed=seed)
        rates.append(float(grasp_outcomes(
            full, np.asarray(g["transl"]),
            np.asarray(g["rot_matrix"]))["success"].mean()))
        try:
            f, _ = run_filter(engine, bps, g, n, list(thresh), False,
                              verbose=False)
            frates.append(float(grasp_outcomes(
                full, np.asarray(f["transl"]),
                np.asarray(f["rot_matrix"]))["success"].mean()))
            passes.append(f["transl"].shape[0] / float(n))
        except ValueError:  # best grasp below threshold: zero yield view
            passes.append(0.0)

        if refine_steps:
            # composed frontier THROUGH THE PRODUCT PATH: same seed →
            # identical sampler draw, then the engine's fused refine +
            # SO(3) projection + rescore (what serving actually emits)
            engine.refine_steps = refine_steps
            rg = engine.generate_grasps(bps, n_samples=n, seed=seed)
            engine.refine_steps = 0
            rrates.append(float(grasp_outcomes(
                full, rg["transl"], rg["rot_matrix"])["success"].mean()))
            try:
                rf, _ = run_filter(engine, bps, rg, n, list(thresh),
                                   False, verbose=False)
                rfrates.append(float(grasp_outcomes(
                    full, np.asarray(rf["transl"]),
                    np.asarray(rf["rot_matrix"]))["success"].mean()))
                rpasses.append(rf["transl"].shape[0] / float(n))
            except ValueError:
                rpasses.append(0.0)

    # filtered-oracle semantics: the mean runs over views that actually
    # served grasps (zero-yield views have no success to average); yield
    # (*_pass) runs over ALL views.  NaN-safe when every view zero-yields.
    fmean = lambda xs: round(float(np.mean(xs)), 4) if xs else 0.0
    rep = {"pipeline": (f"guided DDIM-{steps} (scale {scale}) + 3-stage "
                        "filter" if model == "diffusion"
                        else f"{model} sampler + 3-stage filter"),
           "model": model,
           "data_dir": data_dir, "diff_ckpt": diff_ckpt, "eva_ckpt": eva_ckpt,
           "use_guided_kernel": use_guided_kernel,
           "guided_oracle": fmean(rates),
           "guided_filtered_oracle": fmean(frates),
           "filtered_views": len(frates),
           "filter_pass": fmean(passes),
           "n_views": len(views)}
    if refine_steps:
        rep["refine_steps"] = refine_steps
        rep["guided_refined_oracle"] = fmean(rrates)
        rep["guided_refined_filtered_oracle"] = fmean(rfrates)
        rep["refined_filtered_views"] = len(rfrates)
        rep["refined_filter_pass"] = fmean(rpasses)
    print(json.dumps(rep), flush=True)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(rep, f, indent=1)
    return rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/dexgg_big")
    ap.add_argument("--diff", required=True)
    ap.add_argument("--eva", required=True)
    ap.add_argument("--out", default="runs/best_pipeline.json")
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--scale", type=float, default=10.0)
    ap.add_argument("--guided-kernel", action="store_true")
    ap.add_argument("--refine-steps", type=int, default=0,
                    help="also measure + filter after this many "
                         "evaluator-gradient refinement steps")
    ap.add_argument("--model", default="diffusion",
                    choices=("diffusion", "vae", "gan", "student"),
                    help="sampler family of --diff (vae/gan: one-shot "
                         "decoder, no guidance; refinement + filter "
                         "still compose)")
    args = ap.parse_args()
    run(args.data_dir, args.diff, args.eva, args.out, n=args.n,
        steps=args.steps, scale=args.scale,
        use_guided_kernel=args.guided_kernel,
        refine_steps=args.refine_steps, model=args.model)


if __name__ == "__main__":
    main()
