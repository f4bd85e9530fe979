"""Refinement + filtering quality study, grounded in the geometric oracle.

The reference claims grasp refinement by evaluator ascent
(``dexgangrasp.py:619-660``) improves grasps but never measures it; the
synthetic dataset's oracle (data/grasp_geometry.py) lets us measure the
TRUE success rate of generated / filtered / refined grasps against each
eval view's full object surface (``full_pcd/`` sidecar files written by
the builder).  Reported per configuration:

- oracle success rate (the ground-truth quality metric),
- mean evaluator score (what refinement actually ascends),
both for: raw generated grasps, 3-stage-filtered survivors, gradient-
refined, and sampling-refined grasps (both engine/refine.py modes).

Usage:
    python -m dexgangrasp_tpu.tools.refine_study --data-dir /tmp/dexgg_big \
        --model diffusion --gen runs/diffusion_study/40000_diffusion_net.npz \
        --eva runs/eval_study/150000_eva_net.npz
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _oracle_rate(full_cloud, transl, rot):
    from dexgangrasp_tpu.data.grasp_geometry import grasp_outcomes

    out = grasp_outcomes(full_cloud, np.asarray(transl), np.asarray(rot))
    return float(out["success"].mean())


def run_refine_study(data_dir: str, gen_ckpt, eva_ckpt, model: str = "gan",
                     n_samples: int = 200, refine_steps: int = 10,
                     out_dir: str = "runs/refine_study", seed: int = 0,
                     guidance_scale: float = 0.0) -> dict:
    import jax
    import jax.numpy as jnp

    from dexgangrasp_tpu.cli import load_engine, run_filter
    from dexgangrasp_tpu.core.rotations import project_to_so3
    from dexgangrasp_tpu.data.datasets import DexGeneratorDataSet
    from dexgangrasp_tpu.engine.refine import (
        refine_grasps_gradient,
        refine_grasps_sampling,
    )

    os.makedirs(out_dir, exist_ok=True)
    basis = os.path.join(data_dir, "basis_point_set.npy")
    engine = load_engine(gen_ckpt, eva_ckpt,
                         basis if os.path.isfile(basis) else None,
                         model=model)
    dset = DexGeneratorDataSet(data_dir, "eval")
    unique_bps = sorted(set(dset.bps_paths))

    agg = {k: [] for k in ("raw_oracle", "raw_score",
                           "filtered_oracle", "filtered_score",
                           "grad_oracle", "grad_score",
                           "samp_oracle", "samp_score", "filter_pass",
                           "guided_oracle", "guided_score")}
    use_guidance = guidance_scale and model == "diffusion"
    skipped = 0
    for bps_path in unique_bps:
        stem = os.path.split(bps_path)[1].replace("bps", "pcd")
        full_path = os.path.join(data_dir, "full_pcd",
                                 stem.replace(".npy", "") + ".npy")
        if not os.path.isfile(full_path):
            skipped += 1
            continue
        full_cloud = np.load(full_path)
        bps = np.load(bps_path).ravel()

        g = engine.generate_grasps(bps, n_samples=n_samples, seed=seed)
        agg["raw_oracle"].append(_oracle_rate(full_cloud, g["transl"],
                                              g["rot_matrix"]))
        agg["raw_score"].append(float(np.mean(g["score"])))

        if use_guidance:
            gg = engine.generate_grasps(bps, n_samples=n_samples, seed=seed,
                                        guidance_scale=guidance_scale)
            agg["guided_oracle"].append(
                _oracle_rate(full_cloud, gg["transl"], gg["rot_matrix"]))
            agg["guided_score"].append(float(np.mean(gg["score"])))

        try:
            f, _ = run_filter(engine, bps, g, n_samples,
                              [0.5, 0.75, 0.90], False, verbose=False)
            agg["filtered_oracle"].append(
                _oracle_rate(full_cloud, f["transl"], f["rot_matrix"]))
            agg["filtered_score"].append(float(np.mean(f["score"])))
            agg["filter_pass"].append(
                f["transl"].shape[0] / float(n_samples))
        except ValueError:
            agg["filter_pass"].append(0.0)

        eva_folded = engine.eva_folded
        bps_j = jnp.asarray(bps, jnp.float32)
        rot = jnp.asarray(g["rot_matrix"], jnp.float32)
        transl = jnp.asarray(g["transl"], jnp.float32)
        joints = jnp.asarray(g["joint_conf"], jnp.float32)

        r_rot, r_transl, _, traj = refine_grasps_gradient(
            eva_folded, bps_j, rot, transl, joints, num_steps=refine_steps)
        r_rot = project_to_so3(r_rot)
        agg["grad_oracle"].append(_oracle_rate(full_cloud, r_transl, r_rot))
        agg["grad_score"].append(float(np.asarray(traj[-1]).mean()))

        s_rot, s_transl, _, s_traj = refine_grasps_sampling(
            eva_folded, bps_j, rot, transl, joints,
            jax.random.PRNGKey(seed + 1), num_steps=refine_steps)
        agg["samp_oracle"].append(_oracle_rate(full_cloud, s_transl, s_rot))
        agg["samp_score"].append(float(np.asarray(s_traj[-1]).mean()))

    report = {k: float(np.mean(v)) if v else None for k, v in agg.items()}
    report.update(n_views=len(unique_bps) - skipped, skipped=skipped,
                  n_samples=n_samples, refine_steps=refine_steps,
                  model=model, gen=gen_ckpt, eva=eva_ckpt,
                  guidance_scale=guidance_scale)
    with open(os.path.join(out_dir, "report.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/dexgg_big")
    ap.add_argument("--gen", required=True)
    ap.add_argument("--eva", default=None)
    ap.add_argument("--model", default="gan",
                    choices=["gan", "vae", "diffusion"])
    ap.add_argument("--n-samples", type=int, default=200)
    ap.add_argument("--refine-steps", type=int, default=10)
    ap.add_argument("--guidance-scale", type=float, default=0.0,
                    help="diffusion-only: evaluator-guided DDIM study")
    ap.add_argument("--out", default="runs/refine_study")
    args = ap.parse_args()
    run_refine_study(args.data_dir, args.gen, args.eva, model=args.model,
                     n_samples=args.n_samples,
                     refine_steps=args.refine_steps, out_dir=args.out,
                     guidance_scale=args.guidance_scale)


if __name__ == "__main__":
    main()
