"""Offline inference app — counterpart of ``dexgangrasp_offline.py``.

For every canned real-scan object (``data/real_objects/bps/*.npy``):
generate ``n_samples`` grasps with the fused engine, run the 3-stage
evaluator filter at thresholds [0.5, 0.75, 0.90] (reference
``dexgangrasp_offline.py:27-92``), optionally visualize.  Non-interactive
by default (the reference blocks on stdin + o3d windows).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

DEFAULT_THRESHOLDS = [0.5, 0.75, 0.90]


def filter_stages(engine, bps, grasps: Dict, n_samples: int,
                  thresh_succ_list=DEFAULT_THRESHOLDS,
                  use_discriminator: bool = False,
                  verbose: bool = True) -> Dict:
    """3-stage progressive filter (reference eval.py:139-204 /
    dexgangrasp_offline.py:27-92).  Each stage re-filters the *original*
    set at a stricter threshold, like the reference."""
    out, n_filt = grasps, len(np.asarray(grasps["rot_matrix"]))
    for thresh in thresh_succ_list:
        out = engine.filter_grasps(bps, grasps, thresh=thresh,
                                   use_discriminator=use_discriminator)
        n_filt = out["rot_matrix"].shape[0]
        if verbose:
            print(f"n_grasps after filtering: {n_filt}")
            print(f"This means {n_filt / n_samples:.2f} of grasps pass "
                  "the filtering")
    return out


def eval_sampling_and_filtering_real(
        engine, real_objects_dir: str, n_samples: int = 1000,
        thresh_succ_list=DEFAULT_THRESHOLDS, seed: Optional[int] = 42,
        visualize: bool = False) -> Dict[str, Dict]:
    """Reference eval_dexgangrasp_sampling_and_filtering_real
    (dexgangrasp_offline.py:94-183): per object bps → sample → filter."""
    bps_dir = os.path.join(real_objects_dir, "bps")
    results = {}
    for fname in sorted(os.listdir(bps_dir)):
        if not fname.endswith(".npy"):
            continue
        obj = fname[:-4]
        bps = np.load(os.path.join(bps_dir, fname)).ravel()
        grasps = engine.generate_grasps(bps, n_samples, seed=seed)
        try:
            filtered = filter_stages(engine, bps, grasps, n_samples,
                                     thresh_succ_list)
        except ValueError as e:
            print(f"[{obj}] filter rejected everything: {e}")
            filtered = None
        results[obj] = {"grasps": grasps, "filtered": filtered}
        if visualize and filtered is not None:
            from dexgangrasp_tpu.utils import visualization as viz

            pcd_path = os.path.join(real_objects_dir, "object", obj + ".pcd")
            viz.show_generated_grasp_distribution(pcd_path, filtered)
    return results


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--real-objects",
                    default="/root/reference/data/real_objects")
    ap.add_argument("--gen", default=None)
    ap.add_argument("--eva", default=None)
    ap.add_argument("--n-samples", type=int, default=1000)
    ap.add_argument("--visualize", action="store_true")
    ap.add_argument("--model", default="gan",
                    choices=["gan", "vae", "diffusion", "student", "set"])
    ap.add_argument("--guidance-scale", type=float, default=0.0,
                    help="diffusion only: evaluator-guided DDIM strength")
    ap.add_argument("--refine-steps", type=int, default=0,
                    help="diffusion only: fused evaluator-gradient "
                         "refinement (composed-frontier recipe)")
    args = ap.parse_args()

    from dexgangrasp_tpu import cli as eval_cli  # reuse checkpoint loading

    engine = eval_cli.load_engine(args.gen, args.eva, model=args.model,
                                  guidance_scale=args.guidance_scale,
                                  refine_steps=args.refine_steps)
    results = eval_sampling_and_filtering_real(
        engine, args.real_objects, n_samples=args.n_samples,
        visualize=args.visualize)
    for obj, r in results.items():
        n = (r["filtered"]["rot_matrix"].shape[0]
             if r["filtered"] is not None else 0)
        print(f"{obj}: {n} grasps after final stage")


if __name__ == "__main__":
    main()
