"""DexAfford-Prompt offline replay — counterpart of
``dexafford_prompt_offline.py``.

Replays saved frames (``color_####.png``, ``depth_####.npy``,
``mask_####.npy``, ``pcd_####.npy`` under a save dir): reconstructs the
part cloud by masking the depth image and reprojecting through the pinhole
intrinsics (reference :138-168), encodes the object cloud, generates
grasps, ranks by part-centroid distance (top-30), then evaluator-sorts
with thresh=-1 (keep all, reference :191-198).
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

from dexgangrasp_tpu.apps.mask_filter import (
    filter_grasps_given_mask_offline,
    sort_grasps,
)

# Rig camera intrinsics used by the reference's replay
# (dexafford_prompt_offline.py:50-55 camera_matrix)
DEFAULT_INTRINSICS = dict(fx=952.828, fy=952.828, cx=646.699, cy=342.637)


def depth_mask_to_points(depth: np.ndarray, mask: np.ndarray,
                         intrinsics: Dict = DEFAULT_INTRINSICS,
                         depth_scale: float = 1e-3) -> np.ndarray:
    """Masked depth image → 3D points in the camera frame via the pinhole
    model (reference :138-168)."""
    if mask.ndim == 3:
        mask = mask[0]
    v, u = np.nonzero(mask & (depth > 0))
    z = depth[v, u].astype(np.float64) * depth_scale
    x = (u - intrinsics["cx"]) * z / intrinsics["fx"]
    y = (v - intrinsics["cy"]) * z / intrinsics["fy"]
    return np.stack([x, y, z], axis=1)


def load_frame(save_path: str, index: str) -> Dict:
    """Load one saved frame set by 4-digit index."""
    def p(prefix, ext):
        return os.path.join(save_path, f"{prefix}_{index}.{ext}")

    frame = {}
    if os.path.isfile(p("depth", "npy")):
        frame["depth"] = np.load(p("depth", "npy"))
    if os.path.isfile(p("mask", "npy")):
        frame["mask"] = np.load(p("mask", "npy"))
    if os.path.isfile(p("pcd", "npy")):
        frame["points"] = np.load(p("pcd", "npy"))
    elif os.path.isfile(p("pcd", "pcd")):
        from dexgangrasp_tpu.utils.pcd import load_pcd

        frame["points"] = load_pcd(p("pcd", "pcd"))
    return frame


def run_afford_offline(engine, save_path: str, index: str,
                       n_samples: int = 400, top_k: int = 30,
                       intrinsics: Dict = DEFAULT_INTRINSICS,
                       seed: int = None) -> Dict:
    """Full offline affordance pipeline for one frame; returns the final
    evaluator-sorted grasp dict (camera-centroid frame) plus part info."""
    frame = load_frame(save_path, index)
    obj_points = frame["points"]
    pc_center = obj_points.mean(axis=0)

    # part cloud from depth+mask reprojection (falls back to the mask
    # applied to the organized cloud if no depth was saved)
    if "depth" in frame and "mask" in frame:
        part_points = depth_mask_to_points(frame["depth"], frame["mask"],
                                           intrinsics)
    else:
        part_points = obj_points

    centered = obj_points - pc_center
    bps = engine.encode_pcd(centered)
    grasps = engine.generate_grasps(np.asarray(bps), n_samples, seed=seed)

    ranked_idx, part_centroid = filter_grasps_given_mask_offline(
        grasps, part_points, pc_center)
    top = sort_grasps(grasps, ranked_idx, top_k)

    # evaluator as final ranker: thresh=-1 keeps all, sorted by score
    final = engine.filter_grasps(np.asarray(bps), top, thresh=-1.0)
    return {"grasps": final, "part_centroid": part_centroid,
            "pc_center": pc_center, "n_part_points": part_points.shape[0]}


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--save-path", required=True)
    ap.add_argument("--index", default="0000")
    ap.add_argument("--gen", default=None)
    ap.add_argument("--eva", default=None)
    ap.add_argument("--n-samples", type=int, default=400)
    args = ap.parse_args()

    from dexgangrasp_tpu import cli as eval_cli

    engine = eval_cli.load_engine(args.gen, args.eva)
    out = run_afford_offline(engine, args.save_path, args.index,
                             n_samples=args.n_samples)
    print(f"part points: {out['n_part_points']}, "
          f"final grasps: {out['grasps']['rot_matrix'].shape[0]}")


if __name__ == "__main__":
    main()
