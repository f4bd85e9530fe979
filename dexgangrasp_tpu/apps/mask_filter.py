"""Part-mask grasp ranking (DexAfford-Prompt selection stage).

numpy port of ``DexGanGrasp/utils/filter_grasps_given_mask.py``: mask the
object cloud to the VLPart-predicted part, clip to the ±0.2 m workspace
box, rank grasps by distance to the part centroid, keep the top-k.  No
open3d / debug-file dependencies (the reference hardcodes a ``./obj.pcd``
read and a blocking viewer; those were debug cruft).
"""
from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np


def part_points_from_mask(obj_pcd_np: np.ndarray, mask: np.ndarray,
                          mask_shape: Tuple[int, ...],
                          pc_center: np.ndarray) -> np.ndarray:
    """Organized object cloud + (H, W) bool part mask → centered, clipped
    part points (reference filter_grasps_given_mask.py:95-104)."""
    if mask.ndim == 3:
        mask = mask[0]
    part = obj_pcd_np.reshape(mask_shape)[mask]
    part = part - np.asarray(pc_center).reshape(1, 3)
    for axis in (2, 1, 0):
        part = part[np.abs(part[:, axis]) < 0.2]
    return part


def rank_grasps_by_part(grasps: Dict, part_points: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (sorted_grasp_indices, part_centroid (1,3)); nearest first
    (reference :115-130).

    Raises ValueError on an empty part cloud (the reference silently
    produces a NaN centroid and NaN-sorts all grasps)."""
    if part_points.shape[0] == 0:
        raise ValueError(
            "empty part cloud after workspace clipping — the mask matched "
            "no points within ±0.2 m of the object center")
    centroid = part_points.mean(axis=0).reshape(1, 3)
    d2 = ((np.asarray(grasps["transl"]) - centroid) ** 2).sum(axis=1)
    return np.argsort(d2), centroid


def load_mask_for_image(image_path: str) -> np.ndarray:
    """``color_####`` image path → sibling ``mask_####.npy``
    (reference :86-93)."""
    directory = os.path.dirname(image_path)
    fname = os.path.basename(image_path)
    index = fname[fname.find("color_") + 6:fname.find("color_") + 10]
    masks = np.load(os.path.join(directory, f"mask_{index}.npy"))
    return masks[0] if masks.ndim == 3 else masks


def filter_grasps_given_mask(grasps: Dict, obj_pcd_np: np.ndarray,
                             mask_shape, image_path: str,
                             pc_center) -> Tuple[np.ndarray, np.ndarray]:
    """Reference-compatible entry (filter_grasps_given_mask.py:84-130)."""
    mask = load_mask_for_image(image_path)
    part = part_points_from_mask(obj_pcd_np, mask, mask_shape, pc_center)
    return rank_grasps_by_part(grasps, part)


def filter_grasps_given_mask_offline(grasps: Dict, part_pcd_np: np.ndarray,
                                     pc_center) -> Tuple[np.ndarray, np.ndarray]:
    """Offline variant: the part cloud is already extracted
    (reference :32-82)."""
    part = part_pcd_np - np.asarray(pc_center).reshape(1, 3)
    for axis in (2, 1, 0):
        part = part[np.abs(part[:, axis]) < 0.2]
    return rank_grasps_by_part(grasps, part)


def sort_grasps(grasps: Dict, sorted_idx: np.ndarray, sort_num: int) -> Dict:
    """Slice the top-k grasps in ranked order (reference :134-138)."""
    out = dict(grasps)
    for k in ("transl", "joint_conf", "rot_matrix", "score", "z"):
        if k in out and out[k] is not None:
            out[k] = np.asarray(out[k])[sorted_idx][:sort_num]
    return out
