"""Affordance-ranking quality study with a deterministic part oracle
(VERDICT r4 #6).

The reference's DexAfford-Prompt path ranks grasps by distance to a
VLPart/MLLM part mask's centroid (``filter_grasps_given_mask.py:84-138``)
— but the repo replicates the mask *plumbing* only (the VLPart model is a
host-side scope-out, BASELINE.md), so the ranking's *quality* was never
measured: does part-conditioning actually pick grasps ON the part, and
what does it cost in oracle success?

This study closes that loop without any GPU segmentation model, using a
**geometric part oracle** on synthetic scenes:

1. Build a superquadric object; define the part as the surface region at
   the positive end of its longest principal axis (a "rim/handle end" —
   deterministic from geometry alone).
2. Render the scene exactly as the offline replay consumes it
   (``apps/afford_offline.py``): a pinhole depth image + part mask + the
   visible point cloud (min-depth z-buffer over the rig intrinsics).
3. Run the FULL offline affordance path (`run_afford_offline`: depth+mask
   reprojection -> BPS encode -> generate 400 -> part-rank top-30 ->
   evaluator sort) and an unranked baseline (same 400 grasps by the same
   seed, evaluator sort only).
4. Score both top-k selections with the geometric gripper oracle
   (``data/grasp_geometry.py``):

   - **part_hit_rate** — fraction of selected grasps whose finger-sweep
     contacts are majority part points (the grasp actually lands on the
     part),
   - **oracle success** — plain `grasp_outcomes` success (what ranking
     costs/buys in grasp quality),
   - **dist_to_part** — mean translation distance to the part centroid.

Usage:
    python -m dexgangrasp_tpu.tools.afford_study \
        --gen runs/gan_study/20000_gen_net.npz \
        --eva runs/eval_study/150000_eva_net.npz \
        --basis /tmp/dexgg_big/basis_point_set.npy \
        --n-scenes 16 --out runs/afford_study
"""
from __future__ import annotations

import argparse
import json
import os
import tempfile
from typing import Dict, Optional, Tuple

import numpy as np

from dexgangrasp_tpu.apps.afford_offline import (
    DEFAULT_INTRINSICS,
    run_afford_offline,
)
from dexgangrasp_tpu.data.grasp_geometry import (
    DEFAULT_GRIPPER,
    GripperParams,
    grasp_outcomes,
)


# ------------------------------------------------------------ scene synth

def make_part_object(rng: np.random.Generator, n_points: int = 4096,
                     part_quantile: float = 0.72, taper: float = 0.0
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Superquadric surface + deterministic part labels.

    The part is the cap beyond ``part_quantile`` of the extent along the
    longest semi-axis — the geometric analogue of "the rim/handle end"
    (what a VLPart 'handle'/'rim' mask would segment on a mug-like
    object).  Returns (cloud (N,3) object frame, part (N,) bool).

    ``taper`` (0..~0.6) shrinks the cross-section linearly toward the
    part end, so the labeled end is the geometrically NARROW one.  The
    plain superquadric is centrally symmetric (every term of the
    parameterization is odd under (u,v) negation), so its two long-axis
    caps are congruent and, after a uniform random pose, *no* appearance
    model can tell which carries the label — an appearance-based
    segmenter is capped at a coin flip between the ends.  Real "parts"
    (handles, spouts, rims) are geometrically distinct; ``taper`` models
    that while keeping the rule that the label itself never enters the
    rendering.  Default 0.0 preserves the original symmetric shapes
    (and the published afford_study numbers) bit-exactly.
    """
    ax = rng.uniform(0.035, 0.09, size=3)
    ax[np.argmax(ax)] = rng.uniform(0.07, 0.10)  # pronounced long axis
    eps = rng.uniform(0.4, 1.4, size=2)
    u = rng.uniform(-np.pi / 2, np.pi / 2, n_points)
    v = rng.uniform(-np.pi, np.pi, n_points)

    def sgnpow(x, p):
        return np.sign(x) * np.abs(x) ** p

    x = ax[0] * sgnpow(np.cos(u), eps[0]) * sgnpow(np.cos(v), eps[1])
    y = ax[1] * sgnpow(np.cos(u), eps[0]) * sgnpow(np.sin(v), eps[1])
    z = ax[2] * sgnpow(np.sin(u), eps[0])
    pts = np.stack([x, y, z], axis=1).astype(np.float64)
    pts -= pts.mean(0)

    axis = int(np.argmax(ax))
    coord = pts[:, axis]
    lo, hi = coord.min(), coord.max()
    part = coord > lo + part_quantile * (hi - lo)
    if taper:
        tnorm = (coord - lo) / (hi - lo)
        scale = 1.0 - taper * tnorm
        for j in range(3):
            if j != axis:
                pts[:, j] *= scale
        pts -= pts.mean(0)
    return pts.astype(np.float32), part


def render_scene(cloud_obj: np.ndarray, part: np.ndarray,
                 rng: np.random.Generator,
                 intrinsics: Dict = DEFAULT_INTRINSICS,
                 hw: Tuple[int, int] = (720, 1280),
                 cam_dist: float = 0.55,
                 min_part_pixels: int = 40,
                 max_tries: int = 16) -> Optional[Dict]:
    """Pose the object in front of the pinhole camera and z-buffer it into
    the offline-replay frame format (depth mm + part mask + visible pcd).

    Retries camera orientations until enough part pixels are visible
    (a real operator aims the camera at the part); None if it never is.
    """
    from scipy.spatial.transform import Rotation as _Rot

    H, W = hw
    for _ in range(max_tries):
        R = _Rot.random(random_state=int(rng.integers(0, 2 ** 31))
                        ).as_matrix()
        t = np.array([0.0, 0.0, cam_dist])
        pts_cam = cloud_obj @ R.T + t

        u = (pts_cam[:, 0] / pts_cam[:, 2] * intrinsics["fx"]
             + intrinsics["cx"]).round().astype(int)
        v = (pts_cam[:, 1] / pts_cam[:, 2] * intrinsics["fy"]
             + intrinsics["cy"]).round().astype(int)
        ok = (u >= 0) & (u < W) & (v >= 0) & (v < H)
        if not ok.all():
            continue

        # z-buffer: nearest point wins each pixel (sort by depth, keep the
        # first occurrence of every pixel id)
        flat = v * W + u
        order = np.argsort(pts_cam[:, 2])  # near first
        _, first_pos = np.unique(flat[order], return_index=True)
        win = order[first_pos]                      # visible point indices

        depth = np.zeros((H, W), np.float32)
        depth[v[win], u[win]] = pts_cam[win, 2] * 1000.0  # mm
        mask = np.zeros((H, W), bool)
        pw = win[part[win]]
        mask[v[pw], u[pw]] = True
        if mask.sum() < min_part_pixels:
            continue
        return {
            "depth": depth, "mask": mask,
            "points": pts_cam[win].astype(np.float32),   # visible pcd
            "full_cam": pts_cam.astype(np.float32),      # oracle geometry
            "part_cam": part,                             # per-full-point
        }
    return None


def save_frame(scene: Dict, save_path: str, index: str = "0000") -> None:
    os.makedirs(save_path, exist_ok=True)
    np.save(os.path.join(save_path, f"depth_{index}.npy"), scene["depth"])
    np.save(os.path.join(save_path, f"mask_{index}.npy"), scene["mask"])
    np.save(os.path.join(save_path, f"pcd_{index}.npy"), scene["points"])


# ------------------------------------------------------------ part metric

def part_hit_fraction(cloud: np.ndarray, part: np.ndarray,
                      transl: np.ndarray, rot: np.ndarray,
                      params: GripperParams = DEFAULT_GRIPPER
                      ) -> np.ndarray:
    """Per grasp: fraction of finger-sweep contact points that are part
    points (0 when the sweep touches nothing).  Same sweep volume as
    ``grasp_outcomes`` (grasp_geometry.py:83)."""
    cloud = np.asarray(cloud, np.float64)
    transl = np.atleast_2d(np.asarray(transl, np.float64))
    rot = np.asarray(rot, np.float64).reshape(-1, 3, 3)
    rel = cloud[None, :, :] - transl[:, None, :]
    q = np.einsum("gni,gij->gnj", rel, rot)
    xq = q[..., 0]
    r = np.hypot(q[..., 1], q[..., 2])
    sweep = ((xq >= params.close_min) & (xq <= params.close_max)
             & (r < params.grip_radius))
    total = sweep.sum(axis=1)
    on_part = (sweep & part[None, :]).sum(axis=1)
    return np.where(total > 0, on_part / np.maximum(total, 1), 0.0)


def score_selection(tag: str, grasps: Dict, full_centered: np.ndarray,
                    part: np.ndarray, part_centroid: np.ndarray) -> Dict:
    t = np.asarray(grasps["transl"])
    R = np.asarray(grasps["rot_matrix"])
    out = grasp_outcomes(full_centered, t, R)
    hit = part_hit_fraction(full_centered, part, t, R)
    d = np.linalg.norm(t - part_centroid.reshape(1, 3), axis=1)
    return {
        "tag": tag,
        "n": int(t.shape[0]),
        "success_rate": float(out["success"].mean()),
        "part_hit_rate": float((hit >= 0.5).mean()),
        "part_contact_frac": float(hit.mean()),
        "dist_to_part_m": float(d.mean()),
    }


# ------------------------------------------------------------------ study

def run_study(engine, n_scenes: int, n_samples: int, top_k: int,
              final_k: int, seed: int, workdir: str) -> Dict:
    rng = np.random.default_rng(seed)
    rows = []
    for si in range(n_scenes):
        cloud_obj, part = make_part_object(rng)
        scene = render_scene(cloud_obj, part, rng)
        if scene is None:
            continue
        frame_dir = os.path.join(workdir, f"scene_{si:04d}")
        save_frame(scene, frame_dir)

        res = run_afford_offline(engine, frame_dir, "0000",
                                 n_samples=n_samples, top_k=top_k,
                                 seed=seed + 1000 + si)
        pc_center = res["pc_center"]
        full_centered = scene["full_cam"] - pc_center.reshape(1, 3)
        part_flags = scene["part_cam"]
        ranked = {k: np.asarray(v)[:final_k]
                  for k, v in res["grasps"].items()
                  if isinstance(v, (np.ndarray, list)) and k != "n_valid"}

        # unranked baseline: SAME candidate draw (same explicit seed),
        # evaluator sort only, same final_k
        visible_centered = scene["points"] - pc_center.reshape(1, 3)
        bps = np.asarray(engine.encode_pcd(visible_centered))
        g_all = engine.generate_grasps(bps, n_samples,
                                       seed=seed + 1000 + si)
        base = engine.filter_grasps(bps, g_all, thresh=-1.0)
        base = {k: np.asarray(v)[:final_k] for k, v in base.items()
                if isinstance(v, (np.ndarray, list)) and k != "n_valid"}

        row = {
            "scene": si,
            "n_part_points": int(res["n_part_points"]),
            "ranked": score_selection("part-ranked", ranked, full_centered,
                                      part_flags, res["part_centroid"]),
            "baseline": score_selection("unranked", base, full_centered,
                                        part_flags, res["part_centroid"]),
        }
        rows.append(row)
        print(f"scene {si}: ranked hit={row['ranked']['part_hit_rate']:.2f}"
              f" succ={row['ranked']['success_rate']:.2f} | "
              f"base hit={row['baseline']['part_hit_rate']:.2f}"
              f" succ={row['baseline']['success_rate']:.2f}")

    agg = {}
    for side in ("ranked", "baseline"):
        for key in ("success_rate", "part_hit_rate", "part_contact_frac",
                    "dist_to_part_m"):
            agg[f"{side}_{key}"] = round(
                float(np.mean([r[side][key] for r in rows])), 4)
    agg["n_scenes"] = len(rows)
    return {"aggregate": agg, "scenes": rows}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", default="runs/gan_study/20000_gen_net.npz")
    ap.add_argument("--eva", default="runs/eval_study/150000_eva_net.npz")
    ap.add_argument("--basis", default="/tmp/dexgg_big/basis_point_set.npy")
    ap.add_argument("--model", default="gan")
    ap.add_argument("--n-scenes", type=int, default=16)
    ap.add_argument("--n-samples", type=int, default=400)
    ap.add_argument("--top-k", type=int, default=30)
    ap.add_argument("--final-k", type=int, default=10,
                    help="grasps actually shipped to the robot "
                    "(reference dexafford_prompt.py:216 takes top-10)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="runs/afford_study")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dexgangrasp_tpu.cli import load_engine

    engine = load_engine(args.gen, args.eva, args.basis, model=args.model)
    with tempfile.TemporaryDirectory(prefix="afford_study_") as wd:
        rep = run_study(engine, args.n_scenes, args.n_samples, args.top_k,
                        args.final_k, args.seed, wd)
    rep["config"] = {k: getattr(args, k) for k in
                     ("gen", "eva", "basis", "model", "n_scenes",
                      "n_samples", "top_k", "final_k", "seed")}

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "report.json")
    with open(path, "w") as f:
        json.dump(rep, f, indent=2)
    a = rep["aggregate"]
    print("\n| selection | part-hit | part-contact | success | "
          "dist-to-part (m) |")
    print("|---|---|---|---|---|")
    for side in ("ranked", "baseline"):
        print(f"| {side} | {a[side + '_part_hit_rate']:.3f} "
              f"| {a[side + '_part_contact_frac']:.3f} "
              f"| {a[side + '_success_rate']:.3f} "
              f"| {a[side + '_dist_to_part_m']:.4f} |")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
