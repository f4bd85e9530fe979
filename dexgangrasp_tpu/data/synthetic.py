"""Synthetic dataset generator — exercises the full on-disk data contract.

The reference's training data (``robotiq_data_v2.0_full``: rendered bigbird/
kit object clouds + simulated grasp outcomes) is not redistributable, so the
framework ships a generator that produces a structurally identical dataset:

    data_dir/{metadata.csv, grasp_data_all.h5, pcd_transforms.h5,
              {train,eval}/{bps,pcd}/<obj>/...}

Objects are random superquadric-ish surfaces; positive grasps approach the
surface with palm x-axis toward the centroid (matching the z_offset back-off
convention); negatives are perturbed/displaced poses.  Labels are
*geometrically consistent* (a pose's label is a deterministic function of
its distance/orientation error), so the evaluator has real signal to learn
and end-to-end train/eval tests are meaningful, not noise-fitting.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
from scipy.spatial.transform import Rotation as _Rot

import jax

from dexgangrasp_tpu.data.grasp_store import write_grasp_h5
from dexgangrasp_tpu.ops.bps import BPSEncoder, generate_basis
from dexgangrasp_tpu.utils.pcd import save_pcd


def _superquadric_cloud(rng, n_points: int) -> np.ndarray:
    """Random convex-ish object surface, ~5-18 cm extent, centered."""
    ax = rng.uniform(0.03, 0.09, size=3)  # semi-axes
    eps = rng.uniform(0.4, 1.6, size=2)   # roundness
    u = rng.uniform(-np.pi / 2, np.pi / 2, n_points)
    v = rng.uniform(-np.pi, np.pi, n_points)

    def sgnpow(x, p):
        return np.sign(x) * np.abs(x) ** p

    x = ax[0] * sgnpow(np.cos(u), eps[0]) * sgnpow(np.cos(v), eps[1])
    y = ax[1] * sgnpow(np.cos(u), eps[0]) * sgnpow(np.sin(v), eps[1])
    z = ax[2] * sgnpow(np.sin(u), eps[0])
    pts = np.stack([x, y, z], axis=1)
    return (pts - pts.mean(0)).astype(np.float32)


def _grasp_label_params(rng, cloud: np.ndarray, n: int, positive: bool):
    """Sample grasp poses in the *centroid* frame.

    Positive: palm ~6-10 cm from a surface point, x-axis pointing at the
    centroid with ≤0.25 rad error, joints a smooth function of approach
    distance.  Negative: 1.5-3× that distance or ≥0.7 rad misaligned.
    """
    idx = rng.integers(0, cloud.shape[0], n)
    anchor = cloud[idx]
    dirs = anchor / np.maximum(np.linalg.norm(anchor, axis=1, keepdims=True),
                               1e-6)
    if positive:
        dist = rng.uniform(0.06, 0.10, (n, 1))
        ang_err = rng.uniform(0.0, 0.25, n)
    else:
        if rng.random() < 0.5:
            dist = rng.uniform(0.15, 0.30, (n, 1))
            ang_err = rng.uniform(0.0, 0.3, n)
        else:
            dist = rng.uniform(0.06, 0.10, (n, 1))
            ang_err = rng.uniform(0.7, 1.5, n)
    transl = anchor + dirs * dist
    # palm x-axis points from palm toward centroid (-transl direction)
    x_axis = -transl / np.linalg.norm(transl, axis=1, keepdims=True)
    # perturb by ang_err around a random orthogonal axis
    rand = rng.normal(size=(n, 3))
    ortho = np.cross(x_axis, rand)
    ortho /= np.maximum(np.linalg.norm(ortho, axis=1, keepdims=True), 1e-9)
    rot_err = _Rot.from_rotvec(ortho * ang_err[:, None])
    x_axis = rot_err.apply(x_axis)
    # build full frame: y from random, z = x×y orthonormalized
    y_raw = rng.normal(size=(n, 3))
    z_axis = np.cross(x_axis, y_raw)
    z_axis /= np.maximum(np.linalg.norm(z_axis, axis=1, keepdims=True), 1e-9)
    y_axis = np.cross(z_axis, x_axis)
    R = np.stack([x_axis, y_axis, z_axis], axis=2)  # columns
    joints = np.clip(
        0.2 + 3.0 * (dist - 0.06) + rng.normal(size=(n, 12)) * 0.05, 0.0, 1.2)
    return transl, R, joints


def build_synthetic_dataset(
        data_dir: str,
        n_objects: int = 8,
        views_per_object: int = 2,
        grasps_per_object: int = 24,
        points_per_cloud: int = 2048,
        eval_fraction: float = 0.25,
        basis: Optional[np.ndarray] = None,
        seed: int = 0) -> Dict:
    """Create the dataset tree; returns summary info."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    os.makedirs(data_dir, exist_ok=True)
    if basis is None:
        basis = np.asarray(generate_basis(jax.random.PRNGKey(seed)))
    np.save(os.path.join(data_dir, "basis_point_set.npy"), basis)
    encoder = BPSEncoder(basis=basis, cloud_pad=points_per_cloud)

    import h5py

    grasps_h5: Dict = {}
    tf_h5_path = os.path.join(data_dir, "pcd_transforms.h5")
    rows = []
    n_eval = max(1, int(round(n_objects * eval_fraction)))

    with h5py.File(tf_h5_path, "w") as tf_h5:
        for oi in range(n_objects):
            obj = f"syn_obj_{oi:03d}"
            split = "eval" if oi < n_eval else "train"
            cloud = _superquadric_cloud(rng, points_per_cloud)

            # mesh frame: centroid frame shifted/rotated by a random offset
            mesh_R = _Rot.random(rng=rng).as_matrix()
            mesh_t = rng.uniform(-0.05, 0.05, 3)
            centr_T_mesh = np.eye(4)
            centr_T_mesh[:3, :3] = mesh_R
            centr_T_mesh[:3, 3] = mesh_t
            mesh_T_centr = np.linalg.inv(centr_T_mesh)

            # grasps in centroid frame → store in mesh frame
            t_pos, R_pos, j_pos = _grasp_label_params(
                rng, cloud, grasps_per_object, True)
            t_neg, R_neg, j_neg = _grasp_label_params(
                rng, cloud, grasps_per_object, False)

            def to_mesh_posquat(t, R):
                Rm = np.einsum("ij,njk->nik", mesh_T_centr[:3, :3], R)
                tm = (mesh_T_centr[:3, :3] @ t.T).T + mesh_T_centr[:3, 3]
                q = _Rot.from_matrix(Rm).as_quat()  # xyzw
                return np.concatenate([tm, q], axis=1)

            grasps_h5[obj] = {
                "positive": (to_mesh_posquat(t_pos, R_pos), j_pos),
                "negative": (to_mesh_posquat(t_neg, R_neg), j_neg),
                "collision": (to_mesh_posquat(t_neg, R_neg)[:4], j_neg[:4]),
            }

            obj_tf = tf_h5.create_group(obj)
            bps_dir = os.path.join(data_dir, split, "bps", obj)
            pcd_dir = os.path.join(data_dir, split, "pcd", obj)
            os.makedirs(bps_dir, exist_ok=True)
            os.makedirs(pcd_dir, exist_ok=True)
            for vi in range(views_per_object):
                # single-view realism (the reference's clouds are one-camera
                # renders): keep the half of the surface facing a random
                # view direction, plus small pose jitter.  Near-identical
                # views would otherwise make every view's BPS an object-
                # identity signature — a shortcut that stalls evaluator
                # training (see docs/RESULTS.md).
                view_dir = rng.normal(size=3)
                view_dir /= np.linalg.norm(view_dir)
                visible = cloud @ view_dir < np.median(cloud @ view_dir)
                view_cloud = cloud[visible]
                view_R = _Rot.from_rotvec(
                    rng.normal(size=3) * 0.05).as_matrix()
                view_cloud = (view_R @ view_cloud.T).T.astype(np.float32)
                enc = encoder.encode(view_cloud, check_centered=True)
                stem = f"{obj}_bps{vi:03d}"
                np.save(os.path.join(bps_dir, stem + ".npy"),
                        enc[None].astype(np.float32))
                save_pcd(os.path.join(pcd_dir,
                                      f"{obj}_pcd{vi:03d}.pcd"), view_cloud)
                # mesh_to_centroid transform per view (pos + quat xyzw)
                q = _Rot.from_matrix(centr_T_mesh[:3, :3]).as_quat()
                obj_tf.create_dataset(
                    f"{obj}_pcd{vi:03d}_mesh_to_centroid",
                    data=np.concatenate([centr_T_mesh[:3, 3], q]))

            rows.append({"Unnamed: 0": obj, "positive": grasps_per_object,
                         "negative": grasps_per_object,
                         "train": "X" if split == "train" else "",
                         "eval": "X" if split == "eval" else ""})

    write_grasp_h5(os.path.join(data_dir, "grasp_data_all.h5"), grasps_h5)
    pd.DataFrame(rows).to_csv(os.path.join(data_dir, "metadata.csv"),
                              index=False)
    return {"n_objects": n_objects, "n_eval": n_eval,
            "data_dir": data_dir, "basis": basis}
