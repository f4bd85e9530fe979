"""Synthetic dataset generator — exercises the full on-disk data contract.

The reference's training data (``robotiq_data_v2.0_full``: rendered bigbird/
kit object clouds + simulated grasp outcomes) is not redistributable, so the
framework ships a generator that produces a structurally identical dataset:

    data_dir/{metadata.csv, grasp_data_all.h5, pcd_transforms.h5,
              {train,eval}/{bps,pcd}/<obj>/...}

Objects are random superquadric-ish surfaces.  Grasp labels come from the
contact/collision oracle in ``data/grasp_geometry.py``: all candidate poses
are drawn from ONE distribution (palm offset outward from a random surface
anchor, approach axis pointing back at it with angular jitter) and the
label is the deterministic geometric outcome of closing a proxy gripper
at that pose — the analogue of the reference's simulation-grounded
outcomes.  Because the outcome depends on where the *surface* actually is,
the same pose flips label across objects of different extents: a success
classifier must use the BPS encoding, not pose statistics (the round-1
synthetic set was pose-separable, which stalled evaluator training —
VERDICT r1 §missing-1).

Hard negatives are the reference's ±3 cm / ±0.6 rad perturbations of
positives (``utils.py:217-244``) — but *re-labeled* by the oracle and only
kept if they actually fail, then stored under a ``hard_negative`` h5 group.
The reference labels every perturbation negative sight-unseen, which makes
a fraction of its hard negatives false (a 3 cm shift often still grasps);
grounded relabeling removes that ceiling on the measurable tn rate.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np
from scipy.spatial.transform import Rotation as _Rot

import jax

from dexgangrasp_tpu.data.grasp_geometry import (
    GripperParams,
    grasp_outcomes,
    joints_from_depth,
)
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


def _frames_from_x(rng, x_axis: np.ndarray) -> np.ndarray:
    """Complete (n, 3) unit x-axes into full frames with random roll;
    columns = palm axes."""
    n = x_axis.shape[0]
    y_raw = rng.normal(size=(n, 3))
    z_axis = np.cross(x_axis, y_raw)
    z_axis /= np.maximum(np.linalg.norm(z_axis, axis=1, keepdims=True), 1e-9)
    y_axis = np.cross(z_axis, x_axis)
    return np.stack([x_axis, y_axis, z_axis], axis=2)


def _sample_candidates(rng, cloud: np.ndarray, n: int
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """One candidate distribution for positives AND negatives: palm offset
    0-16 cm outward from a random surface anchor, approach axis pointing
    back at the anchor with U[0, 0.8] rad jitter, random roll."""
    idx = rng.integers(0, cloud.shape[0], n)
    anchor = cloud[idx]
    out_dir = anchor / np.maximum(
        np.linalg.norm(anchor, axis=1, keepdims=True), 1e-6)
    dist = rng.uniform(0.0, 0.16, (n, 1))
    transl = anchor + out_dir * dist
    x_axis = -out_dir
    ang_err = rng.uniform(0.0, 0.8, n)
    rand = rng.normal(size=(n, 3))
    ortho = np.cross(x_axis, rand)
    ortho /= np.maximum(np.linalg.norm(ortho, axis=1, keepdims=True), 1e-9)
    x_axis = _Rot.from_rotvec(ortho * ang_err[:, None]).apply(x_axis)
    return transl, _frames_from_x(rng, x_axis)


def _labeled_grasps(rng, cloud: np.ndarray, n_pos: int, n_neg: int,
                    gripper: GripperParams):
    """Sample candidates until the oracle yields n_pos successes and n_neg
    failures.  Returns (t, R, depth) per class."""
    pools = {True: ([], [], []), False: ([], [], [])}
    counts = {True: 0, False: 0}
    for _ in range(60):
        if counts[True] >= n_pos and counts[False] >= n_neg:
            break
        t, R = _sample_candidates(rng, cloud, 4 * (n_pos + n_neg))
        out = grasp_outcomes(cloud, t, R, gripper)
        for positive in (True, False):
            m = out["success"] == positive
            pools[positive][0].append(t[m])
            pools[positive][1].append(R[m])
            pools[positive][2].append(out["depth"][m])
            counts[positive] += int(m.sum())
    else:
        raise RuntimeError(
            "candidate sampler could not reach the per-class quota — "
            "object too small/large for the gripper proxy?")

    def take(positive, n):
        t = np.concatenate(pools[positive][0])[:n]
        R = np.concatenate(pools[positive][1])[:n]
        d = np.concatenate(pools[positive][2])[:n]
        if t.shape[0] < n:
            raise RuntimeError(f"only {t.shape[0]}/{n} "
                               f"{'pos' if positive else 'neg'} candidates")
        return t, R, d

    return take(True, n_pos), take(False, n_neg)


def _hard_negatives(rng, cloud: np.ndarray, t_pos: np.ndarray,
                    R_pos: np.ndarray, n_hard: int,
                    gripper: GripperParams):
    """Reference hard-negative convention (±3 cm / ±0.6 rad per axis with
    random signs, ``utils.py:217-244``) applied to positives — then
    RE-LABELED by the oracle; only true failures are kept."""
    t_out, R_out, d_out = [], [], []
    have = 0
    for _ in range(60):
        if have >= n_hard:
            break
        k = rng.integers(0, t_pos.shape[0], 2 * n_hard)
        sign = np.where(rng.random((2 * n_hard, 6)) < 0.5, -1.0, 1.0)
        delta = sign * np.array([0.03, 0.03, 0.03, 0.6, 0.6, 0.6])
        t = t_pos[k] + delta[:, :3]
        eul = _Rot.from_matrix(R_pos[k]).as_euler("xyz") + delta[:, 3:]
        R = _Rot.from_euler("xyz", eul).as_matrix()
        out = grasp_outcomes(cloud, t, R, gripper)
        m = ~out["success"]
        t_out.append(t[m])
        R_out.append(R[m])
        d_out.append(out["depth"][m])
        have += int(m.sum())
    t = np.concatenate(t_out)[:n_hard]
    R = np.concatenate(R_out)[:n_hard]
    d = np.concatenate(d_out)[:n_hard]
    if t.shape[0] < n_hard:
        raise RuntimeError(f"only {t.shape[0]}/{n_hard} hard negatives")
    return t, R, d


def build_synthetic_dataset(
        data_dir: str,
        n_objects: int = 8,
        views_per_object: int = 2,
        grasps_per_object: int = 24,
        points_per_cloud: int = 2048,
        eval_fraction: float = 0.25,
        basis: Optional[np.ndarray] = None,
        seed: int = 0,
        hard_neg_factor: float = 1.5,
        visible_fraction: float = 0.65,
        gripper: Optional[GripperParams] = None,
        aug_rots_per_view: int = 0) -> Dict:
    """Create the dataset tree; returns summary info.

    ``grasps_per_object`` = positives per object (same count of negatives,
    plus ``hard_neg_factor``× relabeled hard negatives in a
    ``hard_negative`` h5 group that DexEvaluatorDataSet prefers over
    on-the-fly perturbation when present).

    ``aug_rots_per_view`` > 0 additionally emits that many random-rotation
    augmented copies of each view (tools/augment.py, the reference's
    ``apply_random_rot_transf.py`` convention: Rz·Ry·Rx with U[0,1)-rad
    angles), each with its own re-encoded BPS and a per-view transform
    composing the augmentation — grasp labels stay frame-exact."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    if gripper is None:
        # contact-count threshold scales with surface sampling density
        gripper = GripperParams(
            min_contact_points=max(4, points_per_cloud // 170))
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

            # grasps in centroid frame (oracle-labeled) → store in mesh frame
            (t_pos, R_pos, d_pos), (t_neg, R_neg, d_neg) = _labeled_grasps(
                rng, cloud, grasps_per_object, grasps_per_object, gripper)
            n_hard = max(1, int(round(hard_neg_factor * grasps_per_object)))
            t_hrd, R_hrd, d_hrd = _hard_negatives(
                rng, cloud, t_pos, R_pos, n_hard, gripper)
            j_pos = joints_from_depth(rng, d_pos)
            j_neg = joints_from_depth(rng, d_neg)
            j_hrd = joints_from_depth(rng, d_hrd)

            def to_mesh_posquat(t, R):
                Rm = np.einsum("ij,njk->nik", mesh_T_centr[:3, :3], R)
                tm = (mesh_T_centr[:3, :3] @ t.T).T + mesh_T_centr[:3, 3]
                q = _Rot.from_matrix(Rm).as_quat()  # xyzw
                return np.concatenate([tm, q], axis=1)

            grasps_h5[obj] = {
                "positive": (to_mesh_posquat(t_pos, R_pos), j_pos),
                "negative": (to_mesh_posquat(t_neg, R_neg), j_neg),
                "hard_negative": (to_mesh_posquat(t_hrd, R_hrd), j_hrd),
                "collision": (to_mesh_posquat(t_neg, R_neg)[:4], j_neg[:4]),
            }

            obj_tf = tf_h5.create_group(obj)
            bps_dir = os.path.join(data_dir, split, "bps", obj)
            pcd_dir = os.path.join(data_dir, split, "pcd", obj)
            os.makedirs(bps_dir, exist_ok=True)
            os.makedirs(pcd_dir, exist_ok=True)
            # full (uncropped) surface per view — not part of the reference
            # contract, but enables oracle-grounded quality studies
            # (grasp_geometry.grasp_outcomes on generated/refined poses)
            full_dir = os.path.join(data_dir, "full_pcd")
            os.makedirs(full_dir, exist_ok=True)
            # view index stream: base views get small jitter; augmented
            # copies (aug_rots_per_view each) get a reference-convention
            # random rotation (tools/augment.py)
            view_plan = []
            for _ in range(views_per_object):
                view_plan.append(False)
                view_plan += [True] * aug_rots_per_view
            for vi, is_aug in enumerate(view_plan):
                # single-view realism (the reference's clouds are one-camera
                # renders): keep the ``visible_fraction`` of the surface
                # facing a random view direction, plus small pose jitter.
                # Labels are geometric (grasp_geometry.py), so near-full
                # views no longer create an object-identity label shortcut;
                # the fraction trades partial-observability ambiguity
                # against view realism.
                view_dir = rng.normal(size=3)
                view_dir /= np.linalg.norm(view_dir)
                proj = cloud @ view_dir
                visible = proj < np.quantile(proj, visible_fraction)
                # small per-view pose jitter, applied to the WHOLE frame:
                # the view cloud is rotated AND the view's mesh_to_centroid
                # transform composes the same rotation, so GT grasps land
                # in the exact frame of this view's cloud (the reference's
                # per-view transforms have the same property; storing one
                # shared transform while rotating the cloud would skew
                # grasp labels ~3° against the BPS)
                if is_aug:
                    from dexgangrasp_tpu.tools.augment import (
                        generate_random_rot_max,
                    )

                    view_R = generate_random_rot_max(rng)
                else:
                    view_R = _Rot.from_rotvec(
                        rng.normal(size=3) * 0.05).as_matrix()
                view_full = (view_R @ cloud.T).T.astype(np.float32)
                view_cloud = view_full[visible]
                enc = encoder.encode(view_cloud, check_centered=True)
                stem = f"{obj}_bps{vi:03d}"
                np.save(os.path.join(bps_dir, stem + ".npy"),
                        enc[None].astype(np.float32))
                save_pcd(os.path.join(pcd_dir,
                                      f"{obj}_pcd{vi:03d}.pcd"), view_cloud)
                np.save(os.path.join(full_dir, f"{obj}_pcd{vi:03d}.npy"),
                        view_full)
                # per-view mesh_to_centroid transform (pos + quat xyzw)
                T_view = np.eye(4)
                T_view[:3, :3] = view_R
                T_view = T_view @ centr_T_mesh
                q = _Rot.from_matrix(T_view[:3, :3]).as_quat()
                obj_tf.create_dataset(
                    f"{obj}_pcd{vi:03d}_mesh_to_centroid",
                    data=np.concatenate([T_view[:3, 3], q]))

            rows.append({"Unnamed: 0": obj, "positive": grasps_per_object,
                         "negative": grasps_per_object,
                         "train": "X" if split == "train" else "",
                         "eval": "X" if split == "eval" else ""})

    write_grasp_h5(os.path.join(data_dir, "grasp_data_all.h5"), grasps_h5)
    pd.DataFrame(rows).to_csv(os.path.join(data_dir, "metadata.csv"),
                              index=False)
    return {"n_objects": n_objects, "n_eval": n_eval,
            "data_dir": data_dir, "basis": basis}
