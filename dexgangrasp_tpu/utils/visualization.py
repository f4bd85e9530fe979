"""Visualization — matplotlib counterpart of the reference's open3d/
pyrender viewers (``DexGanGrasp/utils/visualization.py``).

The reference depends on open3d + pyrender + urdfpy (none headless-
friendly); here every viewer renders through matplotlib 3D and can save
to file (``save_path``) instead of blocking on a window, so the same code
runs in CI.  Covered:

- ``show_generated_grasp_distribution`` (:334): object cloud + one frame
  axis triad per grasp.
- ``show_grasp_and_object`` (:544): single grasp pose + palm box proxy
  (full URDF mesh FK needs trimesh/urdfpy, optional import).
- ``plot_confusion_matrix`` (:89) via sklearn.
- ``show_refinement_trajectory`` (:176): success-probability traces.
- paper-style coverage/threshold curves (:721-764) as data-in plots.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

import matplotlib

if not os.environ.get("DISPLAY"):
    matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _finish(fig, save_path: Optional[str]):
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return save_path
    plt.show()
    return None


def _plot_cloud(ax, points: np.ndarray, max_points: int = 4000, **kw):
    if points.shape[0] > max_points:
        idx = np.linspace(0, points.shape[0] - 1, max_points).astype(int)
        points = points[idx]
    ax.scatter(points[:, 0], points[:, 1], points[:, 2], s=1.0,
               c=kw.pop("c", "gray"), **kw)


def _plot_frames(ax, transl: np.ndarray, rot: np.ndarray,
                 length: float = 0.02, max_frames: int = 200):
    n = min(transl.shape[0], max_frames)
    colors = ["r", "g", "b"]
    for i in range(n):
        for a in range(3):
            d = rot[i][:, a] * length
            ax.plot([transl[i, 0], transl[i, 0] + d[0]],
                    [transl[i, 1], transl[i, 1] + d[1]],
                    [transl[i, 2], transl[i, 2] + d[2]],
                    c=colors[a], linewidth=0.8)


def _resolve_backend(backend: str, save_path: Optional[str]) -> str:
    """'auto' → interactive open3d when installed, nothing to save, and a
    display exists; matplotlib otherwise (always available, headless-safe)."""
    if backend == "auto":
        if save_path is None and os.environ.get("DISPLAY"):
            from dexgangrasp_tpu.utils.viz_o3d import o3d_available

            if o3d_available():
                return "open3d"
        return "matplotlib"
    return backend


def show_generated_grasp_distribution(pcd_path_or_points, grasps: Dict,
                                      save_path: Optional[str] = None,
                                      backend: str = "auto",
                                      view_point_path: Optional[str] = None):
    """Object cloud + grasp pose triads (reference :334-423).

    ``backend='open3d'`` opens the reference's interactive viewer with
    saved-viewpoint support (utils/viz_o3d.py); default 'auto' picks it
    when open3d + a display are present and no save_path is requested."""
    if isinstance(pcd_path_or_points, str):
        from dexgangrasp_tpu.utils.pcd import load_pcd

        points = load_pcd(pcd_path_or_points)
    else:
        points = np.asarray(pcd_path_or_points)
    if _resolve_backend(backend, save_path) == "open3d":
        from dexgangrasp_tpu.utils.viz_o3d import (
            show_generated_grasp_distribution_o3d,
        )

        return show_generated_grasp_distribution_o3d(
            points, grasps, view_point_path=view_point_path)
    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(projection="3d")
    _plot_cloud(ax, points)
    _plot_frames(ax, np.asarray(grasps["transl"]),
                 np.asarray(grasps["rot_matrix"]))
    ax.set_title(f"{np.asarray(grasps['transl']).shape[0]} grasps")
    ax.set_box_aspect([1, 1, 1])
    return _finish(fig, save_path)


def show_grasp_and_object(pcd_path_or_points, transl: np.ndarray,
                          rot: np.ndarray,
                          joint_conf: Optional[np.ndarray] = None,
                          urdf_path: Optional[str] = None,
                          save_path: Optional[str] = None,
                          backend: str = "auto",
                          view_point_path: Optional[str] = None):
    """One grasp against the object.

    With ``urdf_path`` (e.g. the robotiq-3f articulated URDF the reference
    renders, visualization.py:544), the hand is drawn as the FK'd link-mesh
    cloud at the given joint configuration; otherwise a palm-box proxy.
    ``backend='open3d'`` uses the interactive viewer when available.
    """
    if isinstance(pcd_path_or_points, str):
        from dexgangrasp_tpu.utils.pcd import load_pcd

        points = load_pcd(pcd_path_or_points)
    else:
        points = np.asarray(pcd_path_or_points)
    if _resolve_backend(backend, save_path) == "open3d":
        from dexgangrasp_tpu.utils.viz_o3d import show_grasp_and_object_o3d

        return show_grasp_and_object_o3d(
            points, transl, rot, joint_conf=joint_conf,
            urdf_path=urdf_path, view_point_path=view_point_path)
    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(projection="3d")
    _plot_cloud(ax, points)
    _plot_frames(ax, transl[None], rot[None], length=0.05, max_frames=1)
    if urdf_path is not None and os.path.isfile(urdf_path):
        from dexgangrasp_tpu.core.joints import hand_cfg_map
        from dexgangrasp_tpu.utils.urdf import URDF

        hand = URDF(urdf_path)
        cfg = hand_cfg_map(joint_conf) if joint_conf is not None else None
        cloud = hand.hand_cloud(cfg)
        world = (rot @ cloud.T).T + transl
        ax.scatter(world[:, 0], world[:, 1], world[:, 2], c="m", s=2)
    else:
        # palm proxy: 8-corner box in the palm frame
        corners = np.array([[x, y, z] for x in (0, 0.04)
                            for y in (-0.05, 0.05) for z in (-0.02, 0.02)])
        world = (rot @ corners.T).T + transl
        ax.scatter(world[:, 0], world[:, 1], world[:, 2], c="m", s=12)
    if joint_conf is not None:
        closure = float(np.mean(joint_conf))
        ax.set_title(f"grasp (mean joint closure {closure:.2f})")
    ax.set_box_aspect([1, 1, 1])
    return _finish(fig, save_path)


def plot_confusion_matrix(gt_labels: np.ndarray, pred_labels: np.ndarray,
                          save_path: Optional[str] = None):
    """Evaluator confusion matrix (reference :89-130)."""
    from sklearn.metrics import ConfusionMatrixDisplay, confusion_matrix

    cm = confusion_matrix(gt_labels, pred_labels, normalize="true")
    disp = ConfusionMatrixDisplay(cm, display_labels=["fail", "success"])
    disp.plot(cmap="Blues", values_format=".2f")
    return _finish(disp.figure_, save_path)


def show_refinement_trajectory(success_traj: np.ndarray,
                               save_path: Optional[str] = None):
    """(num_steps+1, N) per-grasp success traces (reference :176-240)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(np.asarray(success_traj), alpha=0.4, linewidth=0.8)
    ax.plot(np.asarray(success_traj).mean(axis=1), "k-", linewidth=2,
            label="mean")
    ax.set_xlabel("refinement step")
    ax.set_ylabel("p(success)")
    ax.legend()
    return _finish(fig, save_path)


def plot_coverage_success_curve(coverage: Sequence[float],
                                success: Sequence[float],
                                save_path: Optional[str] = None):
    """Paper fig.: success vs coverage tradeoff (reference :721-743)."""
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.plot(coverage, success, "o-")
    ax.set_xlabel("coverage")
    ax.set_ylabel("grasp success rate")
    ax.grid(True, alpha=0.3)
    return _finish(fig, save_path)


def plot_threshold_success_curve(thresholds: Sequence[float],
                                 success: Sequence[float],
                                 save_path: Optional[str] = None):
    """Paper fig.: success vs evaluator threshold (reference :745-764)."""
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.plot(thresholds, success, "s-")
    ax.set_xlabel("evaluator threshold")
    ax.set_ylabel("grasp success rate")
    ax.grid(True, alpha=0.3)
    return _finish(fig, save_path)
