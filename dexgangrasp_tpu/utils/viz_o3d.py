"""Optional open3d interactive viewer backend.

The reference's debugging workhorses are open3d windows with a saved
camera (``DexGanGrasp/utils/visualization.py:334-423``
``show_generated_grasp_distribution`` + ``config/view_point.json`` /
``render_opt.json``, and ``:544`` hand-on-object).  open3d is not a
declared dependency of this framework (headless CI, TPU hosts); this
module activates only when ``import open3d`` succeeds and mirrors those
viewers, including saved-viewpoint round-tripping.  The matplotlib
renderers in utils/visualization.py remain the always-available fallback
and the two share one public API (``backend='auto'`` there).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def _import_o3d():
    try:
        import open3d  # noqa: F401

        return open3d
    except Exception:
        return None


def o3d_available() -> bool:
    return _import_o3d() is not None


def _cloud_geometry(o3d, points: np.ndarray, color=(0.4, 0.4, 0.4)):
    pcd = o3d.geometry.PointCloud()
    pcd.points = o3d.utility.Vector3dVector(np.asarray(points, np.float64))
    pcd.paint_uniform_color(list(color))
    return pcd


def _grasp_frames(o3d, transl: np.ndarray, rot: np.ndarray,
                  size: float = 0.02, max_frames: int = 200):
    """One coordinate-frame triad mesh per grasp (reference :352-366 builds
    the same from create_coordinate_frame + transform)."""
    out = []
    n = min(transl.shape[0], max_frames)
    for i in range(n):
        frame = o3d.geometry.TriangleMesh.create_coordinate_frame(size=size)
        T = np.eye(4)
        T[:3, :3] = rot[i]
        T[:3, 3] = transl[i]
        frame.transform(T)
        out.append(frame)
    return out


def _run_viewer(o3d, geometries, view_point_path: Optional[str] = None,
                render_opt_path: Optional[str] = None,
                window_name: str = "dexgangrasp_tpu", blocking: bool = True):
    """Visualizer with saved-camera support (reference :388-423: create
    window, add geometries, read_pinhole_camera_parameters +
    convert_from_pinhole_camera_parameters, run)."""
    vis = o3d.visualization.Visualizer()
    vis.create_window(window_name=window_name)
    for g in geometries:
        vis.add_geometry(g)
    if render_opt_path and os.path.isfile(render_opt_path):
        vis.get_render_option().load_from_json(render_opt_path)
    if view_point_path and os.path.isfile(view_point_path):
        params = o3d.io.read_pinhole_camera_parameters(view_point_path)
        vis.get_view_control().convert_from_pinhole_camera_parameters(params)
    if blocking:
        vis.run()
        vis.destroy_window()
    return vis


def save_view_point(points: np.ndarray, path: str) -> None:
    """Interactive camera capture: open the cloud, let the user orient the
    view, save pinhole params on close (reference visualization.py:300-331
    ``save_view_point`` writing config/view_point.json)."""
    o3d = _import_o3d()
    if o3d is None:
        raise RuntimeError("open3d not installed")
    vis = o3d.visualization.Visualizer()
    vis.create_window()
    vis.add_geometry(_cloud_geometry(o3d, points))
    vis.run()
    params = vis.get_view_control().convert_to_pinhole_camera_parameters()
    o3d.io.write_pinhole_camera_parameters(path, params)
    vis.destroy_window()


def show_generated_grasp_distribution_o3d(
        points: np.ndarray, grasps: Dict,
        view_point_path: Optional[str] = None,
        render_opt_path: Optional[str] = None,
        blocking: bool = True):
    """Interactive counterpart of visualization.show_generated_grasp_
    distribution (reference :334-423)."""
    o3d = _import_o3d()
    if o3d is None:
        raise RuntimeError("open3d not installed")
    geoms = [_cloud_geometry(o3d, points)]
    geoms += _grasp_frames(o3d, np.asarray(grasps["transl"]),
                           np.asarray(grasps["rot_matrix"]))
    return _run_viewer(o3d, geoms, view_point_path, render_opt_path,
                       blocking=blocking)


def show_grasp_and_object_o3d(points: np.ndarray, transl: np.ndarray,
                              rot: np.ndarray,
                              joint_conf: Optional[np.ndarray] = None,
                              urdf_path: Optional[str] = None,
                              view_point_path: Optional[str] = None,
                              blocking: bool = True):
    """Interactive hand-on-object (reference :544-620): FK'd URDF hand
    cloud (utils/urdf.py — no pyrender needed) over the object cloud."""
    o3d = _import_o3d()
    if o3d is None:
        raise RuntimeError("open3d not installed")
    geoms = [_cloud_geometry(o3d, points)]
    geoms += _grasp_frames(o3d, np.asarray(transl)[None],
                           np.asarray(rot)[None], size=0.05, max_frames=1)
    if urdf_path is not None and os.path.isfile(urdf_path):
        from dexgangrasp_tpu.core.joints import hand_cfg_map
        from dexgangrasp_tpu.utils.urdf import URDF

        hand = URDF(urdf_path)
        cfg = hand_cfg_map(joint_conf) if joint_conf is not None else None
        cloud = hand.hand_cloud(cfg)
        world = (np.asarray(rot) @ cloud.T).T + np.asarray(transl)
        geoms.append(_cloud_geometry(o3d, world, color=(0.8, 0.1, 0.6)))
    return _run_viewer(o3d, geoms, view_point_path, blocking=blocking)
