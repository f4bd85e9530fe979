"""Camera-frame I/O helpers — counterpart of the save/visualize/transport
parts of ``inference/realsense.py`` (:112-218).

Pure-host utilities independent of the RealSense SDK (the capture adapter
lives in apps/realtime.py): clipping-distance background removal on aligned
depth+color, frame saving in the DexAfford replay layout
(color_####.png / depth_####.npy / pcd_####.npy), and the joint-conf push
to a remote hand server (reference uses ``scp``, :145-146).
"""
from __future__ import annotations

import os
import subprocess
from typing import Dict, Optional

import numpy as np


def remove_background(color: np.ndarray, depth: np.ndarray,
                      clipping_distance_m: float = 1.0,
                      depth_scale: float = 1e-3,
                      grey: int = 153) -> np.ndarray:
    """Grey out pixels beyond the clipping distance (reference :112-128)."""
    depth_m = depth.astype(np.float64) * depth_scale
    mask = (depth_m > clipping_distance_m) | (depth_m <= 0)
    out = color.copy()
    out[mask] = grey
    return out


def save_frame(save_path: str, index, color: Optional[np.ndarray] = None,
               depth: Optional[np.ndarray] = None,
               points: Optional[np.ndarray] = None,
               mask: Optional[np.ndarray] = None) -> Dict[str, str]:
    """Write one frame set in the replay layout consumed by
    apps/afford_offline.load_frame."""
    os.makedirs(save_path, exist_ok=True)
    idx = f"{int(index):04d}" if not isinstance(index, str) else index
    written = {}
    if color is not None:
        try:
            import cv2

            p = os.path.join(save_path, f"color_{idx}.png")
            cv2.imwrite(p, color)
            written["color"] = p
        except ImportError:
            p = os.path.join(save_path, f"color_{idx}.npy")
            np.save(p, color)
            written["color"] = p
    if depth is not None:
        p = os.path.join(save_path, f"depth_{idx}.npy")
        np.save(p, depth)
        written["depth"] = p
    if points is not None:
        p = os.path.join(save_path, f"pcd_{idx}.npy")
        np.save(p, np.asarray(points).reshape(-1, 3))
        written["points"] = p
    if mask is not None:
        p = os.path.join(save_path, f"mask_{idx}.npy")
        np.save(p, mask)
        written["mask"] = p
    return written


def push_joint_conf(joint_conf: np.ndarray, remote: str,
                    local_path: str = "/tmp/joint_conf.npy",
                    timeout_s: float = 10.0) -> bool:
    """Ship a joint configuration to the hand-control server
    (reference realsense.py:145-146 uses scp).  remote: 'user@host:/path'."""
    np.save(local_path, np.asarray(joint_conf))
    try:
        subprocess.run(["scp", local_path, remote], check=True,
                       timeout=timeout_s, capture_output=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"push_joint_conf failed: {e}")
        return False
