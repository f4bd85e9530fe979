"""Hand control-point generation + pose augmentation utilities.

Counterparts of the reference's small scripts:

- ``create_hithand_base_control_points.py``: sample a control-point set on
  the palm/finger base used by the control-point L1 loss
  (losses.py:19-51).  The reference samples from the hand mesh; without a
  mesh loader we sample an analytic palm envelope (box + finger-base rays)
  whose extent matches the robotiq palm, which is all the loss needs (a
  rigid point set to transform).
- ``apply_random_rot_transf.py``: apply a random SO(3) rotation to a cloud
  and the corresponding grasp poses (data augmentation).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def create_palm_control_points(n_points: int = 64, seed: int = 0,
                               palm_extent=(0.04, 0.10, 0.04)
                               ) -> np.ndarray:
    """(n, 3) control points in the palm frame: surface of a palm box plus
    three finger-base rays along +x."""
    rng = np.random.default_rng(seed)
    ex, ey, ez = palm_extent
    n_box = n_points * 3 // 4
    face = rng.integers(0, 6, n_box)
    u, v = rng.uniform(-0.5, 0.5, (2, n_box))
    pts = np.zeros((n_box, 3))
    for f in range(6):
        m = face == f
        axis, sign = divmod(f, 2)
        fixed = (0.5 if sign else -0.5)
        coords = np.stack([u[m], v[m]], axis=1)
        p = np.zeros((m.sum(), 3))
        other = [a for a in range(3) if a != axis]
        p[:, other[0]] = coords[:, 0]
        p[:, other[1]] = coords[:, 1]
        p[:, axis] = fixed
        pts[m] = p
    pts *= np.array([ex, ey, ez])
    # finger-base rays: 3 fingers spread along ±y at the +x face
    n_f = n_points - n_box
    t = rng.uniform(0, 0.04, n_f)
    finger = rng.integers(0, 3, n_f)
    y_off = (finger - 1) * ey / 2.0
    rays = np.stack([ex / 2.0 + t, y_off, np.zeros(n_f)], axis=1)
    return np.concatenate([pts, rays]).astype(np.float32)


def save_control_points(path: str, n_points: int = 64, seed: int = 0) -> str:
    np.save(path, create_palm_control_points(n_points, seed))
    return path


def apply_random_rot(points: np.ndarray,
                     transl: Optional[np.ndarray] = None,
                     rot: Optional[np.ndarray] = None,
                     seed: int = 0) -> Tuple:
    """Rotate a cloud (and optionally grasp poses) by one random rotation
    (reference apply_random_rot_transf.py behavior, vectorized)."""
    from scipy.spatial.transform import Rotation

    R = Rotation.random(rng=np.random.default_rng(seed)).as_matrix()
    out_points = points @ R.T
    if transl is None:
        return out_points, R
    out_transl = transl @ R.T
    out_rot = None if rot is None else np.einsum("ij,njk->nik", R, rot)
    return out_points, out_transl, out_rot, R
