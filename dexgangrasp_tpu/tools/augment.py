"""Random-rotation augmentation — port of the reference's
``DexGanGrasp/utils/apply_random_rot_transf.py``.

The reference utility draws a random rotation R = Rz(γ)·Ry(β)·Rx(α) with
angles ~ U[0, 1) rad (≈ 0-57°) to augment rendered views.  Because the
BPS encoding is not equivariant (rotating a cloud changes its encoding),
augmentation must happen at dataset *build* time: the builder re-encodes
each augmented view and stores a per-view mesh_to_centroid transform that
composes the augmentation, keeping grasp labels frame-exact (see
data/synthetic.py).  Opt in via ``build_synthetic_dataset(...,
aug_rots_per_view=K)``.
"""
from __future__ import annotations

import numpy as np


def rot_x(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def rot_y(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def rot_z(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def generate_random_rot_max(rng: np.random.Generator) -> np.ndarray:
    """R = Rz(γ)·Ry(β)·Rx(α), α/β/γ ~ U[0, 1) rad — the reference's
    construction (``apply_random_rot_transf.py:23-31``), with an explicit
    PRNG instead of global numpy state."""
    alpha, beta, gamma = rng.random(3)
    return rot_z(gamma) @ rot_y(beta) @ rot_x(alpha)


def augment_view(cloud: np.ndarray, transl: np.ndarray, rot: np.ndarray,
                 R: np.ndarray):
    """Co-rotate a (view cloud, grasp set) pair by R: labels are invariant
    under a shared rigid rotation about the centroid."""
    cloud_r = (R @ np.asarray(cloud).T).T
    transl_r = (R @ np.asarray(transl).T).T
    rot_r = np.einsum("ij,njk->nik", R, np.asarray(rot))
    return cloud_r, transl_r, rot_r
