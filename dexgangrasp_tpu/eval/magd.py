"""Mean Absolute Grasp Deviation (MAGD) — the parity benchmark.

Matches reference ``eval.py:48-137`` numerically while replacing its O(N)
python loops (``eval.py:63-96``) with vectorized einsum:

per predicted grasp, find the ground-truth grasp with the nearest *squared*
translation distance; sum that distance, the geodesic rotation distance and
squared joint-conf distance to the matched grasp; coverage = fraction of GT
grasps matched at least once.

Computation is float64 numpy on host by default (bit-parity with the
reference's numpy implementation); a float32 jax path is provided for
on-device evaluation sweeps.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def pairwise_transl_sq(t1: np.ndarray, t2: np.ndarray) -> np.ndarray:
    """(N,3) × (M,3) → (N,M) *squared* euclidean distances (the reference
    metric never takes the sqrt — eval.py:74-77)."""
    d = t1[:, None, :] - t2[None, :, :]
    return np.einsum("nmi,nmi->nm", d, d)


def pairwise_joint_sq(j1: np.ndarray, j2: np.ndarray) -> np.ndarray:
    d = j1[:, None, :] - j2[None, :, :]
    return np.einsum("nmi,nmi->nm", d, d)


def pairwise_rot_geodesic(r1: np.ndarray, r2: np.ndarray) -> np.ndarray:
    """(N,3,3) × (M,3,3) → (N,M) arccos((tr(R1 R2ᵀ)-1)/2), eval.py:48-60."""
    rrt = np.einsum("aij,bkj->abik", r1, r2, optimize=True)
    tr = np.trace(rrt, axis1=-2, axis2=-1)
    return np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0))


def magd_for_grasp_distribution(pred: Dict, gt: Dict
                                ) -> Tuple[float, float, float, float]:
    """Returns (transl_loss_sum, rot_loss_sum, joint_loss_sum, coverage).

    Semantics identical to reference eval.py:98-137 (including matching by
    translation argmin and first-occurrence unique coverage counting).
    """
    p_t = np.asarray(pred["transl"], np.float64)
    p_r = np.asarray(pred["rot_matrix"], np.float64)
    p_j = np.asarray(pred["joint_conf"], np.float64)
    g_t = np.asarray(gt["transl"], np.float64)
    g_r = np.asarray(gt["rot_matrix"], np.float64)
    g_j = np.asarray(gt["joint_conf"], np.float64)

    transl_mat = pairwise_transl_sq(p_t, g_t)          # (N, M)
    rot_mat = pairwise_rot_geodesic(p_r, g_r)
    joint_mat = pairwise_joint_sq(p_j, g_j)

    cor = np.argmin(transl_mat, axis=1)                # (N,)
    n_idx = np.arange(p_t.shape[0])
    transl_loss = transl_mat[n_idx, cor]
    rot_loss = rot_mat[n_idx, cor]
    joint_loss = joint_mat[n_idx, cor]

    coverage = len(set(cor.tolist())) / g_t.shape[0]
    return (float(transl_loss.sum()), float(rot_loss.sum()),
            float(joint_loss.sum()), float(coverage))


def magd_bidirectional(pred: Dict, gt: Dict) -> Dict:
    """Analysis extension: MAGD in both matching directions.

    The reference metric matches each *prediction* to its nearest GT, which
    rewards mode collapse (a single near-centroid prediction scores well);
    the reverse direction (each GT to its nearest prediction) measures how
    well the predicted set covers the GT distribution.  Returns both sums
    plus the standard coverage."""
    fwd = magd_for_grasp_distribution(dict(pred), dict(gt))
    bwd = magd_for_grasp_distribution(dict(gt), dict(pred))
    return {
        "transl_pred2gt": fwd[0], "rot_pred2gt": fwd[1],
        "joint_pred2gt": fwd[2], "coverage": fwd[3],
        "transl_gt2pred": bwd[0], "rot_gt2pred": bwd[1],
        "joint_gt2pred": bwd[2],
    }


@jax.jit
def magd_jax(p_t, p_r, p_j, g_t, g_r, g_j):
    """On-device MAGD (f32); same matching rule. Returns
    (transl_sum, rot_sum, joint_sum, n_unique_matched)."""
    d = p_t[:, None, :] - g_t[None, :, :]
    transl_mat = jnp.einsum("nmi,nmi->nm", d, d)
    rrt = jnp.einsum("aij,bkj->abik", p_r, g_r)
    tr = jnp.trace(rrt, axis1=-2, axis2=-1)
    rot_mat = jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))
    dj = p_j[:, None, :] - g_j[None, :, :]
    joint_mat = jnp.einsum("nmi,nmi->nm", dj, dj)

    cor = jnp.argmin(transl_mat, axis=1)
    n_idx = jnp.arange(p_t.shape[0])
    matched = jnp.zeros((g_t.shape[0],), jnp.bool_).at[cor].set(True)
    return (transl_mat[n_idx, cor].sum(), rot_mat[n_idx, cor].sum(),
            joint_mat[n_idx, cor].sum(), matched.sum())
