"""Host-side perception: ROI crop, outlier removal, RANSAC plane removal.

numpy/scipy reimplementation of the reference's open3d pipeline
(``inference/segmentation.py:65-126``): crop an organized cloud with a
bbox/mask, statistical outlier removal (kNN mean-distance test, open3d
``remove_statistical_outlier`` semantics), RANSAC plane fit with the 45°
camera-z normal constraint, return the non-plane points.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

PLANE_NORMAL_THRESHOLD_DEG = 45.0  # reference segmentation.py:63


def crop_organized_cloud(cloud_hw3: np.ndarray, mask: np.ndarray
                         ) -> np.ndarray:
    """(H, W, 3) organized cloud + (H, W) bool ROI mask → (N, 3) points
    (reference crop_pcd_with_bbox, segmentation.py:69-89)."""
    pts = cloud_hw3[mask]
    return pts[np.isfinite(pts).all(axis=1)]


def statistical_outlier_removal(points: np.ndarray, nb_neighbors: int = 20,
                                std_ratio: float = 2.0
                                ) -> Tuple[np.ndarray, np.ndarray]:
    """open3d remove_statistical_outlier semantics: drop points whose mean
    kNN distance exceeds global mean + std_ratio·std.  Returns
    (inlier_points, inlier_indices)."""
    from scipy.spatial import cKDTree

    if points.shape[0] <= nb_neighbors:
        return points, np.arange(points.shape[0])
    tree = cKDTree(points)
    # k+1 because the nearest neighbor of each point is itself
    dists, _ = tree.query(points, k=nb_neighbors + 1)
    mean_d = dists[:, 1:].mean(axis=1)
    thresh = mean_d.mean() + std_ratio * mean_d.std()
    idx = np.nonzero(mean_d <= thresh)[0]
    return points[idx], idx


def distance_removal(points: np.ndarray, z_min: float = 0.0,
                     z_max: float = 1.2) -> np.ndarray:
    """Depth clipping along camera z (reference
    realsense.point_cloud_distance_removal behavior)."""
    m = (points[:, 2] > z_min) & (points[:, 2] < z_max)
    return points[m]


def fit_plane_ransac(points: np.ndarray, distance_threshold: float = 0.01,
                     num_iterations: int = 1000,
                     rng: Optional[np.random.Generator] = None
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """RANSAC plane fit.  Returns (plane [a,b,c,d] normalized, inlier mask).

    Same parameters as the reference's o3d segment_plane call
    (segmentation.py:96-98); vectorized hypothesis scoring.
    """
    rng = rng or np.random.default_rng(0)
    n = points.shape[0]
    assert n >= 3
    best_count, best_plane = -1, None
    # vectorized: draw all triples at once, score in chunks
    tri = rng.integers(0, n, size=(num_iterations, 3))
    p0, p1, p2 = points[tri[:, 0]], points[tri[:, 1]], points[tri[:, 2]]
    normals = np.cross(p1 - p0, p2 - p0)
    norms = np.linalg.norm(normals, axis=1)
    valid = norms > 1e-12
    normals[valid] /= norms[valid][:, None]
    d = -np.einsum("ij,ij->i", normals, p0)
    # score hypotheses in blocks to bound memory
    counts = np.zeros(num_iterations, np.int64)
    for s in range(0, num_iterations, 64):
        e = min(s + 64, num_iterations)
        dist = np.abs(points @ normals[s:e].T + d[s:e])  # (n, block)
        counts[s:e] = (dist < distance_threshold).sum(axis=0)
    counts[~valid] = -1
    best = int(np.argmax(counts))
    plane = np.concatenate([normals[best], [d[best]]])
    inliers = np.abs(points @ plane[:3] + plane[3]) < distance_threshold
    return plane, inliers


class PlaneSegmentation:
    """Reference-compatible façade (segmentation.py:65-126)."""

    def __init__(self, remove_outliers: bool = True):
        self.remove_outliers = remove_outliers

    def crop_pcd_with_bbox(self, cloud_hw3: np.ndarray, bbox_mask: np.ndarray
                           ) -> np.ndarray:
        pts = crop_organized_cloud(cloud_hw3, bbox_mask)
        if self.remove_outliers:
            pts, _ = statistical_outlier_removal(pts)
        return pts

    def plane_seg_with_angle_constrain(
            self, points: np.ndarray,
            remove_statistical_outlier_flag: bool = False
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (object_points, plane_normal).  Logs (but like the
        reference does not reject — segmentation.py:107-109) when the plane
        normal deviates >45° from camera z."""
        plane, inliers = fit_plane_ransac(points)
        normal = plane[:3]
        angle = np.rad2deg(np.arccos(np.clip(np.dot([0, 0, 1.0], normal),
                                             -1, 1)))
        if angle > PLANE_NORMAL_THRESHOLD_DEG:
            print(f"Detected plane has normal {angle:.1f} deg, more than "
                  f"{PLANE_NORMAL_THRESHOLD_DEG} deg")
        obj = points[~inliers]
        if remove_statistical_outlier_flag:
            obj, _ = statistical_outlier_removal(obj)
        return obj, normal
