"""ctypes bindings for the native host runtime (native/dexgg_host.cpp).

Each op transparently falls back to the numpy/scipy implementation in
apps/segmentation.py / ops/bps.py when the shared library hasn't been
built (``make -C native``), so the framework never hard-requires the
toolchain.  The native path matters for the camera-rate closed loop
(BASELINE config #5): ~1M-point RealSense frames per cycle.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "native", "libdexgg_host.so"),
    "libdexgg_host.so",
]

_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(p)
        except OSError:
            continue
        c_f32p = ctypes.POINTER(ctypes.c_float)
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.dexgg_bps_encode.argtypes = [c_f32p, ctypes.c_int64, c_f32p,
                                         ctypes.c_int64, c_f32p]
        lib.dexgg_stat_outlier_mask.argtypes = [c_f32p, ctypes.c_int64,
                                                ctypes.c_int32,
                                                ctypes.c_float, c_u8p]
        lib.dexgg_ransac_plane.argtypes = [c_f32p, ctypes.c_int64,
                                           ctypes.c_float, ctypes.c_int32,
                                           ctypes.c_uint64, c_f32p, c_u8p]
        lib.dexgg_box_crop_mask.argtypes = [c_f32p, ctypes.c_int64, c_f32p,
                                            c_f32p, c_u8p]
        lib.dexgg_voxel_downsample.argtypes = [c_f32p, ctypes.c_int64,
                                               ctypes.c_float, c_f32p,
                                               ctypes.c_int64]
        lib.dexgg_voxel_downsample.restype = ctypes.c_int64
        try:
            lib.dexgg_prep_frame.argtypes = [
                c_f32p, ctypes.c_int64, ctypes.c_int64,  # frame, H, W
                ctypes.c_int64, ctypes.c_int64,          # r0, r1
                ctypes.c_int64, ctypes.c_int64,          # c0, c1
                c_u8p,                                   # roi mask or NULL
                ctypes.c_float, ctypes.c_float,          # zmin, zmax
                ctypes.c_float,                          # voxel
                c_f32p, ctypes.c_int64, ctypes.c_float]  # out, target, pad
            lib.dexgg_prep_frame.restype = ctypes.c_int64
        except AttributeError:  # stale .so without the fused op
            pass
        _lib = lib
        return lib
    return None


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def bps_encode_host(basis: np.ndarray, points: np.ndarray) -> np.ndarray:
    """(B,3) × (N,3) → (B,) min distances on the host CPU."""
    lib = _load()
    basis = np.ascontiguousarray(basis, np.float32)
    points = np.ascontiguousarray(points, np.float32)
    if lib is None:
        d2 = None
        best = np.full(basis.shape[0], np.inf, np.float64)
        for s in range(0, points.shape[0], 8192):
            c = points[s:s + 8192]
            dd = ((basis[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            best = np.minimum(best, dd.min(1))
        return np.sqrt(best).astype(np.float32)
    out = np.empty(basis.shape[0], np.float32)
    lib.dexgg_bps_encode(_fp(basis), basis.shape[0], _fp(points),
                         points.shape[0], _fp(out))
    return out


def statistical_outlier_mask(points: np.ndarray, nb_neighbors: int = 20,
                             std_ratio: float = 2.0) -> np.ndarray:
    """(N,3) → bool keep mask (open3d remove_statistical_outlier
    semantics)."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    if lib is None:
        from dexgangrasp_tpu.apps.segmentation import (
            statistical_outlier_removal,
        )

        _, idx = statistical_outlier_removal(points, nb_neighbors, std_ratio)
        mask = np.zeros(points.shape[0], bool)
        mask[idx] = True
        return mask
    mask = np.empty(points.shape[0], np.uint8)
    lib.dexgg_stat_outlier_mask(_fp(points), points.shape[0], nb_neighbors,
                                std_ratio, _u8p(mask))
    return mask.astype(bool)


def ransac_plane(points: np.ndarray, dist_thresh: float = 0.01,
                 iterations: int = 1000, seed: int = 0
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """(N,3) → (plane [a,b,c,d], bool inlier mask)."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    if lib is None:
        from dexgangrasp_tpu.apps.segmentation import fit_plane_ransac

        plane, mask = fit_plane_ransac(
            points, dist_thresh, iterations,
            rng=np.random.default_rng(seed))
        return plane.astype(np.float32), mask
    plane = np.empty(4, np.float32)
    mask = np.empty(points.shape[0], np.uint8)
    lib.dexgg_ransac_plane(_fp(points), points.shape[0], dist_thresh,
                           iterations, seed, _fp(plane), _u8p(mask))
    return plane, mask.astype(bool)


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray:
    """Keep one point per voxel (first encountered).  The cheap host-side
    decimation in front of the on-device segmentation ops
    (ops/perception.py)."""
    points = np.ascontiguousarray(points, np.float32)
    lib = _load()
    if lib is None:
        minv = points.min(axis=0)
        keys = np.floor((points - minv) / voxel).astype(np.int64)
        packed = (keys[:, 0] << 42) | (keys[:, 1] << 21) | keys[:, 2]
        _, first = np.unique(packed, return_index=True)
        return points[np.sort(first)]
    out = np.empty_like(points)
    n = lib.dexgg_voxel_downsample(_fp(points), points.shape[0], voxel,
                                   _fp(out), points.shape[0])
    return out[:n].copy()


def prep_frame(frame: np.ndarray, roi_mask: Optional[np.ndarray],
               z_clip: float, voxel: float, target: int,
               pad_value: float) -> Tuple[np.ndarray, int]:
    """The whole host half of a fused camera frame in one native pass:
    organized (H, W, 3) frame → ROI crop → finite+z filter → voxel
    downsample → deterministic subsample to ``target`` → PAD_VALUE fill.

    Returns (padded (target, 3) float32, n_valid).  Matches the composed
    numpy path (crop → clip → voxel_downsample → pad_cloud) up to the
    subsample draw.  Falls back to that composition without the lib."""
    lib = _load()
    frame = np.ascontiguousarray(frame, np.float32)
    H, W = frame.shape[:2]
    if roi_mask is not None:
        rows = np.flatnonzero(roi_mask.any(axis=1))
        cols = np.flatnonzero(roi_mask.any(axis=0))
        r0, r1 = (int(rows[0]), int(rows[-1]) + 1) if rows.size else (0, 0)
        c0, c1 = (int(cols[0]), int(cols[-1]) + 1) if cols.size else (0, 0)
    else:
        r0, r1, c0, c1 = 0, H, 0, W
    if lib is None or not hasattr(lib, "dexgg_prep_frame"):
        pts = frame[roi_mask] if roi_mask is not None \
            else frame.reshape(-1, 3)
        pts = pts[np.isfinite(pts).all(axis=1)]
        pts = pts[(pts[:, 2] > 0) & (pts[:, 2] < z_clip)]
        pts = voxel_downsample(pts, voxel)
        n = pts.shape[0]
        if n > target:
            idx = np.sort(np.random.default_rng(n).choice(
                n, target, replace=False))
            pts, n = pts[idx], target
        out = np.full((target, 3), pad_value, np.float32)
        out[:n] = pts
        return out, n
    out = np.empty((target, 3), np.float32)
    mask_arg = None
    if roi_mask is not None:
        mask_u8 = np.ascontiguousarray(roi_mask, np.uint8)  # keep alive
        mask_arg = _u8p(mask_u8)
    n = lib.dexgg_prep_frame(_fp(frame), H, W, r0, r1, c0, c1, mask_arg,
                             0.0, z_clip, voxel, _fp(out), target,
                             pad_value)
    return out, int(n)


def box_crop_mask(points: np.ndarray, lo, hi) -> np.ndarray:
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    if lib is None:
        return ((points >= lo) & (points <= hi)).all(axis=1)
    mask = np.empty(points.shape[0], np.uint8)
    lib.dexgg_box_crop_mask(_fp(points), points.shape[0], _fp(lo), _fp(hi),
                            _u8p(mask))
    return mask.astype(bool)
