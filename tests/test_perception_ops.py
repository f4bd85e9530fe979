"""Tests for the on-device perception ops vs host references."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dexgangrasp_tpu import native
from dexgangrasp_tpu.apps.segmentation import statistical_outlier_removal
from dexgangrasp_tpu.ops.bps import PAD_VALUE, pad_cloud
from dexgangrasp_tpu.ops.perception import (
    knn_mean_dist,
    ransac_plane_device,
    segment_object_device,
    statistical_outlier_mask_device,
)

rng = np.random.default_rng(91)


def test_knn_mean_dist_matches_scipy():
    from scipy.spatial import cKDTree

    pts = rng.normal(size=(500, 3)).astype(np.float32) * 0.05
    padded = pad_cloud(pts, 1024)
    md = np.asarray(knn_mean_dist(jnp.asarray(padded), jnp.asarray(500),
                                  k=10))
    tree = cKDTree(pts)
    d, _ = tree.query(pts, k=11)
    ref = d[:, 1:].mean(axis=1)
    np.testing.assert_allclose(md[:500], ref, rtol=1e-3, atol=1e-5)


def test_outlier_mask_device_matches_host():
    pts = np.concatenate([
        rng.normal(size=(700, 3)).astype(np.float32) * 0.05,
        (rng.normal(size=(8, 3)) * 0.05 + 3.0).astype(np.float32)])
    padded = pad_cloud(pts, 1024)
    mask = np.asarray(statistical_outlier_mask_device(
        jnp.asarray(padded), jnp.asarray(pts.shape[0])))
    assert not mask[708:].any()  # padding excluded
    assert not mask[700:708].any()  # far blob removed
    _, idx = statistical_outlier_removal(pts, 20, 2.0)
    ref = np.zeros(1024, bool)
    ref[idx] = True
    agreement = (mask[:708] == ref[:708]).mean()
    assert agreement > 0.97


def test_ransac_plane_device():
    plane_pts = np.concatenate(
        [rng.uniform(-0.3, 0.3, (1500, 2)),
         0.5 + rng.normal(size=(1500, 1)) * 0.002], axis=1)
    obj = rng.normal(size=(200, 3)) * 0.02 + [0, 0, 0.35]
    pts = np.concatenate([plane_pts, obj]).astype(np.float32)
    padded = pad_cloud(pts, 2048)
    plane, inliers = ransac_plane_device(
        jnp.asarray(padded), jnp.asarray(pts.shape[0]), jax.random.PRNGKey(0))
    plane, inliers = np.asarray(plane), np.asarray(inliers)
    assert abs(abs(plane[2]) - 1.0) < 0.02
    assert inliers[:1500].mean() > 0.97
    assert inliers[1500:1700].mean() < 0.05
    assert not inliers[1700:].any()  # padding excluded


def test_ransac_tabletop_prior_prefers_support_plane():
    """When coplanar object tops outvote the visible table (e.g. flat
    boxes covering most of the ROI — the K=4 whole-scene bench failure),
    max-inlier RANSAC removes the object plane; the tabletop prior keeps
    eligibility by count but picks the DEEPEST eligible plane, which is
    the support surface."""
    local = np.random.default_rng(7)
    table = np.concatenate(
        [local.uniform(-0.3, 0.3, (600, 2)),
         0.5 + local.normal(size=(600, 1)) * 0.002], axis=1)
    # "box tops": more points than the table, loosely coplanar nearer
    # the camera (smaller z) — a 1 cm-threshold plane catches most
    tops = np.concatenate(
        [local.uniform(-0.3, 0.3, (1400, 2)),
         0.35 + local.normal(size=(1400, 1)) * 0.004], axis=1)
    pts = np.concatenate([table, tops]).astype(np.float32)
    padded = pad_cloud(pts, 2048)
    n = jnp.asarray(pts.shape[0])

    _, inl0 = ransac_plane_device(jnp.asarray(padded), n,
                                  jax.random.PRNGKey(0))
    inl0 = np.asarray(inl0)
    assert inl0[600:2000].mean() > 0.9  # default: picks the box-top plane
    assert inl0[:600].mean() < 0.05

    _, inl1 = ransac_plane_device(jnp.asarray(padded), n,
                                  jax.random.PRNGKey(0),
                                  tabletop_prior=0.25)
    inl1 = np.asarray(inl1)
    assert inl1[:600].mean() > 0.95  # prior: picks the (deeper) table
    assert inl1[600:2000].mean() < 0.05
    assert not inl1[2000:].any()  # padding excluded


def test_segment_object_device_end_to_end():
    plane_pts = np.concatenate(
        [rng.uniform(-0.3, 0.3, (1500, 2)),
         0.5 + rng.normal(size=(1500, 1)) * 0.002], axis=1)
    obj = rng.normal(size=(250, 3)) * 0.02 + [0, 0, 0.35]
    outliers = rng.normal(size=(5, 3)) * 0.02 + 4.0
    pts = np.concatenate([plane_pts, obj, outliers]).astype(np.float32)
    padded = pad_cloud(pts, 2048)
    mask = np.asarray(segment_object_device(
        jnp.asarray(padded), jnp.asarray(pts.shape[0]),
        jax.random.PRNGKey(1)))
    # object survives, plane + outliers + padding gone
    assert mask[1500:1750].mean() > 0.9
    assert mask[:1500].mean() < 0.05
    assert not mask[1750:].any()


def test_radius_outlier_mask_device():
    from dexgangrasp_tpu.ops.perception import radius_outlier_mask_device

    dense = rng.normal(size=(600, 3)).astype(np.float32) * 0.03
    sparse = (rng.normal(size=(6, 3)) * 0.03 + 2.0).astype(np.float32)
    pts = np.concatenate([dense, sparse])
    padded = pad_cloud(pts, 1024)
    mask = np.asarray(radius_outlier_mask_device(
        jnp.asarray(padded), jnp.asarray(pts.shape[0]),
        radius=0.02, min_neighbors=4))
    # gaussian-tail points legitimately fall below the density threshold;
    # the bulk is kept and the far blob fully dropped
    assert mask[:600].mean() > 0.8
    assert not mask[600:].any()
    # oracle: brute-force counts
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    counts = (d2 < 0.02 ** 2).sum(1) - 1
    ref = counts >= 4
    assert (mask[:606] == ref).mean() > 0.99


def test_voxel_downsample():
    pts = rng.uniform(0, 1, (5000, 3)).astype(np.float32)
    out = native.voxel_downsample(pts, 0.1)
    # ≤ 1 point per voxel: about 10^3 voxels in the unit cube
    assert 300 < out.shape[0] <= 1100
    keys = np.floor((out - pts.min(axis=0)) / 0.1).astype(int)
    assert len(np.unique(keys, axis=0)) == out.shape[0]
    # numpy fallback agrees on the count scale
    native_lib = native._lib
    native._lib = None
    try:
        out2 = native.voxel_downsample(pts, 0.1)
    finally:
        native._lib = native_lib
    assert abs(out2.shape[0] - out.shape[0]) <= 5


def test_euclidean_cluster_device_vs_scipy_oracle():
    """Label-propagation clustering must match scipy connected components
    on the same radius graph: same partition (up to label names), same
    top-K component sizes, min_points filtering, and padded/dropped points
    excluded."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import connected_components

    from dexgangrasp_tpu.ops.bps import PAD_VALUE
    from dexgangrasp_tpu.ops.perception import euclidean_cluster_device

    rng = np.random.default_rng(7)
    # three blobs of distinct sizes + a 2-point speck (below min_points)
    blobs = [rng.normal(size=(120, 3)) * 0.008 + c for c in
             ([0.0, 0.0, 0.3], [0.15, 0.0, 0.3])]
    blobs.append(rng.normal(size=(60, 3)) * 0.008 + [0.0, 0.18, 0.3])
    blobs.append(rng.normal(size=(2, 3)) * 0.002 + [0.4, 0.4, 0.3])
    pts = np.concatenate(blobs).astype(np.float32)
    m = 512
    buf = np.full((m, 3), PAD_VALUE, np.float32)
    buf[:pts.shape[0]] = pts
    keep = np.zeros((m,), bool)
    keep[:pts.shape[0]] = True
    # drop a few points to exercise the keep mask
    keep[5] = keep[130] = False

    radius, min_points, K = 0.02, 30, 4
    labels, roots, sizes = jax.jit(
        lambda b, k: euclidean_cluster_device(
            b, k, radius=radius, min_points=min_points, max_clusters=K)
    )(jnp.asarray(buf), jnp.asarray(keep))
    labels, roots, sizes = map(np.asarray, (labels, roots, sizes))

    # scipy oracle on the identical graph
    d2 = ((buf[:, None, :] - buf[None, :, :]) ** 2).sum(-1)
    adj = (d2 < radius * radius) & keep[:, None] & keep[None, :]
    n_comp, olab = connected_components(csr_matrix(adj), directed=False)
    ocounts = np.bincount(olab[keep], minlength=n_comp)
    o_sizes = np.sort(ocounts[ocounts >= min_points])[::-1][:K]

    got_sizes = sizes[sizes > 0]
    np.testing.assert_array_equal(got_sizes, o_sizes)
    # partition equality on the returned components
    for r, s in zip(roots, sizes):
        if r < 0:
            continue
        ours = keep & (labels == r)
        theirs = keep & (olab == olab[r])
        np.testing.assert_array_equal(ours, theirs)
        assert ours.sum() == s
    # the 2-point speck must not appear as any returned root
    assert (sizes[sizes > 0] >= min_points).all()
