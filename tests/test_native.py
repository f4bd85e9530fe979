"""Native host-runtime tests: the C++ ops must agree with the numpy
references (and with the golden BPS fixtures)."""
import os
import subprocess

import numpy as np
import pytest

from dexgangrasp_tpu import native

rng = np.random.default_rng(61)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    """Build the native lib if the toolchain is present."""
    so = os.path.join(REPO, "native", "libdexgg_host.so")
    if not os.path.isfile(so):
        try:
            subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                           check=True, capture_output=True)
        except Exception:
            pytest.skip("no C++ toolchain")
    native._lib = None  # force re-probe
    assert native.available()


def test_native_bps_matches_golden(basis, real_objects_dir):
    from dexgangrasp_tpu.utils.pcd import load_pcd

    pts = load_pcd(os.path.join(real_objects_dir, "object", "red_mug.pcd"))
    golden = np.load(os.path.join(real_objects_dir, "bps",
                                  "red_mug.npy")).ravel()
    enc = native.bps_encode_host(basis, pts)
    np.testing.assert_allclose(enc, golden, atol=2e-6)


def test_native_outlier_mask_matches_scipy():
    pts = np.concatenate([rng.normal(size=(800, 3)).astype(np.float32) * 0.05,
                          (rng.normal(size=(8, 3)) * 0.05 + 4.0).astype(np.float32)])
    mask = native.statistical_outlier_mask(pts, 20, 2.0)
    # far blob must be dropped, bulk kept
    assert not mask[800:].any()
    assert mask[:800].mean() > 0.9
    # agreement with the scipy fallback on the kept set (kNN ties can
    # differ slightly at the threshold)
    from dexgangrasp_tpu.apps.segmentation import statistical_outlier_removal

    _, idx = statistical_outlier_removal(pts, 20, 2.0)
    ref_mask = np.zeros(pts.shape[0], bool)
    ref_mask[idx] = True
    assert (mask == ref_mask).mean() > 0.97


def test_native_ransac_plane():
    plane_pts = np.concatenate(
        [rng.uniform(-0.3, 0.3, (3000, 2)),
         0.4 + rng.normal(size=(3000, 1)) * 0.002], axis=1).astype(np.float32)
    obj = (rng.normal(size=(200, 3)) * 0.02 + [0, 0, 0.3]).astype(np.float32)
    pts = np.concatenate([plane_pts, obj])
    plane, mask = native.ransac_plane(pts, 0.01, 500, seed=1)
    assert abs(abs(plane[2]) - 1.0) < 0.02
    assert mask[:3000].mean() > 0.97
    assert mask[3000:].mean() < 0.05


def test_native_box_crop():
    pts = rng.uniform(-1, 1, (1000, 3)).astype(np.float32)
    mask = native.box_crop_mask(pts, [-0.2] * 3, [0.2] * 3)
    ref = (np.abs(pts) <= 0.2).all(axis=1)
    np.testing.assert_array_equal(mask, ref)


def test_native_prep_frame_matches_numpy_fallback():
    """Fused native frame prep == composed numpy chain (crop → finite/z →
    voxel → subsample → pad): same kept-point SET and same n_valid (the
    subsample permutation may differ; both draw deterministically)."""
    from dexgangrasp_tpu.ops.bps import PAD_VALUE

    rng = np.random.default_rng(3)
    H, W = 120, 160
    xs, ys = np.meshgrid(np.linspace(-0.5, 0.5, W),
                         np.linspace(-0.4, 0.4, H))
    frame = np.stack([xs, ys, np.full((H, W), 0.9)],
                     axis=-1).astype(np.float32)
    frame[40:80, 50:90, 2] -= 0.1
    frame += rng.normal(size=frame.shape).astype(np.float32) * 0.001
    frame[3, 3] = np.nan           # finite filter must drop
    frame[5, 5, 2] = 2.0           # z-clip must drop
    roi = np.zeros((H, W), bool)
    roi[20:110, 30:150] = True

    pad_n = 512  # force the subsample branch
    got, n = native.prep_frame(frame, roi, 1.2, 0.006, pad_n, PAD_VALUE)
    lib = native._lib
    native._lib = None
    try:
        ref, n_ref = native.prep_frame(frame, roi, 1.2, 0.006, pad_n,
                                       PAD_VALUE)
    finally:
        native._lib = lib
    assert n == n_ref
    assert got.shape == (pad_n, 3)
    assert (got[n:] == PAD_VALUE).all()
    if lib is not None:  # native really ran
        # the CANDIDATE pools (no subsample cap) must match exactly
        big = 1 << 17
        pool_nat, k1 = native.prep_frame(frame, roi, 1.2, 0.006, big,
                                         PAD_VALUE)
        native._lib = None
        try:
            pool_np, k2 = native.prep_frame(frame, roi, 1.2, 0.006, big,
                                            PAD_VALUE)
        finally:
            native._lib = lib
        assert k1 == k2
        sa = {tuple(r) for r in pool_nat[:k1].tolist()}
        sb = {tuple(r) for r in pool_np[:k2].tolist()}
        assert sa == sb
        # the capped subsample is a subset of that pool
        assert {tuple(r) for r in got[:n].tolist()} <= sa
        # determinism
        got2, n2 = native.prep_frame(frame, roi, 1.2, 0.006, pad_n,
                                     PAD_VALUE)
        assert n2 == n
        np.testing.assert_array_equal(got, got2)
