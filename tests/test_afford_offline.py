"""End-to-end test of the DexAfford offline replay pipeline."""
import os

import numpy as np
import pytest

import jax

from dexgangrasp_tpu.apps.afford_offline import (
    DEFAULT_INTRINSICS,
    depth_mask_to_points,
    load_frame,
    run_afford_offline,
)
from dexgangrasp_tpu.engine.pipeline import GraspEngine
from dexgangrasp_tpu.models.networks import init_dexgan, init_evaluator

rng = np.random.default_rng(151)


@pytest.fixture(scope="module")
def engine():
    (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    return GraspEngine(gp, gs, ep, es, cloud_pad=2048)


def test_depth_mask_reprojection_geometry():
    """A flat depth plane at 0.5 m must reproject to z=0.5 points whose x/y
    match the pinhole model."""
    H, W = 60, 80
    depth = np.full((H, W), 500, np.uint16)  # mm
    mask = np.zeros((H, W), bool)
    mask[30, 40] = True
    pts = depth_mask_to_points(depth, mask)
    assert pts.shape == (1, 3)
    np.testing.assert_allclose(pts[0, 2], 0.5, atol=1e-9)
    expect_x = (40 - DEFAULT_INTRINSICS["cx"]) * 0.5 / DEFAULT_INTRINSICS["fx"]
    expect_y = (30 - DEFAULT_INTRINSICS["cy"]) * 0.5 / DEFAULT_INTRINSICS["fy"]
    np.testing.assert_allclose(pts[0, 0], expect_x, rtol=1e-9)
    np.testing.assert_allclose(pts[0, 1], expect_y, rtol=1e-9)
    # zero-depth pixels excluded
    depth[30, 40] = 0
    assert depth_mask_to_points(depth, mask).shape == (0, 3)


def test_run_afford_offline_replay(tmp_path, engine):
    """Full replay: saved frame files → ranked, evaluator-sorted grasps."""
    from dexgangrasp_tpu.apps.camera_io import save_frame

    H, W = 120, 160
    # object blob ~0.5 m in front of the camera
    obj = (rng.normal(size=(600, 3)) * 0.03 + [0.0, 0.0, 0.5]).astype(
        np.float32)
    depth = np.zeros((H, W), np.uint16)
    mask = np.zeros((H, W), bool)
    # a "part" patch: project a handful of object-ish points to pixels
    mask[50:70, 70:90] = True
    depth[50:70, 70:90] = 480  # mm — the part sits on the near face
    save_frame(str(tmp_path), 7, depth=depth, points=obj, mask=mask)

    frame = load_frame(str(tmp_path), "0007")
    assert set(frame) == {"depth", "mask", "points"}

    # intrinsics scaled to the tiny test image (the rig defaults assume
    # 1280x720 and would project the part outside the +-0.2 m clip)
    intr = dict(fx=100.0, fy=100.0, cx=W / 2, cy=H / 2)
    out = run_afford_offline(engine, str(tmp_path), "0007", n_samples=64,
                             top_k=16, intrinsics=intr)
    g = out["grasps"]
    assert g["rot_matrix"].shape == (16, 3, 3)
    # evaluator-sorted desc
    assert (np.diff(g["score"]) <= 1e-7).all()
    assert out["part_centroid"].shape == (1, 3)
    assert out["n_part_points"] > 0
    # the ranked top-k really is biased toward the part: compare mean
    # distance to part centroid vs a random sample of all grasps
    all_g = engine.generate_grasps(
        np.asarray(engine.encode_pcd(obj - obj.mean(0))), 64, seed=0)
    d_top = np.linalg.norm(g["transl"] - out["part_centroid"], axis=1).mean()
    d_all = np.linalg.norm(all_g["transl"] - out["part_centroid"],
                           axis=1).mean()
    assert d_top <= d_all + 1e-6


def test_empty_part_raises():
    from dexgangrasp_tpu.apps.mask_filter import rank_grasps_by_part

    grasps = {"transl": rng.normal(size=(8, 3))}
    with pytest.raises(ValueError, match="empty part cloud"):
        rank_grasps_by_part(grasps, np.zeros((0, 3)))
