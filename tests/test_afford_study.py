"""Geometry tests for the affordance part-oracle study
(tools/afford_study.py): part labeling, pinhole z-buffer scene rendering,
and the part-hit metric."""
import numpy as np

from dexgangrasp_tpu.apps.afford_offline import depth_mask_to_points
from dexgangrasp_tpu.data.grasp_geometry import DEFAULT_GRIPPER
from dexgangrasp_tpu.tools.afford_study import (
    make_part_object,
    part_hit_fraction,
    render_scene,
)


def test_make_part_object_labels_long_axis_cap():
    rng = np.random.default_rng(0)
    cloud, part = make_part_object(rng, n_points=2048)
    assert cloud.shape == (2048, 3) and part.shape == (2048,)
    assert 0 < part.sum() < 0.5 * len(part)  # a cap, not a half
    # the part is the extremity: its centroid is farther from the object
    # centroid than the non-part centroid is
    c_part = cloud[part].mean(0)
    c_rest = cloud[~part].mean(0)
    assert np.linalg.norm(c_part) > np.linalg.norm(c_rest)
    # deterministic given the rng state
    cloud2, part2 = make_part_object(np.random.default_rng(0), n_points=2048)
    np.testing.assert_array_equal(part, part2)
    np.testing.assert_allclose(cloud, cloud2)


def test_make_part_object_taper_breaks_end_symmetry():
    """The plain superquadric is centrally symmetric, so the two long-axis
    caps are congruent and appearance alone cannot tell which is the part
    (the partseg ill-posedness).  taper>0 must (a) leave the default
    bit-exact, (b) make the part end the geometrically narrow one, and
    (c) keep the labeled cap on the long axis."""
    # (a) default taper=0.0 is the original shape
    c0, p0 = make_part_object(np.random.default_rng(5), n_points=2048)
    c0b, p0b = make_part_object(np.random.default_rng(5), n_points=2048,
                                taper=0.0)
    np.testing.assert_array_equal(p0, p0b)
    np.testing.assert_allclose(c0, c0b)

    for seed in range(4):
        rng = np.random.default_rng(seed)
        cloud, part = make_part_object(rng, n_points=4096, taper=0.45)
        # the long axis of the tapered cloud
        ext = cloud.max(0) - cloud.min(0)
        axis = int(np.argmax(ext))
        cross = [j for j in range(3) if j != axis]
        coord = cloud[:, axis]
        lo, hi = coord.min(), coord.max()
        tn = (coord - lo) / (hi - lo)
        # (b) cross-section radius near the part cap is visibly smaller
        # than near the far cap
        r = np.linalg.norm(cloud[:, cross], axis=1)
        r_part = r[tn > 0.85].max()
        r_far = r[tn < 0.15].max()
        assert r_part < 0.75 * r_far, (seed, r_part, r_far)
        # (c) the part is still the +end cap along the long axis
        assert part.sum() > 0
        assert tn[part].min() > 0.6
        assert tn[~part].max() < tn[part].min() + 1e-6


def test_render_scene_frame_consistency():
    """The rendered depth+mask must reproject (through the same intrinsics)
    onto the part region of the visible cloud."""
    rng = np.random.default_rng(3)
    cloud, part = make_part_object(rng, n_points=2048)
    scene = render_scene(cloud, part, rng)
    assert scene is not None
    assert scene["depth"].shape == (720, 1280)
    assert scene["mask"].shape == (720, 1280)
    assert scene["mask"].sum() >= 40
    # visible cloud is a subset of the full cloud (same camera frame)
    assert scene["points"].shape[0] <= scene["full_cam"].shape[0]
    # masked-depth reprojection lands on actual part geometry: every
    # reprojected point is within a few mm of SOME full-cloud part point
    part_pts = depth_mask_to_points(scene["depth"], scene["mask"])
    assert part_pts.shape[0] == scene["mask"].sum()
    full_part = scene["full_cam"][scene["part_cam"]]
    d = np.linalg.norm(part_pts[:, None, :] - full_part[None, :, :],
                       axis=-1).min(axis=1)
    assert d.max() < 5e-3


def test_part_hit_fraction_targets_part():
    """A grasp whose sweep volume covers only part points scores 1, one
    covering only non-part points scores 0."""
    # two separated blobs: part at +x, rest at origin
    rng = np.random.default_rng(1)
    rest = rng.normal(size=(300, 3)) * 0.01
    part_blob = rng.normal(size=(300, 3)) * 0.01 + [0.2, 0.0, 0.0]
    cloud = np.concatenate([rest, part_blob])
    part = np.zeros(600, bool)
    part[300:] = True

    g = DEFAULT_GRIPPER
    mid = 0.5 * (g.close_min + g.close_max)
    eye = np.eye(3)[None]
    # palm x-axis = +x world; place the sweep window on each blob
    at_part = np.array([[0.2 - mid, 0.0, 0.0]])
    at_rest = np.array([[-mid, 0.0, 0.0]])
    frac = part_hit_fraction(cloud, part,
                             np.concatenate([at_part, at_rest]),
                             np.concatenate([eye, eye]))
    assert frac[0] > 0.95
    assert frac[1] < 0.05
    # empty sweep → 0, not NaN
    far = part_hit_fraction(cloud, part, np.array([[5.0, 5.0, 5.0]]), eye)
    assert far[0] == 0.0
