"""End-to-end test of the fully-fused frame→grasps device program."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.engine import folding
from dexgangrasp_tpu.engine.frame_pipeline import frame_to_grasps
from dexgangrasp_tpu.models.networks import init_dexgan, init_evaluator
from dexgangrasp_tpu.ops.bps import generate_basis, pad_cloud

# NOTE: every scene builder takes a FRESH rng.  A module-level shared rng
# makes each test's scene depend on how many tests ran before it (the
# round-4 order-dependent failure: the student-branch test drew a cloud the
# radius outlier filter wiped to 0 points when the whole file ran, but not
# in isolation).


def test_frame_to_grasps_end_to_end():
    rng = np.random.default_rng(101)
    (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    gf = folding.fold_generator(gp, gs)
    ef = folding.fold_evaluator(ep, es)
    basis = generate_basis(jax.random.PRNGKey(2), 4096, 0.2)

    # scene: table plane + object blob + a few fliers
    plane = np.concatenate(
        [rng.uniform(-0.3, 0.3, (1200, 2)),
         0.5 + rng.normal(size=(1200, 1)) * 0.002], axis=1)
    obj_center = np.array([0.05, -0.02, 0.35])
    obj = rng.normal(size=(400, 3)) * 0.03 + obj_center
    fliers = rng.normal(size=(6, 3)) * 0.03 + 3.0
    pts = np.concatenate([plane, obj, fliers]).astype(np.float32)
    padded = pad_cloud(pts, 2048)

    # statistical outlier mode: exact o3d-parity semantics (this synthetic
    # cloud is far sparser than a voxel-decimated camera frame, so the
    # radius defaults tuned for 4 mm decimation don't apply)
    g, center, n_obj, clipped = frame_to_grasps(
        gf, ef, basis, jnp.asarray(padded), jnp.asarray(pts.shape[0]),
        jax.random.PRNGKey(3), n_samples=512, top_k=8, ransac_iters=256,
        outlier_method="statistical")

    assert g.transl.shape == (8, 3)
    assert g.score.shape == (8,)
    assert (np.diff(np.asarray(g.score)) <= 1e-6).all()
    # the recovered centroid is the object blob's centroid, not the plane's
    assert np.linalg.norm(np.asarray(center) - obj_center) < 0.02
    assert 300 <= int(n_obj) <= 450
    # rotations valid
    R = np.asarray(g.rot_matrix)
    np.testing.assert_allclose(np.einsum("bij,bkj->bik", R, R),
                               np.broadcast_to(np.eye(3), R.shape), atol=1e-4)


def _toy_scene():
    rng = np.random.default_rng(101)
    plane = np.concatenate(
        [rng.uniform(-0.3, 0.3, (1200, 2)),
         0.5 + rng.normal(size=(1200, 1)) * 0.002], axis=1)
    obj_center = np.array([0.05, -0.02, 0.35])
    obj = rng.normal(size=(400, 3)) * 0.03 + obj_center
    pts = np.concatenate([plane, obj]).astype(np.float32)
    return pad_cloud(pts, 2048), pts.shape[0], obj_center


def test_frame_to_grasps_diffusion_end_to_end():
    """The diffusion-family frame program (incl. guided): same perception
    front-end, DDIM tail — both sampler branches produce valid grasps and
    the guided branch actually shifts the samples (the VJP is live)."""
    from dexgangrasp_tpu.engine.frame_pipeline import (
        frame_to_grasps_diffusion,
    )
    from dexgangrasp_tpu.models.diffusion import DexDiffuser

    model = DexDiffuser()
    dparams = model.init(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    ef = folding.fold_evaluator(ep, es)
    basis = generate_basis(jax.random.PRNGKey(2), 4096, 0.2)
    padded, n_valid, obj_center = _toy_scene()

    common = dict(n_samples=64, top_k=8, steps=4, ransac_iters=256,
                  outlier_method="statistical")
    g, center, n_obj, clipped = frame_to_grasps_diffusion(
        model, dparams, ef, None, basis, jnp.asarray(padded),
        jnp.asarray(n_valid), jax.random.PRNGKey(3), **common)
    assert g.transl.shape == (8, 3)
    assert (np.diff(np.asarray(g.score)) <= 1e-6).all()
    assert np.linalg.norm(np.asarray(center) - obj_center) < 0.02
    R = np.asarray(g.rot_matrix)
    np.testing.assert_allclose(np.einsum("bij,bkj->bik", R, R),
                               np.broadcast_to(np.eye(3), R.shape), atol=1e-4)

    gg, _, _, _ = frame_to_grasps_diffusion(
        model, dparams, ef, None, basis, jnp.asarray(padded),
        jnp.asarray(n_valid), jax.random.PRNGKey(3), guidance_scale=10.0,
        **common)
    # same key → same latents; the guidance VJP must move the samples
    # (untrained evaluator ⇒ near-flat log p, so the shift is small but
    # strictly nonzero — bitwise-equal means the branch is dead)
    assert np.max(np.abs(np.asarray(gg.transl) - np.asarray(g.transl))) > 0
    Rg = np.asarray(gg.rot_matrix)
    np.testing.assert_allclose(np.einsum("bij,bkj->bik", Rg, Rg),
                               np.broadcast_to(np.eye(3), Rg.shape),
                               atol=1e-4)


def test_clipped_flag_reports_buffer_truncation():
    """The perception front-end compacts non-plane candidates into a
    quarter-frame buffer; a frame whose object exceeds that cap must set
    clipped=True instead of silently dropping points (ADVICE r3).  A
    normal frame (small object on a dominant plane) must report False."""
    from dexgangrasp_tpu.engine.frame_pipeline import _segment_center_encode

    rng = np.random.default_rng(101)
    basis = generate_basis(jax.random.PRNGKey(2), 4096, 0.2)
    pad_n = 2048  # quarter-cap = max(1024, 512) = 1024
    key = jax.random.PRNGKey(4)

    # normal: 1200-pt plane + 400-pt object → 400 candidates < 1024
    plane = np.concatenate(
        [rng.uniform(-0.3, 0.3, (1200, 2)),
         0.5 + rng.normal(size=(1200, 1)) * 0.002], axis=1)
    obj = rng.normal(size=(400, 3)) * 0.03 + np.array([0.05, -0.02, 0.35])
    pts = np.concatenate([plane, obj]).astype(np.float32)
    _, _, n_obj, clipped = jax.jit(lambda p, n: _segment_center_encode(
        basis, p, n, key, outlier_method="statistical",
        ransac_iters=256))(jnp.asarray(pad_cloud(pts, pad_n)),
                           jnp.asarray(pts.shape[0]))
    assert int(n_obj) > 0 and not bool(clipped)

    # oversize object: 300-pt plane + 1500-pt object → 1500 candidates
    # exceed the 1024-slot buffer
    plane2 = np.concatenate(
        [rng.uniform(-0.3, 0.3, (300, 2)),
         0.5 + rng.normal(size=(300, 1)) * 0.002], axis=1)
    obj2 = rng.normal(size=(1500, 3)) * 0.05 + np.array([0.0, 0.0, 0.35])
    pts2 = np.concatenate([plane2, obj2]).astype(np.float32)
    _, _, n_obj2, clipped2 = jax.jit(lambda p, n: _segment_center_encode(
        basis, p, n, key, outlier_method="statistical",
        ransac_iters=256))(jnp.asarray(pad_cloud(pts2, pad_n)),
                           jnp.asarray(pts2.shape[0]))
    assert bool(clipped2)
    assert int(n_obj2) <= 1024  # kept set is bounded by the buffer


def test_compact_decimate_uniform_thinning():
    """decimate=True keeps every ~n/out-th masked row when over-full (a
    uniform spatial thinning, not a raster-order prefix), stays packed at
    the front, and is bit-identical to plain compaction when it fits."""
    from dexgangrasp_tpu.engine.frame_pipeline import (
        PAD_VALUE, compact_masked_points)

    # fits: identical to the non-decimated path
    pts = np.arange(60, dtype=np.float32).reshape(20, 3)
    mask = np.zeros(20, bool)
    mask[3:15] = True
    a = np.asarray(compact_masked_points(jnp.asarray(pts),
                                         jnp.asarray(mask), 16))
    b = np.asarray(compact_masked_points(jnp.asarray(pts),
                                         jnp.asarray(mask), 16,
                                         decimate=True))
    np.testing.assert_array_equal(a, b)

    # over-full: 100 masked rows into 10 slots
    pts2 = np.stack([np.arange(100, dtype=np.float32),
                     np.zeros(100, np.float32),
                     np.zeros(100, np.float32)], axis=1)
    full = np.ones(100, bool)
    out = 10
    trunc = np.asarray(compact_masked_points(
        jnp.asarray(pts2), jnp.asarray(full), out))
    deci = np.asarray(compact_masked_points(
        jnp.asarray(pts2), jnp.asarray(full), out, decimate=True))
    assert (trunc[:, 0] == np.arange(10)).all()      # prefix: rows 0..9
    assert (deci[:, 0] == np.arange(0, 100, 10)).all()  # uniform stride
    assert not (deci == PAD_VALUE).any()             # packed, no gaps
    # partial mask over-full: valid region stays [0, min(n, out))
    mask3 = np.zeros(100, bool)
    mask3[::4] = True  # 25 masked rows -> 10 kept
    deci3 = np.asarray(compact_masked_points(
        jnp.asarray(pts2), jnp.asarray(mask3), out, decimate=True))
    assert not (deci3 == PAD_VALUE).any()
    kept = deci3[:, 0]
    assert kept[0] == 0.0 and kept[-1] >= 84.0  # spans the full extent
    assert (np.diff(kept) > 0).all()


def test_frame_to_grasps_multi_two_objects():
    """Whole-scene serving: a plane + two separated blobs → one device
    program returns per-object top-k grasps, centroids near each blob,
    empty trailing slots, and valid rotations everywhere a slot is
    occupied."""
    from dexgangrasp_tpu.engine.frame_pipeline import frame_to_grasps_multi

    (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    gf = folding.fold_generator(gp, gs)
    ef = folding.fold_evaluator(ep, es)
    basis = generate_basis(jax.random.PRNGKey(2), 4096, 0.2)

    local = np.random.default_rng(11)
    plane = np.concatenate(
        [local.uniform(-0.3, 0.3, (1600, 2)),
         0.5 + local.normal(size=(1600, 1)) * 0.002], axis=1)
    c1, c2 = np.array([0.10, 0.0, 0.35]), np.array([-0.12, 0.05, 0.33])
    obj1 = local.normal(size=(350, 3)) * 0.012 + c1
    obj2 = local.normal(size=(220, 3)) * 0.012 + c2
    pts = np.concatenate([plane, obj1, obj2]).astype(np.float32)
    padded = pad_cloud(pts, 4096)

    g, centers, n_objs, clipped = frame_to_grasps_multi(
        gf, ef, basis, jnp.asarray(padded), jnp.asarray(pts.shape[0]),
        jax.random.PRNGKey(3), n_samples=256, top_k=6, max_objects=3,
        ransac_iters=256, outlier_method="statistical",
        cluster_radius=0.02, min_cluster_points=40)
    centers, n_objs = np.asarray(centers), np.asarray(n_objs)

    assert g.transl.shape == (3, 6, 3)
    # two occupied slots, size-descending; third empty
    assert n_objs[0] > 0 and n_objs[1] > 0 and n_objs[2] == 0
    assert n_objs[0] >= n_objs[1]
    # slot 0 = larger blob (obj1), slot 1 = obj2
    assert np.linalg.norm(centers[0] - c1) < 0.02
    assert np.linalg.norm(centers[1] - c2) < 0.02
    assert not np.asarray(clipped)[:2].any()
    for k in range(2):
        R = np.asarray(g.rot_matrix[k])
        np.testing.assert_allclose(np.einsum("bij,bkj->bik", R, R),
                                   np.broadcast_to(np.eye(3), R.shape),
                                   atol=1e-4)
        s = np.asarray(g.score[k])
        assert (np.diff(s) <= 1e-6).all()  # per-object sorted top-k


def test_frame_to_grasps_multi_crowded_scene_finds_all_objects():
    """Regression for the K=4 whole-scene failure: when object points
    outnumber table points, max-inlier RANSAC used to remove a coplanar
    object-top 'plane' instead of the table and every cluster came up
    empty (closed_loop_r4 objects_found=0).  The multi front-end now runs
    the plane fit with a tabletop prior and a half-size candidate buffer
    — all four objects must be found."""
    from dexgangrasp_tpu.engine.frame_pipeline import frame_to_grasps_multi

    (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    gf = folding.fold_generator(gp, gs)
    ef = folding.fold_evaluator(ep, es)
    basis = generate_basis(jax.random.PRNGKey(2), 4096, 0.2)

    local = np.random.default_rng(13)
    table = np.concatenate(
        [local.uniform(-0.25, 0.25, (700, 2)),
         0.5 + local.normal(size=(700, 1)) * 0.002], axis=1)
    centers = np.array([[0.12, 0.12, 0.35], [-0.12, 0.12, 0.35],
                        [0.12, -0.12, 0.35], [-0.12, -0.12, 0.35]])
    # object tops loosely coplanar and 2800 > 700 table points — the
    # max-inlier plane is the object slab, not the table
    objs = [local.normal(size=(450, 3)) * [0.015, 0.015, 0.004] + c
            for c in centers]
    pts = np.concatenate([table] + objs).astype(np.float32)
    padded = pad_cloud(pts, 4096)

    g, got_centers, n_objs, clipped = frame_to_grasps_multi(
        gf, ef, basis, jnp.asarray(padded), jnp.asarray(pts.shape[0]),
        jax.random.PRNGKey(3), n_samples=128, top_k=4, max_objects=4,
        ransac_iters=256, outlier_method="statistical",
        cluster_radius=0.03, min_cluster_points=40)
    n_objs = np.asarray(n_objs)
    got_centers = np.asarray(got_centers)

    assert (n_objs > 0).all(), n_objs
    # every true object matched by exactly one found centroid
    d = np.linalg.norm(got_centers[:, None] - centers[None], axis=-1)
    assert (d.min(axis=1) < 0.03).all()
    assert len(set(d.argmin(axis=1))) == 4


def test_frame_to_grasps_multi_matches_single_on_one_object():
    """With one object in the scene, the multi program's slot-0 perception
    (center, object point count) must agree with the single-object
    program's; both feed the same sampler machinery."""
    from dexgangrasp_tpu.engine.frame_pipeline import (
        frame_to_grasps,
        frame_to_grasps_multi,
    )

    (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    gf = folding.fold_generator(gp, gs)
    ef = folding.fold_evaluator(ep, es)
    basis = generate_basis(jax.random.PRNGKey(2), 4096, 0.2)
    padded, n_valid, obj_center = _toy_scene()

    g1, center1, n1, _ = frame_to_grasps(
        gf, ef, basis, jnp.asarray(padded), jnp.asarray(n_valid),
        jax.random.PRNGKey(3), n_samples=128, top_k=5, ransac_iters=256,
        outlier_method="statistical")
    gm, centers, n_objs, _ = frame_to_grasps_multi(
        gf, ef, basis, jnp.asarray(padded), jnp.asarray(n_valid),
        jax.random.PRNGKey(3), n_samples=128, top_k=5, max_objects=2,
        ransac_iters=256, outlier_method="statistical",
        min_cluster_points=40)

    assert int(np.asarray(n_objs)[1]) == 0
    # same object recovered (clustering keeps a connected superset/subset
    # of the outlier-filtered single-object mask — centers within 2 mm)
    assert np.linalg.norm(np.asarray(centers[0]) - np.asarray(center1)) < 2e-3
    assert abs(int(np.asarray(n_objs)[0]) - int(np.asarray(n1))) < 40


def test_frame_to_grasps_multi_refine_tail_live():
    """The whole-scene program must honor refine_steps (frontier parity
    with the single-object path): refined output differs from unrefined
    for the same key, rotations stay valid, empty slots stay empty."""
    from dexgangrasp_tpu.engine.frame_pipeline import frame_to_grasps_multi

    (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    gf = folding.fold_generator(gp, gs)
    ef = folding.fold_evaluator(ep, es)
    basis = generate_basis(jax.random.PRNGKey(2), 4096, 0.2)
    padded, n_valid, _ = _toy_scene()

    common = dict(n_samples=64, top_k=4, max_objects=2, ransac_iters=256,
                  outlier_method="statistical", min_cluster_points=40)
    g0, _, n0, _ = frame_to_grasps_multi(
        gf, ef, basis, jnp.asarray(padded), jnp.asarray(n_valid),
        jax.random.PRNGKey(3), **common)
    g1, _, n1, _ = frame_to_grasps_multi(
        gf, ef, basis, jnp.asarray(padded), jnp.asarray(n_valid),
        jax.random.PRNGKey(3), refine_steps=3, **common)

    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))
    assert int(np.asarray(n1)[0]) > 0
    # refinement moved the slot-0 grasps
    assert np.max(np.abs(np.asarray(g1.transl[0])
                         - np.asarray(g0.transl[0]))) > 0
    R = np.asarray(g1.rot_matrix[0])
    np.testing.assert_allclose(np.einsum("bij,bkj->bik", R, R),
                               np.broadcast_to(np.eye(3), R.shape),
                               atol=1e-4)


def test_frame_to_grasps_diffusion_student_branch():
    """The distilled-student frame program: one denoiser eval replaces the
    DDIM scan; valid grasps, and the branch is distinct from plain DDIM
    with the same key (it is a different sampler, not a relabel)."""
    from dexgangrasp_tpu.engine.frame_pipeline import (
        frame_to_grasps_diffusion,
        frame_to_grasps_multi_diffusion,
    )
    from dexgangrasp_tpu.models.diffusion import DexDiffuser

    model = DexDiffuser(n_blocks=1, hidden=64, cond_dim=32, t_dim=16)
    dparams = model.init(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    ef = folding.fold_evaluator(ep, es)
    basis = generate_basis(jax.random.PRNGKey(2), 4096, 0.2)
    padded, n_valid, obj_center = _toy_scene()

    common = dict(n_samples=64, top_k=8, steps=4, ransac_iters=256,
                  outlier_method="statistical")
    g, center, _, _ = frame_to_grasps_diffusion(
        model, dparams, ef, None, basis, jnp.asarray(padded),
        jnp.asarray(n_valid), jax.random.PRNGKey(3), student=True,
        **common)
    assert g.transl.shape == (8, 3)
    assert np.linalg.norm(np.asarray(center) - obj_center) < 0.02
    R = np.asarray(g.rot_matrix)
    np.testing.assert_allclose(np.einsum("bij,bkj->bik", R, R),
                               np.broadcast_to(np.eye(3), R.shape),
                               atol=1e-4)
    gd, _, _, _ = frame_to_grasps_diffusion(
        model, dparams, ef, None, basis, jnp.asarray(padded),
        jnp.asarray(n_valid), jax.random.PRNGKey(3), **common)
    assert np.max(np.abs(np.asarray(gd.transl) - np.asarray(g.transl))) > 0

    # whole-scene path with the student tail (+ fused refine).  statistical
    # outlier mode like every other call on this synthetic cloud: the radius
    # defaults (tuned for 4 mm camera decimation) keep only ~40-60 of the
    # 400 object points here and wipe the cloud entirely for some draws —
    # the round-4 order-dependent `n_objs[0] == 0` failure.
    gm, centers, n_objs, _ = frame_to_grasps_multi_diffusion(
        model, dparams, ef, None, basis, jnp.asarray(padded),
        jnp.asarray(n_valid), jax.random.PRNGKey(4), n_samples=32,
        top_k=4, max_objects=2, ransac_iters=256, student=True,
        refine_steps=2, outlier_method="statistical")
    assert gm.transl.shape == (2, 4, 3)
    assert int(n_objs[0]) > 0


def test_frame_to_grasps_set_end_to_end():
    """The set-prediction frame program: same perception front-end, one
    deterministic decoder forward — valid sorted grasps, deterministic
    across calls with the same key, and the fused frontier tail is live."""
    from dexgangrasp_tpu.engine.frame_pipeline import frame_to_grasps_set
    from dexgangrasp_tpu.models.grasp_transformer import GraspTransformer

    model = GraspTransformer(n_queries=8, d_model=64, n_heads=4, n_layers=1)
    sp = model.init(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    ef = folding.fold_evaluator(ep, es)
    basis = generate_basis(jax.random.PRNGKey(2), 4096, 0.2)
    padded, n_valid, obj_center = _toy_scene()

    common = dict(top_k=5, ransac_iters=256, outlier_method="statistical")
    g, center, n_obj, clipped = frame_to_grasps_set(
        model, sp, ef, None, basis, jnp.asarray(padded),
        jnp.asarray(n_valid), jax.random.PRNGKey(3), **common)
    assert g.transl.shape == (5, 3)
    assert (np.diff(np.asarray(g.score)) <= 1e-6).all()
    assert np.linalg.norm(np.asarray(center) - obj_center) < 0.02
    assert int(n_obj) > 0 and not bool(clipped)
    R = np.asarray(g.rot_matrix)
    np.testing.assert_allclose(np.einsum("bij,bkj->bik", R, R),
                               np.broadcast_to(np.eye(3), R.shape),
                               atol=1e-4)
    # no sampling axis: the same key (segmentation RANSAC only) must
    # reproduce the set bit-exactly
    g2, _, _, _ = frame_to_grasps_set(
        model, sp, ef, None, basis, jnp.asarray(padded),
        jnp.asarray(n_valid), jax.random.PRNGKey(3), **common)
    np.testing.assert_array_equal(np.asarray(g.transl),
                                  np.asarray(g2.transl))
    # fused frontier tail moves the grasps and keeps rotations valid
    gr, _, _, _ = frame_to_grasps_set(
        model, sp, ef, None, basis, jnp.asarray(padded),
        jnp.asarray(n_valid), jax.random.PRNGKey(3), refine_steps=3,
        **common)
    assert np.max(np.abs(np.asarray(gr.transl) - np.asarray(g.transl))) > 0
    Rr = np.asarray(gr.rot_matrix)
    np.testing.assert_allclose(np.einsum("bij,bkj->bik", Rr, Rr),
                               np.broadcast_to(np.eye(3), Rr.shape),
                               atol=1e-4)


def test_frames_to_grasps_set_batch_matches_single():
    """The coalescing path's batched set program must reproduce the
    per-frame program exactly (deterministic decode, kernels off)."""
    from dexgangrasp_tpu.engine.frame_pipeline import (
        frame_to_grasps_set,
        frames_to_grasps_set_batch,
    )
    from dexgangrasp_tpu.models.grasp_transformer import GraspTransformer

    model = GraspTransformer(n_queries=8, d_model=64, n_heads=4, n_layers=1)
    sp = model.init(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    ef = folding.fold_evaluator(ep, es)
    basis = generate_basis(jax.random.PRNGKey(2), 4096, 0.2)
    padded, n_valid, _ = _toy_scene()

    common = dict(top_k=4, ransac_iters=256, outlier_method="statistical")
    singles = [frame_to_grasps_set(
        model, sp, ef, None, basis, jnp.asarray(padded),
        jnp.asarray(n_valid), jax.random.PRNGKey(s), use_pallas=False,
        **common) for s in (3, 4)]
    keys = jnp.stack([jax.random.PRNGKey(3), jax.random.PRNGKey(4)])
    pts = jnp.stack([jnp.asarray(padded)] * 2)
    nv = jnp.asarray([n_valid, n_valid])
    gb, centers, n_objs, _ = frames_to_grasps_set_batch(
        model, sp, ef, None, basis, pts, nv, keys, **common)
    for i, (g, c, n, _cl) in enumerate(singles):
        np.testing.assert_allclose(np.asarray(gb.transl[i]),
                                   np.asarray(g.transl), atol=1e-5)
        np.testing.assert_allclose(np.asarray(centers[i]), np.asarray(c),
                                   atol=1e-6)
        assert int(n_objs[i]) == int(n)


def test_frame_to_grasps_multi_set_two_objects():
    """Whole-scene set serving: per-object decoded sets with the same
    slot/empty contract as the other multi programs."""
    from dexgangrasp_tpu.engine.frame_pipeline import (
        frame_to_grasps_multi_set,
    )
    from dexgangrasp_tpu.models.grasp_transformer import GraspTransformer

    model = GraspTransformer(n_queries=8, d_model=64, n_heads=4, n_layers=1)
    sp = model.init(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    ef = folding.fold_evaluator(ep, es)
    basis = generate_basis(jax.random.PRNGKey(2), 4096, 0.2)

    local = np.random.default_rng(11)
    plane = np.concatenate(
        [local.uniform(-0.3, 0.3, (1600, 2)),
         0.5 + local.normal(size=(1600, 1)) * 0.002], axis=1)
    c1, c2 = np.array([0.10, 0.0, 0.35]), np.array([-0.12, 0.05, 0.33])
    obj1 = local.normal(size=(350, 3)) * 0.012 + c1
    obj2 = local.normal(size=(220, 3)) * 0.012 + c2
    pts = np.concatenate([plane, obj1, obj2]).astype(np.float32)
    padded = pad_cloud(pts, 4096)

    g, centers, n_objs, clipped = frame_to_grasps_multi_set(
        model, sp, ef, None, basis, jnp.asarray(padded),
        jnp.asarray(pts.shape[0]), jax.random.PRNGKey(3), top_k=6,
        max_objects=3, ransac_iters=256, outlier_method="statistical",
        cluster_radius=0.02, min_cluster_points=40, refine_steps=2)
    centers, n_objs = np.asarray(centers), np.asarray(n_objs)

    assert g.transl.shape == (3, 6, 3)
    assert n_objs[0] > 0 and n_objs[1] > 0 and n_objs[2] == 0
    assert np.linalg.norm(centers[0] - c1) < 0.02
    assert np.linalg.norm(centers[1] - c2) < 0.02
    for k in range(2):
        R = np.asarray(g.rot_matrix[k])
        np.testing.assert_allclose(np.einsum("bij,bkj->bik", R, R),
                                   np.broadcast_to(np.eye(3), R.shape),
                                   atol=1e-4)
        assert (np.diff(np.asarray(g.score[k])) <= 1e-6).all()


def test_frame_to_grasps_bf16_engine_weights():
    """The fused frame program composes with bf16-cast folded weights
    (engine bf16 serving mode): same scene → same object segmentation,
    scores within the bf16 gate of the f32 run."""
    rng = np.random.default_rng(101)
    (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    gf = folding.fold_generator(gp, gs)
    ef = folding.fold_evaluator(ep, es)
    basis = generate_basis(jax.random.PRNGKey(2), 4096, 0.2)

    plane = np.concatenate(
        [rng.uniform(-0.3, 0.3, (1200, 2)),
         0.5 + rng.normal(size=(1200, 1)) * 0.002], axis=1)
    obj = rng.normal(size=(400, 3)) * 0.03 + [0.05, -0.02, 0.35]
    pts = np.concatenate([plane, obj]).astype(np.float32)
    padded = jnp.asarray(pad_cloud(pts, 2048))
    nv = jnp.asarray(pts.shape[0])

    kw = dict(n_samples=256, top_k=8, ransac_iters=256,
              outlier_method="statistical")
    g32, c32, n32, _ = frame_to_grasps(gf, ef, basis, padded, nv,
                                       jax.random.PRNGKey(3), **kw)
    gb = folding.cast_folded(gf, jnp.bfloat16)
    eb = folding.cast_folded(ef, jnp.bfloat16)
    g16, c16, n16, _ = frame_to_grasps(gb, eb, basis, padded, nv,
                                       jax.random.PRNGKey(3), **kw)
    assert int(n16) == int(n32)  # segmentation (f32 front-end) unchanged
    np.testing.assert_allclose(np.asarray(c16), np.asarray(c32), atol=1e-6)
    assert g16.transl.dtype == jnp.float32
    # same key → same z draw → same candidates; top-8 scores drift-bounded
    assert float(np.mean(np.abs(np.asarray(g16.score)
                                - np.asarray(g32.score)))) < 5e-3
