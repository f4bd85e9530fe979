"""Learned part segmenter (models/partseg.py + tools/partseg_study.py):
architecture shapes, host resize round-trips, a tiny overfit run, and the
production serving path (PartSegSegmenter over the LMP wire protocol —
the real-model replacement for the reference's VLPart stage,
dexafford_prompt.py:20,149-156)."""
import numpy as np
import pytest

from dexgangrasp_tpu.models.partseg import (
    POOL,
    downsample_frame,
    downsample_label,
    padded_hw,
    partseg_apply,
    partseg_init,
    partseg_loss,
    upsample_mask,
)


def test_apply_shapes_and_jit():
    import jax

    params = partseg_init(jax.random.PRNGKey(0), width=8)
    img = np.zeros((2, 48, 80, 3), np.float32)
    logits = jax.jit(partseg_apply)(params, img)
    assert logits.shape == (2, 48, 80, 1)
    assert np.isfinite(np.asarray(logits)).all()


def test_apply_auto_detects_legacy_topology():
    """Pre-upgrade checkpoints (no CoordConv stem, no global-context
    block) must keep applying — both options are read off the params
    structure, not a flag."""
    import jax

    legacy = partseg_init(jax.random.PRNGKey(0), width=8,
                          coords=False, global_ctx=False)
    assert "glob" not in legacy
    assert legacy["stem"]["c1"]["w"].shape[2] == 3
    img = np.random.default_rng(3).uniform(size=(2, 48, 80, 3)
                                           ).astype(np.float32)
    out = jax.jit(partseg_apply)(legacy, img)
    assert out.shape == (2, 48, 80, 1)
    # upgraded topology on the same input
    new = partseg_init(jax.random.PRNGKey(0), width=8)
    assert "glob" in new and new["stem"]["c1"]["w"].shape[2] == 5
    out2 = jax.jit(partseg_apply)(new, img)
    assert out2.shape == (2, 48, 80, 1)
    assert np.isfinite(np.asarray(out2)).all()
    # the global block is live: zeroing its output weights changes logits
    import jax.numpy as jnp

    new_dead = jax.tree_util.tree_map(lambda x: x, new)
    new_dead["glob"] = dict(new["glob"],
                            w2=jnp.zeros_like(new["glob"]["w2"]),
                            b2=jnp.zeros_like(new["glob"]["b2"]))
    out3 = jax.jit(partseg_apply)(new_dead, img)
    assert not np.allclose(np.asarray(out2), np.asarray(out3))


def test_loss_finite_and_grad_nonzero():
    import jax

    params = partseg_init(jax.random.PRNGKey(1), width=8)
    img = np.random.default_rng(0).uniform(size=(2, 16, 24, 3)
                                           ).astype(np.float32)
    lab = np.zeros((2, 16, 24), np.float32)
    lab[:, 4:8, 6:12] = 1.0
    loss, grads = jax.value_and_grad(partseg_loss)(params, img, lab)
    assert np.isfinite(float(loss))
    gnorm = sum(float(np.abs(np.asarray(g)).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0.0


def test_resize_round_trip_geometry():
    # 720x1280 camera frame -> 90x160 -> padded 96x160 -> back to 720x1280
    color = np.zeros((720, 1280, 3), np.uint8)
    img, low_hw = downsample_frame(color)
    assert low_hw == (90, 160)
    assert img.shape == (96, 160, 3)
    assert padded_hw(*low_hw) == (96, 160)

    prob = np.zeros((96, 160), np.float32)
    prob[10:20, 30:40] = 1.0
    mask = upsample_mask(prob, low_hw, (720, 1280))
    assert mask.shape == (720, 1280)
    assert mask[10 * POOL:20 * POOL, 30 * POOL:40 * POOL].all()
    assert mask.sum() == 10 * 10 * POOL * POOL

    # label pooling: a solid full-res blob survives; the pad region is 0
    full = np.zeros((720, 1280), bool)
    full[80:160, 320:480] = True
    lab = downsample_label(full)
    assert lab.shape == (96, 160)
    assert lab[10:20, 40:60].all() and lab[90:].sum() == 0

    # pool=4 variant: 720x1280 -> 180x320 (already multiple of 8)
    img4, low4 = downsample_frame(np.zeros((720, 1280, 3), np.uint8),
                                  pool=4)
    assert low4 == (180, 320) and img4.shape == (184, 320, 3)
    lab4 = downsample_label(full, pool=4)
    assert lab4.shape == (184, 320) and lab4[20:40, 80:120].all()
    m4 = upsample_mask(np.ones((184, 320), np.float32), (180, 320),
                       (720, 1280), pool=4)
    assert m4.shape == (720, 1280) and m4.all()


def test_shade_frame_uses_depth_only():
    """Shading must not leak the part label: two scenes with identical
    depth but different part masks shade identically."""
    from dexgangrasp_tpu.tools.partseg_study import shade_frame

    rng_depth = np.random.default_rng(3)
    depth = np.zeros((96, 128), np.float32)
    depth[30:70, 40:90] = 500.0 + rng_depth.uniform(0, 50, (40, 50))
    a = shade_frame(depth, np.random.default_rng(11))
    b = shade_frame(depth, np.random.default_rng(11))
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.uint8 and a.shape == (96, 128, 3)
    # object pixels shade differently from background
    assert abs(float(a[30:70, 40:90].mean())
               - float(a[:20, :20].mean())) > 2.0


def test_densify_zbuffer_fills_consistently():
    """Gap fill copies (depth, part-flag) pairs from the nearest occupied
    pixel and never reaches past max_px."""
    from dexgangrasp_tpu.tools.partseg_study import densify_zbuffer

    depth = np.zeros((20, 20), np.float32)
    mask = np.zeros((20, 20), bool)
    depth[5, 5] = 400.0            # non-part point
    depth[5, 9] = 600.0
    mask[5, 9] = True              # part point
    d2, m2 = densify_zbuffer(depth, mask, max_px=2)
    assert d2[5, 6] == 400.0 and not m2[5, 6]   # nearest = (5,5)
    assert d2[5, 8] == 600.0 and m2[5, 8]       # nearest = (5,9)
    assert d2[5, 7] in (400.0, 600.0)           # tie -> one of them
    assert d2[15, 15] == 0.0 and not m2[15, 15]  # beyond max_px untouched
    # originals unchanged
    assert depth[5, 6] == 0.0 and d2[5, 5] == 400.0 and m2[5, 9]


def test_partseg_overfits_tiny_scenes():
    """A tiny net overfits a handful of shaded scenes: train IoU well
    above the trivial all-background/all-foreground baselines."""
    from dexgangrasp_tpu.tools.partseg_study import (
        build_scenes, eval_masks, scenes_to_arrays, train_partseg)
    import dexgangrasp_tpu.tools.partseg_study as ps

    old_hw = ps.HW
    ps.HW = (360, 640)  # working res 45x80 -> padded 48x80
    try:
        scenes = build_scenes(6, seed=5, keep_full=False,
                              cam_dist=0.42, part_quantile=0.55)
        imgs, labels = scenes_to_arrays(scenes)
        assert imgs.shape[1:] == (48, 80, 3)
        assert 0.01 < labels.mean() < 0.3
        params = train_partseg(imgs, labels, steps=300, batch_size=4,
                               lr=2e-3, width=8, seed=0, log_every=0)
        m = eval_masks(params, scenes)  # train-set IoU: overfit check
        assert m["iou"] > 0.4, m
        assert m["recall"] > 0.6, m
    finally:
        ps.HW = old_hw


def test_partseg_segmenter_serves_wire_protocol(tmp_path):
    """PartSegSegmenter behind LmpStubServer == a real model serving the
    reference's run_lmp boundary; checkpoint round-trips through
    save_pytrees/load_pytrees."""
    import jax

    from dexgangrasp_tpu.apps.lmp_client import (
        LmpClient, LmpStubServer, PartSegSegmenter)
    from dexgangrasp_tpu.train.checkpoints import save_pytrees

    params = partseg_init(jax.random.PRNGKey(2), width=8)
    ckpt = str(tmp_path / "partseg.npz")
    save_pytrees(ckpt, {"params": params}, meta={"kind": "partseg"})

    seg = PartSegSegmenter(ckpt, threshold=0.5)
    assert seg.meta["kind"] == "partseg"
    assert seg.pool == 8  # default POOL when meta has no pool entry
    save_pytrees(ckpt, {"params": params},
                 meta={"kind": "partseg", "pool": 4})
    assert PartSegSegmenter(ckpt).pool == 4  # checkpoint meta honored
    color = np.random.default_rng(0).integers(
        0, 255, (240, 320, 3), dtype=np.uint8)
    direct = seg(color)
    assert direct.shape == (240, 320) and direct.dtype == bool

    with LmpStubServer(segmenter=seg) as srv:
        mask = LmpClient(srv.endpoint, prompt="handle")(color)
    np.testing.assert_array_equal(mask, direct)


def test_affordance_pipeline_accepts_learned_segmenter():
    """AffordancePipeline(run_lmp=PartSegSegmenter(...)) type-checks the
    callable contract end to end on a synthetic organized frame."""
    import jax

    from dexgangrasp_tpu.apps.lmp_client import PartSegSegmenter

    seg = PartSegSegmenter(partseg_init(jax.random.PRNGKey(4), width=8),
                           threshold=0.0)  # threshold 0 => nonempty mask
    color = np.full((120, 160, 3), 127, np.uint8)
    mask = seg(color)
    assert mask.shape == (120, 160) and mask.any()


def test_online_affordance_loop_with_learned_model(basis):
    """The full DexAfford ONLINE loop against a real network: organized
    camera frame → LMP retry → HTTP wire → PartSegSegmenter forward →
    part-centroid ranking → evaluator sort (reference
    dexafford_prompt.py:130-254, with the learned net standing where
    VLPart does)."""
    import jax

    from dexgangrasp_tpu.apps.afford import AffordancePipeline
    from dexgangrasp_tpu.apps.lmp_client import (
        LmpClient, LmpStubServer, PartSegSegmenter)
    from dexgangrasp_tpu.apps.realtime import RealtimeConfig
    from dexgangrasp_tpu.engine.pipeline import GraspEngine
    from dexgangrasp_tpu.models.networks import init_dexgan, init_evaluator

    (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    engine = GraspEngine(gp, gs, ep, es, basis=basis, cloud_pad=1024)

    # organized frame: table plane + box bump (the realtime-test scene)
    H, W = 48, 64
    xs, ys = np.meshgrid(np.linspace(-0.4, 0.4, W),
                         np.linspace(-0.3, 0.3, H))
    cloud = np.stack([xs, ys, np.full((H, W), 0.8)], axis=-1)
    r = np.random.default_rng(3)
    cloud[16:32, 24:40, 2] -= 0.08 + 0.02 * r.random((16, 16))
    color = np.full((H, W, 3), 180, np.uint8)
    color[16:32, 24:40] = 60

    seg = PartSegSegmenter(partseg_init(jax.random.PRNGKey(7), width=8),
                           threshold=0.0)  # untrained: mask everything
    cfg = RealtimeConfig(base_T_cam=np.eye(4), flange_T_palm=np.eye(4),
                         n_samples=32, thresh=-1.0, num_grasps=5)
    with LmpStubServer(segmenter=seg) as srv:
        pipe = AffordancePipeline(engine, cfg,
                                  run_lmp=LmpClient(srv.endpoint,
                                                    prompt="handle"),
                                  top_k=8)
        out = pipe.step_afford(color, cloud)
    assert out["part_centroid"] is not None
    assert out["filtered"]["rot_matrix"].shape[0] == 8
    s = np.asarray(out["filtered"]["score"])
    assert (np.diff(s) <= 1e-6).all()  # evaluator-sorted desc
