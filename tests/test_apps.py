"""App-layer tests: segmentation, mask ranking, offline pipeline on the
real reference scans, affordance replay, realtime pipeline with fakes,
pick-place state machine, refinement, visualization."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.apps.mask_filter import (
    filter_grasps_given_mask_offline,
    part_points_from_mask,
    rank_grasps_by_part,
    sort_grasps,
)
from dexgangrasp_tpu.apps.offline import eval_sampling_and_filtering_real, filter_stages
from dexgangrasp_tpu.apps.pick_place import RobotControl, pose_distance
from dexgangrasp_tpu.apps.realtime import (
    RealtimeConfig,
    RealtimePipeline,
    grasp_to_flange_goals,
)
from dexgangrasp_tpu.apps.segmentation import (
    PlaneSegmentation,
    fit_plane_ransac,
    statistical_outlier_removal,
)
from dexgangrasp_tpu.engine.pipeline import GraspEngine
from dexgangrasp_tpu.engine.refine import (
    refine_grasps_gradient,
    refine_grasps_sampling,
)
from dexgangrasp_tpu.models.networks import init_dexgan, init_evaluator

rng = np.random.default_rng(51)


@pytest.fixture(scope="module")
def engine(basis):
    (_, gp, gs), (_, dp, ds) = init_dexgan(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    return GraspEngine(gp, gs, ep, es, disc_params=dp, disc_state=ds,
                       basis=basis, cloud_pad=2048)


def test_plane_ransac():
    # plane z=0.5 plus an object blob above it
    plane_pts = np.concatenate(
        [rng.uniform(-0.3, 0.3, (2000, 2)),
         0.5 + rng.normal(size=(2000, 1)) * 0.002], axis=1)
    obj_pts = rng.normal(size=(300, 3)) * 0.03 + np.array([0, 0, 0.4])
    pts = np.concatenate([plane_pts, obj_pts])
    plane, inliers = fit_plane_ransac(pts)
    # normal along z, |d| ≈ 0.5
    assert abs(abs(plane[2]) - 1.0) < 0.02
    assert abs(abs(plane[3]) - 0.5) < 0.01
    assert inliers[:2000].mean() > 0.97
    assert inliers[2000:].mean() < 0.05
    seg = PlaneSegmentation()
    obj, normal = seg.plane_seg_with_angle_constrain(pts)
    assert 250 <= obj.shape[0] <= 400


def test_statistical_outlier_removal():
    pts = rng.normal(size=(500, 3)) * 0.05
    outliers = rng.normal(size=(10, 3)) * 0.05 + 5.0
    allp = np.concatenate([pts, outliers])
    kept, idx = statistical_outlier_removal(allp)
    assert (idx < 500).all()  # far blob removed
    assert kept.shape[0] >= 450


def test_mask_ranking():
    grasps = {"transl": rng.normal(size=(50, 3)) * 0.1,
              "rot_matrix": np.tile(np.eye(3), (50, 1, 1)),
              "joint_conf": rng.uniform(size=(50, 12))}
    part = rng.normal(size=(100, 3)) * 0.01 + np.array([0.05, 0, 0])
    idx, centroid = rank_grasps_by_part(grasps, part)
    d = np.linalg.norm(grasps["transl"] - centroid, axis=1)
    assert (np.diff(d[idx]) >= -1e-12).all()
    top = sort_grasps(grasps, idx, 10)
    assert top["transl"].shape == (10, 3)
    # offline variant applies the ±0.2 m clip and centering
    idx2, c2 = filter_grasps_given_mask_offline(
        grasps, part + 1.0, np.array([1.0, 1.0, 1.0]))
    assert len(idx2) == 50


def test_part_points_from_mask():
    cloud = rng.normal(size=(8, 10, 3)) * 0.05
    mask = np.zeros((8, 10), bool)
    mask[2:4, 3:6] = True
    part = part_points_from_mask(cloud.reshape(-1, 3), mask, (8, 10, 3),
                                 np.zeros(3))
    assert part.shape[0] <= 6  # 6 masked pixels, some maybe clipped


def test_offline_app_on_real_scans(engine, real_objects_dir):
    """The canonical offline flow on the shipped real scans: untrained nets
    → scores cluster near 0.5, so use permissive thresholds."""
    results = eval_sampling_and_filtering_real(
        engine, real_objects_dir, n_samples=64,
        thresh_succ_list=[0.0, 0.1, 0.2], seed=0)
    assert len(results) == 7
    for obj, r in results.items():
        assert r["grasps"]["rot_matrix"].shape == (64, 3, 3)


def test_filter_stages_progressive(engine, basis):
    bps = rng.uniform(0, 0.2, 4096).astype(np.float32)
    grasps = engine.generate_grasps(bps, 128, seed=1)
    med = float(np.median(grasps["score"]))
    out = filter_stages(engine, bps, grasps, 128,
                        thresh_succ_list=[med - 0.01, med], verbose=False)
    assert out["rot_matrix"].shape[0] == int((grasps["score"] > med).sum())


def test_realtime_pipeline_with_fakes(engine):
    # synthetic organized frame: table plane + box object
    H, W = 60, 80
    xs, ys = np.meshgrid(np.linspace(-0.4, 0.4, W),
                         np.linspace(-0.3, 0.3, H))
    depth = np.full((H, W), 0.8)
    cloud = np.stack([xs, ys, depth], axis=-1)
    # object bump in the middle
    cloud[20:40, 30:50, 2] -= 0.08 + 0.02 * rng.random((20, 20))
    base_T_cam = np.eye(4)
    base_T_cam[:3, 3] = [0, 0, 1.5]
    base_T_cam[:3, :3] = np.diag([1, -1, -1])  # camera looks down
    cfg = RealtimeConfig(base_T_cam=base_T_cam,
                         flange_T_palm=np.eye(4), n_samples=64,
                         thresh=-1.0, num_grasps=5)

    published = {}

    class FakePub:
        def publish(self, goals):
            published.update(goals)

    pipe = RealtimePipeline(engine, cfg, publisher=FakePub())
    out = pipe.step(cloud=cloud.reshape(H, W, 3))
    assert len(out["goals"]) == 5
    assert published  # publisher invoked
    g0 = out["goals"]["0"]
    assert set(g0) == {"inter", "pick"}
    # inter pose backs off 0.16 m from pick along palm x
    p_pick = np.array([g0["pick"]["position"][k] for k in "xyz"])
    p_inter = np.array([g0["inter"]["position"][k] for k in "xyz"])
    assert 0.0 < np.linalg.norm(p_pick - p_inter) < 0.17


def _organized_test_frame(H=60, W=80):
    xs, ys = np.meshgrid(np.linspace(-0.4, 0.4, W),
                         np.linspace(-0.3, 0.3, H))
    depth = np.full((H, W), 0.8)
    cloud = np.stack([xs, ys, depth], axis=-1)
    cloud[20:40, 30:50, 2] -= 0.08 + 0.02 * rng.random((20, 20))
    return cloud.astype(np.float32)


def _realtime_cfg(n_samples=64, num_grasps=5):
    base_T_cam = np.eye(4)
    base_T_cam[:3, 3] = [0, 0, 1.5]
    base_T_cam[:3, :3] = np.diag([1, -1, -1])
    # the toy frame is far sparser than voxel-decimated camera density →
    # statistical outlier mode (the radius defaults would drop everything)
    return RealtimeConfig(base_T_cam=base_T_cam, flange_T_palm=np.eye(4),
                          n_samples=n_samples, thresh=-1.0,
                          num_grasps=num_grasps,
                          frame_kwargs={"outlier_method": "statistical",
                                        "ransac_iters": 256})


def test_realtime_fused_diffusion_family(basis):
    """The closed-loop frame program serves the diffusion family (VERDICT
    r2 next-2): RealtimePipeline.step_fused auto-dispatches on the engine
    type, both unguided and guided."""
    from dexgangrasp_tpu.engine.diffusion_pipeline import DiffusionEngine

    cloud = _organized_test_frame()
    cfg = _realtime_cfg(n_samples=32, num_grasps=4)

    for gs in (0.0, 5.0):
        eng = DiffusionEngine.from_checkpoints(
            None, basis=basis, ddim_steps=4, guidance_scale=gs,
            use_ddim_kernel=False)
        pipe = RealtimePipeline(eng, cfg)
        out = pipe.step_fused(cloud=cloud, pad_n=2048, voxel=0.004)
        assert len(out["goals"]) == 4
        assert out["filtered"]["rot_matrix"].shape == (4, 3, 3)
        R = out["filtered"]["rot_matrix"]
        np.testing.assert_allclose(np.einsum("bij,bkj->bik", R, R),
                                   np.broadcast_to(np.eye(3), R.shape),
                                   atol=1e-4)


def test_realtime_fused_set_family(basis):
    """The closed-loop frame program serves the set-prediction family:
    RealtimePipeline auto-dispatches SetEngine to frame_to_grasps_set
    (single, batch and whole-scene paths), returns min(num_grasps,
    n_queries) grasps, and batch slot 0 reproduces the single-frame
    result (deterministic decode)."""
    from dexgangrasp_tpu.engine.set_pipeline import SetEngine
    from dexgangrasp_tpu.models.grasp_transformer import GraspTransformer
    from dexgangrasp_tpu.models.networks import init_evaluator

    model = GraspTransformer(n_queries=8, d_model=64, n_heads=4,
                             n_layers=1)
    params = model.init(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    eng = SetEngine(params, ep, es, model=model, basis=basis,
                    cloud_pad=2048)
    cloud = _organized_test_frame()
    pipe = RealtimePipeline(eng, _realtime_cfg(n_samples=32, num_grasps=4))

    out = pipe.step_fused(cloud=cloud, pad_n=2048, seed=0)
    assert out["ok"]
    assert out["filtered"]["rot_matrix"].shape == (4, 3, 3)
    assert len(out["goals"]) == 4
    R = out["filtered"]["rot_matrix"]
    np.testing.assert_allclose(np.einsum("bij,bkj->bik", R, R),
                               np.broadcast_to(np.eye(3), R.shape),
                               atol=1e-4)

    # num_grasps > n_queries: the set caps at n_queries, goals follow suit
    pipe_big = RealtimePipeline(eng, _realtime_cfg(n_samples=32,
                                                   num_grasps=12))
    out_big = pipe_big.step_fused(cloud=cloud, pad_n=2048, seed=0)
    assert out_big["filtered"]["rot_matrix"].shape == (8, 3, 3)
    assert len(out_big["goals"]) == 8

    # coalescing path parity
    batched = pipe.step_fused_batch([cloud, cloud], pad_n=2048,
                                    seeds=[0, 1])
    assert batched[0]["ok"] and batched[1]["ok"]
    np.testing.assert_allclose(out["filtered"]["transl"],
                               batched[0]["filtered"]["transl"],
                               rtol=1e-5, atol=1e-5)

    # whole-scene path dispatches and returns one result per slot
    outs = pipe.step_fused_multi(cloud=cloud, pad_n=2048, seed=0,
                                 max_objects=2, min_cluster_points=20)
    assert len(outs) == 2
    assert outs[0]["ok"]
    assert outs[0]["filtered"]["rot_matrix"].shape == (4, 3, 3)


def test_realtime_run_fused_overlap(engine):
    """Double-buffered serving (run_fused): results arrive per frame, in
    order, identical to the serial step_fused path (same seeds)."""
    cloud = _organized_test_frame()
    cfg = _realtime_cfg(n_samples=32, num_grasps=3)
    pipe = RealtimePipeline(engine, cfg)

    serial = [pipe.step_fused(cloud=cloud, pad_n=2048, seed=s)
              for s in range(3)]
    overlapped = list(pipe.run_fused([cloud] * 3, pad_n=2048))
    assert len(overlapped) == 3
    for a, b in zip(serial, overlapped):
        assert a["ok"] and b["ok"]
        assert np.isfinite(a["filtered"]["transl"]).all()
        np.testing.assert_allclose(a["filtered"]["transl"],
                                   b["filtered"]["transl"], atol=1e-6)
        np.testing.assert_allclose(a["pc_center"], b["pc_center"],
                                   atol=1e-6)


def test_realtime_fused_empty_frame_is_flagged(engine):
    """A frame with no object (pure plane) must come back ok=False with
    empty goals, never NaN flange poses (failure-detection contract)."""
    H, W = 40, 60
    xs, ys = np.meshgrid(np.linspace(-0.4, 0.4, W),
                         np.linspace(-0.3, 0.3, H))
    plane = np.stack([xs, ys, np.full((H, W), 0.8)],
                     axis=-1).astype(np.float32)
    pipe = RealtimePipeline(engine, _realtime_cfg(n_samples=32,
                                                  num_grasps=3))
    out = pipe.step_fused(cloud=plane, pad_n=2048)
    assert out["ok"] is False
    assert out["goals"] == {}


def test_grasp_to_flange_goals_geometry():
    R = np.eye(3)
    goals = grasp_to_flange_goals(np.array([0.1, 0, 0.5]), R,
                                  np.zeros(3), np.eye(4), np.eye(4))
    p_pick = np.array([goals["pick"]["position"][k] for k in "xyz"])
    p_inter = np.array([goals["inter"]["position"][k] for k in "xyz"])
    np.testing.assert_allclose(p_pick - p_inter, [0.16, 0, 0], atol=1e-12)


def test_pick_place_state_machine():
    calls = []

    class FakeArm:
        def __init__(self):
            self.pose = {"position": {"x": 0, "y": 0, "z": 0},
                         "orientation": {"x": 0, "y": 0, "z": 0, "w": 1}}

        def move_to(self, pose):
            calls.append(("move", pose))
            self.pose = pose

        def current_pose(self):
            return self.pose

    class FakeGripper:
        def open(self):
            calls.append(("open",))

        def close(self):
            calls.append(("close",))

    home = {"position": {"x": 0, "y": 0, "z": 0.5},
            "orientation": {"x": 0, "y": 0, "z": 0, "w": 1}}
    place = {"position": {"x": 0.3, "y": 0.3, "z": 0.3},
             "orientation": {"x": 0, "y": 0, "z": 0, "w": 1}}
    rc = RobotControl(FakeArm(), FakeGripper(), home, place, settle_s=0.0)
    goals = {"0": {
        "inter": {"position": {"x": 0.1, "y": 0, "z": 0.4},
                  "orientation": {"x": 0, "y": 0, "z": 0, "w": 1}},
        "pick": {"position": {"x": 0.1, "y": 0, "z": 0.3},
                 "orientation": {"x": 0, "y": 0, "z": 0, "w": 1}},
    }}
    assert rc.on_goal_message(str(goals))
    kinds = [c[0] for c in calls]
    assert kinds == ["open", "move", "move", "move", "close", "move",
                     "move", "open", "move"]


def test_refinement_gradient_improves(engine, basis):
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    g = engine.generate(np.asarray(bps), 32, seed=0)
    rot, transl, joints, traj = refine_grasps_gradient(
        engine.eva_folded, bps, g.rot_matrix, g.transl, g.joint_conf,
        num_steps=5)
    traj = np.asarray(traj)
    assert traj.shape == (6, 32)
    # gradient ascent must not reduce the mean success materially
    assert traj[-1].mean() >= traj[0].mean() - 1e-3
    # translation moved ≤ 1 cm per step
    assert np.linalg.norm(np.asarray(transl) - np.asarray(g.transl),
                          axis=1).max() <= 0.05 + 1e-6


def test_refinement_sampling_monotone(engine, basis):
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    g = engine.generate(np.asarray(bps), 16, seed=0)
    rot, transl, joints, traj = refine_grasps_sampling(
        engine.eva_folded, bps, g.rot_matrix, g.transl, g.joint_conf,
        jax.random.PRNGKey(0), num_steps=5)
    assert np.asarray(traj).shape == (6, 16)
    assert np.isfinite(np.asarray(traj)).all()


def test_visualization_smoke(tmp_path, engine, real_objects_dir):
    from dexgangrasp_tpu.utils import visualization as viz

    pcd = os.path.join(real_objects_dir, "object", "red_mug.pcd")
    bps = np.load(os.path.join(real_objects_dir, "bps", "red_mug.npy")).ravel()
    grasps = engine.generate_grasps(bps, 16, seed=0)
    p1 = viz.show_generated_grasp_distribution(
        pcd, grasps, save_path=str(tmp_path / "dist.png"))
    assert os.path.isfile(p1)
    p2 = viz.show_grasp_and_object(
        pcd, grasps["transl"][0], grasps["rot_matrix"][0],
        grasps["joint_conf"][0], save_path=str(tmp_path / "one.png"))
    assert os.path.isfile(p2)
    p3 = viz.plot_confusion_matrix(
        np.array([0, 1, 1, 0]), np.array([0, 1, 0, 0]),
        save_path=str(tmp_path / "cm.png"))
    assert os.path.isfile(p3)
    p4 = viz.show_refinement_trajectory(
        rng.random((6, 8)), save_path=str(tmp_path / "ref.png"))
    assert os.path.isfile(p4)


def test_grasp_service_roundtrip(engine):
    """The HTTP serving daemon (apps/serve.py): client posts an organized
    frame, gets goals + top-k grasps; health endpoint reports family;
    malformed requests get a 400 and the server keeps serving."""
    from urllib.error import HTTPError
    from urllib.request import Request, urlopen

    from dexgangrasp_tpu.apps.serve import GraspServer, GraspServiceClient

    cloud = _organized_test_frame()
    pipe = RealtimePipeline(engine, _realtime_cfg(n_samples=32,
                                                  num_grasps=3))
    with GraspServer(pipe, pad_n=2048, voxel=0.004) as srv:
        client = GraspServiceClient(srv.endpoint)
        assert client.healthz().startswith("ok gan")
        out = client(cloud, seed=0)
        assert out["ok"] is True
        assert out["rot_matrix"].shape == (3, 3, 3)
        assert set(out["goals"]["0"]) == {"inter", "pick"}
        # same seed → same grasps (deterministic serving)
        out2 = client(cloud, seed=0)
        np.testing.assert_allclose(out["transl"], out2["transl"], atol=0)
        # malformed body → 400, server stays alive
        req = Request(srv.endpoint + "/grasps", data=b"garbage")
        try:
            urlopen(req, timeout=10)
            assert False, "expected HTTPError"
        except HTTPError as e:
            assert e.code == 400
        assert client.healthz().startswith("ok")


def test_step_fused_batch_parity(engine):
    """The batched frame program (frames_to_grasps_batch via vmap) must
    produce EXACTLY the per-frame program's results for the same seeds
    (same PRNG keys, kernels off on both paths on CPU)."""
    clouds = [_organized_test_frame(), _organized_test_frame(H=50, W=70)]
    # pad both to the same prep shape (the batch axis requires it)
    pipe = RealtimePipeline(engine, _realtime_cfg(n_samples=32,
                                                  num_grasps=3))
    singles = [pipe.step_fused(cloud=c, pad_n=2048, seed=s)
               for s, c in enumerate(clouds)]
    batched = pipe.step_fused_batch(clouds, pad_n=2048, seeds=[0, 1])
    assert len(batched) == 2
    for s, b in zip(singles, batched):
        assert s["ok"] and b["ok"]
        assert s["n_obj"] == b["n_obj"]
        np.testing.assert_allclose(s["pc_center"], b["pc_center"],
                                   atol=1e-6)
        np.testing.assert_allclose(s["filtered"]["transl"],
                                   b["filtered"]["transl"], atol=1e-5)
        np.testing.assert_allclose(s["filtered"]["score"],
                                   b["filtered"]["score"], atol=1e-5)


def test_step_fused_batch_diffusion_guided(basis):
    """Batched serving of the guided-diffusion production recipe: batch
    results match per-frame guided serving for the same seeds."""
    from dexgangrasp_tpu.engine.diffusion_pipeline import DiffusionEngine

    cloud = _organized_test_frame()
    cfg = _realtime_cfg(n_samples=16, num_grasps=3)
    eng = DiffusionEngine.from_checkpoints(
        None, basis=basis, ddim_steps=3, guidance_scale=5.0,
        use_ddim_kernel=False)
    pipe = RealtimePipeline(eng, cfg)
    single = pipe.step_fused(cloud=cloud, pad_n=2048, seed=7)
    batched = pipe.step_fused_batch([cloud, cloud], pad_n=2048,
                                    seeds=[7, 8])
    assert batched[0]["ok"] and batched[1]["ok"]
    # vmap batching reassociates the matmul reductions → float noise at
    # ~1e-7 relative (untrained-diffusion transl magnitudes are ~1e2)
    np.testing.assert_allclose(single["filtered"]["transl"],
                               batched[0]["filtered"]["transl"],
                               rtol=1e-5, atol=1e-4)
    # different seed in slot 1 → different grasps (keys really per-slot)
    assert not np.allclose(batched[0]["filtered"]["transl"],
                           batched[1]["filtered"]["transl"])


def test_grasp_service_coalesced_batching(engine):
    """The serving daemon with max_batch>1: concurrent clients are
    coalesced into one device program; every client gets its own
    seed-deterministic result (identical to max_batch=1 serving)."""
    from concurrent.futures import ThreadPoolExecutor

    from dexgangrasp_tpu.apps.serve import GraspServer, GraspServiceClient

    cloud = _organized_test_frame()
    pipe = RealtimePipeline(engine, _realtime_cfg(n_samples=32,
                                                  num_grasps=3))
    # reference results from the non-batching server
    with GraspServer(pipe, pad_n=2048, voxel=0.004) as srv:
        client = GraspServiceClient(srv.endpoint)
        ref = [client(cloud, seed=s) for s in range(4)]

    with GraspServer(pipe, pad_n=2048, voxel=0.004, max_batch=4,
                     batch_window_ms=50.0) as srv:
        client = GraspServiceClient(srv.endpoint)
        # warm the compile caches (bucket sizes 1 and 4)
        client(cloud, seed=0)
        with ThreadPoolExecutor(max_workers=4) as ex:
            outs = list(ex.map(lambda s: client(cloud, seed=s), range(4)))
        stats = client.stats()
    for s, (r, o) in enumerate(zip(ref, outs)):
        assert o["ok"] is True
        np.testing.assert_allclose(r["transl"], o["transl"], atol=1e-5)
        np.testing.assert_allclose(r["score"], o["score"], atol=1e-5)
    # observability: /stats saw every request, no errors, and at least
    # one multi-request coalesced batch
    assert stats["requests"] == 5 and stats["errors"] == 0
    assert stats["max_batch"] == 4
    assert any(int(k) > 1 for k in stats["batch_size_hist"])
    assert "p50_ms" in stats


def test_grasp_service_hot_reload(basis):
    """POST /reload hot-swaps serving weights without restart: same-seed
    requests differ across the swap, stats count it, and a server
    without an engine_factory refuses with 501."""
    from urllib.error import HTTPError

    from dexgangrasp_tpu.apps.serve import GraspServer, GraspServiceClient

    cloud = _organized_test_frame()
    cfg = _realtime_cfg(n_samples=32, num_grasps=3)

    def make_engine(seed):
        (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(seed))
        _, ep, es = init_evaluator(jax.random.PRNGKey(seed + 1))
        return GraspEngine(gp, gs, ep, es, basis=basis, cloud_pad=2048)

    calls = []

    def factory(gen, eva):
        calls.append((gen, eva))
        return make_engine(9)

    pipe = RealtimePipeline(make_engine(0), cfg)
    with GraspServer(pipe, pad_n=2048, voxel=0.004,
                     engine_factory=factory) as srv:
        client = GraspServiceClient(srv.endpoint)
        before = client(cloud, seed=5)
        out = client.reload(gen="new_gen.npz", eva="new_eva.npz")
        assert out["ok"] is True and out["family"] == "gan"
        assert calls == [("new_gen.npz", "new_eva.npz")]
        after = client(cloud, seed=5)
        # same seed, same frame — different weights → different grasps
        assert not np.allclose(before["transl"], after["transl"])
        assert client.stats()["reloads"] == 1

    with GraspServer(pipe, pad_n=2048, voxel=0.004) as srv:
        client = GraspServiceClient(srv.endpoint)
        try:
            client.reload()
            assert False, "expected HTTPError 501"
        except HTTPError as e:
            assert e.code == 501


def test_plane_first_segmentation_parity(engine):
    """The TPU-efficient plane-first perception order (RANSAC → compact →
    outlier pass on the quarter buffer) must agree with the reference
    order (outlier pass on the full frame → RANSAC) on well-formed
    frames: same object extent, centroid, and encoding."""
    import jax.numpy as jnp

    from dexgangrasp_tpu.engine.frame_pipeline import _segment_center_encode
    from dexgangrasp_tpu.ops.bps import PAD_VALUE, pad_cloud

    # deterministic frame (module rng state depends on test order)
    local = np.random.default_rng(123)
    xs, ys = np.meshgrid(np.linspace(-0.4, 0.4, 80),
                         np.linspace(-0.3, 0.3, 60))
    frame = np.stack([xs, ys, np.full((60, 80), 0.8)], axis=-1)
    frame[20:40, 30:50, 2] -= 0.08 + 0.02 * local.random((20, 20))
    cloud = frame.astype(np.float32).reshape(-1, 3)
    padded, n_valid = pad_cloud(cloud, 8192), cloud.shape[0]
    basis = engine.encoder.basis
    key = jax.random.PRNGKey(4)

    outs = {}
    for pf in (False, True):
        outs[pf] = jax.jit(
            lambda pf=pf: _segment_center_encode(
                basis, jnp.asarray(padded), jnp.asarray(n_valid), key,
                outlier_method="statistical", ransac_iters=256,
                plane_first=pf))()
    bps0, c0, n0, _ = map(np.asarray, outs[False])
    bps1, c1, n1, _ = map(np.asarray, outs[True])
    assert int(n1) > 0
    # both orders find the same object (plane fully removed, centroid
    # within 1 mm).  Extents differ at the boundary: the full-frame
    # outlier statistics of the reference order are dominated by the
    # dense plane (tight threshold → drops object-edge points), while
    # plane-first computes them over the object only and retains them —
    # closer to the full-object encodings the models trained on.
    assert int(n1) >= int(n0)  # plane-first never over-prunes vs old
    assert int(n1) <= int(n0) * 1.4
    # centroid shift from boundary-point differences stays well under
    # the 4-6 mm serving voxel
    np.testing.assert_allclose(c0, c1, atol=3e-3)
    # the BPS distance fields agree to the boundary-point scale (cm)
    assert float(np.max(np.abs(bps0 - bps1))) < 0.03
    assert float(np.mean(np.abs(bps0 - bps1))) < 0.01


def test_grasp_service_soak_mixed_workload(engine, basis):
    """Daemon robustness under a mixed concurrent workload: grasp
    requests, hot reloads, malformed bodies, and stats polls all racing.
    Every grasp request must succeed (reload drains in-flight permits
    atomically — no torn weight swaps), counters must reconcile, and the
    server must stay serving."""
    from concurrent.futures import ThreadPoolExecutor
    from urllib.error import HTTPError
    from urllib.request import Request, urlopen

    from dexgangrasp_tpu.apps.serve import GraspServer, GraspServiceClient

    cloud = _organized_test_frame()
    cfg = _realtime_cfg(n_samples=32, num_grasps=3)

    def factory(gen, eva):
        (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(11))
        _, ep, es = init_evaluator(jax.random.PRNGKey(12))
        return GraspEngine(gp, gs, ep, es, basis=basis, cloud_pad=2048)

    pipe = RealtimePipeline(factory(None, None), cfg)
    # pre-compile every bucket shape (1, 2, 4) — on a loaded single-CPU
    # host the compiles otherwise land inside the concurrent phase and
    # can blow the request timeout
    for b in (2, 4):
        pipe.step_fused_batch([cloud] * b, pad_n=2048, voxel=0.004,
                              seeds=list(range(b)))
    with GraspServer(pipe, pad_n=2048, voxel=0.004, max_batch=4,
                     batch_window_ms=5.0, engine_factory=factory,
                     max_inflight=2) as srv:
        client = GraspServiceClient(srv.endpoint, timeout_s=300.0)
        client(cloud, seed=0)  # warm

        n_grasp, n_reload, n_bad = 12, 3, 4

        def do_grasp(s):
            out = client(cloud, seed=s)
            assert out["ok"] is True
            assert np.isfinite(out["transl"]).all()
            return "g"

        def do_reload(_):
            assert client.reload()["ok"] is True
            return "r"

        def do_bad(_):
            try:
                urlopen(Request(srv.endpoint + "/grasps", data=b"junk"),
                        timeout=30)
                raise AssertionError("expected 400")
            except HTTPError as e:
                assert e.code == 400
            return "b"

        def do_stats(_):
            assert "requests" in client.stats()
            return "s"

        jobs = ([(do_grasp, s) for s in range(n_grasp)]
                + [(do_reload, i) for i in range(n_reload)]
                + [(do_bad, i) for i in range(n_bad)]
                + [(do_stats, i) for i in range(4)])
        rng_local = np.random.default_rng(0)
        rng_local.shuffle(jobs)
        with ThreadPoolExecutor(max_workers=6) as ex:
            results = list(ex.map(lambda fa: fa[0](fa[1]), jobs))
        assert results.count("g") == n_grasp

        stats = client.stats()
        assert stats["requests"] == n_grasp + 1  # + the warm request
        assert stats["errors"] == n_bad
        assert stats["reloads"] == n_reload
        assert stats["not_ok_frames"] == 0
        assert client.healthz().startswith("ok")


def test_realtime_fused_refined_frontier(basis):
    """The composed-frontier recipe (guided DDIM → evaluator-gradient
    refinement → rescore → top-k) serves as ONE fused frame program:
    refinement moves the grasps, served rotations stay orthonormal
    (SO(3) projection before the robot sees them), goals build."""
    from dexgangrasp_tpu.engine.diffusion_pipeline import DiffusionEngine

    cloud = _organized_test_frame()
    cfg = _realtime_cfg(n_samples=16, num_grasps=3)

    outs = {}
    for rs in (0, 4):
        eng = DiffusionEngine.from_checkpoints(
            None, basis=basis, ddim_steps=3, guidance_scale=5.0,
            use_ddim_kernel=False, refine_steps=rs)
        pipe = RealtimePipeline(eng, cfg)
        outs[rs] = pipe.step_fused(cloud=cloud, pad_n=2048, voxel=0.004,
                                   seed=3)
    assert outs[0]["ok"] and outs[4]["ok"]
    # the refinement stage executed: grasps moved (movement magnitude is
    # gradient-sized — ~1e-5 m on random-init weights whose evaluator
    # field is nearly flat; quality effect is measured on trained
    # checkpoints in runs/best_pipeline_refined.json)
    delta = np.max(np.abs(outs[0]["filtered"]["transl"]
                          - outs[4]["filtered"]["transl"]))
    assert delta > 1e-8, delta
    # and the served rotations are valid SO(3)
    R = outs[4]["filtered"]["rot_matrix"]
    np.testing.assert_allclose(np.einsum("bij,bkj->bik", R, R),
                               np.broadcast_to(np.eye(3), R.shape),
                               atol=1e-4)
    dets = np.linalg.det(R)
    np.testing.assert_allclose(dets, 1.0, atol=1e-4)
    assert len(outs[4]["goals"]) == 3


def test_grasp_service_concurrent_reloads(engine, basis):
    """Concurrent /reload requests must serialize, not deadlock (each
    drain takes ALL in-flight permits — without the reload lock two
    drains would each hold half and wait forever)."""
    from concurrent.futures import ThreadPoolExecutor

    from dexgangrasp_tpu.apps.serve import GraspServer, GraspServiceClient

    def factory(gen, eva):
        (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(21))
        _, ep, es = init_evaluator(jax.random.PRNGKey(22))
        return GraspEngine(gp, gs, ep, es, basis=basis, cloud_pad=2048)

    pipe = RealtimePipeline(engine, _realtime_cfg(n_samples=16,
                                                  num_grasps=2))
    with GraspServer(pipe, pad_n=2048, max_inflight=2,
                     engine_factory=factory) as srv:
        client = GraspServiceClient(srv.endpoint, timeout_s=60.0)
        with ThreadPoolExecutor(max_workers=4) as ex:
            outs = list(ex.map(lambda i: client.reload(), range(4)))
        assert all(o["ok"] for o in outs)
        assert client.stats()["reloads"] == 4


def test_step_fused_multi_two_objects(engine):
    """Whole-scene app serving: an organized frame with TWO depth blobs →
    step_fused_multi returns one ok result per object with distinct
    centroids and per-object goals, empty slots marked ok=False."""
    local = np.random.default_rng(5)
    xs, ys = np.meshgrid(np.linspace(-0.4, 0.4, 80),
                         np.linspace(-0.3, 0.3, 60))
    frame = np.stack([xs, ys, np.full((60, 80), 0.8)], axis=-1)
    # smooth blob surfaces (5 mm roughness — a voxel-decimated camera
    # frame's point spacing; 2 cm roughness would legitimately split a
    # blob at the default 2 cm cluster radius)
    frame[10:25, 10:25, 2] -= 0.08 + 0.005 * local.random((15, 15))
    frame[35:50, 50:70, 2] -= 0.09 + 0.005 * local.random((15, 20))
    cloud = frame.astype(np.float32)

    pipe = RealtimePipeline(engine, _realtime_cfg(n_samples=32,
                                                  num_grasps=3))
    # pad_n must hold the full frame: subsampling a 4800-pt frame into
    # 2048 slots doubles point spacing past the 2 cm cluster radius
    out = pipe.step_fused_multi(cloud=cloud, pad_n=8192, voxel=0.004,
                                seed=0, max_objects=3,
                                min_cluster_points=25)
    assert len(out) == 3
    assert out[0]["ok"] and out[1]["ok"] and not out[2]["ok"]
    assert out[0]["n_obj"] >= out[1]["n_obj"] > 0
    # the two object centroids are far apart (distinct blobs)
    d = np.linalg.norm(np.asarray(out[0]["pc_center"])
                       - np.asarray(out[1]["pc_center"]))
    assert d > 0.1
    for r in out[:2]:
        assert len(r["goals"]) == 3
        R = r["filtered"]["rot_matrix"]
        np.testing.assert_allclose(np.einsum("bij,bkj->bik", R, R),
                                   np.broadcast_to(np.eye(3), R.shape),
                                   atol=1e-4)


def test_run_fused_multi_overlap(engine):
    """Pipelined whole-scene serving (run_fused_multi): one per-object
    result list per frame, in order, identical to the serial
    step_fused_multi path (same seeds), at depth 1 and 2."""
    local = np.random.default_rng(5)
    xs, ys = np.meshgrid(np.linspace(-0.4, 0.4, 80),
                         np.linspace(-0.3, 0.3, 60))
    frame = np.stack([xs, ys, np.full((60, 80), 0.8)], axis=-1)
    frame[10:25, 10:25, 2] -= 0.08 + 0.005 * local.random((15, 15))
    frame[35:50, 50:70, 2] -= 0.09 + 0.005 * local.random((15, 20))
    cloud = frame.astype(np.float32)

    pipe = RealtimePipeline(engine, _realtime_cfg(n_samples=32,
                                                  num_grasps=3))
    kw = dict(pad_n=8192, voxel=0.004, max_objects=3,
              min_cluster_points=25)
    serial = [pipe.step_fused_multi(cloud=cloud, seed=s, **kw)
              for s in range(3)]
    for depth in (1, 2):
        overlapped = list(pipe.run_fused_multi([cloud] * 3, depth=depth,
                                               **kw))
        assert len(overlapped) == 3
        for a_objs, b_objs in zip(serial, overlapped):
            assert len(a_objs) == len(b_objs) == 3
            for a, b in zip(a_objs, b_objs):
                assert a["ok"] == b["ok"]
                if not a["ok"]:
                    continue
                np.testing.assert_allclose(a["filtered"]["transl"],
                                           b["filtered"]["transl"],
                                           atol=1e-6)
                np.testing.assert_allclose(a["pc_center"], b["pc_center"],
                                           atol=1e-6)
                assert len(b["goals"]) == 3


def test_grasp_service_scene_endpoint(engine):
    """POST /scene: one frame with two blobs → per-object grasp sets over
    the wire; /grasps and /stats still serve alongside."""
    from dexgangrasp_tpu.apps.serve import GraspServer, GraspServiceClient

    local = np.random.default_rng(5)
    xs, ys = np.meshgrid(np.linspace(-0.4, 0.4, 80),
                         np.linspace(-0.3, 0.3, 60))
    frame = np.stack([xs, ys, np.full((60, 80), 0.8)], axis=-1)
    frame[10:25, 10:25, 2] -= 0.08 + 0.005 * local.random((15, 15))
    frame[35:50, 50:70, 2] -= 0.09 + 0.005 * local.random((15, 20))
    cloud = frame.astype(np.float32)

    pipe = RealtimePipeline(engine, _realtime_cfg(n_samples=32,
                                                  num_grasps=3))
    with GraspServer(pipe, pad_n=8192, voxel=0.004) as srv:
        client = GraspServiceClient(srv.endpoint)
        out = client.scene(cloud, seed=0, max_objects=3)
        assert len(out) == 3
        assert out[0]["ok"] and out[1]["ok"] and not out[2]["ok"]
        assert out[0]["n_obj"] >= out[1]["n_obj"] > 0
        d = np.linalg.norm(out[0]["pc_center"] - out[1]["pc_center"])
        assert d > 0.1
        for r in out[:2]:
            assert len(r["goals"]) == 3
            assert r["filtered"]["transl"].shape == (3, 3)
        # single-object endpoint still fine on the same daemon
        single = client(cloud, seed=1)
        assert single["ok"]
        st = client.stats()
        assert st["requests"] == 2 and st["errors"] == 0


def test_grasp_service_scene_clamps_max_objects(engine):
    """/scene must never compile a client-chosen program shape: requests
    above the server's compiled scene_max_objects are clamped (response
    trimmed), requests below get a trimmed response."""
    from dexgangrasp_tpu.apps.serve import GraspServer, GraspServiceClient

    cloud = _organized_test_frame()
    pipe = RealtimePipeline(engine, _realtime_cfg(n_samples=32,
                                                  num_grasps=3))
    with GraspServer(pipe, pad_n=8192, voxel=0.004,
                     scene_max_objects=2) as srv:
        client = GraspServiceClient(srv.endpoint)
        out_big = client.scene(cloud, seed=0, max_objects=8)
        assert len(out_big) == 2  # clamped to the compiled shape
        out_small = client.scene(cloud, seed=0, max_objects=1)
        assert len(out_small) == 1
        assert out_small[0]["ok"]


def test_serve_family_name_labels():
    """The /healthz-/reload family label mirrors the dispatch seam: the
    three engine shapes map to their wire names (set = the no-folded-
    params fallback)."""
    from dexgangrasp_tpu.apps.serve import _family_name

    class _D:
        diff_params = {}

    class _G:
        gen_folded = {}

    class _S:
        pass

    assert _family_name(_D()) == "diffusion"
    assert _family_name(_G()) == "gan"
    assert _family_name(_S()) == "set"
