"""Tests for tools (split/control-points/tf), timing, camera IO, PCD
dataset + PointNet evaluator, affordance pipeline, experiments harness."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.apps.afford import AffordancePipeline, run_lmp_with_retry
from dexgangrasp_tpu.apps.camera_io import remove_background, save_frame
from dexgangrasp_tpu.apps.realtime import RealtimeConfig
from dexgangrasp_tpu.data.synthetic import build_synthetic_dataset
from dexgangrasp_tpu.models.pointnet import PointNetEvaluator
from dexgangrasp_tpu.tools.control_points import (
    apply_random_rot,
    create_palm_control_points,
)
from dexgangrasp_tpu.tools.split_dataset import assign_splits, mark_metadata
from dexgangrasp_tpu.tools.tf_broadcaster import TFBroadcaster
from dexgangrasp_tpu.utils.timing import StageTimer, annotate

rng = np.random.default_rng(71)


def test_assign_splits():
    objs = [f"o{i}" for i in range(20)]
    s = assign_splits(objs, 0.7, 0.15, 0.15, seed=0)
    counts = {k: sum(1 for v in s.values() if v == k)
              for k in ("train", "test", "eval")}
    assert counts["train"] == 14 and counts["test"] == 3


def test_mark_metadata(tmp_path):
    import pandas as pd

    d = str(tmp_path)
    pd.DataFrame({"Unnamed: 0": [f"o{i}" for i in range(10)],
                  "positive": [5] * 10}).to_csv(
        os.path.join(d, "metadata.csv"), index=False)
    mark_metadata(d, 0.6, 0.2, 0.2, seed=1)
    df = pd.read_csv(os.path.join(d, "metadata.csv"))
    assert (df["train"] == "X").sum() == 6
    # every object in exactly one split
    marks = (df[["train", "test", "eval"]] == "X").sum(axis=1)
    assert (marks == 1).all()


def test_control_points():
    cp = create_palm_control_points(64, seed=0)
    assert cp.shape == (64, 3)
    assert np.abs(cp).max() < 0.15
    # usable by the control-point loss
    from dexgangrasp_tpu.train.losses import control_point_l1_loss

    r6 = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    loss = control_point_l1_loss(r6, t, r6, t, jnp.asarray(cp))
    assert float(loss) == 0.0


def test_apply_random_rot():
    pts = rng.normal(size=(100, 3))
    transl = rng.normal(size=(5, 3))
    rot = np.tile(np.eye(3), (5, 1, 1))
    p2, t2, r2, R = apply_random_rot(pts, transl, rot, seed=3)
    np.testing.assert_allclose(p2, pts @ R.T, atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(t2, axis=1),
                               np.linalg.norm(transl, axis=1), atol=1e-9)
    np.testing.assert_allclose(r2[0], R, atol=1e-12)


def test_tf_broadcaster_frames(tmp_path):
    T = np.eye(4)
    T[:3, 3] = [1, 2, 3]
    p = str(tmp_path / "base2flange_inferred.npy")
    b = TFBroadcaster(T, inferred_pose_path=p)
    assert len(b.frames()) == 1
    np.save(p, T)
    frames = b.frames()
    assert len(frames) == 2
    assert frames[1][1] == "inferred_grasp"


def test_stage_timer():
    t = StageTimer()
    with t.stage("x"):
        t.observe(jnp.ones((10,)) * 2)
    with t.stage("x"):
        pass
    s = t.summary()
    assert s["x"]["count"] == 2
    assert "x" in t.report()
    with annotate("host-span"):
        pass


def test_camera_io(tmp_path):
    color = rng.integers(0, 255, (8, 10, 3)).astype(np.uint8)
    depth = rng.integers(0, 3000, (8, 10)).astype(np.uint16)
    out = remove_background(color, depth, clipping_distance_m=1.0)
    far = depth * 1e-3 > 1.0
    assert (out[far] == 153).all()
    assert (out[~far & (depth > 0)] == color[~far & (depth > 0)]).all()
    written = save_frame(str(tmp_path), 3, color=color, depth=depth,
                         points=rng.normal(size=(8, 10, 3)),
                         mask=np.zeros((8, 10), bool))
    assert all(os.path.isfile(p) for p in written.values())
    assert "depth_0003.npy" in written["depth"]


def test_run_lmp_retry():
    calls = []

    def flaky(img):
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("boom")
        return np.ones((4, 4), bool)

    out = run_lmp_with_retry(flaky, np.zeros((4, 4, 3)), max_retries=5,
                             delay_s=0.0)
    assert out.shape == (4, 4) and len(calls) == 3
    with pytest.raises(RuntimeError):
        run_lmp_with_retry(lambda im: 1 / 0, np.zeros((2, 2, 3)),
                           max_retries=2, delay_s=0.0)


def test_pointnet_evaluator_forward_and_train():
    net = PointNetEvaluator()
    params, state = net.init(jax.random.PRNGKey(0))
    pts = jnp.asarray(rng.normal(size=(8, 128, 3)).astype(np.float32))
    rot = jnp.asarray(rng.normal(size=(8, 9)).astype(np.float32))
    tr = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    p, new_state = net.apply(params, state, pts, rot, tr, train=False)
    assert p.shape == (8, 1)
    assert ((np.asarray(p) >= 0) & (np.asarray(p) <= 1)).all()
    # permutation invariance over points
    perm = rng.permutation(128)
    p2, _ = net.apply(params, state, pts[:, perm], rot, tr, train=False)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p2), atol=1e-5)
    # train mode updates BN state
    _, ts = net.apply(params, state, pts, rot, tr, train=True)
    assert not np.allclose(np.asarray(ts["point"][0]["bn"]["mean"]),
                           np.asarray(state["point"][0]["bn"]["mean"]))


def test_pcd_dataset(tmp_path):
    """Build a synthetic set, add *_dspcd files, exercise the PCD dataset."""
    from dexgangrasp_tpu.data.pcd_dataset import (
        DexEvaluatorPCDDataSet,
        normalize_pc,
    )
    from dexgangrasp_tpu.utils.pcd import save_pcd

    d = str(tmp_path / "ds")
    build_synthetic_dataset(d, n_objects=4, views_per_object=1,
                            grasps_per_object=6, points_per_cloud=256, seed=2)
    # create 1024-pt downsampled clouds next to each pcd
    for split in ("train", "eval"):
        pdir = os.path.join(d, split, "pcd")
        for obj in os.listdir(pdir):
            for f in os.listdir(os.path.join(pdir, obj)):
                if f.endswith(".pcd"):
                    stem = f[:-4].replace("_pcd", "_dspcd")
                    cloud = rng.normal(size=(1024, 3)).astype(np.float32) * 0.05
                    save_pcd(os.path.join(pdir, obj, stem + ".pcd"), cloud)
    ds = DexEvaluatorPCDDataSet(d, "train")
    assert len(ds) > 0
    item = ds[0]
    assert item["pcd_array"].shape == (1024, 3)
    # normalized: centroid ~0, max radius ~1
    assert np.abs(item["pcd_array"].mean(0)).max() < 1e-6
    assert abs(np.linalg.norm(item["pcd_array"], axis=1).max() - 1.0) < 1e-6
    batch = ds.sample_batch(4)
    assert batch["pcd_array"].shape == (4, 1024, 3)
    assert set(np.unique(batch["label"])) <= {0.0, 1.0}
    n = normalize_pc(rng.normal(size=(10, 3)))
    assert abs(np.linalg.norm(n, axis=1).max() - 1.0) < 1e-9


def test_closed_loop_report(tmp_path, capsys):
    """The capture-jsonl tabulator groups passes, medians across them,
    and computes the depth-2 freshness/rate trade per family."""
    import json

    from dexgangrasp_tpu.tools import closed_loop_report as clr

    rows = []
    for v, p50, p95 in [(20.0, 40.0, 50.0), (24.0, 44.0, 54.0)]:
        rows.append({"metric": "closed_loop_fps", "value": v,
                     "family": "guided", "depth": 1, "serial_fps": v - 1,
                     "latency_p50_ms": p50, "latency_p95_ms": p95,
                     "host_prep_ms": 3.0})
    rows.append({"metric": "closed_loop_fps", "value": 33.0,
                 "family": "guided", "depth": 2, "serial_fps": 20.0,
                 "latency_p50_ms": 50.0, "latency_p95_ms": 70.0,
                 "host_prep_ms": 3.0})
    rows.append({"metric": "closed_loop_multi_fps", "value": 11.0,
                 "family": "gan", "n_objects": 2, "objects_found": 2,
                 "object_rate_per_s": 22.0})
    path = tmp_path / "cl.jsonl"
    path.write_text("".join(json.dumps(r) + "\n" for r in rows))

    clr.main([str(path)])
    out = capsys.readouterr().out
    # median of the two depth-1 passes, spread preserved
    assert "22.0 (20.0–24.0)" in out
    # depth trade: 33/22 = 1.50x, +8.0 ms p50, +18.0 ms p95
    assert "| guided | 1.50× | +8.0 | +18.0 |" in out
    # multi row with found/K and object rate
    assert "| gan | 2 | 1 | 11.0 | 2/2 | 22.0 |" in out
