"""Data-layer tests on a synthetic dataset following the reference's
on-disk contract."""
import os

import numpy as np
import pytest

import jax

from dexgangrasp_tpu.data.datasets import (
    DexEvaluatorDataSet,
    DexGeneratorDataSet,
    hard_negative_np,
)
from dexgangrasp_tpu.data.grasp_store import (
    GraspDataHandler,
    InMemoryGraspStore,
)
from dexgangrasp_tpu.data.loader import BatchLoader
from dexgangrasp_tpu.data.synthetic import build_synthetic_dataset

N_OBJ, VIEWS, GRASPS = 6, 2, 12


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("synth_data"))
    info = build_synthetic_dataset(d, n_objects=N_OBJ, views_per_object=VIEWS,
                                   grasps_per_object=GRASPS,
                                   points_per_cloud=512, seed=0)
    return d


def test_disk_contract(synth_dir):
    assert os.path.isfile(os.path.join(synth_dir, "metadata.csv"))
    assert os.path.isfile(os.path.join(synth_dir, "grasp_data_all.h5"))
    assert os.path.isfile(os.path.join(synth_dir, "pcd_transforms.h5"))
    for split in ("train", "eval"):
        objs = os.listdir(os.path.join(synth_dir, split, "bps"))
        assert len(objs) >= 1
        obj = objs[0]
        files = os.listdir(os.path.join(synth_dir, split, "bps", obj))
        assert len(files) == VIEWS
        enc = np.load(os.path.join(synth_dir, split, "bps", obj, files[0]))
        assert enc.shape == (1, 4096)


def test_grasp_store(synth_dir):
    h5 = os.path.join(synth_dir, "grasp_data_all.h5")
    handler = GraspDataHandler(h5)
    store = InMemoryGraspStore(h5)
    counts = handler.get_num_success_per_object()
    assert all(v == GRASPS for v in counts.values())
    obj = store.objects()[0]
    palms, joints, n = handler.get_grasps_for_object(obj, "positive")
    assert n == GRASPS and len(palms) == GRASPS
    sp, sj = store.get(obj, "positive")
    np.testing.assert_allclose(sp, np.stack(palms), atol=0)
    # single random access
    palm, joint, _ = handler.get_single_successful_grasp(obj)
    assert palm.shape == (7,) and joint.shape == (12,)
    # 'all' outcome concatenates
    _, _, n_all = handler.get_grasps_for_object(obj, "all")
    assert n_all == GRASPS * 2 + 4


def test_generator_dataset(synth_dir):
    ds = DexGeneratorDataSet(synth_dir, "train")
    n_train_obj = len(os.listdir(os.path.join(synth_dir, "train", "bps")))
    assert len(ds) == n_train_obj * VIEWS * GRASPS
    batch = ds.sample_batch(16)
    assert batch["bps_object"].shape == (16, 4096)
    assert batch["rot_matrix"].shape == (16, 3, 3)
    assert batch["transl"].shape == (16, 3)
    assert batch["joint_conf"].shape == (16, 12)
    # rotations orthonormal
    R = batch["rot_matrix"]
    np.testing.assert_allclose(np.einsum("bij,bkj->bik", R, R),
                               np.broadcast_to(np.eye(3), R.shape), atol=1e-6)
    # grasps near the object (centroid frame): transl within ~35 cm
    assert (np.linalg.norm(batch["transl"], axis=1) < 0.35).all()
    # single item API
    item = ds[0]
    assert item["bps_object"].shape == (4096,)
    assert isinstance(item["obj_name"], str)


def test_generator_gt_grasps(synth_dir):
    ds = DexGeneratorDataSet(synth_dir, "eval")
    obj = sorted(os.listdir(os.path.join(synth_dir, "eval", "bps")))[0]
    pcd_path = os.path.join(synth_dir, "eval", "pcd", obj,
                            f"{obj}_pcd000.pcd")
    gt = ds.get_grasps_from_pcd_path(pcd_path)
    assert gt["rot_matrix"].shape == (GRASPS, 3, 3)
    assert gt["transl"].shape == (GRASPS, 3)
    # positives in the synthetic data sit 6-10 cm off the surface → transl
    # norm within 20 cm of the centroid
    assert (np.linalg.norm(gt["transl"], axis=1) < 0.25).all()


def test_evaluator_dataset(synth_dir):
    ds = DexEvaluatorDataSet(synth_dir, "train")
    n_train_obj = len(os.listdir(os.path.join(synth_dir, "train", "bps")))
    per_file = GRASPS + int(0.3 * GRASPS / 0.3) + int(0.4 * GRASPS / 0.3)
    assert len(ds) == n_train_obj * VIEWS * per_file
    labels = np.array(ds.labels)
    assert set(labels) == {"positive", "negative", "hard_negative"}
    batch = ds.sample_batch(32)
    assert batch["label"].shape == (32,)
    assert set(np.unique(batch["label"])) <= {0.0, 1.0}


def test_hard_negative_np():
    rng = np.random.default_rng(0)
    from scipy.spatial.transform import Rotation
    T = np.tile(np.eye(4), (8, 1, 1))
    T[:, :3, :3] = Rotation.random(8, rng=rng).as_matrix()
    T[:, :3, 3] = rng.normal(size=(8, 3)) * 0.1
    Tn = hard_negative_np(rng, T)
    dt = np.abs(Tn[:, :3, 3] - T[:, :3, 3])
    np.testing.assert_allclose(dt, 0.03, atol=1e-9)
    # rotation changed substantially
    from dexgangrasp_tpu.core.rotations import geodesic_distance
    import jax.numpy as jnp
    d = np.asarray(geodesic_distance(jnp.asarray(T[:, :3, :3]),
                                     jnp.asarray(Tn[:, :3, :3])))
    assert (d > 0.3).all()


def test_batch_loader(synth_dir):
    ds = DexGeneratorDataSet(synth_dir, "train")
    loader = BatchLoader(ds, batch_size=8, to_device=True)
    batches = list(loader)
    assert len(batches) == len(ds) // 8
    assert batches[0]["bps_object"].shape == (8, 4096)
    # device arrays
    assert isinstance(batches[0]["bps_object"], jax.Array)


def test_epoch_determinism_and_shuffle(synth_dir):
    ds1 = DexGeneratorDataSet(synth_dir, "train", seed=5)
    ds2 = DexGeneratorDataSet(synth_dir, "train", seed=5)
    b1 = next(iter(ds1.epoch_batches(8)))
    b2 = next(iter(ds2.epoch_batches(8)))
    np.testing.assert_allclose(b1["bps_object"], b2["bps_object"], atol=0)
    ds3 = DexGeneratorDataSet(synth_dir, "train", seed=6)
    b3 = next(iter(ds3.epoch_batches(8)))
    assert not np.allclose(b1["bps_object"], b3["bps_object"])
