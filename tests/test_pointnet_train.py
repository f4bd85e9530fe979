"""PointNet evaluator training + bidirectional MAGD tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.eval.magd import magd_bidirectional
from dexgangrasp_tpu.models.pointnet import PointNetEvaluator
from dexgangrasp_tpu.train.pointnet import PointNetTrainer

rng = np.random.default_rng(171)


def test_pointnet_trainer_learns_toy():
    model = PointNetEvaluator(point_dims=(32, 64), head_dims=(64,))
    trainer = PointNetTrainer(model, lr=1e-3)
    ts = trainer.init_state(jax.random.PRNGKey(0))
    n = 64
    batch = {
        "pcd_array": jnp.asarray(
            rng.normal(size=(n, 64, 3)).astype(np.float32)),
        "rot_matrix": jnp.asarray(
            np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))),
        "transl": jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
    }
    batch["label"] = (batch["transl"][:, 0] > 0).astype(jnp.float32)
    losses = []
    for _ in range(40):
        ts, logs = trainer.train_step(ts, batch)
        losses.append(float(logs["total_loss_eva"]))
    assert losses[-1] < losses[0] * 0.8
    assert int(ts.step) == 40


def test_magd_bidirectional_exposes_collapse():
    """A collapsed predictor scores well pred→gt but terribly gt→pred."""
    from scipy.spatial.transform import Rotation

    gt = {
        "transl": rng.normal(size=(50, 3)) * 0.1,
        "rot_matrix": Rotation.random(50, rng=rng).as_matrix(),
        "joint_conf": rng.uniform(size=(50, 12)),
    }
    centroid = gt["transl"].mean(0)
    collapsed = {
        "transl": np.tile(centroid, (50, 1)) + rng.normal(size=(50, 3)) * 1e-4,
        "rot_matrix": np.tile(gt["rot_matrix"][0], (50, 1, 1)),
        "joint_conf": np.tile(gt["joint_conf"][0], (50, 1)),
    }
    diverse = {k: v.copy() for k, v in gt.items()}
    m_collapsed = magd_bidirectional(collapsed, gt)
    m_diverse = magd_bidirectional(diverse, gt)
    # forward (pred→gt) can look acceptable for the collapsed set...
    assert m_collapsed["coverage"] <= 0.05
    # ...but the reverse direction exposes it
    assert m_collapsed["transl_gt2pred"] > 10 * max(
        m_diverse["transl_gt2pred"], 1e-12)
    assert m_diverse["coverage"] == 1.0
