"""End-to-end engine façade: raw centered cloud → filtered sorted grasps."""
import numpy as np
import pytest

import jax

from dexgangrasp_tpu.engine.pipeline import GraspEngine
from dexgangrasp_tpu.models.networks import init_dexgan, init_evaluator

rng = np.random.default_rng(161)


def test_grasps_from_pcd_end_to_end():
    (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    engine = GraspEngine(gp, gs, ep, es, cloud_pad=1024)
    cloud = (rng.normal(size=(700, 3)) * 0.04).astype(np.float32)
    out = engine.grasps_from_pcd(cloud, n_samples=64, thresh=-1.0, seed=3)
    assert out.transl.shape[0] == 64  # thresh=-1 keeps all, sorted
    s = np.asarray(out.score)
    assert (np.diff(s) <= 1e-7).all()
    # off-center cloud trips the reference's centering contract
    with pytest.raises(ValueError):
        engine.grasps_from_pcd(cloud + 3.0, n_samples=16)
