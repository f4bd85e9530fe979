"""Coverage for the remaining small surfaces: paper-curve plotters, the
ablation harness, config→TrainConfig mapping, parallel helpers."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_paper_curve_plotters(tmp_path):
    from dexgangrasp_tpu.utils import visualization as viz

    p1 = viz.plot_coverage_success_curve(
        [0.05, 0.5, 1.0], [0.90, 0.75, 0.61],
        save_path=str(tmp_path / "cov.png"))
    p2 = viz.plot_threshold_success_curve(
        [0.0, 0.5, 0.95], [0.61, 0.75, 0.91],
        save_path=str(tmp_path / "thr.png"))
    assert os.path.isfile(p1) and os.path.isfile(p2)


def test_ablation_harness(tmp_path):
    from dexgangrasp_tpu.data.synthetic import build_synthetic_dataset
    from dexgangrasp_tpu.eval.experiments import (
        run_evaluator_ablation,
        tabulate,
    )

    d = str(tmp_path / "ds")
    build_synthetic_dataset(d, n_objects=4, views_per_object=1,
                            grasps_per_object=6, points_per_cloud=256)
    results = run_evaluator_ablation(
        d, n_resblocks_grid=(3,), n_neurons_grid=(256,), epochs=2,
        eval_every=2, batch_size=16)
    assert len(results) == 1
    r = results[0]
    assert r.epochs == [2]
    assert 0.0 <= r.tp_rates[0] <= 1.0
    table = tabulate(results)
    assert "256" in table and "resblocks" in table


def test_yaml_config_maps_to_train_config(tmp_path):
    from dexgangrasp_tpu.utils.config import Config, train_config_from_cfg

    cfg = Config("configs/dexgangrasp.yaml",
                 overrides={"is_train": False}).parse(str(tmp_path))
    tcfg = train_config_from_cfg(cfg)
    assert tcfg.is_wgan is True
    assert tcfg.gen_train_freq == 2
    assert tcfg.recon_loss == "control_point_l1"
    assert tcfg.latent_dim == 5 and tcfg.n_joints == 12


def test_parallel_replicate_helper():
    from dexgangrasp_tpu.parallel.mesh import data_parallel_mesh
    from dexgangrasp_tpu.parallel.sharding import replicate

    mesh = data_parallel_mesh(8)
    tree = {"a": jnp.ones((4, 4)), "b": jnp.zeros((3,))}
    rep = replicate(tree, mesh)
    assert len(rep["a"].sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(rep["a"]), 1.0)
