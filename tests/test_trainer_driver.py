"""TrainDriver integration tests: epoch loop, checkpointing, resume, and
data-parallel mesh mode on a tiny synthetic dataset."""
import os

import numpy as np
import pytest

from dexgangrasp_tpu.data.synthetic import build_synthetic_dataset
from dexgangrasp_tpu.train.trainer import TrainDriver
from dexgangrasp_tpu.utils.config import Config


@pytest.fixture(scope="module")
def tiny_ds(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tiny_ds"))
    build_synthetic_dataset(d, n_objects=4, views_per_object=1,
                            grasps_per_object=8, points_per_cloud=256,
                            seed=3)
    return d


def _cfg(tiny_ds, tmp_path, **over):
    base = dict(data_dir=tiny_ds, num_epochs=2, batch_size=8,
                train_ffhgenerator=True, train_ffhevaluator=True,
                save_freq=2, print_freq=0, name="t")
    base.update(over)
    return Config(overrides=base).parse(base_path=str(tmp_path))


def test_driver_end_to_end_and_resume(tiny_ds, tmp_path):
    cfg = _cfg(tiny_ds, tmp_path)
    driver = TrainDriver(cfg)
    final = driver.run()
    assert np.isfinite(final["total_loss_gen"])
    assert np.isfinite(final["total_loss_eva"])
    # checkpoints + eval label dumps written
    assert os.path.isfile(os.path.join(cfg["save_dir"], "2_gen_net.npz"))
    assert os.path.isfile(os.path.join(cfg["save_dir"], "2_eva_net.npz"))
    assert os.path.isfile(os.path.join(cfg["eval_dir"], "2_gt_labels.npy"))
    assert os.path.isfile(os.path.join(cfg["save_dir"], "loss_log.txt"))

    # resume: continue_train from the run dir picks up at epoch 3
    cfg2 = _cfg(tiny_ds, tmp_path, continue_train=True,
                load_path=cfg["save_dir"], load_epoch=-1, num_epochs=3)
    driver2 = TrainDriver(cfg2)
    assert driver2.start_epoch == 3
    driver2.run()
    assert os.path.isfile(os.path.join(cfg["save_dir"], "3_gen_net.npz"))


def test_driver_wgan_mode(tiny_ds, tmp_path):
    """is_wgan config flag drives the WGAN-GP step through the driver."""
    cfg = _cfg(tiny_ds, tmp_path, is_wgan=True, train_ffhevaluator=False,
               num_epochs=1, save_freq=5)
    driver = TrainDriver(cfg)
    assert driver.tcfg.is_wgan
    driver.run(num_epochs=1)
    assert int(driver.gan_ts.step) > 0


def test_dataset_debug_show_sample(tiny_ds, tmp_path):
    from dexgangrasp_tpu.data.datasets import DexGeneratorDataSet

    ds = DexGeneratorDataSet(tiny_ds, "train")
    item = ds[0]
    out = ds.debug_show_sample(ds.bps_paths[0], item["transl"],
                               item["rot_matrix"], item["joint_conf"],
                               save_path=str(tmp_path / "dbg.png"))
    assert os.path.isfile(out)


def test_driver_data_parallel_mesh(tiny_ds, tmp_path):
    from dexgangrasp_tpu.parallel.mesh import data_parallel_mesh

    cfg = _cfg(tiny_ds, tmp_path, train_ffhevaluator=False, num_epochs=1,
               save_freq=5)
    mesh = data_parallel_mesh(8)
    driver = TrainDriver(cfg, mesh=mesh)
    driver.run(num_epochs=1)
    assert int(driver.gan_ts.step) > 0


def test_cli_fast_train(tiny_ds, tmp_path, monkeypatch):
    """`train.py --fast` runs the device-resident scan trainer end to end
    and writes servable checkpoints (slow tier)."""
    import sys

    from dexgangrasp_tpu.cli import train_main

    monkeypatch.setattr(sys, "argv", [
        "train.py", "--fast", "--steps", "6", "--batch-size", "8",
        "--train-evaluator"])
    cfg_over = _cfg(tiny_ds, tmp_path)
    # train_main builds its own Config; patch Config.parse to reuse ours
    import dexgangrasp_tpu.cli as cli_mod

    class _FakeConfig:
        def __init__(self, *a, **k):
            pass

        def parse(self, *a, **k):
            return cfg_over

    monkeypatch.setattr("dexgangrasp_tpu.utils.config.Config", _FakeConfig)
    train_main()
    import os

    files = os.listdir(cfg_over["save_dir"])
    assert any(f.endswith("_gen_net.npz") for f in files)
    assert any(f.endswith("_eva_net.npz") for f in files)
    # checkpoint serves through the engine
    from dexgangrasp_tpu.engine.pipeline import GraspEngine

    gen = [f for f in files if f.endswith("_gen_net.npz")][0]
    eva = [f for f in files if f.endswith("_eva_net.npz")][0]
    eng = GraspEngine.from_checkpoints(
        os.path.join(cfg_over["save_dir"], gen),
        os.path.join(cfg_over["save_dir"], eva))
    g = eng.generate_grasps(np.random.default_rng(0).uniform(
        0, 0.2, 4096).astype(np.float32), 8, seed=0)
    assert g["rot_matrix"].shape == (8, 3, 3)
