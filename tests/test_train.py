"""Training tests: loss parity with torch formulas, GAN/evaluator steps run
and learn on toy data, scheduler/early-stop semantics, checkpoint round-trip."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.train.checkpoints import (
    load_evaluator,
    load_gan,
    latest_epoch,
    save_evaluator,
    save_gan,
)
from dexgangrasp_tpu.train.gan import GanTrainer, TrainConfig, get_lr, set_lr
from dexgangrasp_tpu.train.losses import (
    accuracy_evaluator,
    bce,
    kl_divergence,
    transl_rot_6d_l2_loss,
)
from dexgangrasp_tpu.train.schedule import EarlyStopping, PlateauScheduler

rng = np.random.default_rng(31)


def _toy_batch(n=16, nj=12):
    from scipy.spatial.transform import Rotation
    return {
        "bps_object": jnp.asarray(
            rng.uniform(0, 0.2, size=(n, 4096)).astype(np.float32)),
        "rot_matrix": jnp.asarray(
            Rotation.random(n, rng=rng).as_matrix().astype(np.float32)),
        "transl": jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.1),
        "joint_conf": jnp.asarray(
            rng.uniform(0, 1, size=(n, nj)).astype(np.float32)),
        "label": jnp.asarray(
            (rng.uniform(size=(n,)) > 0.5).astype(np.float32)),
    }


def test_bce_matches_torch():
    p = rng.uniform(1e-4, 1 - 1e-4, size=(32, 1)).astype(np.float32)
    t = (rng.uniform(size=(32, 1)) > 0.5).astype(np.float32)
    ours = float(bce(jnp.asarray(p), jnp.asarray(t)))
    ref = torch.nn.BCELoss()(torch.from_numpy(p), torch.from_numpy(t)).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_kl_matches_torch_formula():
    mu = rng.normal(size=(8, 5)).astype(np.float32)
    logvar = rng.normal(size=(8, 5)).astype(np.float32)
    ours = float(kl_divergence(jnp.asarray(mu), jnp.asarray(logvar)))
    ref = torch.mean(-0.5 * torch.sum(
        1 + torch.from_numpy(logvar) - torch.from_numpy(mu) ** 2
        - torch.exp(torch.from_numpy(logvar)), dim=-1)).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_transl_rot_loss_shapes():
    r6 = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    gt_rot = jnp.asarray(rng.normal(size=(8, 9)).astype(np.float32))
    tl, rl = transl_rot_6d_l2_loss(r6, t, gt_rot, t)
    assert float(tl) == 0.0
    assert float(rl) > 0.0


def test_accuracy_evaluator_matches_reference():
    pred = jnp.asarray((rng.uniform(size=(64, 1)) > 0.4).astype(np.float32))
    gt = jnp.asarray((rng.uniform(size=(64, 1)) > 0.5).astype(np.float32))
    tp, tn, acc = accuracy_evaluator(pred, gt)
    pt, gt_t = torch.from_numpy(np.asarray(pred)), torch.from_numpy(np.asarray(gt))
    correct = torch.eq(pt, gt_t)
    ref_tp = (torch.sum(correct * gt_t) / torch.sum(gt_t)).item()
    ref_tn = (torch.sum(correct * (1 - gt_t)) / torch.sum(1 - gt_t)).item()
    ref_acc = (correct.sum() / float(len(gt_t))).item()
    np.testing.assert_allclose([float(tp), float(tn), float(acc)],
                               [ref_tp, ref_tn, ref_acc], rtol=1e-6)


@pytest.mark.parametrize("is_wgan", [False, True])
def test_gan_step_runs_and_descends(is_wgan):
    trainer = GanTrainer(TrainConfig(is_wgan=is_wgan))
    ts = trainer.init_gan_state(jax.random.PRNGKey(0))
    batch = _toy_batch(32)
    logs0 = None
    for i in range(8):
        ts, logs = trainer.gan_step(ts, batch, jax.random.PRNGKey(i),
                                    is_train_gen=True)
        if logs0 is None:
            logs0 = logs
        assert np.isfinite(float(logs["total_loss_disc"]))
        assert np.isfinite(float(logs["total_loss_gen"]))
    # recon part of the generator loss must shrink on a fixed batch
    assert float(logs["transl_loss"]) < float(logs0["transl_loss"])
    assert int(ts.step) == 8


def test_gan_step_bf16_mixed_precision():
    """compute_dtype='bfloat16': masters + BN running stats stay f32, the
    recon loss still descends on a fixed batch."""
    trainer = GanTrainer(TrainConfig(compute_dtype="bfloat16"))
    ts = trainer.init_gan_state(jax.random.PRNGKey(0))
    batch = _toy_batch(32)
    logs0 = None
    for i in range(8):
        ts, logs = trainer.gan_step(ts, batch, jax.random.PRNGKey(i))
        if logs0 is None:
            logs0 = logs
    assert float(logs["transl_loss"]) < float(logs0["transl_loss"])
    for leaf in jax.tree.leaves(ts.gen_params) + jax.tree.leaves(
            ts.gen_state) + jax.tree.leaves(ts.disc_state):
        assert leaf.dtype == jnp.float32


def test_mode_seeking_regularizer():
    """ms_coef > 0 adds a finite ms_loss, changes the generator update, and
    pushes toward higher output diversity than the plain objective."""
    batch = _toy_batch(32)
    key = jax.random.PRNGKey(0)

    def run(ms_coef, steps=12):
        trainer = GanTrainer(TrainConfig(ms_coef=ms_coef, lr_gen=1e-3))
        ts = trainer.init_gan_state(jax.random.PRNGKey(0))
        for i in range(steps):
            ts, logs = trainer.gan_step(ts, batch, jax.random.fold_in(key, i))
        # output spread over z at fixed bps
        z = jax.random.normal(jax.random.PRNGKey(99), (64, 5))
        bps = jnp.broadcast_to(batch["bps_object"][0], (64, 4096))
        y, _ = trainer.gen.apply(ts.gen_params, ts.gen_state, z, bps,
                                 train=False)
        spread = float(jnp.mean(jnp.std(y.transl, axis=0)))
        return logs, spread

    logs_ms, spread_ms = run(0.05)
    logs_off, spread_off = run(0.0)
    assert "ms_loss" in logs_ms and np.isfinite(float(logs_ms["ms_loss"]))
    assert "ms_loss" not in logs_off
    assert spread_ms > spread_off


def test_gan_step_disc_only():
    trainer = GanTrainer(TrainConfig())
    ts = trainer.init_gan_state(jax.random.PRNGKey(0))
    batch = _toy_batch(8)
    gen_before = jax.tree.leaves(ts.gen_params)[0]
    ts, logs = trainer.gan_step(ts, batch, jax.random.PRNGKey(0),
                                is_train_gen=False)
    gen_after = jax.tree.leaves(ts.gen_params)[0]
    np.testing.assert_array_equal(np.asarray(gen_before), np.asarray(gen_after))
    assert "total_loss_gen" not in logs


def test_evaluator_learns_separable_toy():
    trainer = GanTrainer(TrainConfig(lr=1e-3))
    ts = trainer.init_evaluator_state(jax.random.PRNGKey(0))
    batch = _toy_batch(64)
    # make labels depend on translation x-sign: learnable signal
    label = (np.asarray(batch["transl"])[:, 0] > 0).astype(np.float32)
    batch["label"] = jnp.asarray(label)
    losses = []
    for i in range(30):
        ts, logs = trainer.evaluator_step(ts, batch, jax.random.PRNGKey(i))
        losses.append(float(logs["total_loss_eva"]))
    assert losses[-1] < losses[0] * 0.7
    ev = trainer.eval_evaluator(ts, batch)
    assert float(ev["accuracy"]) > 0.8


@pytest.mark.parametrize("loss", ["control_point_l1",
                                  "control_point_chamfer"])
def test_recon_loss_variants_descend(loss):
    trainer = GanTrainer(TrainConfig(recon_loss=loss))
    ts = trainer.init_gan_state(jax.random.PRNGKey(0))
    batch = _toy_batch(16)
    first = None
    for i in range(5):
        ts, logs = trainer.gan_step(ts, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(logs["transl_loss"])
    assert float(logs["transl_loss"]) < first
    assert float(logs["rot_loss"]) == 0.0  # pose error collapsed into one term


def test_recon_loss_rejects_unknown():
    with pytest.raises(ValueError):
        GanTrainer(TrainConfig(recon_loss="bogus"))


def test_eval_steps_no_state_mutation():
    trainer = GanTrainer(TrainConfig())
    ts = trainer.init_gan_state(jax.random.PRNGKey(0))
    batch = _toy_batch(8)
    logs = trainer.eval_gan_losses(ts, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(logs["total_loss_gen"]))


def test_plateau_scheduler_semantics():
    sch = PlateauScheduler(lr=1e-4, factor=0.2, patience=3, threshold=0.01)
    # improving losses: lr unchanged
    for v in [1.0, 0.9, 0.8, 0.7]:
        assert sch.step(v) == 1e-4
    # stagnation: after patience+1 bad epochs, lr drops
    for _ in range(3):
        assert sch.step(0.7) == 1e-4
    assert sch.step(0.7) == pytest.approx(2e-5)


def test_early_stopping():
    es = EarlyStopping(patience=3)
    assert not es(1.0)
    # equal loss counts as improvement (reference train_tools.py uses
    # strict <); only strictly worse losses increment the counter
    assert not es(1.0) and es.counter == 0
    assert not es(1.1)
    assert not es(1.2)
    assert es(1.3)  # 3rd strictly-worse epoch → stop
    # improvement resets
    es2 = EarlyStopping(patience=2)
    es2(1.0); es2(1.5); es2(0.5)
    assert es2.counter == 0 and not es2.early_stop


def test_checkpoint_roundtrip(tmp_path):
    trainer = GanTrainer(TrainConfig())
    ts = trainer.init_gan_state(jax.random.PRNGKey(0))
    ets = trainer.init_evaluator_state(jax.random.PRNGKey(1))
    sch = PlateauScheduler(1e-4)
    sch.step(1.0)
    p1 = save_gan(str(tmp_path), 5, ts, scheduler_gen=sch)
    p2 = save_evaluator(str(tmp_path), 7, ets, scheduler=sch)
    ts2, meta = load_gan(p1, ts_template=ts)
    assert meta["epoch"] == 5
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(ts.gen_params)[0]),
        np.asarray(jax.tree.leaves(ts2.gen_params)[0]), atol=0)
    # optimizer state round-trips (incl. hyperparams)
    assert get_lr(ts2.gen_opt) == get_lr(ts.gen_opt)
    ets2, meta2 = load_evaluator(p2, as_state=True)
    assert meta2["epoch"] == 7
    assert meta2["scheduler"]["lr"] == sch.lr
    assert latest_epoch(str(tmp_path), "gen") == 5
    assert latest_epoch(str(tmp_path), "eva") == 7
    # loaded state is usable for another step
    ts3, _ = trainer.gan_step(ts2, _toy_batch(8), jax.random.PRNGKey(9))
    assert int(ts3.step) == int(ts.step) + 1


def test_checkpoint_roundtrip_orbax(tmp_path):
    """Orbax backend: directory checkpoints round-trip the full train
    state (exact optax structure via sidecar treedefs) and resume."""
    trainer = GanTrainer(TrainConfig())
    ts = trainer.init_gan_state(jax.random.PRNGKey(0))
    p1 = save_gan(str(tmp_path), 5, ts, backend="orbax")
    assert p1.endswith("5_gen_net.orbax") and latest_epoch(
        str(tmp_path), "gen") == 5
    ts2, meta = load_gan(p1, ts_template=ts)  # auto-detects orbax dir
    assert meta["epoch"] == 5
    for a, b in zip(jax.tree.leaves(ts.gen_opt), jax.tree.leaves(ts2.gen_opt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    assert get_lr(ts2.gen_opt) == get_lr(ts.gen_opt)
    ts3, _ = trainer.gan_step(ts2, _toy_batch(8), jax.random.PRNGKey(9))
    assert int(ts3.step) == int(ts.step) + 1


def test_orbax_checkpoints_serve_through_engine(tmp_path):
    """The orbax backend ties into the product: a GAN dir + evaluator dir
    load straight into GraspEngine.from_checkpoints (auto-detected) and
    serve grasps identical to the in-memory weights."""
    from dexgangrasp_tpu.engine.pipeline import GraspEngine

    trainer = GanTrainer(TrainConfig())
    ts = trainer.init_gan_state(jax.random.PRNGKey(0))
    ets = trainer.init_evaluator_state(jax.random.PRNGKey(1))
    gp = save_gan(str(tmp_path), 3, ts, backend="orbax")
    ep = save_evaluator(str(tmp_path), 3, ets, backend="orbax")

    eng_ckpt = GraspEngine.from_checkpoints(gp, ep)
    eng_mem = GraspEngine(ts.gen_params, ts.gen_state, ets.params,
                          ets.state)
    bps = rng.uniform(0, 0.2, 4096).astype(np.float32)
    a = eng_ckpt.generate_grasps(bps, n_samples=16, seed=5)
    b = eng_mem.generate_grasps(bps, n_samples=16, seed=5)
    np.testing.assert_allclose(a["transl"], b["transl"], atol=1e-6)
    np.testing.assert_allclose(a["score"], b["score"], atol=1e-6)


def test_set_lr_affects_updates():
    trainer = GanTrainer(TrainConfig())
    ts = trainer.init_gan_state(jax.random.PRNGKey(0))
    set_lr(ts.gen_opt, 0.0)
    batch = _toy_batch(8)
    before = np.asarray(jax.tree.leaves(ts.gen_params)[0]).copy()
    ts, _ = trainer.gan_step(ts, batch, jax.random.PRNGKey(0))
    after = np.asarray(jax.tree.leaves(ts.gen_params)[0])
    np.testing.assert_array_equal(before, after)
