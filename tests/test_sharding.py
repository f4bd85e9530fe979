"""Multi-device tests on the virtual 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8): dp training parity, tp layout,
grasp-axis-sharded inference."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from dexgangrasp_tpu.engine import folding
from dexgangrasp_tpu.engine.pipeline import sample_and_score
from dexgangrasp_tpu.models.networks import init_dexgan, init_evaluator
from dexgangrasp_tpu.parallel.mesh import (
    data_parallel_mesh,
    make_mesh,
    multislice_mesh,
)
from dexgangrasp_tpu.parallel.sharding import (
    dp_axes,
    evaluator_param_specs,
    gan_param_specs,
    shard_batch,
    sharded_gan_step,
    sharded_sample_and_score,
)
from dexgangrasp_tpu.train.gan import GanTrainer, TrainConfig

rng = np.random.default_rng(41)


def _toy_batch(n=16, nj=12):
    from scipy.spatial.transform import Rotation
    return {
        "bps_object": rng.uniform(0, 0.2, size=(n, 4096)).astype(np.float32),
        "rot_matrix": Rotation.random(n, rng=rng).as_matrix().astype(np.float32),
        "transl": (rng.normal(size=(n, 3)) * 0.1).astype(np.float32),
        "joint_conf": rng.uniform(0, 1, size=(n, nj)).astype(np.float32),
        "label": (rng.uniform(size=(n,)) > 0.5).astype(np.float32),
    }


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_gan_step_matches_single_device():
    """The sharded step must produce numerically equal losses/params to the
    unsharded step (BN batch stats are global because XLA all-reduces the
    mean over the sharded batch axis)."""
    trainer = GanTrainer(TrainConfig())
    ts = trainer.init_gan_state(jax.random.PRNGKey(0))
    batch = _toy_batch(32)
    key = jax.random.PRNGKey(7)

    ts_ref, logs_ref = trainer.gan_step(
        ts, {k: jnp.asarray(v) for k, v in batch.items()}, key)

    mesh = data_parallel_mesh(8)
    step = sharded_gan_step(trainer, mesh)
    ts_sh, logs_sh = step(ts, batch, key)

    np.testing.assert_allclose(float(logs_sh["total_loss_disc"]),
                               float(logs_ref["total_loss_disc"]), rtol=1e-4)
    np.testing.assert_allclose(float(logs_sh["total_loss_gen"]),
                               float(logs_ref["total_loss_gen"]), rtol=1e-4)
    # parameters after the step agree
    for a, b in zip(jax.tree.leaves(ts_ref.gen_params),
                    jax.tree.leaves(ts_sh.gen_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_tp_param_placement_and_step():
    """2×4 (data×model) mesh: tensor-parallel param layout compiles and runs
    a full train step; fc1 hidden dim is actually sharded."""
    trainer = GanTrainer(TrainConfig())
    ts = trainer.init_gan_state(jax.random.PRNGKey(0))
    mesh = make_mesh([("data", 2), ("model", 4)])
    specs = gan_param_specs(mesh)
    gp = jax.device_put(ts.gen_params,
                        jax.tree.map(lambda s: NamedSharding(mesh, s),
                                     specs["gen_params"],
                                     is_leaf=lambda x: isinstance(x, P)))
    # fc1 weight really sharded over model axis (columns)
    w = gp["rb1"]["fc1"]["w"]
    shard_shapes = {tuple(s.data.shape) for s in w.addressable_shards}
    assert shard_shapes == {(4101, 64)}

    import dataclasses
    ts = dataclasses.replace(ts, gen_params=gp)
    step = sharded_gan_step(trainer, mesh)
    ts2, logs = step(ts, _toy_batch(16), jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["total_loss_gen"]))
    assert np.isfinite(float(logs["total_loss_disc"]))


def test_tp_gan_step_matches_single_device():
    """dp×tp numerics equivalence (VERDICT r1 next-4): the tensor-parallel
    layout must produce the same losses AND the same updated parameters as
    the unsharded step — a wrong fc2 row-parallel reduction or a misplaced
    BN spec fails this, not just a compile check."""
    trainer = GanTrainer(TrainConfig())
    ts = trainer.init_gan_state(jax.random.PRNGKey(2))
    batch = _toy_batch(16)
    key = jax.random.PRNGKey(9)

    ts_ref, logs_ref = trainer.gan_step(
        ts, {k: jnp.asarray(v) for k, v in batch.items()}, key)

    import dataclasses
    mesh = make_mesh([("data", 2), ("model", 4)])
    specs = gan_param_specs(mesh)
    put = lambda tree, spec: jax.device_put(
        tree, jax.tree.map(lambda s: NamedSharding(mesh, s), spec,
                           is_leaf=lambda x: isinstance(x, P)))
    ts_tp = dataclasses.replace(
        ts,
        gen_params=put(ts.gen_params, specs["gen_params"]),
        gen_state=put(ts.gen_state, specs["gen_state"]),
        disc_params=put(ts.disc_params, specs["disc_params"]),
        disc_state=put(ts.disc_state, specs["disc_state"]))
    step = sharded_gan_step(trainer, mesh)
    ts_sh, logs_sh = step(ts_tp, batch, key)

    np.testing.assert_allclose(float(logs_sh["total_loss_disc"]),
                               float(logs_ref["total_loss_disc"]), rtol=1e-4)
    np.testing.assert_allclose(float(logs_sh["total_loss_gen"]),
                               float(logs_ref["total_loss_gen"]), rtol=1e-4)
    # params: Adam normalizes near-zero grads (m/sqrt(v)), so TP reduction-
    # order noise is amplified to ~1e-4 on isolated elements; a real layout
    # bug shifts entire tensors by O(lr)=1e-4 *systematically*, which the
    # mean-abs check below catches, while per-element atol stays loose
    # enough for the benign wiggle.
    for name in ("gen_params", "disc_params", "gen_state", "disc_state"):
        for a, b in zip(jax.tree.leaves(getattr(ts_ref, name)),
                        jax.tree.leaves(getattr(ts_sh, name))):
            a, b = np.asarray(a), np.asarray(b)
            np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)
            assert np.mean(np.abs(a - b)) < 2e-5


def test_evaluator_specs_cover_tree():
    trainer = GanTrainer(TrainConfig())
    ets = trainer.init_evaluator_state(jax.random.PRNGKey(0))
    mesh = make_mesh([("data", 4), ("model", 2)])
    specs = evaluator_param_specs(mesh)
    # device_put with the spec tree must succeed leaf-for-leaf
    p = jax.device_put(ets.params,
                       jax.tree.map(lambda s: NamedSharding(mesh, s),
                                    specs["params"],
                                    is_leaf=lambda x: isinstance(x, P)))
    assert jax.tree.structure(p) == jax.tree.structure(ets.params)


def test_sharded_inference_matches_single_device():
    (gen, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
    eva, ep, es = init_evaluator(jax.random.PRNGKey(1))
    gen_folded = folding.fold_generator(gp, gs)
    eva_folded = folding.fold_evaluator(ep, es)
    bps = jnp.asarray(rng.uniform(0, 0.2, size=(4096,)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    n = 256

    ref = sample_and_score(gen_folded, eva_folded, bps, key, n)
    mesh = data_parallel_mesh(8)
    run = sharded_sample_and_score(mesh)
    out = run(gen_folded, eva_folded, bps, key, n)

    np.testing.assert_allclose(np.asarray(out.score), np.asarray(ref.score),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.transl), np.asarray(ref.transl),
                               atol=1e-5)
    # result really lives sharded across 8 devices
    assert len(out.transl.sharding.device_set) == 8


def test_multislice_dcn_gan_step_matches_single_device():
    """2-slice × 4-way-dp mesh (virtual): the batch spans ('dcn','data'),
    gradients hierarchically all-reduce, numerics must equal the unsharded
    step — the multi-slice analogue of the dp parity test above."""
    trainer = GanTrainer(TrainConfig())
    ts = trainer.init_gan_state(jax.random.PRNGKey(4))
    batch = _toy_batch(32)
    key = jax.random.PRNGKey(11)

    ts_ref, logs_ref = trainer.gan_step(
        ts, {k: jnp.asarray(v) for k, v in batch.items()}, key)

    mesh = multislice_mesh(2, [("data", 4)])
    assert mesh.axis_names == ("dcn", "data")
    assert dp_axes(mesh) == ("dcn", "data")
    step = sharded_gan_step(trainer, mesh)
    ts_sh, logs_sh = step(ts, batch, key)

    np.testing.assert_allclose(float(logs_sh["total_loss_disc"]),
                               float(logs_ref["total_loss_disc"]), rtol=1e-4)
    np.testing.assert_allclose(float(logs_sh["total_loss_gen"]),
                               float(logs_ref["total_loss_gen"]), rtol=1e-4)
    # params: the hierarchical (per-slice then cross-slice) all-reduce
    # changes gradient summation order; Adam amplifies that on near-zero
    # grads to ~1e-4 on isolated elements (same effect as the tp test
    # above).  A real layout bug shifts tensors *systematically* — caught
    # by the tight mean-abs bound.
    for a, b in zip(jax.tree.leaves(ts_ref.gen_params),
                    jax.tree.leaves(ts_sh.gen_params)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)
        assert np.mean(np.abs(a - b)) < 2e-5
    # the batch really spans all 8 devices 4-per-slice
    sh = shard_batch(batch, mesh)["bps_object"]
    assert len(sh.sharding.device_set) == 8
    assert {tuple(s.data.shape) for s in sh.addressable_shards} == {(4, 4096)}


def test_multislice_inference_spans_mesh():
    (gen, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
    eva, ep, es = init_evaluator(jax.random.PRNGKey(1))
    gen_folded = folding.fold_generator(gp, gs)
    eva_folded = folding.fold_evaluator(ep, es)
    bps = jnp.asarray(rng.uniform(0, 0.2, size=(4096,)).astype(np.float32))
    mesh = multislice_mesh(2, [("data", 4)])
    run = sharded_sample_and_score(mesh)
    out = run(gen_folded, eva_folded, bps, jax.random.PRNGKey(3), 256)
    ref = sample_and_score(gen_folded, eva_folded, bps,
                           jax.random.PRNGKey(3), 256)
    np.testing.assert_allclose(np.asarray(out.score), np.asarray(ref.score),
                               atol=1e-5)
    assert len(out.transl.sharding.device_set) == 8


def test_sharded_chain_kernel_inference_matches_single_device():
    """shard_map + per-device chain kernel: same numerics as the fused
    single-device chain path; result spans the mesh."""
    from dexgangrasp_tpu.parallel.sharding import (
        sharded_sample_and_score_chain,
    )

    (gen, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
    eva, ep, es = init_evaluator(jax.random.PRNGKey(1))
    gen_folded = folding.fold_generator(gp, gs)
    eva_folded = folding.fold_evaluator(ep, es)
    bps = jnp.asarray(rng.uniform(0, 0.2, size=(4096,)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    n = 256

    ref = sample_and_score(gen_folded, eva_folded, bps, key, n,
                           sort=False, use_chain_kernel=True)
    mesh = data_parallel_mesh(8)
    run = sharded_sample_and_score_chain(mesh)
    out = run(gen_folded, eva_folded, bps, key, n)

    np.testing.assert_allclose(np.asarray(out.score), np.asarray(ref.score),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.transl),
                               np.asarray(ref.transl), atol=1e-5)
    assert len(out.transl.sharding.device_set) == 8


def test_shard_batch_layout():
    mesh = data_parallel_mesh(8)
    batch = shard_batch(_toy_batch(16), mesh)
    arr = batch["bps_object"]
    assert len(arr.sharding.device_set) == 8
    shapes = {tuple(s.data.shape) for s in arr.addressable_shards}
    assert shapes == {(2, 4096)}


# ------------------------------------------- sharded scan-chunk trainer


def _toy_table(rows=64, views=4, nj=12, with_label=True, with_joints=True):
    from scipy.spatial.transform import Rotation
    t = {"bps": rng.uniform(0, 0.2, size=(views, 4096)).astype(np.float32),
         "bps_idx": rng.integers(0, views, rows).astype(np.int32),
         "rot9": Rotation.random(rows, rng=rng).as_matrix().reshape(
             rows, 9).astype(np.float32),
         "transl": (rng.normal(size=(rows, 3)) * 0.1).astype(np.float32)}
    if with_joints:
        t["joint_conf"] = rng.uniform(0, 1, size=(rows, nj)).astype(np.float32)
    if with_label:
        t["label"] = (rng.uniform(size=(rows,)) > 0.5).astype(np.float32)
    return t


def test_evaluator_chunk_sharded_matches_single_device():
    """The device-resident scan trainer (train/fast.py), dp-sharded over the
    mesh, must match its unsharded execution step-for-step (VERDICT r2
    next-1: multi-chip training uses the SAME scan program)."""
    from dexgangrasp_tpu.train.fast import evaluator_train_chunk, put_table

    trainer = GanTrainer(TrainConfig())
    ts = trainer.init_evaluator_state(jax.random.PRNGKey(0))
    table = _toy_table(with_joints=False)
    key = jax.random.PRNGKey(5)

    ts_ref, losses_ref = evaluator_train_chunk(
        trainer, ts, put_table(table), key, steps=4, batch_size=16)

    mesh = data_parallel_mesh(8)
    from dexgangrasp_tpu.parallel.sharding import replicate

    ts_sh, losses_sh = evaluator_train_chunk(
        trainer, replicate(ts, mesh), put_table(table, mesh), key,
        steps=4, batch_size=16, mesh=mesh)

    np.testing.assert_allclose(np.asarray(losses_sh), np.asarray(losses_ref),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(ts_ref.params),
                    jax.tree.leaves(ts_sh.params)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)
        assert np.mean(np.abs(a - b)) < 2e-5
    # the table really lives replicated on all 8 devices
    assert len(put_table(table, mesh)["bps"].sharding.device_set) == 8


def test_gan_chunk_sharded_matches_single_device():
    from dexgangrasp_tpu.train.fast import gan_train_chunk, put_table

    trainer = GanTrainer(TrainConfig())
    ts = trainer.init_gan_state(jax.random.PRNGKey(1))
    table = _toy_table(with_label=False)
    key = jax.random.PRNGKey(6)

    ts_ref, logs_ref = gan_train_chunk(
        trainer, ts, put_table(table), key, steps=3, batch_size=16)

    mesh = multislice_mesh(2, [("data", 4)])  # dp spans ('dcn','data')
    from dexgangrasp_tpu.parallel.sharding import replicate

    ts_sh, logs_sh = gan_train_chunk(
        trainer, replicate(ts, mesh), put_table(table, mesh), key,
        steps=3, batch_size=16, mesh=mesh)

    # per-step losses compound Adam's reduction-order wiggle over the scan
    # (step k's loss is evaluated at slightly-different params) — rtol 5e-4
    # covers the drift while a real dp bug (wrong mean) shifts by O(1)
    np.testing.assert_allclose(np.asarray(logs_sh["total_loss_gen"]),
                               np.asarray(logs_ref["total_loss_gen"]),
                               rtol=5e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(ts_ref.gen_params),
                    jax.tree.leaves(ts_sh.gen_params)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)
        assert np.mean(np.abs(a - b)) < 2e-5


def test_diffusion_chunk_sharded_matches_single_device():
    from dexgangrasp_tpu.models.diffusion import DexDiffuser
    from dexgangrasp_tpu.train.diffusion import DiffusionTrainer
    from dexgangrasp_tpu.train.fast import diffusion_train_chunk, put_table

    model = DexDiffuser()
    trainer = DiffusionTrainer(model)
    ts = trainer.init_state(jax.random.PRNGKey(2))
    table = _toy_table(with_label=False, with_joints=False)
    table["g0"] = rng.normal(size=(64, trainer.model.g_dim)).astype(
        np.float32)
    key = jax.random.PRNGKey(7)

    ts_ref, losses_ref = diffusion_train_chunk(
        trainer, ts, put_table(table), key, steps=3, batch_size=16)

    mesh = data_parallel_mesh(8)
    from dexgangrasp_tpu.parallel.sharding import replicate

    ts_sh, losses_sh = diffusion_train_chunk(
        trainer, replicate(ts, mesh), put_table(table, mesh), key,
        steps=3, batch_size=16, mesh=mesh)

    np.testing.assert_allclose(np.asarray(losses_sh), np.asarray(losses_ref),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(ts_ref.params),
                    jax.tree.leaves(ts_sh.params)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)
        assert np.mean(np.abs(a - b)) < 2e-5


def test_set_step_sharded_matches_single_device():
    """The set-prediction trainer's two device programs (cost matrix +
    grad step) dp-shard the views axis; the host Hungarian seam between
    them is per-view, so the sharded run must reproduce the unsharded
    matching AND numerics."""
    from dexgangrasp_tpu.models.grasp_transformer import GraspTransformer
    from dexgangrasp_tpu.parallel.sharding import replicate
    from dexgangrasp_tpu.train.set_transformer import SetTrainer

    model = GraspTransformer(n_queries=8, n_layers=2)
    trainer = SetTrainer(model)
    v, m_gt = 16, 6
    bps = rng.uniform(0, 0.2, (v, 4096)).astype(np.float32)
    gt = rng.normal(size=(v, m_gt, model.g_dim)).astype(np.float32)
    mask = np.zeros((v, m_gt), np.float32)
    for i in range(v):  # prefix-form validity (build_set_table contract)
        mask[i, : int(rng.integers(1, m_gt + 1))] = 1.0

    ts_ref = trainer.init_state(jax.random.PRNGKey(9))
    mesh = data_parallel_mesh(8)
    ts_sh = replicate(ts_ref, mesh)
    for _ in range(2):
        ts_ref, log_ref = trainer.train_step(ts_ref, bps, gt, mask)
        ts_sh, log_sh = trainer.train_step(ts_sh, bps, gt, mask, mesh=mesh)

    assert abs(float(log_ref["loss"]) - float(log_sh["loss"])) < 1e-4
    for a, b in zip(jax.tree.leaves(ts_ref.params),
                    jax.tree.leaves(ts_sh.params)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)


def test_set_chunk_sharded_matches_single_device():
    """set_train_chunk (fused auction steps under lax.scan) dp-shards its
    scan interior; the sharded chunk must reproduce the unsharded one."""
    from dexgangrasp_tpu.models.grasp_transformer import GraspTransformer
    from dexgangrasp_tpu.parallel.sharding import replicate
    from dexgangrasp_tpu.train.fast import put_table, set_train_chunk
    from dexgangrasp_tpu.train.set_transformer import SetTrainer

    model = GraspTransformer(n_queries=8, n_layers=2)
    trainer = SetTrainer(model)
    v, m_gt = 16, 6
    table = {
        "bps": rng.uniform(0, 0.2, (v, 4096)).astype(np.float32),
        "gt": rng.normal(size=(v, m_gt, model.g_dim)).astype(np.float32),
        "mask": (rng.uniform(size=(v, m_gt)) < 0.7).astype(np.float32),
    }
    key = jax.random.PRNGKey(13)
    ts0 = trainer.init_state(jax.random.PRNGKey(11))
    ts_ref, losses_ref = set_train_chunk(trainer, ts0, put_table(table),
                                         key, steps=3, batch_size=8)
    mesh = data_parallel_mesh(8)
    ts_sh, losses_sh = set_train_chunk(trainer, replicate(ts0, mesh),
                                       put_table(table, mesh), key,
                                       steps=3, batch_size=8, mesh=mesh)
    np.testing.assert_allclose(np.asarray(losses_sh),
                               np.asarray(losses_ref),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(ts_ref.params),
                    jax.tree.leaves(ts_sh.params)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)


def test_fused_set_step_sharded_matches_single_device():
    """matcher="device": the auction matcher runs INSIDE the grad jit, so
    the whole DETR step is one GSPMD program — no host seam.  The sharded
    fused step must reproduce the unsharded fused step."""
    from dexgangrasp_tpu.models.grasp_transformer import GraspTransformer
    from dexgangrasp_tpu.parallel.sharding import replicate
    from dexgangrasp_tpu.train.set_transformer import SetTrainer

    model = GraspTransformer(n_queries=8, n_layers=2)
    trainer = SetTrainer(model)
    v, m_gt = 16, 6
    bps = rng.uniform(0, 0.2, (v, 4096)).astype(np.float32)
    gt = rng.normal(size=(v, m_gt, model.g_dim)).astype(np.float32)
    mask = np.zeros((v, m_gt), np.float32)
    for i in range(v):
        mask[i, : int(rng.integers(1, m_gt + 1))] = 1.0

    ts_ref = trainer.init_state(jax.random.PRNGKey(11))
    mesh = data_parallel_mesh(8)
    ts_sh = replicate(ts_ref, mesh)
    for _ in range(2):
        ts_ref, log_ref = trainer.train_step(ts_ref, bps, gt, mask,
                                             matcher="device")
        ts_sh, log_sh = trainer.train_step(ts_sh, bps, gt, mask,
                                           mesh=mesh, matcher="device")

    assert abs(float(log_ref["loss"]) - float(log_sh["loss"])) < 1e-4
    for a, b in zip(jax.tree.leaves(ts_ref.params),
                    jax.tree.leaves(ts_sh.params)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)
