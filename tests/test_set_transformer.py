"""Set-prediction grasp transformer tests: decoder shapes/conditioning,
Hungarian matching correctness, the DETR loop learning fixed sets, and
the serving engine surface."""
import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.models.grasp_transformer import GraspTransformer
from dexgangrasp_tpu.train.set_transformer import (
    SetTrainer,
    train_set_transformer,
)

rng = np.random.default_rng(31)

TINY = dict(n_queries=8, d_model=64, n_heads=2, n_layers=2, n_tokens=16)


def test_decoder_shapes_and_conditioning():
    model = GraspTransformer(**TINY)
    params = model.init(jax.random.PRNGKey(0))
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    g, logit = model.apply(params, bps)
    assert g.shape == (8, 21)
    assert logit.shape == (8,)
    # queries differentiate (self/cross attention + heads are live)
    assert float(np.std(np.asarray(g), axis=0).max()) > 0
    # conditioning matters
    bps2 = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    g2, _ = model.apply(params, bps2)
    assert not np.allclose(np.asarray(g), np.asarray(g2))
    # batched apply matches single
    gb, lb = model.apply_batch(params, jnp.stack([bps, bps2]))
    np.testing.assert_allclose(np.asarray(gb[0]), np.asarray(g), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lb[1]),
                               np.asarray(model.apply(params, bps2)[1]),
                               atol=1e-5)


def test_hungarian_matching_matches_bruteforce():
    trainer = SetTrainer(GraspTransformer(**TINY))
    n_q, m = 5, 4
    cost = rng.uniform(size=(2, n_q, m + 2)).astype(np.float32)
    mask = np.zeros((2, m + 2), np.float32)
    mask[:, :m] = 1.0
    midx, mok = trainer.match(cost, mask)
    for b in range(2):
        # brute-force optimal assignment of m GT to n_q queries
        best, best_cost = None, np.inf
        for perm in itertools.permutations(range(n_q), m):
            c = sum(cost[b, q, j] for j, q in enumerate(perm))
            if c < best_cost:
                best, best_cost = perm, c
        got = sum(cost[b, q, midx[b, q]] for q in range(n_q)
                  if mok[b, q] > 0)
        assert mok[b].sum() == m
        assert got == pytest.approx(best_cost, rel=1e-6)
    # empty view: nothing matched
    midx0, mok0 = trainer.match(cost, np.zeros((2, m + 2), np.float32))
    assert mok0.sum() == 0


def test_set_training_learns_fixed_sets():
    """Two views, three fixed GT grasps each: matched cost collapses and
    confidence separates matched from unmatched queries."""
    model = GraspTransformer(**TINY)
    trainer = SetTrainer(model, lr=3e-3)
    ts = trainer.init_state(jax.random.PRNGKey(0))
    m_pad = 4
    table = {
        "bps": rng.uniform(0, 0.2, (2, 4096)).astype(np.float32),
        "gt": np.zeros((2, m_pad, 21), np.float32),
        "mask": np.zeros((2, m_pad), np.float32),
    }
    gt = rng.normal(size=(2, 3, 21)).astype(np.float32)
    table["gt"][:, :3] = gt
    table["mask"][:, :3] = 1.0

    from dexgangrasp_tpu.train.set_transformer import eval_matched_cost

    cost0 = eval_matched_cost(trainer, ts.params, table)
    ts, history = train_set_transformer(trainer, ts, table, 400,
                                        batch_views=2, eval_every=100,
                                        eval_table=table)
    last = history[-1]
    assert last["eval_matched_cost"] < 0.05 * cost0
    # every GT grasp is covered by some query
    pred, logit = model.apply_batch(ts.params,
                                    jnp.asarray(table["bps"]))
    pred, logit = np.asarray(pred), np.asarray(logit)
    cost = np.asarray(trainer.cost_matrix(
        ts.params, jnp.asarray(table["bps"]), jnp.asarray(table["gt"])))
    midx, mok = trainer.match(cost, table["mask"])
    for b in range(2):
        for j in range(3):
            d = np.min(np.sum((pred[b] - gt[b, j]) ** 2, axis=-1))
            assert d < 0.5
        conf_m = logit[b][mok[b] > 0].mean()
        conf_u = logit[b][mok[b] == 0].mean()
        assert conf_m > conf_u


def test_fused_device_step_matches_host_step():
    """matcher="device" (auction inside the grad jit) must reproduce the
    host-Hungarian step whenever the optimal matching is unique — random
    costs from a fresh init are generically well-separated, so one step
    from the same state must land on the same params."""
    model = GraspTransformer(**TINY)
    trainer = SetTrainer(model, lr=1e-3)
    v, m_pad = 4, 6
    bps = rng.uniform(0, 0.2, (v, 4096)).astype(np.float32)
    gt = rng.normal(size=(v, m_pad, 21)).astype(np.float32)
    mask = np.zeros((v, m_pad), np.float32)
    for i in range(v):
        mask[i, : int(rng.integers(1, m_pad + 1))] = 1.0

    ts0 = trainer.init_state(jax.random.PRNGKey(3))
    ts_h, log_h = trainer.train_step(ts0, bps, gt, mask, matcher="host")
    ts_d, log_d = trainer.train_step(ts0, bps, gt, mask, matcher="device")
    assert float(log_h["loss"]) == pytest.approx(float(log_d["loss"]),
                                                 abs=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ts_h.params),
                    jax.tree_util.tree_leaves(ts_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
    with pytest.raises(ValueError):
        trainer.train_step(ts0, bps, gt, mask, matcher="sinkhorn")


def test_set_chunk_matches_stepwise_fused():
    """set_train_chunk (K fused steps under lax.scan) must reproduce K
    individual fused-step dispatches fed the same jax.random batches."""
    from dexgangrasp_tpu.train.fast import put_table, set_train_chunk

    model = GraspTransformer(**TINY)
    trainer = SetTrainer(model)
    v, m_pad, bs, steps = 6, 5, 3, 4
    table = {
        "bps": rng.uniform(0, 0.2, (v, 4096)).astype(np.float32),
        "gt": rng.normal(size=(v, m_pad, 21)).astype(np.float32),
        "mask": (rng.uniform(size=(v, m_pad)) < 0.7).astype(np.float32),
    }
    dev = put_table(table)
    key = jax.random.PRNGKey(5)
    ts0 = trainer.init_state(jax.random.PRNGKey(1))
    ts_c, losses = set_train_chunk(trainer, ts0, dev, key,
                                   steps=steps, batch_size=bs)
    ts_s = ts0
    for k in jax.random.split(key, steps):
        rows = jax.random.randint(k, (bs,), 0, v)
        ts_s, logs = trainer._fused_step(ts_s, dev["bps"][rows],
                                         dev["gt"][rows],
                                         dev["mask"][rows])
    assert float(losses[-1]) == pytest.approx(float(logs["loss"]),
                                              abs=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ts_c.params),
                    jax.tree_util.tree_leaves(ts_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_fused_device_training_learns():
    """The chunked single-program DETR loop (device auction inside a
    lax.scan, no host sync anywhere) collapses the matched cost on a
    fixed-set table, same as the host-matched loop."""
    model = GraspTransformer(**TINY)
    trainer = SetTrainer(model, lr=3e-3)
    ts = trainer.init_state(jax.random.PRNGKey(0))
    m_pad = 4
    table = {
        "bps": rng.uniform(0, 0.2, (2, 4096)).astype(np.float32),
        "gt": np.zeros((2, m_pad, 21), np.float32),
        "mask": np.zeros((2, m_pad), np.float32),
    }
    table["gt"][:, :3] = rng.normal(size=(2, 3, 21)).astype(np.float32)
    table["mask"][:, :3] = 1.0

    from dexgangrasp_tpu.train.set_transformer import eval_matched_cost

    with pytest.raises(ValueError):  # chunking needs the device matcher
        train_set_transformer(trainer, ts, table, 10, chunked=True)

    cost0 = eval_matched_cost(trainer, ts.params, table)
    ts, history = train_set_transformer(trainer, ts, table, 200,
                                        batch_views=2, eval_every=100,
                                        eval_table=table,
                                        matcher="device", chunked=True)
    assert history[-1]["eval_matched_cost"] < 0.2 * cost0


def test_set_engine_serves_and_composes(tmp_path):
    from dexgangrasp_tpu.cli import load_engine
    from dexgangrasp_tpu.engine.set_pipeline import SetEngine
    from dexgangrasp_tpu.models.networks import init_evaluator
    from dexgangrasp_tpu.train import checkpoints as ckpt

    model = GraspTransformer(**TINY)
    params = model.init(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    eng = SetEngine(params, ep, es, model=model, refine_steps=0)
    bps = rng.uniform(0, 0.2, 4096).astype(np.float32)
    out = eng.generate_grasps(bps)
    assert out["transl"].shape == (8, 3)
    R = out["rot_matrix"]
    np.testing.assert_allclose(np.einsum("bij,bkj->bik", R, R),
                               np.broadcast_to(np.eye(3), R.shape),
                               atol=1e-5)
    # decoder confidence rides along in z[..., -1] as a probability
    assert ((out["z"][:, -1] >= 0) & (out["z"][:, -1] <= 1)).all()
    # n_samples < n_queries → evaluator-top-n subset of the full set
    out3 = eng.generate_grasps(bps, n_samples=3)
    assert out3["transl"].shape == (3, 3)
    assert set(map(tuple, np.round(out3["transl"], 6))) <= set(
        map(tuple, np.round(out["transl"], 6)))
    # filter + refine compose
    filt = eng.filter_grasps(bps, out, thresh=-1.0)
    assert filt["transl"].shape[0] == 8
    eng.refine_steps = 2
    outr = eng.generate_grasps(bps)
    assert outr["transl"].shape == (8, 3)

    # checkpoint roundtrip through the CLI seam (default-size model)
    path = str(tmp_path / "10_set_net.npz")
    big = GraspTransformer()
    ckpt.save_pytrees(path, {"params": big.init(jax.random.PRNGKey(2)),
                             "normalizer_mean": jnp.zeros(21),
                             "normalizer_std": jnp.ones(21)},
                      {"family": "set"})
    eng2 = load_engine(path, None, model="set")
    out2 = eng2.generate_grasps(bps)
    assert out2["transl"].shape == (big.n_queries, 3)
