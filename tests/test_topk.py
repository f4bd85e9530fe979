"""Tests for the serving top-k and multi-object engine paths."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.engine import folding
from dexgangrasp_tpu.engine.pipeline import (
    GraspEngine,
    sample_and_score,
    sample_and_topk,
    sample_and_topk_multi,
)
from dexgangrasp_tpu.models.networks import init_dexgan, init_evaluator

rng = np.random.default_rng(81)


@pytest.fixture(scope="module")
def folded():
    (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    return (folding.fold_generator(gp, gs), folding.fold_evaluator(ep, es),
            (gp, gs, ep, es))


def test_topk_exact_matches_full_sort(folded):
    gf, ef, _ = folded
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    key = jax.random.PRNGKey(3)
    full = sample_and_score(gf, ef, bps, key, 256)
    topk = sample_and_topk(gf, ef, bps, key, 256, 16, exact=True)
    np.testing.assert_allclose(np.asarray(topk.score),
                               np.asarray(full.score)[:16], atol=1e-6)
    np.testing.assert_allclose(np.asarray(topk.transl),
                               np.asarray(full.transl)[:16], atol=1e-6)


def test_topk_approx_high_recall(folded):
    gf, ef, _ = folded
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    key = jax.random.PRNGKey(4)
    full = sample_and_score(gf, ef, bps, key, 2048)
    approx = sample_and_topk(gf, ef, bps, key, 2048, 64, exact=False)
    # value-level recall: untrained scores are near-ties, so compare score
    # magnitudes, not index identity — approx top-64 must be within the
    # value range of the true top-64 (tolerating ~5% rank slack)
    kth_true = np.asarray(full.score)[80]  # 64 * 1.25 slack
    assert (np.asarray(approx.score) >= kth_true - 1e-6).mean() >= 0.9
    # sorted desc
    assert (np.diff(np.asarray(approx.score)) <= 1e-7).all()


def test_multi_object_batched(folded):
    gf, ef, _ = folded
    bps_batch = jnp.asarray(
        rng.uniform(0, 0.2, size=(4, 4096)).astype(np.float32))
    key = jax.random.PRNGKey(5)
    out = sample_and_topk_multi(gf, ef, bps_batch, key, 128, 8, exact=True)
    assert out.transl.shape == (4, 8, 3)
    assert out.rot_matrix.shape == (4, 8, 3, 3)
    assert out.score.shape == (4, 8)
    # per-object results equal the single-object path with the same split
    keys = jax.random.split(key, 4)
    single = sample_and_topk(gf, ef, bps_batch[2], keys[2], 128, 8,
                             exact=True)
    np.testing.assert_allclose(np.asarray(out.score[2]),
                               np.asarray(single.score), atol=1e-6)


def test_engine_generate_topk(folded):
    _, _, (gp, gs, ep, es) = folded
    engine = GraspEngine(gp, gs, ep, es)
    bps = rng.uniform(0, 0.2, 4096).astype(np.float32)
    g = engine.generate_topk(bps, 256, 10, seed=1, exact=True)
    assert g.transl.shape == (10, 3)
    assert (np.diff(np.asarray(g.score)) <= 1e-7).all()
