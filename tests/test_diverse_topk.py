"""Diversity-aware top-k selection tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.engine.pipeline import diverse_topk

rng = np.random.default_rng(191)


def test_diverse_topk_enforces_separation():
    # two tight clusters of high scorers + scattered low scorers
    n = 512
    transl = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    score = rng.uniform(0.0, 0.4, n).astype(np.float32)
    transl[:50] = np.array([0.05, 0.0, 0.0]) + rng.normal(size=(50, 3)) * 1e-3
    score[:50] = 0.9 + rng.uniform(0, 0.05, 50)
    transl[50:100] = np.array([-0.05, 0.0, 0.0]) + rng.normal(size=(50, 3)) * 1e-3
    score[50:100] = 0.8 + rng.uniform(0, 0.05, 50)

    idx = np.asarray(diverse_topk(jnp.asarray(score), jnp.asarray(transl),
                                  k=5, min_dist=0.02))
    assert len(set(idx.tolist())) == 5  # distinct picks
    picked = transl[idx]
    # first pick = global best
    assert idx[0] == int(np.argmax(score))
    # at most one pick per 1-mm cluster among the separated picks: count
    # picks within each cluster — the 0.02 separation allows only one each
    d_c1 = np.linalg.norm(picked - [0.05, 0, 0], axis=1)
    d_c2 = np.linalg.norm(picked - [-0.05, 0, 0], axis=1)
    assert (d_c1 < 0.01).sum() == 1
    assert (d_c2 < 0.01).sum() == 1
    # plain top-5 would have taken 5 from cluster 1
    plain = np.argsort(-score)[:5]
    assert (np.linalg.norm(transl[plain] - [0.05, 0, 0], axis=1) < 0.01).all()


def test_diverse_topk_fallback_when_all_close():
    """If fewer than k well-separated grasps exist, still return k."""
    transl = (np.zeros((64, 3)) + rng.normal(size=(64, 3)) * 1e-4).astype(
        np.float32)
    score = rng.uniform(0.5, 1.0, 64).astype(np.float32)
    idx = np.asarray(diverse_topk(jnp.asarray(score), jnp.asarray(transl),
                                  k=8, min_dist=0.05, candidates=64))
    assert len(set(idx.tolist())) == 8
