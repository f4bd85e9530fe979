"""Device auction assignment (ops/assignment.py) vs the scipy oracle.

The auction is eps-optimal (total cost within m*eps of the optimum,
eps = eps_frac * cost range); the tests gate exactly that bound, plus
the structural contract (every valid column matched to a distinct row,
``match``-compatible output layout) and the degenerate cases the DETR
loop hits (empty views, square costs, single query).
"""
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.ops.assignment import (
    auction_assign,
    auction_assign_batch,
)

rng = np.random.default_rng(47)

EPS_FRAC = 1e-3


def _oracle(cost, m):
    r, c = linear_sum_assignment(cost[:, :m])
    return cost[r, c].sum()


@pytest.mark.parametrize("n_q,M", [(16, 12), (8, 8), (32, 5), (4, 1),
                                   (8, 32), (16, 32)])
def test_auction_eps_optimal_vs_scipy(n_q, M):
    """Covers m < n (classic DETR), m == n, and m > n (the real data
    regime: build_set_table max_grasps=32 vs n_queries=16)."""
    B = 6
    cost = rng.uniform(size=(B, n_q, M)).astype(np.float32)
    mask = np.zeros((B, M), bool)
    ms = rng.integers(1, M + 1, B)
    for b in range(B):
        mask[b, : ms[b]] = True
    midx, mok = jax.device_get(auction_assign_batch(
        jnp.asarray(cost), jnp.asarray(mask), eps_frac=EPS_FRAC))
    assert midx.shape == (B, n_q) and mok.shape == (B, n_q)
    for b in range(B):
        m = int(ms[b])
        k = min(n_q, m)  # scipy's rectangular match count
        assert mok[b].sum() == k
        rows = np.where(mok[b] > 0)[0]
        cols = midx[b][rows]
        # matched columns are valid and distinct
        assert len(set(cols.tolist())) == k and (cols < m).all()
        # unmatched rows carry the 0 sentinel (match() contract)
        assert (midx[b][mok[b] == 0] == 0).all()
        got = cost[b][rows, cols].sum()
        span = cost[b][:, :m].max() - cost[b][:, :m].min()
        assert got <= _oracle(cost[b], m) + n_q * EPS_FRAC * span + 1e-5


def test_auction_empty_and_full_masks():
    n_q, M = 8, 6
    cost = rng.uniform(size=(n_q, M)).astype(np.float32)
    # empty view: loop exits immediately, nothing matched
    midx, mok = jax.device_get(
        auction_assign(jnp.asarray(cost), jnp.zeros(M, bool)))
    assert mok.sum() == 0 and (midx == 0).all()
    # full mask: all M matched
    _, mok_f = jax.device_get(
        auction_assign(jnp.asarray(cost), jnp.ones(M, bool)))
    assert mok_f.sum() == M


def test_auction_recovers_exact_optimum_on_separated_costs():
    """With a unique, well-separated optimum, eps-optimal == optimal —
    the matching itself (not just the cost) must agree with scipy."""
    n_q, m = 10, 7
    base = rng.uniform(1.0, 2.0, size=(n_q, m)).astype(np.float32)
    perm = rng.permutation(n_q)[:m]
    cost = base.copy()
    cost[perm, np.arange(m)] = 0.0  # planted optimum, gap >= 1
    midx, mok = jax.device_get(
        auction_assign(jnp.asarray(cost), jnp.ones(m, bool)))
    r, c = linear_sum_assignment(cost)
    want = np.zeros(n_q, np.int64)
    want[r] = c
    rows = np.where(mok > 0)[0]
    np.testing.assert_array_equal(np.sort(rows), np.sort(r))
    np.testing.assert_array_equal(midx[rows], want[rows])


def test_auction_under_vmap_of_heterogeneous_views():
    """vmap lanes converge at different iteration counts; late lanes must
    not corrupt early ones (the masked while_loop batching rule)."""
    B, n_q, M = 4, 12, 9
    cost = rng.uniform(size=(B, n_q, M)).astype(np.float32)
    mask = np.zeros((B, M), bool)
    mask[0, :1] = True          # trivial lane
    mask[1] = True              # full lane
    mask[2, :5] = True
    # lane 3 stays empty
    midx_b, mok_b = jax.device_get(auction_assign_batch(
        jnp.asarray(cost), jnp.asarray(mask)))
    for b in range(B):
        midx_s, mok_s = jax.device_get(auction_assign(
            jnp.asarray(cost[b]), jnp.asarray(mask[b])))
        np.testing.assert_array_equal(mok_b[b], mok_s)
        np.testing.assert_array_equal(midx_b[b], midx_s)
