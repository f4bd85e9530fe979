"""Device-side linear assignment — the auction algorithm under jit.

The set-prediction (DGTR-style) trainer needs a min-cost bipartite
matching between learned queries and GT grasps every step (DETR
matching).  The host path (``scipy.optimize.linear_sum_assignment``,
train/set_transformer.py) costs microseconds of compute but forces a
device→host cost download and a host→device index upload per step —
a hard sync that caps dp scaling (VERDICT r4 #7, __graft_entry__ note)
and forbids putting the step under ``lax.scan``.

This module implements Bertsekas' forward auction with Jacobi
(all-at-once) bidding as a ``lax.while_loop``, vmappable over the views
axis, so the entire train step fuses into ONE device program.

The rectangular problem (n queries × m valid GT columns, m dynamic
under jit) is solved with whichever side is smaller as the bidders —
a forward auction terminates iff bidders ≤ objects:

- ``m <= n`` (classic DETR): valid columns bid for rows,
- ``m >= n`` (the real data regime — build_set_table pads to
  max_grasps=32 vs n_queries=16): rows bid for valid columns.

Both orientations run in the same program (each lane's while_loop is
gated by an ``active`` bidder mask, so the infeasible orientation exits
immediately) and the per-view result selects the feasible one.

All prices start at ZERO and run a single eps phase.  That combination
is load-bearing for the rectangular case: at termination every object
with positive price is owned, so objects outside the matching still
price at their common initial zero, and the standard eps-CS duality
argument gives total matched cost within ``min(n, m) * eps`` of the
optimum.  (Development falsified the tempting alternatives on random
ensembles: dummy-object squaring loses real matches once eps-scaled
prices carry across phases, and eps-scaling an asymmetric auction
without re-zeroing leaves stale prices on unmatched objects that block
optimal edges.)  ``eps = eps_frac * per-view cost range``, so the bound
is relative; worst observed convergence on adversarial near-tie
ensembles is ~1000 Jacobi rounds (mean ~50), hence the 2048 default
iteration cap.  The trainer keeps the scipy path as the oracle; tests
gate the auction's cost bound, structure, and degenerate cases against
it (tests/test_assignment.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -1e30


def _auction(value: jax.Array, active, eps, span, max_iters: int):
    """Zero-price forward auction, Jacobi bidding, one eps phase.

    value: (P, O) bidder valuations (NEG = unbiddable pair).
    active: (P,) bool — bidders that participate at all; feasibility
    (#active ≤ #biddable objects per the orientation) is the caller's
    contract.  Returns (owner (O,) int32 — bidder index or -1,
    assigned (P,) int32 — object index or -1) at eps-complementary
    slackness.
    """
    p, o = value.shape
    idx = jnp.arange(p, dtype=jnp.int32)

    def cond(state):
        it, price, owner, assigned = state
        return jnp.any(active & (assigned < 0)) & (it < max_iters)

    def body(state):
        it, price, owner, assigned = state
        open_b = active & (assigned < 0)                     # (P,)
        v = value - price[None, :]                           # (P, O)
        jstar = jnp.argmax(v, axis=1).astype(jnp.int32)      # (P,)
        w1 = jnp.take_along_axis(v, jstar[:, None], axis=1)[:, 0]
        v2 = v.at[idx, jstar].set(NEG)
        w2 = jnp.max(v2, axis=1)
        # single-biddable-object bidder: no second-best exists — bid a
        # full cost-span over the current price so it wins outright
        w2 = jnp.where(w2 > NEG / 2, w2, w1 - span)
        bid = price[jstar] + (w1 - w2) + eps                 # (P,)
        bid = jnp.where(open_b, bid, NEG)

        # conflict resolution: per object, highest bid wins; exact ties
        # broken by the largest bidder index (second scatter-max)
        best_bid = jnp.full((o,), NEG, jnp.float32
                            ).at[jstar].max(bid, mode="drop")
        is_best = open_b & (bid >= best_bid[jstar]) & (bid > NEG / 2)
        winner = jnp.full((o,), -1, jnp.int32
                          ).at[jstar].max(jnp.where(is_best, idx, -1),
                                          mode="drop")
        won = is_best & (winner[jstar] == idx)               # (P,)

        # objects taken this round
        obj_taken = jnp.zeros((o,), bool).at[jstar].max(won, mode="drop")
        # unassign previous owners of taken objects
        prev_owner = jnp.where(obj_taken, owner, -1)         # (O,)
        lost = jnp.zeros((p,), bool
                         ).at[jnp.clip(prev_owner, 0, p - 1)].max(
                             prev_owner >= 0, mode="drop")
        assigned = jnp.where(lost, -1, assigned)
        # record the new matches + prices
        assigned = jnp.where(won, jstar, assigned)
        owner = jnp.where(obj_taken,
                          jnp.full((o,), -1, jnp.int32
                                   ).at[jstar].max(
                                       jnp.where(won, idx, -1),
                                       mode="drop"),
                          owner)
        price = jnp.where(obj_taken,
                          jnp.full((o,), NEG, jnp.float32
                                   ).at[jstar].max(
                                       jnp.where(won, bid, NEG),
                                       mode="drop"),
                          price)
        return it + 1, price, owner, assigned

    price0 = jnp.zeros((o,), jnp.float32)
    owner0 = jnp.full((o,), -1, jnp.int32)
    assigned0 = jnp.full((p,), -1, jnp.int32)
    _, _, owner, assigned = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), price0, owner0, assigned0))
    return owner, assigned


@functools.partial(jax.jit, static_argnames=("eps_frac", "max_iters"))
def auction_assign(cost: jax.Array, col_valid: jax.Array,
                   eps_frac: float = 1e-3, max_iters: int = 2048):
    """Min-cost assignment of rows to distinct valid columns.

    cost: (n, M) float — cost[i, j] of assigning row i to column j.
    col_valid: (M,) bool — columns beyond the view's GT count are
    ignored.  Returns (midx (n,) int32, mok (n,) float32): per row, the
    matched column index (0 where unmatched) and a matched flag — the
    exact contract of SetTrainer.match: min(n, sum(col_valid)) rows
    matched, their total cost within ``min(n, m) * eps_frac * range``
    of the optimum.
    """
    n, m = cost.shape
    valid = col_valid.astype(bool)
    c = cost.astype(jnp.float32)
    any_valid = jnp.any(valid)
    mvalid = jnp.sum(valid.astype(jnp.int32))
    cmax = jnp.where(any_valid,
                     jnp.max(jnp.where(valid[None, :], c, -jnp.inf)), 0.0)
    cmin = jnp.where(any_valid,
                     jnp.min(jnp.where(valid[None, :], c, jnp.inf)), 0.0)
    span = jnp.maximum(cmax - cmin, 1e-6)
    eps = eps_frac * span

    use_rows = mvalid >= n  # rows-bid orientation feasible

    # orientation A (m <= n): valid columns bid for the n row-objects
    val_cols = jnp.where(valid[:, None], -c.T, NEG)          # (M, n)
    owner_a, _ = _auction(val_cols, valid & ~use_rows, eps, span,
                          max_iters)                         # owner: (n,)
    midx_a = jnp.where(owner_a >= 0, jnp.clip(owner_a, 0, m - 1), 0)
    mok_a = owner_a >= 0

    # orientation B (m >= n): rows bid for the valid column-objects
    val_rows = jnp.where(valid[None, :], -c, NEG)            # (n, M)
    row_active = jnp.broadcast_to(use_rows, (n,))
    _, assigned_b = _auction(val_rows, row_active, eps, span,
                             max_iters)                      # (n,)
    midx_b = jnp.where(assigned_b >= 0, jnp.clip(assigned_b, 0, m - 1), 0)
    mok_b = assigned_b >= 0

    midx = jnp.where(use_rows, midx_b, midx_a).astype(jnp.int32)
    mok = jnp.where(use_rows, mok_b, mok_a).astype(jnp.float32)
    return midx, mok


def auction_assign_batch(cost: jax.Array, col_valid: jax.Array,
                         eps_frac: float = 1e-3, max_iters: int = 2048):
    """vmapped auction over the views axis: (B, n, M), (B, M) →
    (midx (B, n), mok (B, n))."""
    return jax.vmap(
        lambda c, v: auction_assign(c, v, eps_frac=eps_frac,
                                    max_iters=max_iters))(cost, col_valid)
