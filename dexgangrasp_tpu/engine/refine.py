"""Grasp refinement — counterpart of ``DexGanGrasp.refine_grasps``
(``dexgangrasp.py:516-569,619-660``), rebuilt as jitted scan loops.

- gradient: ascend the evaluator's success probability w.r.t.
  (transl, rot, joints); the step is scaled so translation moves ≤1 cm per
  iteration (α = min(0.01 / ||∂p/∂t||, 1), reference :532-534).
- sampling: Metropolis-style — perturb ±2 cm translation / ±1 rad Euler,
  re-score, accept with probability min(1, p_new/p_old) (reference
  :543-569; that code path references stale attributes — bit-rotted — so
  this is the documented-intent reconstruction).

Both run entirely on device over the whole grasp batch (the reference
loops host-side per refinement step) and return per-step success
trajectories for the refinement viewer.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.engine import folding


def _score(eva_folded, ctx, rot, transl):
    n = transl.shape[0]
    pose = jnp.concatenate([rot.reshape(n, 9), transl], axis=1)
    return folding.evaluator_apply_folded(eva_folded, ctx, pose)


@functools.partial(jax.jit, static_argnames=("num_steps",))
def refine_grasps_gradient(eva_folded: dict, bps: jax.Array,
                           rot: jax.Array, transl: jax.Array,
                           joints: jax.Array, num_steps: int = 10
                           ) -> Tuple[jax.Array, jax.Array, jax.Array,
                                      jax.Array]:
    """Returns (rot, transl, joints, success_trajectory (num_steps+1, N))."""
    ctx = folding.evaluator_object_context(eva_folded, bps)

    def p_sum(rot, transl):
        return jnp.sum(_score(eva_folded, ctx, rot, transl))

    def body(carry, _):
        rot, transl, joints = carry
        p = _score(eva_folded, ctx, rot, transl)
        g_rot, g_transl = jax.grad(p_sum, argnums=(0, 1))(rot, transl)
        # clamp: translation step ≤ 1 cm (reference :532-534)
        norm_t = jnp.linalg.norm(g_transl, axis=-1)
        alpha = jnp.minimum(0.01 / jnp.maximum(norm_t, 1e-12), 1.0)
        transl = transl + g_transl * alpha[:, None]
        rot = rot + g_rot * alpha[:, None, None]
        # joints don't enter the evaluator (reference quirk) → unchanged,
        # matching the zero gradient torch would produce
        return (rot, transl, joints), p

    (rot, transl, joints), traj = jax.lax.scan(
        body, (rot, transl, joints), None, length=num_steps)
    p_final = _score(eva_folded, ctx, rot, transl)
    traj = jnp.concatenate([traj, p_final[None]], axis=0)
    return rot, transl, joints, traj


@functools.partial(jax.jit, static_argnames=("num_steps",))
def refine_grasps_sampling(eva_folded: dict, bps: jax.Array,
                           rot: jax.Array, transl: jax.Array,
                           joints: jax.Array, key: jax.Array,
                           num_steps: int = 10
                           ) -> Tuple[jax.Array, jax.Array, jax.Array,
                                      jax.Array]:
    """Metropolis refinement: returns (rot, transl, joints, trajectory)."""
    from dexgangrasp_tpu.core.rotations import euler_to_mat

    ctx = folding.evaluator_object_context(eva_folded, bps)
    n = transl.shape[0]

    def body(carry, k):
        rot, transl, last_p = carry
        dt = transl.dtype
        k1, k2, k3 = jax.random.split(k, 3)
        delta_t = (jax.random.uniform(k1, (n, 3), dt) - 0.5) * 2.0 * 0.02
        delta_e = (jax.random.uniform(k2, (n, 3), dt) - 0.5) * 2.0
        dR = euler_to_mat(delta_e[:, 0], delta_e[:, 1], delta_e[:, 2])
        cand_rot = jnp.einsum("nij,njk->nik", dR, rot).astype(rot.dtype)
        cand_transl = transl + delta_t
        cand_p = _score(eva_folded, ctx, cand_rot, cand_transl)
        ratio = cand_p / jnp.maximum(last_p, 1e-4)
        accept = jax.random.uniform(k3, (n,), dt) <= ratio
        rot = jnp.where(accept[:, None, None], cand_rot, rot)
        transl = jnp.where(accept[:, None], cand_transl, transl)
        p = jnp.where(accept, cand_p, last_p)
        return (rot, transl, p), p

    p0 = _score(eva_folded, ctx, rot, transl)
    (rot, transl, p_last), traj = jax.lax.scan(
        body, (rot, transl, p0), jax.random.split(key, num_steps))
    traj = jnp.concatenate([p0[None], traj], axis=0)
    return rot, transl, joints, traj
