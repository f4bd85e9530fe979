"""Distill the guided-DDIM teacher into a one-step student sampler.

The production quality frontier samples with evaluator-guided DDIM-10
(engine/diffusion_pipeline.sample_guided) — 10 denoiser evals + 10
evaluator VJPs per frame.  That map is *deterministic* given the initial
noise, so it can be distilled by direct regression (Luhman & Luhman,
arXiv:2101.02388): pre-generate (z, teacher(z)) pairs per training view,
then train a student — the same DexDiffuser backbone evaluated once at
t = 1 with its output head read as an x0-prediction
(models/diffusion.py ``student_x0``) — to reproduce the endpoint in ONE
denoiser pass.

Serving value: the sampler stage of the frame program drops from a
10-step scan with an embedded reverse-mode sweep to a single MLP pass;
the evaluator-gradient refinement + 3-stage filter (the rest of the
frontier recipe, reference ``dexgangrasp.py:619-660`` / ``eval.py:274-276``)
compose on top unchanged.  Quality head-to-head: tools/distill_study.py.

TPU notes: pair generation and training are batched matmul work (MXU);
the student inherits f32 master params with the teacher's normalizer;
everything is static-shaped and jit-scanned per chunk.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from dexgangrasp_tpu.models.diffusion import DexDiffuser


def build_teacher_pairs(model: DexDiffuser, diff_params: dict,
                        eva_folded: dict, normalizer,
                        bps_views: np.ndarray, key: jax.Array,
                        pairs_per_view: int = 128, steps: int = 10,
                        guidance_scale: float = 10.0,
                        grad_clip: float = 1.0, z_offset: float = 0.025,
                        log: Optional[Callable[[str], None]] = None
                        ) -> Dict[str, np.ndarray]:
    """Run the guided-DDIM teacher from explicit noise starts.

    ``bps_views`` (V, 4096) → {"bps": (V, 4096), "z": (V, P, g_dim),
    "g": (V, P, g_dim)} with g the teacher endpoint in NORMALIZED space
    (the student regresses in the same space the teacher samples in).
    One teacher call per view; deterministic given ``key``.
    """
    from dexgangrasp_tpu.engine.diffusion_pipeline import sample_guided

    v = bps_views.shape[0]
    zs, gs = [], []
    t0 = time.time()
    for i in range(v):
        key, kz = jax.random.split(key)
        z = jax.random.normal(kz, (pairs_per_view, model.g_dim),
                              jnp.float32)
        g = sample_guided(model, diff_params, eva_folded, normalizer,
                          jnp.asarray(bps_views[i], jnp.float32), kz,
                          pairs_per_view, steps=steps,
                          guidance_scale=guidance_scale,
                          grad_clip=grad_clip, z_offset=z_offset,
                          g_init=z)
        zs.append(np.asarray(z))
        gs.append(np.asarray(g))
        if log and (i + 1) % max(1, v // 8) == 0:
            log(f"teacher pairs: {i + 1}/{v} views "
                f"({time.time() - t0:.0f}s)")
    return {"bps": np.asarray(bps_views, np.float32),
            "z": np.stack(zs), "g": np.stack(gs)}


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DistillTrainState:
    params: Any
    opt: Any
    step: jax.Array


class DistillTrainer:
    """Adam regression of ``student_x0`` onto teacher pairs."""

    def __init__(self, model: DexDiffuser = DexDiffuser(),
                 lr: float = 1e-4):
        self.model = model
        self.tx = optax.adam(lr)

    def init_state(self, teacher_params: dict) -> DistillTrainState:
        # standard distillation warm start: student = teacher weights
        params = jax.tree.map(jnp.asarray, teacher_params)
        return DistillTrainState(params=params, opt=self.tx.init(params),
                                 step=jnp.zeros((), jnp.int32))

    def loss(self, params: dict, bps: jax.Array, z: jax.Array,
             target: jax.Array) -> jax.Array:
        cond = self.model.embed_object(params, bps)
        pred = self.model.student_x0(params, cond, z)
        return jnp.mean((pred - target) ** 2)

    @functools.partial(jax.jit, static_argnames=("self",))
    def train_step(self, ts: DistillTrainState, bps: jax.Array,
                   z: jax.Array, target: jax.Array
                   ) -> Tuple[DistillTrainState, jax.Array]:
        loss, grads = jax.value_and_grad(self.loss)(ts.params, bps, z,
                                                    target)
        updates, opt = self.tx.update(grads, ts.opt, ts.params)
        params = optax.apply_updates(ts.params, updates)
        return DistillTrainState(params=params, opt=opt,
                                 step=ts.step + 1), loss

    @functools.partial(jax.jit, static_argnames=("self",))
    def eval_mse(self, params: dict, bps: jax.Array, z: jax.Array,
                 target: jax.Array) -> jax.Array:
        return self.loss(params, bps, z, target)


def train_distill(trainer: DistillTrainer, ts: DistillTrainState,
                  pairs: Dict[str, np.ndarray], total_steps: int,
                  batch_size: int = 256, seed: int = 0,
                  eval_pairs: Optional[Dict[str, np.ndarray]] = None,
                  eval_every: int = 1000,
                  log: Optional[Callable[[str], None]] = None
                  ) -> Tuple[DistillTrainState, list]:
    """Minibatch loop over the (view, pair) table; history of train/eval
    distill-MSE every ``eval_every`` steps."""
    rng = np.random.default_rng(seed)
    v, p, _ = pairs["z"].shape
    history = []
    run_loss = []
    for i in range(1, total_steps + 1):
        vi = rng.integers(0, v, batch_size)
        pi = rng.integers(0, p, batch_size)
        ts, loss = trainer.train_step(
            ts, jnp.asarray(pairs["bps"][vi]),
            jnp.asarray(pairs["z"][vi, pi]),
            jnp.asarray(pairs["g"][vi, pi]))
        run_loss.append(loss)
        if i % eval_every == 0 or i == total_steps:
            m = {"step": i,
                 "train_mse": float(np.mean(jax.device_get(run_loss)))}
            run_loss = []
            if eval_pairs is not None:
                ev, ep = eval_pairs["z"].shape[:2]
                n_ev = min(2048, ev * ep)
                evi = rng.integers(0, ev, n_ev)
                epi = rng.integers(0, ep, n_ev)
                m["eval_mse"] = float(trainer.eval_mse(
                    ts.params, jnp.asarray(eval_pairs["bps"][evi]),
                    jnp.asarray(eval_pairs["z"][evi, epi]),
                    jnp.asarray(eval_pairs["g"][evi, epi])))
            history.append(m)
            if log:
                log(" ".join(f"{k} {v:.6g}" if isinstance(v, float)
                             else f"{k} {v}" for k, v in m.items()))
    return ts, history
