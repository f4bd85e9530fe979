"""Device-resident multi-step training — the TPU-first train loop.

The reference feeds one batch per optimizer step through a DataLoader and
crosses host↔device every step (``train.py:231-294``).  On TPU (especially
through the axon relay, where each program dispatch costs ~50 ms) that
serializes training on host overhead.  This module keeps the *entire
dataset resident in HBM* and runs K optimizer steps per XLA program with
``lax.scan``:

- tables: unique BPS rows (V, 4096) + per-sample ``bps_idx`` gather
  indices, so the 128k-sample index costs megabytes, not gigabytes;
- each scan step draws a uniform batch with the on-device PRNG, gathers
  its BPS rows, and applies the exact ``GanTrainer`` step body (same
  semantics as the reference's per-batch update — see train/gan.py);
- the host only orchestrates chunks: LR plateau scheduling, eval-split
  metrics, checkpoints.

This is both the evaluator-quality workhorse (VERDICT r1 next-1) and the
training-throughput benchmark path (BASELINE config #3, VERDICT r1 next-6).
"""
from __future__ import annotations

import functools
import os
from typing import Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.data.datasets import (
    DexEvaluatorDataSet,
    DexGeneratorDataSet,
    _hom_from_pos_quat,
    hard_negative_np,
)
from dexgangrasp_tpu.train.gan import (
    EvaluatorTrainState,
    GanTrainer,
    GanTrainState,
    set_lr,
)
from dexgangrasp_tpu.train.schedule import PlateauScheduler

# ------------------------------------------------------------------- tables


def _bps_matrix(ds, paths):
    uniq = sorted(set(paths))
    pos = {p: i for i, p in enumerate(uniq)}
    mat = np.stack([ds._load_bps(p) for p in uniq]).astype(np.float32)
    return mat, pos


def build_evaluator_table(ds: DexEvaluatorDataSet,
                          seed: int = 0) -> Dict[str, np.ndarray]:
    """Materialize the evaluator index (same marginals as the reference's
    per-epoch sampling: per bps view, all S positives + 0.3/0.4-ratio
    negatives/hard-negatives) into flat arrays for device residence."""
    rng = np.random.default_rng(seed)
    bps_mat, pos = _bps_matrix(ds, ds.bps_paths)
    M = len(ds)
    bps_idx = np.fromiter((pos[p] for p in ds.bps_paths), np.int32, M)
    label = np.fromiter((1.0 if l == "positive" else 0.0 for l in ds.labels),
                        np.float32, M)

    rot9 = np.empty((M, 9), np.float32)
    transl = np.empty((M, 3), np.float32)

    # group rows by (bps_path, label) and assemble vectorized
    keys = np.array([f"{p}\0{l}" for p, l in zip(ds.bps_paths, ds.labels)])
    order = np.argsort(keys, kind="stable")
    homs: Dict[Tuple[str, str], np.ndarray] = {}

    def hom_for(obj, outcome):
        if (obj, outcome) not in homs:
            palms, _ = ds.store.get(obj, outcome)
            homs[(obj, outcome)] = _hom_from_pos_quat(palms)
        return homs[(obj, outcome)]

    s = 0
    while s < M:
        e = s
        while e < M and keys[order[e]] == keys[order[s]]:
            e += 1
        rows = order[s:e]
        bps_path = ds.bps_paths[rows[0]]
        lab = ds.labels[rows[0]]
        obj = ds.obj_name_from_bps(bps_path)
        T = ds._centr_T_mesh(bps_path)
        outcome, perturb = lab, False
        if lab == "hard_negative" and ds.store.palm_poses[obj].get(
                "hard_negative", np.zeros((0,))).shape[0] == 0:
            outcome, perturb = "positive", True
        hom = hom_for(obj, outcome)
        n = len(rows)
        if lab == "positive" and n == hom.shape[0]:
            g = np.arange(n)          # full enumeration (index == all pos)
        else:
            g = rng.integers(0, hom.shape[0], n)
        pose = np.einsum("ij,gjk->gik", T, hom[g])
        if perturb:
            pose = hard_negative_np(rng, pose)
        rot9[rows] = pose[:, :3, :3].reshape(n, 9).astype(np.float32)
        transl[rows] = pose[:, :3, 3].astype(np.float32)
        s = e

    return {"bps": bps_mat, "bps_idx": bps_idx, "rot9": rot9,
            "transl": transl, "label": label}


def build_generator_table(ds: DexGeneratorDataSet) -> Dict[str, np.ndarray]:
    """Flatten the generator index: every (bps view, positive grasp) pair
    exactly once (same joint distribution the reference samples from,
    ``dexgenerator_data_set.py:124-150``)."""
    # the generator loads the *_single bps variant when present
    load_paths = []
    for p in ds.bps_paths:
        lp = p.replace("multi", "single")
        load_paths.append(lp if (lp != p and os.path.isfile(lp)) else p)
    bps_mat, pos = _bps_matrix(ds, load_paths)
    M = len(ds)
    bps_idx = np.fromiter((pos[p] for p in load_paths), np.int32, M)
    rot9 = np.empty((M, 9), np.float32)
    transl = np.empty((M, 3), np.float32)
    joints_out: Optional[np.ndarray] = None

    homs: Dict[str, np.ndarray] = {}
    jcs: Dict[str, np.ndarray] = {}
    for i in range(M):
        bps_path = ds.bps_paths[i]
        obj = ds.obj_name_from_bps(bps_path)
        if obj not in homs:
            palms, jc = ds.store.get(obj, "positive")
            homs[obj] = _hom_from_pos_quat(palms)
            jcs[obj] = np.asarray([ds._reduce(j) for j in jc], np.float32)
        g = ds.grasp_idxs[i]
        pose = ds._centr_T_mesh(bps_path) @ homs[obj][g]
        rot9[i] = pose[:3, :3].reshape(9).astype(np.float32)
        transl[i] = pose[:3, 3].astype(np.float32)
        if joints_out is None:
            joints_out = np.empty((M, jcs[obj].shape[1]), np.float32)
        joints_out[i] = jcs[obj][g]

    return {"bps": bps_mat, "bps_idx": bps_idx, "rot9": rot9,
            "transl": transl, "joint_conf": joints_out}


def put_table(table: Dict[str, np.ndarray],
              mesh=None) -> Dict[str, jax.Array]:
    """Tables onto device(s).  With a mesh, tables are *replicated* on every
    device: even the 8×-scale BPS table is tens of MB (2048 views × 4096 ×
    f32 ≈ 33 MB), so replication buys collective-free per-step gathers —
    each device gathers its batch shard locally (SURVEY §2.2 regime)."""
    if mesh is None:
        return {k: jnp.asarray(v) for k, v in table.items()}
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    return {k: jax.device_put(jnp.asarray(v), rep) for k, v in table.items()}


def _constrain_dp(batch, mesh):
    """Constrain every batch leaf to shard its leading axis over the mesh's
    data-parallel axes.  Inside the scan body this is what makes the whole
    chunk program data-parallel: the gather, forward, and backward all
    partition over 'data', and GSPMD inserts one gradient all-reduce per
    scan step (the DataParallel replacement, ref dexgangrasp.py:127-129)."""
    if mesh is None:
        return batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dexgangrasp_tpu.parallel.sharding import dp_axes

    axes = dp_axes(mesh)
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*((axes,) + (None,) * (x.ndim - 1))))),
        batch)


def _gather_batch(table, rows, mesh=None):
    b = {"bps_object": table["bps"][table["bps_idx"][rows]],
         "rot_matrix": table["rot9"][rows].reshape(rows.shape[0], 3, 3),
         "transl": table["transl"][rows]}
    if "joint_conf" in table:
        b["joint_conf"] = table["joint_conf"][rows]
    if "label" in table:
        b["label"] = table["label"][rows]
    return _constrain_dp(b, mesh)


# ----------------------------------------------------------- scan programs


@functools.partial(jax.jit,
                   static_argnames=("trainer", "steps", "batch_size", "mesh"))
def evaluator_train_chunk(trainer: GanTrainer, ts: EvaluatorTrainState,
                          table: Dict[str, jax.Array], key: jax.Array,
                          steps: int, batch_size: int, mesh=None
                          ) -> Tuple[EvaluatorTrainState, jax.Array]:
    """K evaluator optimizer steps in ONE XLA program.  Returns
    (new_state, per-step losses (K,)).

    With ``mesh``, each step's batch shards over the mesh's dp axes and
    GSPMD emits the per-step gradient all-reduce — the multi-chip path
    runs the SAME 490-steps/s scan program, not per-batch host dispatch
    (VERDICT r2 next-1)."""
    M = table["bps_idx"].shape[0]

    def body(ts, k):
        k_rows, k_drop = jax.random.split(k)
        rows = jax.random.randint(k_rows, (batch_size,), 0, M)
        ts, logs = trainer.evaluator_step_body(
            ts, _gather_batch(table, rows, mesh), k_drop)
        return ts, logs["total_loss_eva"]

    return jax.lax.scan(body, ts, jax.random.split(key, steps))


@functools.partial(jax.jit, static_argnames=("trainer", "steps",
                                             "batch_size", "gen_train_freq",
                                             "mesh"))
def gan_train_chunk(trainer: GanTrainer, ts: GanTrainState,
                    table: Dict[str, jax.Array], key: jax.Array,
                    steps: int, batch_size: int, gen_train_freq: int = 1,
                    mesh=None
                    ) -> Tuple[GanTrainState, Dict[str, jax.Array]]:
    """K whole-GAN steps in one program.  ``gen_train_freq`` super-steps:
    each scan iteration runs (freq-1) discriminator-only updates then one
    generator+discriminator update (reference train.py:248-251 semantics).
    ``steps`` counts scan iterations (= generator updates).  ``mesh``:
    see evaluator_train_chunk — dp-sharded scan interior."""
    M = table["bps_idx"].shape[0]

    def one(ts, k, train_gen: bool):
        k_rows, k_step = jax.random.split(k)
        rows = jax.random.randint(k_rows, (batch_size,), 0, M)
        return trainer.gan_step_body(ts, _gather_batch(table, rows, mesh),
                                     k_step, is_train_gen=train_gen)

    def body(ts, k):
        ks = jax.random.split(k, gen_train_freq)
        d_losses = []
        for i in range(gen_train_freq - 1):
            ts, logs = one(ts, ks[i], False)
            d_losses.append(logs["total_loss_disc"])
        ts, logs = one(ts, ks[-1], True)
        d_losses.append(logs["total_loss_disc"])
        return ts, {"total_loss_disc": jnp.mean(jnp.stack(d_losses)),
                    "total_loss_gen": logs["total_loss_gen"]}

    return jax.lax.scan(body, ts, jax.random.split(key, steps))


def build_diffusion_table(ds: Optional[DexGeneratorDataSet], trainer,
                          table: Optional[Dict[str, np.ndarray]] = None
                          ) -> Dict[str, np.ndarray]:
    """Generator table + precomputed normalized grasp vectors 'g0' for the
    diffusion trainer (train/diffusion.py).  Pass a prebuilt generator
    ``table`` to skip the rebuild (e.g. after fitting the normalizer)."""
    table = dict(table) if table is not None else build_generator_table(ds)
    batch = {"rot_matrix": table["rot9"].reshape(-1, 3, 3),
             "transl": table["transl"], "joint_conf": table["joint_conf"],
             "bps_object": np.zeros((1,), np.float32)}  # unused by g0
    _, g0 = trainer.batch_to_g0(batch)
    table["g0"] = np.asarray(g0, np.float32)
    return table


@functools.partial(jax.jit,
                   static_argnames=("trainer", "steps", "batch_size", "mesh"))
def diffusion_train_chunk(trainer, ts, table: Dict[str, jax.Array],
                          key: jax.Array, steps: int, batch_size: int,
                          mesh=None):
    """K diffusion ε-MSE steps in one program (counterpart of the host loop
    in train/families.py:train_diffusion).  ``mesh``: see
    evaluator_train_chunk — dp-sharded scan interior."""
    M = table["bps_idx"].shape[0]

    def body(ts, k):
        k_rows, k_step = jax.random.split(k)
        rows = jax.random.randint(k_rows, (batch_size,), 0, M)
        batch = _constrain_dp(
            {"bps": table["bps"][table["bps_idx"][rows]],
             "g0": table["g0"][rows]}, mesh)
        ts, loss = trainer.train_step_body(ts, batch["bps"], batch["g0"],
                                           k_step)
        return ts, loss

    return jax.lax.scan(body, ts, jax.random.split(key, steps))


def build_pointnet_table(ds, repeats: int = 1,
                         seed: int = 0) -> Dict[str, np.ndarray]:
    """Materialize the PointNet evaluator index (data/pcd_dataset.py) into
    flat arrays: unique normalized clouds (V, 1024, 3) + per-row
    ``cloud_idx`` gathers.  ``repeats`` replays the index with fresh grasp
    draws — the device-resident stand-in for the reference's per-epoch
    re-sampling (each epoch draws new grasps per row,
    ``dexevaluator_data_set.py:177-316``)."""
    rng = np.random.default_rng(seed)
    ds.rng = rng  # _assemble draws grasps from this
    uniq = sorted(set(ds.pcd_paths))
    pos = {p: i for i, p in enumerate(uniq)}
    clouds = np.stack([ds._cloud(p) for p in uniq]).astype(np.float32)
    M = len(ds)
    cloud_idx = np.fromiter((pos[p] for p in ds.pcd_paths), np.int32, M)
    rows = {"rot9": [], "transl": [], "label": []}
    for _ in range(repeats):
        b = ds._assemble(np.arange(M))
        rows["rot9"].append(b["rot_matrix"].reshape(M, 9))
        rows["transl"].append(b["transl"])
        rows["label"].append(b["label"])
    return {"clouds": clouds,
            "cloud_idx": np.tile(cloud_idx, repeats),
            "rot9": np.concatenate(rows["rot9"]).astype(np.float32),
            "transl": np.concatenate(rows["transl"]).astype(np.float32),
            "label": np.concatenate(rows["label"]).astype(np.float32)}


@functools.partial(jax.jit,
                   static_argnames=("trainer", "steps", "batch_size", "mesh"))
def pointnet_train_chunk(trainer, ts, table: Dict[str, jax.Array],
                         key: jax.Array, steps: int, batch_size: int,
                         mesh=None):
    """K PointNet evaluator steps in one program.  ``mesh``: see
    evaluator_train_chunk — dp-sharded scan interior."""
    M = table["cloud_idx"].shape[0]

    def body(ts, k):
        rows = jax.random.randint(k, (batch_size,), 0, M)
        batch = _constrain_dp(
            {"pcd_array": table["clouds"][table["cloud_idx"][rows]],
             "rot_matrix": table["rot9"][rows].reshape(batch_size, 3, 3),
             "transl": table["transl"][rows],
             "label": table["label"][rows]}, mesh)
        ts, logs = trainer.train_step_body(ts, batch)
        return ts, logs["total_loss_eva"]

    return jax.lax.scan(body, ts, jax.random.split(key, steps))


@functools.partial(jax.jit, static_argnames=("trainer", "batch_size"))
def pointnet_scores(trainer, params, state, table: Dict[str, jax.Array],
                    batch_size: int = 2048) -> jax.Array:
    """Eval-mode success probabilities for every PointNet table row."""
    M = table["cloud_idx"].shape[0]
    nb = -(-M // batch_size)
    rows = jnp.arange(nb * batch_size) % M

    def body(_, rws):
        pts = table["clouds"][table["cloud_idx"][rws]]
        p, _s = trainer.model.apply(
            params, state, pts, table["rot9"][rws], table["transl"][rws],
            train=False)
        return 0, p[:, 0]

    _, out = jax.lax.scan(body, 0, rows.reshape(nb, batch_size))
    return out.reshape(-1)[:M]


@functools.partial(jax.jit,
                   static_argnames=("trainer", "steps", "batch_size", "mesh"))
def vae_train_chunk(trainer, ts, table: Dict[str, jax.Array],
                    key: jax.Array, steps: int, batch_size: int, mesh=None):
    """K cVAE steps in one program (device-resident counterpart of the
    host loop in train/families.py:train_vae).  ``mesh``: see
    evaluator_train_chunk — dp-sharded scan interior."""
    M = table["bps_idx"].shape[0]

    def body(ts, k):
        k_rows, k_step = jax.random.split(k)
        rows = jax.random.randint(k_rows, (batch_size,), 0, M)
        ts, logs = trainer.train_step_body(
            ts, _gather_batch(table, rows, mesh), k_step)
        return ts, logs["total_loss_vae"]

    return jax.lax.scan(body, ts, jax.random.split(key, steps))


@functools.partial(jax.jit,
                   static_argnames=("trainer", "steps", "batch_size", "mesh"))
def set_train_chunk(trainer, ts, table: Dict[str, jax.Array],
                    key: jax.Array, steps: int, batch_size: int, mesh=None):
    """K fused DETR set-prediction steps in one program.

    Only possible with the DEVICE matcher: the eps-optimal auction
    (ops/assignment.py) replaces the per-step host Hungarian sync, so
    the whole minibatch loop scans on device like every other family —
    through the axon relay this amortizes the ~35-50 ms fixed dispatch
    cost over K steps (the host-matched path pays it every step).
    ``table``: build_set_table output {"bps" (V,4096), "gt" (V,M,21),
    "mask" (V,M)}, normalized upstream if the trainer has a normalizer.
    ``mesh``: dp-sharded scan interior (see evaluator_train_chunk)."""
    V = table["bps"].shape[0]

    def body(ts, k):
        rows = jax.random.randint(k, (batch_size,), 0, V)
        batch = _constrain_dp({"bps": table["bps"][rows],
                               "gt": table["gt"][rows],
                               "mask": table["mask"][rows]}, mesh)
        ts, logs = trainer._fused_step_body(ts, batch["bps"], batch["gt"],
                                            batch["mask"], mesh=mesh)
        return ts, logs["loss"]

    return jax.lax.scan(body, ts, jax.random.split(key, steps))


@functools.partial(jax.jit, static_argnames=("trainer", "batch_size",
                                             "mesh"))
def evaluator_scores(trainer: GanTrainer, params, state,
                     table: Dict[str, jax.Array],
                     batch_size: int = 8192, mesh=None) -> jax.Array:
    """Eval-mode success probabilities for every table row, one program."""
    M = table["bps_idx"].shape[0]
    nb = -(-M // batch_size)
    rows = jnp.arange(nb * batch_size) % M

    def body(_, rws):
        b = _gather_batch(table, rws, mesh)
        p, _s = trainer.eva.apply(params, state, b["bps_object"],
                                  b["rot_matrix"].reshape(rws.shape[0], 9),
                                  b["transl"], train=False)
        return 0, p[:, 0]

    _, out = jax.lax.scan(body, 0, rows.reshape(nb, batch_size))
    return out.reshape(-1)[:M]


# ------------------------------------------------------------ host metrics


def binary_auc(probs: np.ndarray, labels: np.ndarray) -> float:
    """Rank-based (Mann-Whitney) ROC AUC."""
    probs = np.asarray(probs, np.float64)
    labels = np.asarray(labels) > 0.5
    n_pos = int(labels.sum())
    n_neg = labels.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    ranks = np.empty(probs.size, np.float64)
    order = np.argsort(probs, kind="mergesort")
    sp = probs[order]
    i = 0
    while i < sp.size:  # average ranks over ties
        j = i
        while j < sp.size and sp[j] == sp[i]:
            j += 1
        ranks[order[i:j]] = 0.5 * (i + j - 1) + 1.0
        i = j
    return float((ranks[labels].sum() - n_pos * (n_pos + 1) / 2.0)
                 / (n_pos * n_neg))


def evaluator_metrics(probs: np.ndarray, labels: np.ndarray,
                      thresh: float = 0.5) -> Dict[str, float]:
    """tp/tn class rates at ``thresh`` (reference losses.py:5-17 semantics:
    tp_rate = P(pred=1 | label=1), tn_rate = P(pred=0 | label=0)), accuracy,
    BCE, AUC."""
    probs = np.asarray(probs, np.float64)
    labels = np.asarray(labels, np.float64)
    pred = probs > thresh
    pos = labels > 0.5
    tp = float(pred[pos].mean()) if pos.any() else float("nan")
    tn = float((~pred[~pos]).mean()) if (~pos).any() else float("nan")
    acc = float((pred == pos).mean())
    eps = 1e-7
    p = np.clip(probs, eps, 1 - eps)
    bce = float(-(labels * np.log(p) + (1 - labels) * np.log(1 - p)).mean())
    return {"tp_rate": tp, "tn_rate": tn, "accuracy": acc, "bce": bce,
            "auc": binary_auc(probs, labels)}


# -------------------------------------------------------------- host driver


def train_evaluator_fast(trainer: GanTrainer, ts: EvaluatorTrainState,
                         train_table: Dict[str, np.ndarray],
                         eval_table: Dict[str, np.ndarray],
                         total_steps: int, batch_size: int = 256,
                         chunk: int = 500, eval_every: int = 2000,
                         seed: int = 0, use_plateau: bool = True,
                         log: Optional[Callable[[str], None]] = print,
                         mesh=None
                         ) -> Tuple[EvaluatorTrainState, list]:
    """Chunked evaluator training with plateau LR + eval metrics.

    With ``mesh``, the scan chunks run data-parallel over the mesh's dp
    axes (tables replicated, params replicated, batch sharded).

    Returns (final_state, history list of dicts)."""
    dev_train = put_table(train_table, mesh)
    dev_eval = put_table(eval_table, mesh)
    if mesh is not None:
        from dexgangrasp_tpu.parallel.sharding import replicate

        ts = replicate(ts, mesh)
    key = jax.random.PRNGKey(seed)
    sched = PlateauScheduler(lr=float(trainer.cfg.lr))
    history = []
    done = 0
    while done < total_steps:
        n = min(chunk, total_steps - done)
        key, k = jax.random.split(key)
        ts, losses = evaluator_train_chunk(trainer, ts, dev_train, k,
                                           n, batch_size, mesh=mesh)
        done += n
        if done % eval_every < chunk or done >= total_steps:
            train_loss = float(np.asarray(losses).mean())
            probs = np.asarray(evaluator_scores(trainer, ts.params, ts.state,
                                                dev_eval, mesh=mesh))
            m = evaluator_metrics(probs, eval_table["label"])
            m.update(step=done, train_loss=train_loss,
                     lr=float(sched.lr))
            history.append(m)
            if log:
                log(f"step {done}: train_bce {train_loss:.4f} "
                    f"eval_bce {m['bce']:.4f} auc {m['auc']:.3f} "
                    f"tp {m['tp_rate']:.3f} tn {m['tn_rate']:.3f} "
                    f"lr {sched.lr:.2e}")
            if use_plateau:
                new_lr = sched.step(m["bce"])
                ts = EvaluatorTrainState(
                    params=ts.params, state=ts.state,
                    opt=set_lr(ts.opt, new_lr), step=ts.step)
    return ts, history
