"""Checkpoint save/load.

Three formats:

- **native**: a single ``.npz`` per net holding the flattened param/state/
  optimizer pytrees plus scheduler state and epoch — fast, dependency-free,
  resumable (replaces the reference's torch.save dicts,
  ``dexgangrasp.py:662-712``).  File naming follows the reference:
  ``{epoch}_gen_net.npz`` / ``{epoch}_eva_net.npz`` under a run dir.
- **orbax** (``backend="orbax"``): an orbax-checkpoint directory per net
  (``{epoch}_gen_net.orbax/``) — the multi-host/multi-slice option: orbax
  writes device-sharded arrays in parallel without host gathering.  The
  leaves are stored flat under our own pickled treedefs (sidecar), so
  optax optimizer states restore to their exact structure rather than
  orbax's plain-dict reconstruction.  ``load_pytrees`` auto-detects the
  format from the path (directory → orbax, file → npz).
- **torch interop**: import the reference's legacy ``ffh*``-keyed ``.pt``
  checkpoints / export ours to that layout (models/torch_import.py), so
  weights flow both ways between the frameworks.
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def save_pytrees(path: str, trees: Dict[str, Any],
                 meta: Optional[dict] = None,
                 backend: str = "npz") -> None:
    """Save named pytrees + JSON-able metadata into one npz (default) or
    an orbax checkpoint directory (``backend="orbax"``).

    Tree *structures* are stored via pickled treedefs; leaves as arrays.
    """
    if backend == "orbax":
        return _save_pytrees_orbax(path, trees, meta)
    if backend != "npz":
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    arrays: Dict[str, np.ndarray] = {}
    structs: Dict[str, bytes] = {}
    for name, tree in trees.items():
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        structs[name] = pickle.dumps(treedef)
        for i, leaf in enumerate(leaves):
            arrays[f"{name}::{i}"] = np.asarray(leaf)
    arrays["__structs__"] = np.frombuffer(
        pickle.dumps(structs), dtype=np.uint8)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def _save_pytrees_orbax(path: str, trees: Dict[str, Any],
                        meta: Optional[dict] = None) -> None:
    """Orbax backend: leaves flat (name::i), treedefs + meta as sidecars.

    Orbax writes each (possibly device-sharded) array in parallel from all
    hosts — the backend for multi-slice runs where gathering the full
    optimizer state onto one host (the npz path) would not scale.
    """
    import shutil

    import orbax.checkpoint as ocp

    flat: Dict[str, Any] = {}
    structs: Dict[str, bytes] = {}
    for name, tree in trees.items():
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        structs[name] = pickle.dumps(treedef)
        for i, leaf in enumerate(leaves):
            flat[f"{name}::{i}"] = jnp.asarray(leaf)
    path = os.path.abspath(path)
    # Atomic commit: orbax finalizes its own directory, but our sidecars
    # land after — so assemble everything in a staging dir and rename it
    # into place last.  The previous checkpoint is renamed ASIDE (.old),
    # not deleted, before the tmp→path rename, so a crash at any point
    # leaves a complete checkpoint at either ``path`` or ``path + '.old'``
    # (plus possibly a stray .tmp dir) — never a window with no
    # recoverable checkpoint (ADVICE r3).
    tmp = path + ".tmp"
    old = path + ".old"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    ocp.PyTreeCheckpointer().save(tmp, flat, force=True)
    with open(os.path.join(tmp, "dexgg_structs.pkl"), "wb") as f:
        pickle.dump(structs, f)
    with open(os.path.join(tmp, "dexgg_meta.json"), "w") as f:
        json.dump(meta or {}, f)
    if os.path.isdir(path):
        # only displace a still-live .old when a NEW complete checkpoint
        # sits at ``path``; if ``path`` is absent (recovering from a crash
        # mid-commit), the surviving .old stays untouched until the new
        # checkpoint is in place
        if os.path.isdir(old):
            shutil.rmtree(old)
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.isdir(old):
        shutil.rmtree(old)


def _load_pytrees_orbax(path: str) -> Tuple[Dict[str, Any], dict]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "dexgg_structs.pkl"), "rb") as f:
        structs = pickle.load(f)
    with open(os.path.join(path, "dexgg_meta.json")) as f:
        meta = json.load(f)
    flat = ocp.PyTreeCheckpointer().restore(path)
    out = {}
    for name, treedef_b in structs.items():
        treedef = pickle.loads(treedef_b)
        leaves = [flat[f"{name}::{i}"]
                  for i in range(treedef.num_leaves)]
        out[name] = jax.tree_util.tree_unflatten(treedef, leaves)
    return out, meta


def load_pytrees(path: str) -> Tuple[Dict[str, Any], dict]:
    if not os.path.exists(path) and os.path.isdir(path + ".old"):
        # crash recovery: a save that died between rename(path, .old) and
        # rename(tmp, path) leaves the previous complete checkpoint at
        # .old — serve it rather than failing
        path = path + ".old"
    if os.path.isdir(path):
        return _load_pytrees_orbax(path)
    z = np.load(path, allow_pickle=False)
    structs = pickle.loads(z["__structs__"].tobytes())
    meta = json.loads(z["__meta__"].tobytes().decode())
    out = {}
    for name, treedef_b in structs.items():
        treedef = pickle.loads(treedef_b)
        n = treedef.num_leaves
        leaves = [jnp.asarray(z[f"{name}::{i}"]) for i in range(n)]
        out[name] = jax.tree_util.tree_unflatten(treedef, leaves)
    return out, meta


# ----------------------------------------------------------- run-dir layout


def gen_ckpt_path(save_dir: str, epoch, backend: str = "npz") -> str:
    ext = "orbax" if backend == "orbax" else "npz"
    return os.path.join(save_dir, f"{epoch}_gen_net.{ext}")


def eva_ckpt_path(save_dir: str, epoch, backend: str = "npz") -> str:
    ext = "orbax" if backend == "orbax" else "npz"
    return os.path.join(save_dir, f"{epoch}_eva_net.{ext}")


def save_gan(save_dir: str, epoch, ts, scheduler_gen=None,
             scheduler_disc=None, backend: str = "npz") -> str:
    path = gen_ckpt_path(save_dir, epoch, backend)
    meta = {"epoch": int(epoch) if isinstance(epoch, int) else epoch}
    if scheduler_gen is not None:
        meta["scheduler_gen"] = scheduler_gen.state_dict()
    if scheduler_disc is not None:
        meta["scheduler_disc"] = scheduler_disc.state_dict()
    save_pytrees(path, {
        "gen_params": ts.gen_params, "gen_state": ts.gen_state,
        "disc_params": ts.disc_params, "disc_state": ts.disc_state,
        "gen_opt": ts.gen_opt, "disc_opt": ts.disc_opt,
        "step": ts.step,
    }, meta, backend=backend)
    return path


def load_gan(path: str, ts_template=None):
    """Returns (trees dict, meta). If ``ts_template`` given, returns a new
    GanTrainState with loaded leaves."""
    trees, meta = load_pytrees(path)
    if ts_template is None:
        return trees, meta
    from dexgangrasp_tpu.train.gan import GanTrainState

    return GanTrainState(
        gen_params=trees["gen_params"], gen_state=trees["gen_state"],
        disc_params=trees["disc_params"], disc_state=trees["disc_state"],
        gen_opt=trees["gen_opt"], disc_opt=trees["disc_opt"],
        step=trees["step"]), meta


def save_evaluator(save_dir: str, epoch, ts, scheduler=None,
                   backend: str = "npz") -> str:
    path = eva_ckpt_path(save_dir, epoch, backend)
    meta = {"epoch": int(epoch) if isinstance(epoch, int) else epoch}
    if scheduler is not None:
        meta["scheduler"] = scheduler.state_dict()
    save_pytrees(path, {"params": ts.params, "state": ts.state,
                        "opt": ts.opt, "step": ts.step}, meta,
                 backend=backend)
    return path


def load_evaluator(path: str, as_state: bool = False):
    trees, meta = load_pytrees(path)
    if not as_state:
        return trees, meta
    from dexgangrasp_tpu.train.gan import EvaluatorTrainState

    return EvaluatorTrainState(params=trees["params"], state=trees["state"],
                               opt=trees["opt"], step=trees["step"]), meta


def latest_epoch(save_dir: str, kind: str = "gen") -> Optional[int]:
    """Find the newest ``{epoch}_{kind}_net.{npz,orbax}`` in a run dir
    (fixes the reference's broken epoch==-1 'latest' path,
    dexgangrasp.py:574-577)."""
    best = None
    for f in os.listdir(save_dir):
        parts = f.split("_")
        if len(parts) >= 3 and parts[1] == kind and \
                (f.endswith(".npz") or f.endswith(".orbax")):
            try:
                e = int(parts[0])
            except ValueError:
                continue
            best = e if best is None else max(best, e)
    return best
