"""Loading of the reference's frozen 64-object eval fixture.

``data/eval_batch.pth`` (created once by reference ``eval.py:292-296``) is
the regression anchor for MAGD.  We convert it to npz on first load so the
framework has no torch dependency at eval time; torch is used only for the
one-time conversion when the npz cache is absent.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

DEFAULT_PTH = "/root/reference/data/eval_batch.pth"


def load_eval_batch(path: str = DEFAULT_PTH,
                    cache_dir: Optional[str] = None) -> Dict:
    """Returns {'rot_matrix' (64,3,3) f64, 'transl' (64,3) f64,
    'joint_conf' (64,12) f64, 'bps_object' (64,4096) f32,
    'pcd_path' list[str], 'obj_name' list[str]}."""
    if path.endswith(".npz"):
        return _from_npz(path)
    cache = os.path.join(cache_dir or os.path.dirname(path) or ".",
                         "eval_batch.npz")
    if cache_dir is not None and os.path.isfile(cache):
        return _from_npz(cache)
    import torch

    batch = torch.load(path, map_location="cpu", weights_only=False)
    out = {
        "rot_matrix": batch["rot_matrix"].numpy().astype(np.float64),
        "transl": batch["transl"].numpy().astype(np.float64),
        "joint_conf": batch["joint_conf"].numpy().astype(np.float64),
        "bps_object": batch["bps_object"].numpy().astype(np.float32),
        "pcd_path": [str(p) for p in batch["pcd_path"]],
        "obj_name": [str(o) for o in batch["obj_name"]],
    }
    if cache_dir is not None:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(cache, **{k: np.asarray(v) if not isinstance(v, list)
                           else np.array(v) for k, v in out.items()})
    return out


def make_eval_batch(dataset, batch_size: int = 64) -> Dict:
    """Draw one fixed batch from a generator dataset — the counterpart of
    the reference's first-run fixture creation (eval.py:292-296), which
    freezes one shuffled 64-row batch as the regression anchor."""
    batch = dataset.sample_batch(batch_size)
    return {
        "rot_matrix": np.asarray(batch["rot_matrix"], np.float64),
        "transl": np.asarray(batch["transl"], np.float64),
        "joint_conf": np.asarray(batch["joint_conf"], np.float64),
        "bps_object": np.asarray(batch["bps_object"], np.float32),
        "pcd_path": list(batch["pcd_path"]),
        "obj_name": list(batch["obj_name"]),
    }


def save_eval_batch(batch: Dict, path: str) -> str:
    """Persist a fixture as npz (the torch-free equivalent of
    save_batch_to_file, eval.py:22-31)."""
    np.savez(path, rot_matrix=batch["rot_matrix"], transl=batch["transl"],
             joint_conf=batch["joint_conf"], bps_object=batch["bps_object"],
             pcd_path=np.array(batch["pcd_path"]),
             obj_name=np.array(batch["obj_name"]))
    return path


def _from_npz(path: str) -> Dict:
    z = np.load(path, allow_pickle=False)
    out = {k: z[k] for k in
           ("rot_matrix", "transl", "joint_conf", "bps_object")}
    out["pcd_path"] = [str(p) for p in z["pcd_path"]]
    out["obj_name"] = [str(o) for o in z["obj_name"]]
    return out
