"""Raw-point-cloud evaluator dataset (PointNet-style model input).

Counterpart of ``DexEvaluatorPCDDataSet`` (``dexevaluator_data_set.py:
177-316``): same positive/negative/hard-negative index construction, but
samples return a normalized 1024-point cloud (``*_dspcd*`` downsampled pcd
files) instead of the BPS encoding.  Normalization = center at the
centroid, scale by the furthest-point distance (``:242-247``).

The reference only *configures* a PointNet evaluator and never ships one;
here models/pointnet.py provides a working TPU-friendly PointNet evaluator
consuming these batches.
"""
from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from dexgangrasp_tpu.data.datasets import (
    DexEvaluatorDataSet,
    _hom_from_pos_quat,
    hard_negative_np,
)
from dexgangrasp_tpu.utils.pcd import load_pcd

N_POINTS = 1024


def normalize_pc(points: np.ndarray) -> np.ndarray:
    """Center + unit-sphere scale (reference :242-247)."""
    points = points - points.mean(0)
    furthest = np.max(np.sqrt((points ** 2).sum(-1)))
    return points / max(furthest, 1e-12)


class DexEvaluatorPCDDataSet(DexEvaluatorDataSet):
    """Index over ``pcd/<obj>/*_dspcd*.pcd`` files; n_success forced to 1
    per file (reference :204)."""

    def __init__(self, data_dir: str, split: str = "train", **kw):
        super().__init__(data_dir, split, **kw)
        self.objs_folder = os.path.join(self.ds_path, "pcd")
        self.pcd_paths: List[str] = []
        self.labels = []
        for obj in self.num_success_per_object:
            obj_path = os.path.join(self.objs_folder, obj)
            if not os.path.isdir(obj_path):
                continue
            n_success = 1  # reference :204
            n_total = n_success / self.POS_RATIO
            for f_name in sorted(os.listdir(obj_path)):
                if "_dspcd" not in f_name:
                    continue
                f_path = os.path.join(obj_path, f_name)
                self.pcd_paths += n_success * [f_path]
                self.labels += n_success * ["positive"]
                n_neg = int(self.NEG_RATIO * n_total)
                self.pcd_paths += n_neg * [f_path]
                self.labels += n_neg * ["negative"]
                n_hneg = int(self.HARD_NEG_RATIO * n_total)
                self.pcd_paths += n_hneg * [f_path]
                self.labels += n_hneg * ["hard_negative"]
        self._cloud_cache: Dict[str, np.ndarray] = {}

    def __len__(self) -> int:
        return len(self.pcd_paths)

    def _cloud(self, path: str) -> np.ndarray:
        if path not in self._cloud_cache:
            arr = load_pcd(path)
            assert arr.shape == (N_POINTS, 3), arr.shape
            self._cloud_cache[path] = normalize_pc(arr.astype(np.float64))
        return self._cloud_cache[path]

    def _centr_T_mesh_pcd(self, pcd_path: str) -> np.ndarray:
        """dspcd name → pcd transform key (reference :223-241)."""
        return self._centr_T_mesh(
            pcd_path.replace("_dspcd", "_bps").replace(".pcd", ".npy"))

    def _assemble(self, idxs: np.ndarray) -> Dict:
        n = len(idxs)
        clouds = np.empty((n, N_POINTS, 3))
        rot = np.empty((n, 3, 3))
        transl = np.empty((n, 3))
        joints_list = []
        label_arr = np.empty((n,), np.float32)
        for i, idx in enumerate(idxs):
            path = self.pcd_paths[idx]
            label = self.labels[idx]
            obj = "_".join(os.path.split(path)[1].split("_dspcd")[:-1])
            clouds[i] = self._cloud(path)
            T = self._centr_T_mesh_pcd(path)
            outcome = "positive" if label == "hard_negative" else label
            palms, jconfs = self.store.get(obj, outcome)
            g = self.rng.integers(0, palms.shape[0])
            pose = T @ _hom_from_pos_quat(palms[g])
            if label == "hard_negative":
                pose = hard_negative_np(self.rng, pose)
            rot[i] = pose[:3, :3]
            transl[i] = pose[:3, 3]
            joints_list.append(self._reduce(jconfs[g]))
            label_arr[i] = 1.0 if label == "positive" else 0.0
        return {"rot_matrix": rot, "transl": transl,
                "joint_conf": np.stack(joints_list), "pcd_array": clouds,
                "label": label_arr}

    def __getitem__(self, idx: int) -> Dict:
        b = self._assemble(np.array([idx]))
        return {k: v[0] for k, v in b.items()}
