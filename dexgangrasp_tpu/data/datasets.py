"""Dataset layer — same on-disk contract as the reference, vectorized.

Directory contract (reference ``config_dexgangrasp.yaml`` + datasets):

    data_dir/
      metadata.csv                  # rows: object; cols incl. 'positive',
                                    # 'train'/'eval' marked with 'X'
      grasp_data_all.h5             # schema in grasp_store.py
      pcd_transforms.h5             # hdf[obj]['<pcd_name>_mesh_to_centroid'] (7,)
      {train,eval}/
        bps/<obj>/<obj>_bps###[_multi].npy
        pcd/<obj>/<obj>_pcd###[_multi].pcd

Index construction replicates the reference exactly:

- generator (``dexgenerator_data_set.py:68-96``): each bps file of an object
  appears once per positive grasp (skipping ``*_single`` / ``*_obstacle``
  files); a sample = (that bps, one random positive grasp transformed
  mesh→centroid).
- evaluator (``dexevaluator_data_set.py:52-88``): per object with S
  positives and N = S/0.3, each bps appears S× positive, 0.3·N× negative,
  0.4·N× hard-negative (a positive perturbed ±3 cm / ±0.6 rad,
  ``utils.py:217-244``).

Unlike the reference (per-sample h5 reopen + python transform loop —
``train.py:194`` TODO), everything is preloaded by ``InMemoryGraspStore``
and batches are assembled with batched matmuls, so a single host thread
keeps a TPU fed.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import h5py
import numpy as np
from scipy.spatial.transform import Rotation as _Rot

from dexgangrasp_tpu.data.grasp_store import InMemoryGraspStore

_HARD_NEG_DIST = np.array([0.03, 0.03, 0.03, 0.6, 0.6, 0.6])


def _hom_from_pos_quat(pos_quat: np.ndarray) -> np.ndarray:
    """(.., 7) xyz + quat(xyzw) → (.., 4, 4), vectorized."""
    pos_quat = np.asarray(pos_quat, np.float64)
    batch = pos_quat.shape[:-1]
    T = np.zeros(batch + (4, 4))
    T[..., :3, :3] = _Rot.from_quat(pos_quat[..., 3:7].reshape(-1, 4)
                                    ).as_matrix().reshape(batch + (3, 3))
    T[..., :3, 3] = pos_quat[..., :3]
    T[..., 3, 3] = 1.0
    return T


def hard_negative_np(rng: np.random.Generator, T: np.ndarray) -> np.ndarray:
    """Vectorized numpy port of reference utils.py:217-244."""
    batch = T.shape[:-2]
    eul = _Rot.from_matrix(T[..., :3, :3].reshape(-1, 3, 3)).as_euler("xyz")
    pos_ori = np.concatenate([T[..., :3, 3].reshape(-1, 3), eul], axis=-1)
    sign = np.where(rng.random(pos_ori.shape) < 0.5, -1.0, 1.0)
    pos_ori = pos_ori + sign * _HARD_NEG_DIST
    out = np.zeros((pos_ori.shape[0], 4, 4))
    out[:, :3, :3] = _Rot.from_euler("xyz", pos_ori[:, 3:]).as_matrix()
    out[:, :3, 3] = pos_ori[:, :3]
    out[:, 3, 3] = 1.0
    return out.reshape(batch + (4, 4))


def read_metadata(data_dir: str, split: str) -> Dict[str, int]:
    """metadata.csv → {obj: n_positive} for objects marked 'X' in ``split``."""
    import pandas as pd

    df = pd.read_csv(os.path.join(data_dir, "metadata.csv"))
    sel = df[df[split] == "X"]
    return dict(zip(sel.iloc[:, 0], sel["positive"].astype("int64")))


class _BaseDataSet:
    def __init__(self, data_dir: str, split: str = "train",
                 grasp_file: str = "grasp_data_all.h5",
                 group_joints: bool = False,
                 seed: int = 0):
        self.data_dir = data_dir
        self.split = split
        self.ds_path = os.path.join(data_dir, split)
        self.objs_folder = os.path.join(self.ds_path, "bps")
        self.group_joints = group_joints
        self.rng = np.random.default_rng(seed)
        self.store = InMemoryGraspStore(os.path.join(data_dir, grasp_file))
        self.num_success_per_object = read_metadata(data_dir, split)
        # preload all transforms + bps encodings
        self._transforms: Dict[str, np.ndarray] = {}  # bps_path -> (4,4)
        self._bps: Dict[str, np.ndarray] = {}  # bps_path -> (4096,)
        self._tf_h5 = os.path.join(data_dir, "pcd_transforms.h5")

    # ---------------------------------------------------------- preloading

    def _load_bps(self, bps_path: str) -> np.ndarray:
        if bps_path not in self._bps:
            self._bps[bps_path] = np.load(bps_path).ravel().astype(np.float32)
        return self._bps[bps_path]

    def _centr_T_mesh(self, bps_path: str) -> np.ndarray:
        """Reference read_pcd_transform (dexgenerator_data_set.py:98-122)."""
        if bps_path in self._transforms:
            return self._transforms[bps_path]
        base_path, bps_name = os.path.split(bps_path)
        pcd_name = bps_name.replace("bps", "pcd").replace(".npy", "")
        obj = os.path.split(base_path)[1]
        for suffix in ("_multi", "_obstacle", "_single"):
            if suffix in pcd_name:
                pcd_name = pcd_name[:pcd_name.find(suffix)]
        with h5py.File(self._tf_h5, "r") as hdf:
            pos_quat = hdf[obj][pcd_name + "_mesh_to_centroid"][()]
        T = _hom_from_pos_quat(pos_quat)
        self._transforms[bps_path] = T
        return T

    @staticmethod
    def obj_name_from_bps(bps_path: str) -> str:
        bps_name = os.path.split(bps_path)[1]
        return "_".join(bps_name.split("_bps")[:-1])

    def debug_show_sample(self, bps_path: str, transl, rot, joint_conf=None,
                          save_path: Optional[str] = None):
        """Render one assembled sample's grasp against its view cloud —
        the counterpart of the reference's is_debug visual checks
        (dexgenerator_data_set.py:166-173) for frame-convention sanity."""
        from dexgangrasp_tpu.utils import visualization as viz

        pcd_path = bps_path.replace("bps", "pcd").replace(".npy", ".pcd")
        return viz.show_grasp_and_object(pcd_path, np.asarray(transl),
                                         np.asarray(rot),
                                         joint_conf=joint_conf,
                                         save_path=save_path)

    def _reduce(self, joints: np.ndarray) -> np.ndarray:
        if not self.group_joints:
            return joints
        from dexgangrasp_tpu.core.joints import _FULL_IDX_A, _FULL_IDX_B

        return np.maximum(joints[..., _FULL_IDX_A], joints[..., _FULL_IDX_B])


class DexGeneratorDataSet(_BaseDataSet):
    """Positive-grasps-only dataset for GAN training."""

    def __init__(self, data_dir: str, split: str = "train", **kw):
        super().__init__(data_dir, split, **kw)
        self.bps_paths: List[str] = []
        self.grasp_idxs: List[int] = []
        for obj, n_success in self.num_success_per_object.items():
            obj_path = os.path.join(self.objs_folder, obj)
            if not os.path.isdir(obj_path):
                continue
            for f_name in sorted(os.listdir(obj_path)):
                stem = f_name.split(".")[0]
                if stem.split("_")[-1] in ("single", "obstacle"):
                    continue
                if "bps" in f_name:
                    f_path = os.path.join(obj_path, f_name)
                    self.bps_paths += n_success * [f_path]
                    self.grasp_idxs += list(range(n_success))

    def __len__(self) -> int:
        return len(self.bps_paths)

    def __getitem__(self, idx: int) -> Dict:
        """Reference-parity single-sample path (random positive grasp)."""
        return self._assemble(np.array([idx]))._first()

    # ----------------------------------------------------------- batching

    class _Batch(dict):
        def _first(self):
            return {k: (v[0] if isinstance(v, np.ndarray) else v[0])
                    for k, v in self.items()}

    def _assemble(self, idxs: np.ndarray) -> "_Batch":
        n = len(idxs)
        bps = np.empty((n, 4096), np.float32)
        rot = np.empty((n, 3, 3))
        transl = np.empty((n, 3))
        joints_list = []
        pcd_paths, obj_names = [], []
        for i, idx in enumerate(idxs):
            bps_path = self.bps_paths[idx]
            obj = self.obj_name_from_bps(bps_path)
            T = self._centr_T_mesh(bps_path)
            # reference loads the *_single bps variant for training
            load_path = bps_path.replace("multi", "single")
            if not os.path.isfile(load_path):
                load_path = bps_path
            bps[i] = self._load_bps(load_path)
            palms, jconfs = self.store.get(obj, "positive")
            g = self.rng.integers(0, palms.shape[0])
            pose = T @ _hom_from_pos_quat(palms[g])
            rot[i] = pose[:3, :3]
            transl[i] = pose[:3, 3]
            joints_list.append(self._reduce(jconfs[g]))
            pcd_paths.append(bps_path.replace("bps", "pcd").replace("npy", "pcd"))
            obj_names.append(obj)
        return self._Batch(
            rot_matrix=rot, transl=transl,
            joint_conf=np.stack(joints_list), bps_object=bps,
            pcd_path=pcd_paths, obj_name=obj_names)

    def sample_batch(self, batch_size: int) -> Dict:
        idxs = self.rng.integers(0, len(self), batch_size)
        return self._assemble(idxs)

    def epoch_batches(self, batch_size: int, drop_last: bool = True,
                      shuffle: bool = True):
        order = np.arange(len(self))
        if shuffle:
            self.rng.shuffle(order)
        stop = (len(order) // batch_size * batch_size
                if drop_last else len(order))
        for i in range(0, stop, batch_size):
            yield self._assemble(order[i:i + batch_size])

    # --------------------------------------------------- MAGD ground truth

    def get_grasps_from_pcd_path(self, pcd_path: str,
                                 label: str = "positive") -> Dict:
        """All grasps of one outcome for the object of a pcd file,
        transformed into the view's centroid frame
        (reference dexgenerator_data_set.py:46-66)."""
        base_path, pcd_name = os.path.split(pcd_path)
        base_path = base_path.replace("pcd", "bps")
        bps_name = pcd_name.replace("pcd", "bps").replace(".bps", ".npy")
        if not bps_name.endswith(".npy"):
            bps_name = bps_name.rsplit(".", 1)[0] + ".npy"
        bps_path = os.path.join(base_path, bps_name)
        obj = self.obj_name_from_bps(bps_path)
        T = self._centr_T_mesh(bps_path)
        palms, jconfs = self.store.get(obj, label)
        poses = np.einsum("ij,gjk->gik", T, _hom_from_pos_quat(palms))
        return {"rot_matrix": poses[:, :3, :3], "transl": poses[:, :3, 3],
                "joint_conf": self._reduce(jconfs)}


class DexEvaluatorDataSet(_BaseDataSet):
    """Mixed-label dataset: 0.3 pos / 0.3 neg / 0.4 hard-neg of S/0.3."""

    POS_RATIO, NEG_RATIO, HARD_NEG_RATIO = 0.3, 0.3, 0.4

    def __init__(self, data_dir: str, split: str = "train", **kw):
        super().__init__(data_dir, split, **kw)
        self.bps_paths: List[str] = []
        self.labels: List[str] = []
        for obj, n_success in self.num_success_per_object.items():
            obj_path = os.path.join(self.objs_folder, obj)
            if not os.path.isdir(obj_path):
                continue
            # reference uses floor division by the float ratio
            # (dexevaluator_data_set.py:72: n_success // self.pos_ratio)
            n_total = n_success // self.POS_RATIO
            for f_name in sorted(os.listdir(obj_path)):
                if "bps" not in f_name:
                    continue
                f_path = os.path.join(obj_path, f_name)
                self.bps_paths += n_success * [f_path]
                self.labels += n_success * ["positive"]
                n_neg = int(self.NEG_RATIO * n_total)
                self.bps_paths += n_neg * [f_path]
                self.labels += n_neg * ["negative"]
                n_hneg = int(self.HARD_NEG_RATIO * n_total)
                self.bps_paths += n_hneg * [f_path]
                self.labels += n_hneg * ["hard_negative"]
        assert len(self.bps_paths) == len(self.labels)

    def __len__(self) -> int:
        return len(self.bps_paths)

    def _assemble(self, idxs: np.ndarray) -> Dict:
        n = len(idxs)
        bps = np.empty((n, 4096), np.float32)
        rot = np.empty((n, 3, 3))
        transl = np.empty((n, 3))
        joints_list = []
        label_arr = np.empty((n,), np.float32)
        for i, idx in enumerate(idxs):
            bps_path = self.bps_paths[idx]
            label = self.labels[idx]
            obj = self.obj_name_from_bps(bps_path)
            T = self._centr_T_mesh(bps_path)
            bps[i] = self._load_bps(bps_path)
            # hard negatives: prefer a stored (oracle-relabeled)
            # ``hard_negative`` group when the h5 provides one — the
            # on-the-fly reference perturbation (utils.py:217-244) labels
            # every perturbed pose negative sight-unseen, which is wrong
            # for a measurable fraction and caps the tn rate (see
            # data/synthetic.py); fall back to it otherwise.
            outcome, perturb = label, False
            if label == "hard_negative":
                if self.store.palm_poses[obj].get(
                        "hard_negative", np.zeros((0,))).shape[0] == 0:
                    outcome, perturb = "positive", True
            palms, jconfs = self.store.get(obj, outcome)
            g = self.rng.integers(0, palms.shape[0])
            pose = T @ _hom_from_pos_quat(palms[g])
            if perturb:
                pose = hard_negative_np(self.rng, pose)
            rot[i] = pose[:3, :3]
            transl[i] = pose[:3, 3]
            joints_list.append(self._reduce(jconfs[g]))
            label_arr[i] = 1.0 if label == "positive" else 0.0
        return {"rot_matrix": rot, "transl": transl,
                "joint_conf": np.stack(joints_list), "bps_object": bps,
                "label": label_arr}

    def __getitem__(self, idx: int) -> Dict:
        b = self._assemble(np.array([idx]))
        return {k: v[0] for k, v in b.items()}

    def sample_batch(self, batch_size: int) -> Dict:
        return self._assemble(self.rng.integers(0, len(self), batch_size))

    def epoch_batches(self, batch_size: int, drop_last: bool = True,
                      shuffle: bool = True):
        order = np.arange(len(self))
        if shuffle:
            self.rng.shuffle(order)
        stop = (len(order) // batch_size * batch_size
                if drop_last else len(order))
        for i in range(0, stop, batch_size):
            yield self._assemble(order[i:i + batch_size])
