"""Grasp HDF5 access.

Schema (reference ``grasp_data_all.h5``, see ``grasp_data_handler.py:19-115``):
``hdf[obj][outcome][grasp_id]`` with datasets
``desired_preshape_palm_mesh_frame`` (7: xyz + quat xyzw),
``true_preshape_joint_state`` / ``desired_preshape_joint_state`` (J).

Two access layers:

- ``GraspDataHandler`` — API-compatible random access (opens the file per
  call like the reference; kept for drop-in parity).
- ``InMemoryGraspStore`` — loads everything once into contiguous numpy
  arrays per (object, outcome).  The reference re-opens the h5 for *every
  sample* (``grasp_data_handler.py:74``, the acknowledged train-loop
  bottleneck, ``train.py:194``); the store makes batch assembly a pure
  vectorized gather so the TPU never starves.

Outcome-to-joint-field mapping: the reference's
``get_single_grasp_of_outcome`` has an always-true ``or`` bug
(``grasp_data_handler.py:82``) so it *always* reads the desired preshape;
its ``get_grasps_for_object`` reads true preshape except for collisions.
We implement the documented intent (desired for collision — unexecuted
grasps have no true state — true otherwise) and expose
``joint_field='desired'`` for bug-compatible behavior.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import h5py
import numpy as np

OUTCOMES = ("positive", "negative", "collision")


def _joint_field(outcome: str, compat_always_desired: bool = False) -> str:
    if compat_always_desired or outcome == "collision":
        return "desired_preshape_joint_state"
    return "true_preshape_joint_state"


class GraspDataHandler:
    """Random access into the grasp h5 (reference-compatible API)."""

    def __init__(self, file_path: str):
        assert os.path.exists(file_path), file_path
        self.file_path = file_path

    def get_grasps_for_object(self, obj_name: str, outcome: str = "positive"):
        def for_outcome(oc):
            palm_poses, joint_confs = [], []
            with h5py.File(self.file_path, "r") as hdf:
                gp = hdf[obj_name][oc]
                keys = list(gp.keys())
                jf = _joint_field(oc)
                for k in keys:
                    palm_poses.append(gp[k]["desired_preshape_palm_mesh_frame"][()])
                    joint_confs.append(gp[k][jf][()])
            return palm_poses, joint_confs, len(keys)

        if outcome == "all":
            palms, joints, n = [], [], 0
            for oc in ("collision", "negative", "positive"):
                p, j, m = for_outcome(oc)
                palms += p
                joints += j
                n += m
            return palms, joints, n
        if outcome in OUTCOMES:
            return for_outcome(outcome)
        raise ValueError("Choose outcome in [positive, negative, collision, all]")

    def get_num_success_per_object(self) -> Dict[str, int]:
        out = {}
        with h5py.File(self.file_path, "r") as hdf:
            for obj in hdf.keys():
                out[obj] = len(hdf[obj]["positive"].keys())
        return out

    def get_single_successful_grasp(self, obj_name, random=True, idx=None):
        return self.get_single_grasp_of_outcome(obj_name, "positive",
                                                random=random, idx=idx)

    def get_single_grasp_of_outcome(self, obj_name, outcome, random=True,
                                    idx=None, rng: Optional[np.random.Generator] = None):
        with h5py.File(self.file_path, "r") as hdf:
            gp = hdf[obj_name][outcome]
            ids = list(gp.keys())
            if random:
                idx = (rng or np.random.default_rng()).integers(0, len(ids))
            palm = gp[ids[idx]]["desired_preshape_palm_mesh_frame"][()]
            joints = gp[ids[idx]][_joint_field(outcome)][()]
        return palm, joints, None


class InMemoryGraspStore:
    """All grasps resident as numpy arrays: palm_poses[obj][outcome] (G, 7),
    joint_confs[obj][outcome] (G, J)."""

    def __init__(self, file_path: str):
        self.file_path = file_path
        self.palm_poses: Dict[str, Dict[str, np.ndarray]] = {}
        self.joint_confs: Dict[str, Dict[str, np.ndarray]] = {}
        with h5py.File(file_path, "r") as hdf:
            for obj in hdf.keys():
                self.palm_poses[obj] = {}
                self.joint_confs[obj] = {}
                for oc in hdf[obj].keys():
                    gp = hdf[obj][oc]
                    keys = sorted(gp.keys())
                    if not keys:
                        self.palm_poses[obj][oc] = np.zeros((0, 7), np.float64)
                        self.joint_confs[obj][oc] = np.zeros((0, 0), np.float64)
                        continue
                    jf = _joint_field(oc)
                    palms = np.stack([gp[k]["desired_preshape_palm_mesh_frame"][()]
                                      for k in keys])
                    joints = np.stack([gp[k][jf][()] for k in keys])
                    self.palm_poses[obj][oc] = np.asarray(palms, np.float64)
                    self.joint_confs[obj][oc] = np.asarray(joints, np.float64)

    def objects(self) -> List[str]:
        return sorted(self.palm_poses.keys())

    def counts(self, outcome: str = "positive") -> Dict[str, int]:
        return {obj: self.palm_poses[obj].get(outcome, np.zeros((0,))).shape[0]
                for obj in self.palm_poses}

    def get(self, obj: str, outcome: str) -> Tuple[np.ndarray, np.ndarray]:
        return self.palm_poses[obj][outcome], self.joint_confs[obj][outcome]


def write_grasp_h5(path: str, grasps: Dict[str, Dict[str, Tuple[np.ndarray, np.ndarray]]]) -> None:
    """Write a grasp h5 in the reference schema.

    grasps[obj][outcome] = (palm_poses (G,7 xyz+quat_xyzw), joint_confs (G,J)).
    Both joint fields are written (desired == true for synthetic data).
    """
    with h5py.File(path, "w") as hdf:
        for obj, ocs in grasps.items():
            obj_gp = hdf.create_group(obj)
            for oc, (palms, joints) in ocs.items():
                gp = obj_gp.create_group(oc)
                for i in range(palms.shape[0]):
                    g = gp.create_group(f"grasp_{i:05d}")
                    g.create_dataset("desired_preshape_palm_mesh_frame",
                                     data=palms[i])
                    g.create_dataset("true_preshape_joint_state",
                                     data=joints[i])
                    g.create_dataset("desired_preshape_joint_state",
                                     data=joints[i])
