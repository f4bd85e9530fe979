"""Geometric grasp-outcome oracle — contact/collision-based labels.

The reference's training labels come from physics simulation of a real
gripper (its ``grasp_data_all.h5`` stores simulated positive/negative
outcomes; see reference ``DexGanGrasp/data/dexevaluator_data_set.py:52-118``).
That simulator is not redistributable, so the synthetic dataset uses this
deterministic geometric proxy instead: a grasp *succeeds* iff

1. **contact**  — enough object surface lies inside the finger sweep
   volume (a cylinder of radius ``grip_radius`` along the palm x-axis,
   depth ``close_min..close_max`` in front of the palm), and
2. **no collision** — no surface point intersects the palm body (a disc
   of radius ``palm_radius`` spanning ``-palm_back..palm_front`` along x).

Both conditions are functions of the *object geometry relative to the palm
pose*, so a success classifier must jointly use the BPS encoding and the
pose — there is no label shortcut through the pose alone (objects of
different extents flip the label at the same pose).  This is what makes
evaluator training on the synthetic set meaningful (VERDICT round-1 §1).

The palm frame convention matches the reference: x-axis = approach
direction (the ``z_offset`` back-off translates along palm x, reference
``networks.py:254``, ``utils.py:19-33``).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np


@dataclasses.dataclass(frozen=True)
class GripperParams:
    """Finger-sweep / palm-body proxy dimensions (meters).

    Loosely sized to the Robotiq 3F of the reference rig: ~5.5 cm palm
    disc, fingers closing 1.5-8.5 cm in front of the palm over a ~4.5 cm
    radius aperture."""

    close_min: float = 0.015
    close_max: float = 0.085
    grip_radius: float = 0.045
    palm_back: float = 0.060
    palm_front: float = 0.010
    palm_radius: float = 0.055
    min_contact_points: int = 12


DEFAULT_GRIPPER = GripperParams()


def grasp_outcomes(cloud: np.ndarray, transl: np.ndarray, rot: np.ndarray,
                   params: GripperParams = DEFAULT_GRIPPER,
                   chunk: int = 256) -> Dict[str, np.ndarray]:
    """Label G grasps against one object cloud.

    cloud: (N, 3) full object surface, centroid frame.
    transl: (G, 3) palm positions; rot: (G, 3, 3) palm orientations
    (columns = palm axes; x = approach).

    Returns dict of (G,)-arrays: ``success`` (bool), ``collision`` (bool),
    ``contact_count`` (int), ``depth`` (float; mean x of sweep contacts,
    NaN when no contact).
    """
    cloud = np.asarray(cloud, np.float64)
    transl = np.atleast_2d(np.asarray(transl, np.float64))
    rot = np.asarray(rot, np.float64).reshape(-1, 3, 3)
    G = transl.shape[0]
    success = np.zeros(G, bool)
    collision = np.zeros(G, bool)
    contact_count = np.zeros(G, np.int64)
    depth = np.full(G, np.nan)

    for s in range(0, G, chunk):
        e = min(s + chunk, G)
        # palm-frame coords: q = Rᵀ (p - t) for every (grasp, point)
        rel = cloud[None, :, :] - transl[s:e, None, :]       # (g, N, 3)
        q = np.einsum("gni,gij->gnj", rel, rot[s:e])          # (g, N, 3)
        x = q[..., 0]
        r = np.hypot(q[..., 1], q[..., 2])

        sweep = ((x >= params.close_min) & (x <= params.close_max)
                 & (r < params.grip_radius))
        palm_hit = ((x >= -params.palm_back) & (x <= params.palm_front)
                    & (r < params.palm_radius))

        cc = sweep.sum(axis=1)
        col = palm_hit.any(axis=1)
        contact_count[s:e] = cc
        collision[s:e] = col
        success[s:e] = (cc >= params.min_contact_points) & ~col
        xsum = np.where(sweep, x, 0.0).sum(axis=1)
        depth[s:e] = np.where(cc > 0, xsum / np.maximum(cc, 1), np.nan)

    return {"success": success, "collision": collision,
            "contact_count": contact_count, "depth": depth}


def joints_from_depth(rng: np.random.Generator, depth: np.ndarray,
                      n_joints: int = 12) -> np.ndarray:
    """Finger preshape as a smooth function of contact depth (the generator
    must learn joint_conf; the evaluator ignores it — reference
    ``networks.py:307-325``).  NaN depth (no contact) falls back to a
    uniform draw over the closing range."""
    depth = np.asarray(depth, np.float64)
    d = np.where(np.isnan(depth),
                 rng.uniform(0.0, 0.09, depth.shape), depth)
    base = np.clip(0.2 + 8.0 * d[:, None], 0.0, 1.2)
    return np.clip(base + rng.normal(size=(depth.shape[0], n_joints)) * 0.05,
                   0.0, 1.2)
