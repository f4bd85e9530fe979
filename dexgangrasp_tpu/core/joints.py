"""Hand-joint configuration maps.

20↔15 DoF hithand reductions (reference ``utils.py:164-185`` and
``utils.py:356-377``) vectorized over a batch axis, plus the named joint maps
(reference ``DexGanGrasp/utils/definitions.py``) used by the URDF viewer and
robot I/O.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Reference definitions.py:1-39 — note the robotiq dict in the reference
# repeats `finger_*_joint_2` keys, so the *effective* dict has 9 unique keys;
# the real robotiq-3f articulated URDF has 11 joints of which 12 values are
# produced by the net (n_hand_joints=12).  We keep an explicit 12-name list.
HAND_CFG = {
    f"Right_{finger}_{i}": 0.2
    for finger in ("Index", "Little", "Middle", "Ring", "Thumb")
    for i in range(4)
}

ROBOTIQ_CFG = {
    "finger_1_joint_1": 0.2,
    "finger_1_joint_2": 0.2,
    "finger_1_joint_3": 0.2,
    "finger_2_joint_1": 0.2,
    "finger_2_joint_2": 0.2,
    "finger_2_joint_3": 0.2,
    "finger_middle_joint_1": 0.2,
    "finger_middle_joint_2": 0.2,
    "finger_middle_joint_3": 0.2,
    "palm_finger_1_joint": 0.2,
    "palm_finger_2_joint": 0.2,
    "palm_finger_middle_joint": 0.2,
}


def hand_cfg_map(cfg_arr) -> dict:
    """Array of joint values → {joint_name: value}, names sorted
    alphabetically (reference ``utils.py:188-196``)."""
    cfg_arr = np.asarray(cfg_arr)
    template = ROBOTIQ_CFG if cfg_arr.shape[-1] == 12 else HAND_CFG
    keys = sorted(template.keys())
    return {k: float(cfg_arr[i]) for i, k in enumerate(keys)}


# --- 20 <-> 15 DoF hithand maps ------------------------------------------
# In the 20-DoF layout every finger has 4 joints and joints 3&4 are coupled.
# Reduced index i (1-based) with i % 3 == 0 corresponds to the coupled pair.
_FULL_IDX_A = []  # index into full conf for each reduced slot (primary)
_FULL_IDX_B = []  # secondary index (only differs for coupled slots)
_idx = 0
for _i in range(15):
    if (_i + 1) % 3 == 0:
        _FULL_IDX_A.append(_idx)
        _FULL_IDX_B.append(_idx + 1)
        _idx += 2
    else:
        _FULL_IDX_A.append(_idx)
        _FULL_IDX_B.append(_idx)
        _idx += 1
_FULL_IDX_A = np.array(_FULL_IDX_A)
_FULL_IDX_B = np.array(_FULL_IDX_B)

# scatter map for expansion: full slot -> reduced slot
_RED_IDX_FOR_FULL = np.zeros(20, dtype=np.int64)
for _r, (_a, _b) in enumerate(zip(_FULL_IDX_A, _FULL_IDX_B)):
    _RED_IDX_FOR_FULL[_a] = _r
    _RED_IDX_FOR_FULL[_b] = _r


def reduce_joint_conf(jc_full: jax.Array) -> jax.Array:
    """(.., 20) → (.., 15), taking max of each coupled joint pair.

    Vectorized equivalent of reference ``utils.py:356-377``.
    """
    a = jc_full[..., _FULL_IDX_A]
    b = jc_full[..., _FULL_IDX_B]
    return jnp.maximum(a, b)


def full_joint_conf_from_partial(jc_red: jax.Array) -> jax.Array:
    """(.., 15) → (.., 20), repeating every third value into the coupled
    pair (reference ``utils.py:164-185``)."""
    return jc_red[..., _RED_IDX_FOR_FULL]
