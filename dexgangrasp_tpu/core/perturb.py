"""Hard-negative grasp perturbation.

Vectorized equivalent of reference ``utils.py:217-244``: perturb a positive
grasp by ±3 cm along each axis and ±0.6 rad around each Euler axis with a
random sign per component, producing a grasp far enough from the positive to
count as a negative label for evaluator training
(``dexevaluator_data_set.py`` hard-negative path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

from dexgangrasp_tpu.core.rotations import euler_to_mat, mat_to_euler
from dexgangrasp_tpu.core.transforms import hom_from_transl_rot

# disturb by 3 cm and by 0.6 rad per axis (reference utils.py:226).
# Kept as a numpy constant: a module-level jnp.array would initialize the
# jax backend at IMPORT time — which blocks the whole package import when
# the axon relay is unreachable (and pins the platform before callers can
# force CPU).  jnp ops convert it at trace time.
_DIST_VEC = np.array([0.03, 0.03, 0.03, 0.6, 0.6, 0.6], np.float32)


def hard_negative_from_positive(key: jax.Array, transl: jax.Array,
                                rot: jax.Array):
    """Perturb (.., 3) transl + (.., 3, 3) rot into hard negatives.

    Returns (transl_neg, rot_neg).  Each of the 6 pose components moves by
    exactly ±the reference's dist_vec with independent random signs.
    """
    batch = transl.shape[:-1]
    r, p, y = mat_to_euler(rot)
    pos_ori = jnp.concatenate(
        [transl, r[..., None], p[..., None], y[..., None]], axis=-1)
    u = jax.random.uniform(key, batch + (6,))
    sign = jnp.where(u < 0.5, -1.0, 1.0)
    pos_ori_d = pos_ori + sign * _DIST_VEC
    rot_neg = euler_to_mat(pos_ori_d[..., 3], pos_ori_d[..., 4], pos_ori_d[..., 5])
    return pos_ori_d[..., :3], rot_neg


def hard_negative_hom(key: jax.Array, palm_pos_hom: jax.Array) -> jax.Array:
    """4×4-transform variant matching the reference signature."""
    t, R = hard_negative_from_positive(
        key, palm_pos_hom[..., :3, 3], palm_pos_hom[..., :3, :3])
    return hom_from_transl_rot(t, R)
