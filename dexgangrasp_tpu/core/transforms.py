"""Homogeneous-transform helpers (batched, pure JAX).

Replaces the reference's numpy/torch mix in ``DexGanGrasp/utils/utils.py``
(``hom_matrix_from_pos_quat_list``:247, ``hom_matrix_from_transl_rot_matrix``
:266, ``translate_along_axis``:19) with vectorized equivalents.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.core.rotations import quat_xyzw_to_mat


def hom_from_transl_rot(transl: jax.Array, rot: jax.Array) -> jax.Array:
    """(.., 3) translation + (.., 3, 3) rotation → (.., 4, 4) transform."""
    batch = jnp.broadcast_shapes(transl.shape[:-1], rot.shape[:-2])
    transl = jnp.broadcast_to(transl, batch + (3,))
    rot = jnp.broadcast_to(rot, batch + (3, 3))
    top = jnp.concatenate([rot, transl[..., :, None]], axis=-1)  # (.., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), batch + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def hom_from_pos_quat(pos_quat: jax.Array) -> jax.Array:
    """7-vector [x y z qx qy qz qw] (ROS xyzw order) → (.., 4, 4).

    Vectorized equivalent of reference ``utils.py:247-263``.
    """
    pos = pos_quat[..., :3]
    rot = quat_xyzw_to_mat(pos_quat[..., 3:7])
    return hom_from_transl_rot(pos, rot)


def transform_points(T: jax.Array, points: jax.Array) -> jax.Array:
    """Apply (.., 4, 4) transform to (.., N, 3) points."""
    return jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], points) + T[..., None, :3, 3]


def translate_along_axis(
    transl: jax.Array, rot: jax.Array, axis: int, offset
) -> jax.Array:
    """Back a pose off along one of its own (rotated) axes.

    new_transl = transl - offset * R[:, axis]; the vectorized equivalent of
    the per-pose python loop in reference ``utils.py:19-48`` (used with
    axis=0, offset=z_offset≈0.025 m to retreat along the palm x-axis after
    grasp generation, ``networks.py:254-257``).
    """
    return transl - offset * rot[..., :, axis]
