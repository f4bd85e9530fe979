"""Batched rotation math in pure JAX.

Semantics match the reference implementation where it matters for parity:

- ``rot_matrix_from_ortho6d`` follows the Gram-Schmidt construction of
  ``DexGanGrasp/utils/utils.py:380-394`` (Zhou et al. continuous 6D rotation),
  including the 1e-8 magnitude clamp in ``normalize_vector``
  (``utils.py:323-332``).  The reference hardcodes ``.cuda()`` inside
  ``normalize_vector`` (a known bug that breaks CPU inference); here the math
  is device-agnostic.
- ``geodesic_distance`` matches ``eval.py:48-60``.
- Quaternion/Euler conversions follow the ``transforms3d`` conventions used by
  the reference (quaternions wxyz; Euler static 'sxyz').

All functions are shape-polymorphic over a leading batch axis and safe to
``jit`` / ``vmap`` / ``grad``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_vector(v: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Normalize vectors along the last axis, clamping the norm at ``eps``.

    Mirrors reference ``utils.py:323-332`` (max(|v|, 1e-8), not |v|+eps).
    """
    mag = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v / jnp.maximum(mag, eps)


def rot_matrix_from_ortho6d(ortho6d: jax.Array) -> jax.Array:
    """Map a (..., 6) continuous rotation representation to (..., 3, 3).

    Columns of the result are the Gram-Schmidt frame (x, y, z) per
    reference ``utils.py:380-394``: x = norm(a1); z = norm(x × a2); y = z × x.
    """
    x_raw = ortho6d[..., 0:3]
    y_raw = ortho6d[..., 3:6]
    x = normalize_vector(x_raw)
    z = normalize_vector(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    # stack as columns: matrix[..., :, 0] = x etc.
    return jnp.stack([x, y, z], axis=-1)


def ortho6d_from_rot_matrix(rot: jax.Array) -> jax.Array:
    """Inverse embedding: first two *columns* of R flattened to (..., 6)."""
    return jnp.concatenate([rot[..., :, 0], rot[..., :, 1]], axis=-1)


def geodesic_distance(r1: jax.Array, r2: jax.Array) -> jax.Array:
    """Angular distance between rotation matrices, broadcasting over batch.

    ``arccos((tr(R1 R2^T) - 1) / 2)`` clipped to [-1, 1], as in the MAGD
    metric (reference ``eval.py:48-60``).
    """
    rrt = jnp.einsum("...ij,...kj->...ik", r1, r2)
    tr = jnp.trace(rrt, axis1=-2, axis2=-1)
    return jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))


def geodesic_distance_pairwise(r1s: jax.Array, r2s: jax.Array) -> jax.Array:
    """All-pairs angular distances: (N, 3, 3) × (M, 3, 3) → (N, M)."""
    rrt = jnp.einsum("aij,bkj->abik", r1s, r2s)
    tr = jnp.trace(rrt, axis1=-2, axis2=-1)
    return jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))


def quat_wxyz_to_mat(q: jax.Array) -> jax.Array:
    """Quaternion (w, x, y, z) → rotation matrix, transforms3d-compatible.

    Normalizes the quaternion; near-zero quaternions map to identity
    (same behavior as ``transforms3d.quaternions.quat2mat``).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = w * w + x * x + y * y + z * z
    safe = n > 1e-12  # FLOAT_EPS-ish guard
    s = jnp.where(safe, 2.0 / jnp.where(safe, n, 1.0), 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    m = jnp.stack(
        [
            1.0 - (yy + zz), xy - wz, xz + wy,
            xy + wz, 1.0 - (xx + zz), yz - wx,
            xz - wy, yz + wx, 1.0 - (xx + yy),
        ],
        axis=-1,
    ).reshape(q.shape[:-1] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=m.dtype), m.shape)
    return jnp.where(safe[..., None, None], m, eye)


def quat_xyzw_to_mat(q: jax.Array) -> jax.Array:
    """ROS-order quaternion (x, y, z, w) → rotation matrix.

    Replaces the reference's ``quat_xyzw2wxyz`` + ``quat2mat`` pair
    (``utils.py:50-57``, ``utils.py:247-263``).
    """
    return quat_wxyz_to_mat(jnp.concatenate(
        [q[..., 3:4], q[..., 0:3]], axis=-1))


def mat_to_quat_wxyz(m: jax.Array) -> jax.Array:
    """Rotation matrix → quaternion (w, x, y, z), branch-free batched form.

    Uses the standard four-candidate construction and picks the numerically
    best (largest pivot), valid for proper rotations.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    # candidate 0: trace pivot
    q0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    # candidate 1: x pivot
    q1 = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    # candidate 2: y pivot
    q2 = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    # candidate 3: z pivot
    q3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    del safe_sqrt  # candidates are proportional to q; plain normalize suffices
    pivots = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def euler_to_mat(r, p, y):
    """Static/extrinsic XYZ Euler → matrix: R = Rz(y) @ Ry(p) @ Rx(r).

    Matches ``transforms3d.euler.euler2mat`` default 'sxyz' used by the
    reference for hard-negative generation (``utils.py:238``).
    """
    r, p, y = jnp.asarray(r), jnp.asarray(p), jnp.asarray(y)
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def mat_to_euler(m: jax.Array):
    """Matrix → static XYZ Euler (r, p, y); inverse of ``euler_to_mat``.

    Matches ``transforms3d.euler.mat2euler`` 'sxyz' on non-degenerate inputs;
    at gimbal lock (|cos p| < 4*eps) sets r from the alternate closed form
    and y = 0, like transforms3d.
    """
    cy_cp = m[..., 0, 0]
    sy_cp = m[..., 1, 0]
    sp = -m[..., 2, 0]
    cp = jnp.sqrt(m[..., 2, 1] ** 2 + m[..., 2, 2] ** 2)
    degenerate = cp < 4.0 * jnp.finfo(m.dtype).eps
    r = jnp.where(
        degenerate,
        jnp.arctan2(m[..., 1, 2], m[..., 1, 1]),
        jnp.arctan2(m[..., 2, 1], m[..., 2, 2]),
    )
    p = jnp.arctan2(sp, cp)
    y = jnp.where(degenerate, 0.0, jnp.arctan2(sy_cp, cy_cp))
    return r, p, y


def project_to_so3(m: jax.Array) -> jax.Array:
    """Nearest rotation matrix (Frobenius) via SVD: U diag(1,1,det) Vᵀ.

    Gradient-based grasp refinement ascends the evaluator w.r.t. the raw
    9 rotation entries (reference dexgangrasp.py:516-541 does the same),
    which leaves SO(3); downstream geometric consumers (oracle labeling,
    robot transforms) need a proper rotation back."""
    u, _, vt = jnp.linalg.svd(m)
    det = jnp.linalg.det(u @ vt)
    d = jnp.concatenate([jnp.ones_like(m[..., :2, 0]), det[..., None]],
                        axis=-1)
    return (u * d[..., None, :]) @ vt
