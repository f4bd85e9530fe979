"""Basis Point Set (BPS) encoding — the point-cloud featurizer.

For each of B basis points, the encoding is the Euclidean distance to the
nearest point of the object cloud: ``enc[b] = min_n ||basis[b] - cloud[n]||``.
This replaces the reference's third-party CUDA ``bps_torch`` dependency
(``DexGanGrasp/data/bps_encoder.py:28-55``) with:

- ``bps_encode_xla``    — pure-XLA blocked min-reduction (runs anywhere),
- ``bps_encode_pallas`` — a Pallas TPU kernel that tiles basis × cloud through
  VMEM and computes squared distances via one MXU matmul per tile pair
  (``|a-b|² = |a|² + |b|² - 2a·b``), fusing the min-reduction,
- ``bps_encode``        — dispatcher (Pallas on TPU, XLA elsewhere).

The canonical basis is the reference's ``models/basis_point_set.npy``
(4096×3 float32, random-uniform in a 0.2 m ball); ``generate_basis``
reproduces that construction (``bps_encoder.py:23-26``) for new bases.

Padding contract: clouds are padded to a static size with points at
``PAD_VALUE`` (1e6), far outside the 0.2 m workspace, so padded entries never
win the min.  This keeps every shape static under jit.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BASIS_PATH = "/root/reference/models/basis_point_set.npy"
PAD_VALUE = 1.0e6

# Tile sizes: basis axis × cloud axis. 8 sublanes × 128 lanes min tile (f32);
# 512×1024 keeps both operands and the (512,1024) distance tile in VMEM
# (512*1024*4 B = 2 MB) while giving the MXU a decent K=... no — the matmul
# contraction dim is 3 (xyz), so the MXU work is skinny; the win is fusing
# the min-reduce so the N×B distance matrix never touches HBM.
_TILE_B = 512
_TILE_N = 1024


def load_basis(path: str = DEFAULT_BASIS_PATH) -> np.ndarray:
    basis = np.load(path).astype(np.float32)
    assert basis.shape[1] == 3
    return basis


def generate_basis(key: jax.Array, n_points: int = 4096,
                   radius: float = 0.2) -> jax.Array:
    """Random-uniform ball basis, same construction as bps_torch
    'random_uniform' (reference bps_encoder.py:23-26)."""
    k1, k2 = jax.random.split(key)
    d = jax.random.normal(k1, (n_points, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    r = radius * jax.random.uniform(k2, (n_points, 1)) ** (1.0 / 3.0)
    return (d * r).astype(jnp.float32)


def pad_cloud(points: np.ndarray, target: int) -> np.ndarray:
    """Pad/truncate an (N, 3) cloud to (target, 3) with PAD_VALUE points.

    Truncation uses a deterministic uniform-random subsample WITHOUT
    replacement, not an index-strided (linspace) pick: for organized
    (row-major) RealSense crops a fixed index stride aliases against the
    scan width and can lock onto whole columns/scanlines, leaving spatial
    gaps that inflate BPS distances (the reference encodes the full cloud,
    ``bps_encoder.py:28-55``; VERDICT r2 next-10).  The RNG is seeded from
    n so equal-sized frames subsample identically (reproducible serving)."""
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    if n >= target:
        if n > target:
            idx = np.sort(np.random.default_rng(n).choice(n, target,
                                                          replace=False))
            return points[idx]
        return points
    pad = np.full((target - n, 3), PAD_VALUE, np.float32)
    return np.concatenate([points, pad], axis=0)


# ---------------------------------------------------------------- XLA path


@functools.partial(jax.jit, static_argnames=("block",))
def bps_encode_xla(basis: jax.Array, points: jax.Array,
                   block: int = 2048) -> jax.Array:
    """(B, 3) basis × (N, 3) cloud → (B,) min distances.

    Blocked over the cloud axis with ``lax.scan`` so the full B×N distance
    matrix is never materialized (N can be ~100k for raw RealSense frames).
    """
    basis = basis.astype(jnp.float32)
    points = points.astype(jnp.float32)
    n = points.shape[0]
    nblocks = max(1, -(-n // block))
    padded = jnp.full((nblocks * block, 3), PAD_VALUE, jnp.float32)
    padded = jax.lax.dynamic_update_slice(padded, points, (0, 0))
    chunks = padded.reshape(nblocks, block, 3)
    b_sq = jnp.sum(basis * basis, axis=1)  # (B,)

    def body(carry, chunk):
        p_sq = jnp.sum(chunk * chunk, axis=1)  # (block,)
        # HIGHEST precision: the default TPU matmul runs bf16 passes, which
        # costs ~1e-2 absolute error on distances — the golden BPS parity
        # tests (and the 0.1 mm-scale grasp workspace) need full f32.
        cross = jnp.matmul(basis, chunk.T,
                           precision=jax.lax.Precision.HIGHEST)  # (B, block)
        d2 = b_sq[:, None] + p_sq[None, :] - 2.0 * cross
        return jnp.minimum(carry, jnp.min(d2, axis=1)), None

    init = jnp.full((basis.shape[0],), jnp.inf, jnp.float32)
    min_d2, _ = jax.lax.scan(body, init, chunks)
    return jnp.sqrt(jnp.maximum(min_d2, 0.0))


# ------------------------------------------------------------- Pallas path


def _bps_kernel(basis_ref, points_ref, out_ref):
    """Grid (B/TILE_B, N/TILE_N): one (TILE_B, TILE_N) distance tile via
    direct broadcast-subtract — d² = Σ_c (b_c − p_c)² computed exactly in
    f32 on the VPU.

    This replaced an earlier |a|²+|b|²−2a·b MXU formulation: with K=3 the
    matmul is all overhead (and needs HIGHEST precision against
    catastrophic cancellation); the subtract form measured 25% faster AND
    8e-8-exact (tools history in docs/RESULTS.md).  Layout: basis coords
    ride pre-broadcast across a 128-lane minor dim so each (TILE_B, 128)
    slab `pltpu.repeat`s into lane-major tiles; the cloud tile broadcasts
    one (1, TILE_N) row down the sublanes; the min reduces along lanes.

    Axis 1 (cloud tiles) is innermost; the out tile is revisited across
    it, so initialize at j==0 and fold the running min in place.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, jnp.inf)

    pt = points_ref[:]  # (3, TILE_N)
    tile_n = pt.shape[1]
    acc = None
    for c in range(3):
        b_c = pltpu.repeat(basis_ref[c], tile_n // 128, axis=1)
        d = b_c - pt[c:c + 1, :]  # (TILE_B, TILE_N)
        t = d * d
        acc = t if acc is None else acc + t
    out_ref[:] = jnp.minimum(out_ref[:],
                             jnp.min(acc, axis=1, keepdims=True))


@jax.jit
def bps_encode_pallas(basis: jax.Array, points: jax.Array) -> jax.Array:
    """Pallas TPU kernel: (B, 3) × (N, 3) → (B,) min distances.

    Requires B % _TILE_B == 0 and N % _TILE_N == 0 (use ``pad_cloud``).
    """
    B = basis.shape[0]
    N = points.shape[0]
    assert B % _TILE_B == 0, B
    assert N % _TILE_N == 0, N
    grid = (B // _TILE_B, N // _TILE_N)
    # per-coordinate basis values broadcast across a 128-lane minor dim
    bb = jnp.broadcast_to(
        basis.astype(jnp.float32).T[:, :, None], (3, B, 128))
    out = pl.pallas_call(
        _bps_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, _TILE_B, 128), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, _TILE_N), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_B, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=9 * B * N,
            bytes_accessed=(B * 3 * 128 + N * 3 + B) * 4,
            transcendentals=0,
        ),
    )(bb, points.astype(jnp.float32).T)
    return jnp.sqrt(jnp.maximum(out[:, 0], 0.0))


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def bps_encode(basis: jax.Array, points: jax.Array,
               use_pallas: Optional[bool] = None) -> jax.Array:
    """Dispatch: Pallas kernel on TPU (shapes permitting), XLA otherwise."""
    if use_pallas is None:
        use_pallas = (
            _on_tpu()
            and basis.shape[0] % _TILE_B == 0
            and points.shape[0] % _TILE_N == 0
        )
    if use_pallas:
        return bps_encode_pallas(basis, points)
    return bps_encode_xla(basis, points)


class BPSEncoder:
    """Object-oriented façade matching the reference's ``BPSEncoder``
    (``bps_encoder.py:12-55``): holds a basis, encodes clouds, checks the
    origin-centering invariant."""

    def __init__(self, basis: Optional[np.ndarray] = None,
                 bps_path: str = DEFAULT_BASIS_PATH,
                 cloud_pad: int = 8192):
        self.basis = jnp.asarray(
            basis if basis is not None else load_basis(bps_path))
        self.cloud_pad = cloud_pad

    def encode(self, points: np.ndarray, check_centered: bool = True
               ) -> np.ndarray:
        """(N, 3) cloud → (4096,) float32 encoding."""
        pts = pad_cloud(np.asarray(points, np.float32), self.cloud_pad)
        enc = np.asarray(bps_encode(self.basis, jnp.asarray(pts)))
        if check_centered and enc.min() >= 0.1:
            # reference bps_encoder.py:50 asserts; we raise a typed error
            raise ValueError(
                "The pcd might not be centered in origin! min dist = %.4f"
                % enc.min())
        return enc
