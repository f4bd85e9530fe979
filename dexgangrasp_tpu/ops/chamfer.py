"""Chamfer distance as a TPU reduction.

The reference installs the CUDA ``chamfer_distance`` extension
(``README.md:39``) for FFHNet-style training; here it is a blocked
XLA/Pallas symmetric nearest-neighbor reduction sharing the same tiled
min-distance machinery as the BPS encoder.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.ops import bps as _bps


@functools.partial(jax.jit, static_argnames=("block", "squared"))
def chamfer_distance_xla(a: jax.Array, b: jax.Array, block: int = 2048,
                         squared: bool = True) -> jax.Array:
    """Symmetric chamfer distance between clouds (N,3) and (M,3).

    Returns mean_a min_b d(a,b) + mean_b min_a d(a,b); squared distances by
    default (the common training form).
    """
    def one_sided(x, y):
        # for each x row: min over y
        x_sq = jnp.sum(x * x, axis=1)
        n = y.shape[0]
        nblocks = max(1, -(-n // block))
        padded = jnp.full((nblocks * block, 3), _bps.PAD_VALUE, y.dtype)
        padded = jax.lax.dynamic_update_slice(padded, y, (0, 0))
        chunks = padded.reshape(nblocks, block, 3)

        def body(carry, chunk):
            c_sq = jnp.sum(chunk * chunk, axis=1)
            cross = jnp.matmul(x, chunk.T,
                               precision=jax.lax.Precision.HIGHEST)
            d2 = x_sq[:, None] + c_sq[None, :] - 2.0 * cross
            return jnp.minimum(carry, jnp.min(d2, axis=1)), None

        init = jnp.full((x.shape[0],), jnp.inf, x.dtype)
        md2, _ = jax.lax.scan(body, init, chunks)
        md2 = jnp.maximum(md2, 0.0)
        return md2 if squared else jnp.sqrt(md2)

    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    return jnp.mean(one_sided(a, b)) + jnp.mean(one_sided(b, a))


def chamfer_distance_pallas(a: jax.Array, b: jax.Array,
                            squared: bool = True) -> jax.Array:
    """Pallas TPU path: chamfer is two one-sided min-distance passes, which
    is exactly the BPS kernel's tiled fused min-reduction (ops/bps.py) run
    in both directions.

    Shapes must satisfy the kernel's tiling (rows of ``a`` % 512 == 0 and
    rows of ``b`` % 1024 == 0, and vice versa — pad with ops.bps.PAD_VALUE
    via ``pad_cloud`` and mask afterwards if needed); use
    ``chamfer_distance`` for arbitrary shapes.
    """
    d_ab = _bps.bps_encode_pallas(a, b)  # for each a-row: min dist to b
    d_ba = _bps.bps_encode_pallas(b, a)
    if squared:
        return jnp.mean(d_ab ** 2) + jnp.mean(d_ba ** 2)
    return jnp.mean(d_ab) + jnp.mean(d_ba)


def chamfer_distance(a: jax.Array, b: jax.Array, squared: bool = True
                     ) -> jax.Array:
    """Dispatcher: Pallas kernel on TPU when the tiling divides, blocked
    XLA scan otherwise."""
    if (_bps._on_tpu()
            and a.shape[0] % _bps._TILE_B == 0
            and b.shape[0] % _bps._TILE_N == 0
            and b.shape[0] % _bps._TILE_B == 0
            and a.shape[0] % _bps._TILE_N == 0):
        return chamfer_distance_pallas(a, b, squared=squared)
    return chamfer_distance_xla(a, b, squared=squared)
