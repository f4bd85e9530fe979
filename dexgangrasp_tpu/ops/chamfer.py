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


def chamfer_distance(a: jax.Array, b: jax.Array, squared: bool = True
                     ) -> jax.Array:
    """Dispatcher (currently XLA path everywhere; the blocked scan already
    keeps the distance matrix out of HBM and feeds the MXU)."""
    return chamfer_distance_xla(a, b, squared=squared)
