"""Device-mesh construction.

The workload's parallel axes (SURVEY §2.2): the *batch* axis for GAN /
evaluator training (data parallel — replaces the reference's
``torch.nn.DataParallel``, ``dexgangrasp.py:127-129``) and the *n_samples*
grasp axis for inference (the reference's 400–10k grasp tiling,
``dexgangrasp.py:508-512``).  Both shard the leading axis; an optional
``model`` axis tensor-parallelizes the wide BPS-facing layers for scale-out
headroom.  Collectives ride ICI via GSPMD — no hand-written NCCL analogue.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(axis_sizes: Sequence[Tuple[str, int]],
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh with named axes, e.g. [('data', 4), ('model', 2)]."""
    devices = list(devices if devices is not None else jax.devices())
    names = tuple(n for n, _ in axis_sizes)
    sizes = tuple(s for _, s in axis_sizes)
    total = int(np.prod(sizes))
    assert total <= len(devices), (total, len(devices))
    arr = np.array(devices[:total]).reshape(sizes)
    return Mesh(arr, names)


def data_parallel_mesh(n_devices: Optional[int] = None) -> Mesh:
    n = n_devices or len(jax.devices())
    return make_mesh([("data", n)])


def multislice_mesh(n_slices: int,
                    axis_sizes: Sequence[Tuple[str, int]],
                    devices: Optional[Sequence] = None) -> Mesh:
    """('dcn', n_slices) × per-slice ICI axes — the multi-slice layout.

    Data parallelism spans the slow DCN axis (gradient all-reduce is one
    small psum per step, latency-tolerant), while everything
    bandwidth-hungry (tensor-parallel matmuls, batch-norm batch stats)
    stays on per-slice ICI axes — the scaling-book layering.

    On real multi-slice hardware (devices expose distinct
    ``slice_index``), the 'dcn' axis is laid exactly along slice
    boundaries via ``mesh_utils.create_hybrid_device_mesh``; on a single
    slice or the virtual CPU mesh it degrades to a plain reshape (useful
    for dryruns — the collectives are identical, only the wire differs).
    """
    devices = list(devices if devices is not None else jax.devices())
    names = ("dcn",) + tuple(n for n, _ in axis_sizes)
    sizes = tuple(s for _, s in axis_sizes)
    total = n_slices * int(np.prod(sizes))
    assert total <= len(devices), (total, len(devices))
    slice_ids = {getattr(d, "slice_index", 0) or 0 for d in devices}
    if len(slice_ids) >= n_slices > 1:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1,) + sizes,
            dcn_mesh_shape=(n_slices,) + (1,) * len(sizes),
            devices=devices)
    else:
        arr = np.array(devices[:total]).reshape((n_slices,) + sizes)
    return Mesh(arr, names)
