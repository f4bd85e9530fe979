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
