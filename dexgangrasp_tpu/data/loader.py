"""Host-side batch prefetching.

Replaces the reference's torch DataLoader worker processes
(``train.py:203-215``) with a lightweight background-thread pipeline: batch
assembly is already vectorized numpy (datasets.py), so one thread keeps the
device queue full.  ``device_put`` happens on the consumer side to overlap
H2D transfer with compute via JAX's async dispatch.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import numpy as np

import jax


class BatchLoader:
    """Iterate a dataset's ``epoch_batches`` with background prefetch."""

    def __init__(self, dataset, batch_size: int, drop_last: bool = True,
                 shuffle: bool = True, prefetch: int = 2,
                 to_device: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.shuffle = shuffle
        self.prefetch = prefetch
        self.to_device = to_device

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()

        def producer():
            try:
                for batch in self.dataset.epoch_batches(
                        self.batch_size, drop_last=self.drop_last,
                        shuffle=self.shuffle):
                    q.put(batch)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if self.to_device:
                item = {k: (jax.device_put(np.asarray(v))
                            if isinstance(v, np.ndarray) else v)
                        for k, v in item.items()}
            yield item
