"""Device-prefetching batch pipeline.

The reference moves each batch host→device inline in the train loop
(learner.py:202-206), stalling the accelerator on every transfer. Here a
background thread stays ``depth`` batches ahead: it device_puts (and
optionally mesh-shards) the next batches while the current step runs, so
the step dequeues data that is already resident.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax
import jax.numpy as jnp


class DevicePrefetcher:
    """Iterate host batches with transfers overlapped ``depth`` ahead.

    Exceptions in the producer propagate to the consumer; iteration is
    single-use (wrap a fresh iterator per epoch)."""

    _END = object()

    def __init__(self, batches: Iterable, depth: int = 2, mesh=None):
        self._q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._mesh = mesh
        self._thread = threading.Thread(
            target=self._produce, args=(iter(batches),), daemon=True
        )
        self._thread.start()

    def _place(self, batch):
        if self._mesh is not None:
            from .steps import shard_batch_for

            return shard_batch_for(self._mesh, jax.tree.map(jnp.asarray, batch))
        return jax.tree.map(jnp.asarray, batch)

    def _produce(self, it: Iterator):
        try:
            for b in it:
                self._q.put(self._place(b))
            self._q.put(self._END)
        except BaseException as e:  # propagate to the consumer
            self._q.put(e)
            # terminate iteration for consumers that keep calling next()
            # after catching the error (otherwise they'd block forever)
            self._q.put(self._END)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._END:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item
