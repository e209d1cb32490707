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
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._produce, args=(iter(batches),), daemon=True
        )
        self._thread.start()

    def _place(self, batch):
        if self._mesh is not None:
            from .steps import shard_batch_for

            return shard_batch_for(self._mesh, jax.tree.map(jnp.asarray, batch))
        return jax.tree.map(jnp.asarray, batch)

    def _put(self, item) -> bool:
        """Blocking put that aborts when close() is requested (a plain
        q.put would deadlock the producer forever if the consumer stops
        draining mid-epoch, e.g. because step_fn raised)."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _produce(self, it: Iterator):
        try:
            for b in it:
                if self._stop.is_set() or not self._put(self._place(b)):
                    return
            self._put(self._END)
        except BaseException as e:  # propagate to the consumer
            self._put(e)
            # terminate iteration for consumers that keep calling next()
            # after catching the error (otherwise they'd block forever)
            self._put(self._END)

    def close(self) -> None:
        """Stop the producer and drop queued (device-resident) batches.

        Idempotent. Must be called when abandoning iteration early (the
        Trainer does this in a ``finally``) — otherwise the producer
        thread stays blocked on a full queue holding up to depth+1
        device_put batches alive for the process lifetime."""
        self._stop.set()
        while self._thread.is_alive():
            try:
                self._q.get_nowait()  # unblock a pending put
            except queue.Empty:
                pass
            self._thread.join(timeout=0.05)
        while True:  # release any remaining device references
            try:
                self._q.get_nowait()
            except queue.Empty:
                break

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop.is_set():
            raise StopIteration
        item = self._q.get()
        if item is self._END:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item
