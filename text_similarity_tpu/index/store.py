"""EmbeddingStore: HBM-resident corpus embedding matrix.

The reference moves every embedding GPU→numpy→C++ index
(search_pipeline.py:114-122); here embeddings stay on device from encode to
query. Fixed capacity (static shapes), device-side append via
dynamic_update_slice, deletion by tombstone mask (parity with hnswlib's
``mark_deleted``/``resize_index``, reference search_pipeline.py:154-175),
npz save/load.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_rows(buf, rows, offset):
    return jax.lax.dynamic_update_slice(buf, rows.astype(buf.dtype), (offset, 0))


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_mask(mask, value, offset, count):
    idx = jnp.arange(mask.shape[0])
    sel = (idx >= offset) & (idx < offset + count)
    return jnp.where(sel, value, mask)


class EmbeddingStore:
    """Append-only (plus tombstones) embedding matrix in HBM.

    Rows are L2-normalized fp32/bf16, or **int8 with per-row scales**
    (``quantized=True``): 4× the corpus per chip, scored by the int8
    Pallas kernel (ops.topk.cosine_topk_pallas_int8). ``alive`` masks
    tombstoned rows out of search."""

    def __init__(
        self, capacity: int, dim: int, dtype=jnp.float32,
        quantized: bool = False,
    ):
        self.capacity = capacity
        self.dim = dim
        self.quantized = quantized
        self.data = jnp.zeros(
            (capacity, dim), jnp.int8 if quantized else dtype
        )
        self.scales = (
            jnp.ones((capacity,), jnp.float32) if quantized else None
        )
        self.alive = jnp.zeros((capacity,), jnp.bool_)
        self.size = 0

    def add(self, embeddings) -> np.ndarray:
        """Append rows; returns their assigned ids."""
        rows = jnp.asarray(embeddings)
        n = rows.shape[0]
        if self.size + n > self.capacity:
            raise ValueError(
                f"store full: {self.size}+{n} > {self.capacity}; "
                "create with larger capacity or grow()"
            )
        if self.quantized:
            from ..compress.quantize import quantize_embeddings_int8

            q, s = quantize_embeddings_int8(rows)
            self.data = _write_rows(self.data, q, self.size)
            self.scales = self.scales.at[self.size : self.size + n].set(s)
        else:
            self.data = _write_rows(self.data, rows, self.size)
        self.alive = _write_mask(self.alive, True, self.size, n)
        ids = np.arange(self.size, self.size + n)
        self.size += n
        return ids

    def mark_deleted(self, ids: Sequence[int]) -> int:
        """Tombstone the given row ids; returns how many were alive."""
        alive = np.array(jax.device_get(self.alive))  # writable copy
        idx = np.asarray(list(ids), dtype=np.int64)
        n_alive = int(alive[idx].sum())
        alive[idx] = False
        self.alive = jnp.asarray(alive)
        return n_alive

    def grow(self, new_capacity: int) -> None:
        """Resize (analogue of hnswlib resize_index)."""
        if new_capacity < self.capacity:
            raise ValueError("can only grow")
        pad = new_capacity - self.capacity
        self.data = jnp.pad(self.data, ((0, pad), (0, 0)))
        self.alive = jnp.pad(self.alive, ((0, pad),))
        if self.scales is not None:
            self.scales = jnp.pad(
                self.scales, ((0, pad),), constant_values=1.0
            )
        self.capacity = new_capacity

    @property
    def scales_view(self):
        return self.scales[: self.size] if self.scales is not None else None

    @property
    def view(self) -> jax.Array:
        """(size, dim) view of the filled prefix."""
        return self.data[: self.size]

    @property
    def alive_view(self) -> jax.Array:
        return self.alive[: self.size]

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        extra = {}
        if self.quantized:
            # without the scales an int8 store would reload as raw code
            # magnitudes — rankings over the reloaded store were garbage
            extra["scales"] = np.asarray(
                jax.device_get(self.scales[: self.size])
            )
        data = np.asarray(jax.device_get(self.data[: self.size]))
        if self.data.dtype == jnp.bfloat16:
            # np.savez silently degrades bf16 to a void V2 dtype that
            # np.load can't hand to jnp.asarray — persist a uint16 bit
            # view plus a tag (same trick as IVFIndex._to_npz)
            extra["data_dtype"] = "bfloat16"
            data = data.view(np.uint16)
        np.savez(
            path,
            data=data,
            alive=np.asarray(jax.device_get(self.alive[: self.size])),
            capacity=self.capacity,
            quantized=self.quantized,
            **extra,
        )

    @classmethod
    def load(cls, path: str, dtype=jnp.float32) -> "EmbeddingStore":
        if not os.path.exists(path) and os.path.exists(path + ".npz"):
            path = path + ".npz"   # np.savez appends the suffix
        with np.load(path) as z:
            data = z["data"]
            alive = z["alive"]
            capacity = int(z["capacity"])
            quantized = bool(z["quantized"]) if "quantized" in z.files else False
            scales = z["scales"] if "scales" in z.files else None
            if "data_dtype" in z.files and str(z["data_dtype"]) == "bfloat16":
                import ml_dtypes

                data = data.view(ml_dtypes.bfloat16)
                dtype = jnp.bfloat16
        store = cls(capacity, data.shape[1], dtype, quantized=quantized)
        store.data = _write_rows(store.data, jnp.asarray(data), 0)
        if quantized and scales is not None:
            store.scales = store.scales.at[: data.shape[0]].set(
                jnp.asarray(scales)
            )
        store.alive = _write_mask(store.alive, True, 0, data.shape[0])
        if not alive.all():
            am = np.zeros((capacity,), bool)
            am[: data.shape[0]] = alive
            store.alive = jnp.asarray(am)
        store.size = data.shape[0]
        return store
