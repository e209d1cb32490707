"""On-device spherical k-means — the IVF index build kernel.

Replaces the reference's C++ HNSW graph construction
(hnswlib ``init_index``/``add_items``, reference:
src/pipeline/search_pipeline.py:105-122) with the TPU-native build step of a
clustered/IVF index: assignment is a chunked matmul+argmax over the MXU,
centroid update is a segment-sum — both stay in HBM, no host round trips
(SURVEY.md §2.1). Also backs the k-means clustering pipeline (reference:
src/pipeline/clustering.py:8-31).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _map_row_chunks(data, chunk, fn):
    """Map ``fn`` over contiguous row chunks of ``data`` WITHOUT a padded
    full copy (``jnp.pad`` + reshape materializes a second corpus — a
    5.8 GB HLO temp at 8M×384 that OOM'd the single-chip build,
    docs/ROUND3.md): full chunks stream through ``lax.map`` +
    ``dynamic_slice`` reads of the ORIGINAL buffer; a ragged tail re-reads
    the last full-chunk-sized window ending at n (the overlap recomputes a
    few rows instead of allocating a pad). Returns the list of per-chunk
    outputs with the tail trimmed to the remainder (concat on the LAST
    axis)."""
    n, d = data.shape
    n_full = n // chunk
    rem = n - n_full * chunk
    outs = []
    if n_full:
        starts = jnp.arange(n_full, dtype=jnp.int32) * chunk
        outs.append(
            jax.lax.map(
                lambda st: fn(jax.lax.dynamic_slice(data, (st, 0), (chunk, d))),
                starts,
            )
        )
    if rem:
        if n >= chunk:
            tail = fn(jax.lax.dynamic_slice(data, (n - chunk, 0), (chunk, d)))
            outs.append(tail[..., chunk - rem:][None])
        else:
            outs.append(fn(data)[None])
    return outs


@functools.partial(jax.jit, static_argnames=("chunk",))
def assign_clusters(
    data: jax.Array,        # (N, D) L2-normalized
    centroids: jax.Array,   # (C, D) L2-normalized
    chunk: int = 65536,
) -> jax.Array:
    """argmax_c <x, centroid_c> per row, chunked so the (N, C) score matrix
    never materializes."""
    n, d = data.shape
    # small corpora must not pay a full 65536-row padded matmul per call:
    # clamp the chunk to the enclosing power of two (still shape-stable
    # per corpus size — n is static under jit)
    chunk = min(chunk, max(8, 1 << (max(n - 1, 1)).bit_length()))

    def one(chunk_rows):
        scores = jnp.einsum(
            "nd,cd->nc", chunk_rows, centroids,
            preferred_element_type=jnp.float32,
        )
        return jnp.argmax(scores, axis=1).astype(jnp.int32)

    outs = _map_row_chunks(data, chunk, one)
    return jnp.concatenate([o.reshape(-1) for o in outs])


@functools.partial(jax.jit, static_argnames=("topk", "chunk"))
def assign_clusters_topk(
    data: jax.Array,
    centroids: jax.Array,
    topk: int = 3,
    chunk: int = 65536,
) -> jax.Array:
    """Per row, the ids of its ``topk`` nearest centroids (used by the
    balanced IVF layout to spill capped rows to their next-best cluster).

    Returns shape **(topk, N)** — topk-major. An (N, topk) tiled output
    pads the 3-wide minor dim to 128 lanes (a 42× / multi-GB blowup at
    8M rows); callers transpose on host (``np.asarray(out).T``)."""
    n, d = data.shape
    chunk = min(chunk, max(8, 1 << (max(n - 1, 1)).bit_length()))

    def one(chunk_rows):
        scores = jnp.einsum(
            "nd,cd->nc", chunk_rows, centroids,
            preferred_element_type=jnp.float32,
        )
        _, ids = jax.lax.top_k(scores, topk)
        return ids.astype(jnp.int32).T      # (topk, chunk): lane dim wide

    outs = _map_row_chunks(data, chunk, one)
    flat = [
        o.transpose(1, 0, 2).reshape(topk, -1) if o.ndim == 3 else o
        for o in outs
    ]
    return jnp.concatenate(flat, axis=1)


@functools.partial(jax.jit, static_argnames=("num_clusters", "chunk"))
def _update_centroids(
    data: jax.Array, assign: jax.Array, num_clusters: int, chunk: int = 65536
) -> Tuple[jax.Array, jax.Array]:
    sums = jax.ops.segment_sum(
        data.astype(jnp.float32), assign, num_segments=num_clusters
    )
    counts = jax.ops.segment_sum(
        jnp.ones((data.shape[0],), jnp.float32), assign,
        num_segments=num_clusters,
    )
    return sums, counts


@functools.partial(jax.jit, static_argnames=("num_clusters", "chunk"))
def _kmeans_iter(data, centroids, reseed_key, num_clusters: int, chunk: int):
    # NOTE: data must be an ARGUMENT, not a closure capture — captured
    # arrays bake into the HLO as constants (GBs shipped per compile).
    c, n = num_clusters, data.shape[0]
    assign = assign_clusters(data, centroids, chunk=chunk)
    sums, counts = _update_centroids(data, assign, c, chunk=chunk)
    new = sums / jnp.maximum(counts[:, None], 1.0)
    # re-seed empties from random data rows
    rand_rows = data[
        jax.random.randint(reseed_key, (c,), 0, n)
    ].astype(jnp.float32)
    new = jnp.where(counts[:, None] > 0, new, rand_rows)
    norm = jnp.linalg.norm(new, axis=1, keepdims=True)
    return new / jnp.maximum(norm, 1e-12)


def kmeans(
    data: jax.Array,        # (N, D) L2-normalized
    num_clusters: int,
    iters: int = 12,
    key: jax.Array | None = None,
    chunk: int = 65536,
) -> Tuple[jax.Array, jax.Array]:
    """Spherical k-means. Returns (centroids (C, D) normalized,
    assignments (N,)). Empty clusters are re-seeded from random rows."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n = data.shape[0]
    c = num_clusters
    init_idx = jax.random.choice(key, n, (c,), replace=False)
    centroids = data[init_idx].astype(jnp.float32)

    for i in range(iters):
        key, sub = jax.random.split(key)
        centroids = _kmeans_iter(data, centroids, sub, c, chunk)
    assign = assign_clusters(data, centroids, chunk=chunk)
    return centroids, assign
