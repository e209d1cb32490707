"""Density-based clustering (DBSCAN) on device.

Capability parity with the reference's HDBSCAN stage in topic modeling
(src/pipeline/topic_modeling.py:98-104: noise-aware density clustering of
reduced document embeddings). TPU-first formulation: the ε-neighborhood
graph is a thresholded cosine-similarity matmul and connected components
resolve by iterative min-label propagation (a masked (N, N) min-reduce per
sweep inside ``lax.while_loop`` — O(graph diameter) sweeps, every op is a
dense VPU/MXU primitive; no pointer chasing).

Semantics match classic DBSCAN: core points (≥ min_samples neighbors)
merge through core-core edges; border points adopt the label of any
neighboring core point; everything else is noise (−1).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def dbscan_cosine(
    x: jax.Array,            # (N, D) L2-normalized
    eps: float = 0.3,        # cosine-distance radius
    min_samples: int = 5,
    max_sweeps: int = 0,     # 0 = N sweeps upper bound (while_loop exits early)
) -> np.ndarray:
    """Cluster rows of ``x``; returns (N,) int labels, −1 = noise, else
    labels renumbered 0..k−1 in first-appearance order."""
    labels = _dbscan_device(
        jnp.asarray(x, jnp.float32), float(eps), int(min_samples),
        int(max_sweeps),
    )
    labels = np.asarray(jax.device_get(labels))
    # compact renumbering on host (tiny)
    out = np.full(labels.shape, -1, np.int64)
    next_id = 0
    seen: dict = {}
    for i, l in enumerate(labels):
        if l < 0:
            continue
        if l not in seen:
            seen[l] = next_id
            next_id += 1
        out[i] = seen[l]
    return out


from functools import partial


@partial(jax.jit, static_argnames=("min_samples", "max_sweeps"))
def _dbscan_device(x, eps, min_samples: int, max_sweeps: int):
    n = x.shape[0]
    sims = jnp.einsum(
        "nd,md->nm", x, x, preferred_element_type=jnp.float32
    )
    adj = sims >= (1.0 - eps)            # includes self
    deg = jnp.sum(adj.astype(jnp.int32), axis=1)
    core = deg >= min_samples
    sent = jnp.int32(n)                  # sentinel = "no label"

    core_adj = adj & core[None, :]       # edges into core points
    init = jnp.where(core, jnp.arange(n, dtype=jnp.int32), sent)
    limit = max_sweeps or n

    def cond(state):
        labels, changed, it = state
        return changed & (it < limit)

    def body(state):
        labels, _, it = state
        neigh = jnp.where(core_adj, labels[None, :], sent)
        m = jnp.min(neigh, axis=1)
        new = jnp.where(core, jnp.minimum(labels, m), labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.bool_(True), jnp.int32(0))
    )
    # border points: adopt the minimum label among neighboring cores
    neigh = jnp.where(core_adj, labels[None, :], sent)
    border = jnp.min(neigh, axis=1)
    labels = jnp.where(core, labels, border)
    return jnp.where(labels >= sent, -1, labels)
