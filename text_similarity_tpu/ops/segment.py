"""Sparse label-graph ops: structured logits.

Parity with the reference's ``StructuredLogits``
(src/modules/structured_logits.py:19-98), which needs the torch_scatter /
torch_sparse CUDA extensions for a sparse adjacency spmv. On TPU this is
``jax.ops.segment_sum`` over edge lists — no extension required
(SURVEY.md §2.1)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def adjacency_matvec(
    values: jax.Array,       # (..., C) per-class values
    edge_src: jax.Array,     # (E,) int32 — neighbor class
    edge_dst: jax.Array,     # (E,) int32 — receiving class
    edge_weight: jax.Array,  # (E,)
    num_classes: int,
    normalize: bool = True,
) -> jax.Array:
    """y[dst] = Σ_src w · x[src] over graph edges (sparse A @ x)."""
    gathered = values[..., edge_src] * edge_weight          # (..., E)
    out = jax.ops.segment_sum(
        jnp.moveaxis(gathered, -1, 0), edge_dst, num_segments=num_classes
    )
    out = jnp.moveaxis(out, 0, -1)
    if normalize:
        deg = jax.ops.segment_sum(
            edge_weight, edge_dst, num_segments=num_classes
        )
        out = out / jnp.maximum(deg, 1e-9)
    return out


def structured_logits(
    logits: jax.Array,       # (B, C)
    edge_src: jax.Array,
    edge_dst: jax.Array,
    edge_weight: jax.Array,
    alpha: float = 0.5,
) -> jax.Array:
    """Label-graph smoothing: mix each class logit with its graph
    neighborhood's mean logit (the reference's neighbor-logit addition)."""
    c = logits.shape[-1]
    neighbor = adjacency_matvec(
        logits, edge_src, edge_dst, edge_weight, c, normalize=True
    )
    return (1.0 - alpha) * logits + alpha * neighbor
