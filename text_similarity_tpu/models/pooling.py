"""Pooling strategies turning token states into sentence/word embeddings.

Parity targets (intent, not bugs) with reference src/modules/modules.py:
- masked mean      ← AvgPoolingStrategy (modules.py:154-171)
- CLS              ← CLSPoolingStrategy (modules.py:174-181; the reference
                     returns an empty slice ``embeddings[:0:]`` by mistake —
                     we implement the intended ``[:, 0, :]``)
- BERT pooler      ← BertPoolingStrategy CLS→Linear→Tanh (modules.py:184-195)
- word spans       ← WordPoolingStrategy (modules.py:58-74)

All poolers are shape-static and jit-friendly; the word pooler takes a
fixed-size span-index matrix (padded with -1) instead of Python lists.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def mean_pool(hidden: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked mean over the sequence axis.

    hidden: (B, S, H); mask: (B, S) with 1 = real token.
    Matches the reference's clamp(min=1e-9) on the token count."""
    m = mask.astype(jnp.float32)[..., None]
    summed = jnp.sum(hidden.astype(jnp.float32) * m, axis=1)
    count = jnp.maximum(jnp.sum(m, axis=1), 1e-9)
    return (summed / count).astype(hidden.dtype)


def cls_pool(hidden: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    return hidden[:, 0, :]


def max_pool(hidden: jax.Array, mask: jax.Array) -> jax.Array:
    neg = jnp.finfo(jnp.float32).min
    m = mask.astype(bool)[..., None]
    return jnp.max(
        jnp.where(m, hidden.astype(jnp.float32), neg), axis=1
    ).astype(hidden.dtype)


def segment_mean_pool(
    hidden: jax.Array,     # (B, S, H)
    segments: jax.Array,   # (B, S) 1-based segment tag per token, 0 = pad
    max_segments: int,     # static segments-per-row bound (owners width)
) -> jax.Array:
    """Per-segment masked mean for PACKED rows (data/packing.py): one
    fixed-width row carries several sentences separated by segment tags;
    each gets its own embedding. Returns (B, max_segments, H); empty
    segment slots come out zero. One (B,S,M)x(B,S,H) einsum — MXU-friendly
    and shape-static (M is the packing layout's owners width)."""
    tags = jnp.arange(1, max_segments + 1, dtype=segments.dtype)
    oh = (segments[:, :, None] == tags[None, None, :]).astype(jnp.float32)
    summed = jnp.einsum(
        "bsm,bsh->bmh", oh, hidden.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    count = jnp.maximum(jnp.sum(oh, axis=1), 1e-9)    # (B, M)
    return (summed / count[..., None]).astype(hidden.dtype)


def segment_first_pool(
    hidden: jax.Array,     # (B, S, H)
    segments: jax.Array,   # (B, S) 1-based segment tag per token, 0 = pad
    max_segments: int,
) -> jax.Array:
    """Per-segment FIRST-token (CLS) pool for PACKED rows: each packed
    sequence starts with its own [CLS], so segment m's score vector is the
    hidden state at the first position tagged m. Returns
    (B, max_segments, H); empty slots come out zero. The packed analogue
    of cls_pool for cross-encoder pair scoring."""
    b, s, _ = hidden.shape
    pos = jnp.arange(s, dtype=jnp.int32)
    tags = jnp.arange(1, max_segments + 1, dtype=segments.dtype)
    is_m = segments[:, :, None] == tags[None, None, :]       # (B, S, M)
    first = jnp.min(
        jnp.where(is_m, pos[None, :, None], s), axis=1
    )                                                         # (B, M)
    present = first < s
    gathered = jnp.take_along_axis(
        hidden, jnp.minimum(first, s - 1)[:, :, None], axis=1
    )                                                         # (B, M, H)
    return jnp.where(present[:, :, None], gathered, 0)


def bert_pooler(hidden: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    cls = hidden[:, 0, :].astype(jnp.float32)
    return jnp.tanh(cls @ w + b).astype(hidden.dtype)


def word_span_pool(
    hidden: jax.Array,       # (B, S, H)
    span_indices: jax.Array,  # (B, W) subtoken indices of the target word,
                              # padded with -1
) -> jax.Array:
    """Mean of the sub-token vectors of one target word per example —
    the WiC/GWSC word-embedding pooler."""
    b, s, h = hidden.shape
    valid = (span_indices >= 0).astype(jnp.float32)  # (B, W)
    idx = jnp.maximum(span_indices, 0)
    gathered = jnp.take_along_axis(
        hidden, idx[..., None].astype(jnp.int32), axis=1
    ).astype(jnp.float32)  # (B, W, H)
    summed = jnp.sum(gathered * valid[..., None], axis=1)
    count = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1.0)
    return (summed / count).astype(hidden.dtype)


POOLERS = {
    "mean": mean_pool,
    "cls": cls_pool,
    "max": max_pool,
}


def pool(strategy: str, hidden: jax.Array, mask: jax.Array) -> jax.Array:
    return POOLERS[strategy](hidden, mask)
