"""Attention ops: XLA reference path + Pallas flash-attention kernel.

The reference relies on HF BERT's eager attention (materialising the full
(B, heads, S, S) score tensor) and offers Performer/FAVOR+ as its
long-context option (reference: src/modules/fast_attention.py; SURVEY.md
§5.7). Here the default *exact* kernel is a blockwise flash attention in
Pallas (softmax never materialises the S×S matrix in HBM), with a pure-jnp
path used as the numerical oracle in tests and as the fallback on
non-TPU backends / tiny shapes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e9  # large finite negative: bf16-safe masking


# ---------------------------------------------------------------------------
# Reference (XLA) implementation — the numerical oracle.
# ---------------------------------------------------------------------------

def attention_reference(
    q: jax.Array,  # (B, S, H, D)
    k: jax.Array,  # (B, S, H, D)
    v: jax.Array,  # (B, S, H, D)
    mask: Optional[jax.Array] = None,  # (B, S) 1=keep
    head_mask: Optional[jax.Array] = None,  # (H,) multiplier per head
    window: int = 0,  # >0: banded (local) attention, |i-j| <= window
    global_cls: bool = True,
) -> jax.Array:
    """Exact softmax attention; softmax in fp32. ``window`` gives the
    Longformer-style sliding-window variant (the reference converts models
    with LongformerSelfAttention, make_long_transformer.py:56-68); with
    ``global_cls`` position 0 keeps global attention in both directions."""
    *_, s, h, d = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        bias = jnp.where(mask[:, None, None, :].astype(bool), 0.0, NEG_INF)
        logits = logits + bias
    if window > 0:
        qi = jnp.arange(s)[:, None]
        kj = jnp.arange(s)[None, :]
        keep = jnp.abs(qi - kj) <= window
        if global_cls:  # CLS attends/attended globally
            keep = keep | (qi == 0) | (kj == 0)
        logits = jnp.where(keep[None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    if head_mask is not None:
        probs = probs * head_mask[None, :, None, None].astype(probs.dtype)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention (non-causal, padding-masked) for encoders.
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, len_ref, k_ref, v_ref, o_ref, *, block_k: int, sm_scale: float, window: int = 0):
    """One (batch*head, q-block) program: stream K/V blocks, online softmax.

    Block shapes inside the kernel (leading 1 = folded batch*head dim):
      q_ref: (1, block_q, d); k_ref/v_ref: (1, S, d); o_ref: (1, block_q, d);
      len_ref: full (B*H, 1) array in SMEM — number of valid (non-padding)
      keys per sequence. Padding is assumed contiguous at the end of the
      sequence (guaranteed by the framework's length-bucketed batching).
    """
    q = q_ref[0].astype(jnp.float32) * sm_scale
    seq_len = k_ref.shape[1]
    block_q, d = q.shape
    valid_len = len_ref[pl.program_id(0), 0]
    q_start = pl.program_id(1) * block_q

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        key_pos = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1
        )
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k)
        s = jnp.where(key_pos < valid_len, s, NEG_INF)
        if window > 0:
            q_pos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0
            )
            s = jnp.where(jnp.abs(q_pos - key_pos) <= window, s, NEG_INF)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    n_blocks = seq_len // block_k
    if window > 0:
        # visit only k-blocks intersecting the band of this q-block —
        # DMA volume scales with the window, not the sequence
        lo = jnp.maximum((q_start - window) // block_k, 0)
        hi = jnp.minimum(
            (q_start + block_q - 1 + window) // block_k + 1, n_blocks
        )
    else:
        lo, hi = 0, n_blocks
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, _, l = jax.lax.fori_loop(lo, hi, body, (acc0, m0, l0))
    # Fully-masked rows (padding queries) have l == 0 → output 0.
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret", "window")
)
def flash_attention(
    q: jax.Array,  # (B, S, H, D)
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,  # (B, S)
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
    window: int = 0,   # >0: sliding-window (banded) attention
) -> jax.Array:
    """Blockwise exact attention. S must be a multiple of block sizes
    (callers pad to length buckets — which encode() does anyway, mirroring
    the reference's length-bucketed batching, sentence_encoder.py:138).

    ``mask`` must be contiguous (all 1s then all 0s); it is reduced to
    per-sequence lengths delivered through SMEM."""
    from jax.experimental.pallas import tpu as pltpu

    b, s, h, d = q.shape
    if mask is None:
        lengths = jnp.full((b,), s, jnp.int32)
    else:
        lengths = jnp.sum(mask.astype(jnp.int32), axis=1)
    block_q = min(block_q, s)
    block_k = min(block_k, s)

    # Layout: fold heads into batch; kernel grid = (B*H, S/block_q).
    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)

    qf, kf, vf = fold(q), fold(k), fold(v)
    lf = jnp.repeat(lengths, h, axis=0).reshape(b * h, 1)

    grid = (b * h, s // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, block_k=block_k, sm_scale=1.0 / (d ** 0.5),
            window=window,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full lengths array
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
        interpret=interpret,
    )(qf, lf, kf, vf)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    head_mask: Optional[jax.Array] = None,
    impl: str = "auto",
    performer_proj: Optional[jax.Array] = None,
    causal: bool = False,
    window: int = 0,
) -> jax.Array:
    """Dispatching MHA. impl: auto | flash | reference | performer.

    ``flash`` requires no head_mask (pruning paths use ``reference``, which
    exposes attention probabilities to the head-mask gradient).
    ``performer`` needs a (m, head_dim) random-feature matrix."""
    if impl == "performer":
        from .performer import performer_attention, performer_attention_causal

        if performer_proj is None:
            raise ValueError("performer impl needs performer_proj features")
        out = (
            performer_attention_causal(q, k, v, performer_proj, mask)
            if causal
            else performer_attention(q, k, v, performer_proj, mask)
        )
        if head_mask is not None:
            out = out * head_mask[None, None, :, None].astype(out.dtype)
        return out
    if impl == "auto":
        # Flash pays off when the S×S score tensor is the memory hot spot;
        # at short encoder lengths XLA's fused attention is already optimal.
        use_flash = (
            _on_tpu()
            and head_mask is None
            and q.shape[1] % 128 == 0
            and q.shape[1] >= 512
        )
        impl = "flash" if use_flash else "reference"
    if impl == "flash":
        if head_mask is not None:
            raise ValueError("flash attention does not support head_mask")
        return flash_attention(
            q, k, v, mask, interpret=not _on_tpu(), window=window
        )
    return attention_reference(
        q, k, v, mask, head_mask, window=window, global_cls=False
    )
