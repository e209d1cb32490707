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
    causal: bool = False,
    segment_ids: Optional[jax.Array] = None,  # (B, S) int; tokens attend
                                              # only within their segment
                                              # (greedy sequence packing —
                                              # block-diagonal mask)
) -> jax.Array:
    """Exact softmax attention; softmax reduces in fp32. ``window`` gives
    the Longformer-style sliding-window variant (the reference converts
    models with LongformerSelfAttention, make_long_transformer.py:56-68);
    with ``global_cls`` position 0 keeps global attention both ways.

    Layout note: q/k/v pre-transpose to (B,H,S,D) — ~50 MB of cheap moves
    — so the (B,H,S,S) score tensor comes out of the matmul already in
    its consumer layout instead of re-laying 800 MB (profiled: the
    logits transpose+softmax chain was half the encode step)."""
    *_, s, h, d = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qt, kt, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        bias = jnp.where(mask[:, None, None, :].astype(bool), 0.0, NEG_INF)
        logits = logits + bias
    if segment_ids is not None:
        # packed rows: token i sees token j iff they belong to the same
        # packed sequence — the block-diagonal mask of greedy packing
        same = segment_ids[:, None, :, None] == segment_ids[:, None, None, :]
        logits = jnp.where(same, logits, NEG_INF)
    if window > 0 or causal:
        qi = jnp.arange(s)[:, None]
        kj = jnp.arange(s)[None, :]
        keep = (
            jnp.abs(qi - kj) <= window
            if window > 0
            else jnp.ones((s, s), bool)
        )
        if window > 0 and global_cls:  # CLS attends/attended globally
            keep = keep | (qi == 0) | (kj == 0)
        if causal:
            keep = keep & (kj <= qi)
        logits = jnp.where(keep[None, None], logits, NEG_INF)
    if q.dtype == jnp.bfloat16:
        # bf16 AMP analogue of the reference's fp16 autocast: materialize
        # the (B,H,S,S) tensor in bf16 (the cast fuses into the matmul
        # epilogue) so every softmax pass reads half the bytes; exp/sum
        # still compute in f32.
        l16 = logits.astype(jnp.bfloat16)
        m = jnp.max(l16, axis=-1, keepdims=True).astype(jnp.float32)
        p = jnp.exp(l16.astype(jnp.float32) - m)
        probs = p / jnp.sum(p, axis=-1, keepdims=True)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    if head_mask is not None:
        probs = probs * head_mask[None, :, None, None].astype(probs.dtype)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), vt,
        preferred_element_type=jnp.float32,
    )
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention (non-causal, padding-masked) for encoders.
# ---------------------------------------------------------------------------

def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int, sm_scale: float, window: int = 0, global_cls: bool = False):
    """One (batch*head-group, q-block) program: stream K/V blocks, online
    softmax, vectorized over a group of G folded sequences.

    Block shapes inside the kernel (leading G = group of folded batch*head
    rows; G>1 amortizes per-program overhead at short S where the grid
    would otherwise have B*H tiny programs):
      q_ref: (G, block_q, d); k_ref/v_ref: (G, S, d); o_ref: (G, block_q, d);
      len_ref: scalar-prefetched (B*H,) int32 — number of valid
      (non-padding) keys per sequence. Padding is assumed contiguous at the
      end of the sequence (guaranteed by length-bucketed batching).
    """
    g = q_ref.shape[0]
    seq_len = k_ref.shape[1]
    block_q, d = q_ref.shape[1], q_ref.shape[2]
    q_start = pl.program_id(1) * block_q
    n_blocks = seq_len // block_k

    # All math stays 2D (Mosaic rejects shape-casting SMEM scalars into 3D
    # vectors); the G loop unrolls, so one program still runs G sequences
    # back-to-back and the grid shrinks G-fold.
    for gi in range(g):
        # Operands stay in their input dtype (bf16 in serving/training):
        # the MXU takes bf16 natively with f32 accumulation — upcasting to
        # f32 first would push every matmul onto the ~4x-slower f32 path.
        q = q_ref[gi]
        valid_len = len_ref[pl.program_id(0) * g + gi]

        def body(i, carry, gi=gi, q=q):
            acc, m_prev, l_prev = carry
            k_blk = k_ref[gi, pl.ds(i * block_k, block_k), :]
            v_blk = v_ref[gi, pl.ds(i * block_k, block_k), :]
            key_pos = i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1
            )
            s = jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale  # (block_q, block_k) f32
            s = jnp.where(key_pos < valid_len, s, NEG_INF)
            if window > 0:
                q_pos = q_start + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, 1), 0
                )
                keep = jnp.abs(q_pos - key_pos) <= window
                if global_cls:
                    # Longformer global CLS: position 0 attends and is
                    # attended globally (reference
                    # make_long_transformer.py:56-68). Invalid keys stay
                    # NEG_INF — the length mask already ran.
                    keep = keep | (q_pos == 0) | (key_pos == 0)
                s = jnp.where(keep, s, NEG_INF)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
            p = jnp.exp(s - m_new[:, None])
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1)
            acc = acc * alpha[:, None] + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc, m_new, l_new

        # Never visit fully-masked key blocks (padding is contiguous at
        # the end): bounds the loop at ceil(valid_len/block_k). A
        # valid_len==0 row (batch padding) runs zero iterations, so l
        # stays 0 and the guard below really produces 0 — with finite
        # NEG_INF the masked p=exp(0)=1 would otherwise average V rows.
        n_valid_blocks = (valid_len + block_k - 1) // block_k
        if window > 0:
            # visit only k-blocks intersecting the band of this q-block —
            # DMA volume scales with the window, not the sequence
            lo = jnp.maximum((q_start - window) // block_k, 0)
            hi = jnp.minimum(
                jnp.minimum(
                    (q_start + block_q - 1 + window) // block_k + 1, n_blocks
                ),
                n_valid_blocks,
            )
            if global_cls:
                # the CLS-row q-block attends every valid key block
                hi = jnp.where(
                    q_start == 0, jnp.minimum(n_blocks, n_valid_blocks), hi
                )
        else:
            lo, hi = 0, jnp.minimum(n_blocks, n_valid_blocks)
        acc0 = jnp.zeros((block_q, d), jnp.float32)
        m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
        l0 = jnp.zeros((block_q,), jnp.float32)
        if window > 0 and global_cls:
            # every q-block must also visit k-block 0 (the CLS column):
            # run one extra leading iteration remapped to block 0 when the
            # band excludes it (index remap — lax.cond carries don't lower
            # reliably in Mosaic)
            start = jnp.where(lo > 0, lo - 1, lo)
            acc, m, l = jax.lax.fori_loop(
                start, hi,
                lambda i, c: body(jnp.where(i < lo, 0, i), c),
                (acc0, m0, l0),
            )
        else:
            acc, m, l = jax.lax.fori_loop(lo, hi, body, (acc0, m0, l0))
        if lse_ref is not None:
            # log-sum-exp residual for the backward pass. Zero-length rows
            # get lse=0: backward sees p = exp(NEG_INF - 0) = 0 everywhere.
            lse_ref[gi, 0, :] = jnp.where(l > 0.0, m + jnp.log(l), 0.0)
        # Fully-masked rows (padding queries) have l == 0 → output 0.
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[gi] = (acc / l[:, None]).astype(o_ref.dtype)


def _flash_fwd_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, **kw):
    _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, None, **kw)


def _flash_fwd_res_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, **kw):
    _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, **kw)


def _flash_forward(qf, kf, vf, lf, block_q, block_k, interpret, window,
                   save_residuals: bool, global_cls: bool = False):
    """Folded-layout forward: qf/kf/vf (B*H, S, D); lf (B*H,) int32 lengths
    delivered by scalar prefetch (SMEM-resident once, not per-program —
    a full blocked SMEM operand blows the 1MB SMEM budget at large B*H).
    lse rides as (B*H, 1, S): the middle singleton keeps Mosaic's
    last-two-dims block rule satisfied."""
    from jax.experimental.pallas import tpu as pltpu

    bh, s, d = qf.shape
    # Short sequences → thousands of tiny (1 folded row) programs; group
    # G rows per program to amortize grid overhead (measured: flash at
    # S=128/G=1 ran BELOW the XLA path on v5e; G recovers it).
    g = 8 if (s <= 256 and bh % 8 == 0) else 1
    grid = (bh // g, s // block_q)
    kw = dict(block_k=block_k, sm_scale=1.0 / (d ** 0.5), window=window,
              global_cls=global_cls)
    in_specs = [
        pl.BlockSpec((g, block_q, d), lambda i, j, lens: (i, j, 0)),
        pl.BlockSpec((g, s, d), lambda i, j, lens: (i, 0, 0)),
        pl.BlockSpec((g, s, d), lambda i, j, lens: (i, 0, 0)),
    ]
    if not save_residuals:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (g, block_q, d), lambda i, j, lens: (i, j, 0)
            ),
        )
        out = pl.pallas_call(
            functools.partial(_flash_fwd_kernel, **kw),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bh, s, d), qf.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(lf, qf, kf, vf)
        return out, None
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((g, block_q, d), lambda i, j, lens: (i, j, 0)),
            pl.BlockSpec((g, 1, block_q), lambda i, j, lens: (i, 0, j)),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(_flash_fwd_res_kernel, **kw),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, s, d), qf.dtype),
            jax.ShapeDtypeStruct((bh, 1, s), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(lf, qf, kf, vf)
    return out, lse


# ---------------------------------------------------------------------------
# Flash backward (recompute-based: residuals are o + row log-sum-exp; the
# S×S probability matrix is rebuilt blockwise from q,k and lse, never
# stored — boom guide §7 / the standard flash backward decomposition).
# ---------------------------------------------------------------------------

def _flash_bwd_dq_kernel(
    len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref,
    *, block_k: int, sm_scale: float, window: int, global_cls: bool = False,
):
    """Grid (B*H, S/block_q): one q-block accumulates dq over k-blocks."""
    q = q_ref[0]                          # input dtype: bf16-native MXU
    do = do_ref[0]
    lse = lse_ref[0, 0, :]                # (block_q,)
    di = di_ref[0, 0, :]                  # (block_q,)
    seq_len = k_ref.shape[1]
    block_q, d = q.shape
    valid_len = len_ref[pl.program_id(0)]
    q_start = pl.program_id(1) * block_q

    def body(i, dq_acc):
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :]
        key_pos = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1
        )
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        s = jnp.where(key_pos < valid_len, s, NEG_INF)
        if window > 0:
            q_pos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0
            )
            keep = jnp.abs(q_pos - key_pos) <= window
            if global_cls:
                keep = keep | (q_pos == 0) | (key_pos == 0)
            s = jnp.where(keep, s, NEG_INF)
        p = jnp.exp(s - lse[:, None])
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - di[:, None])
        return dq_acc + jax.lax.dot_general(
            ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    n_blocks = seq_len // block_k
    n_valid_blocks = (valid_len + block_k - 1) // block_k
    if window > 0:
        lo = jnp.maximum((q_start - window) // block_k, 0)
        hi = jnp.minimum(
            jnp.minimum(
                (q_start + block_q - 1 + window) // block_k + 1, n_blocks
            ),
            n_valid_blocks,
        )
        if global_cls:
            hi = jnp.where(
                q_start == 0, jnp.minimum(n_blocks, n_valid_blocks), hi
            )
    else:
        lo, hi = 0, jnp.minimum(n_blocks, n_valid_blocks)
    if window > 0 and global_cls:
        start = jnp.where(lo > 0, lo - 1, lo)
        dq = jax.lax.fori_loop(
            start, hi,
            lambda i, c: body(jnp.where(i < lo, 0, i), c),
            jnp.zeros((block_q, d), jnp.float32),
        )
    else:
        dq = jax.lax.fori_loop(
            lo, hi, body, jnp.zeros((block_q, d), jnp.float32)
        )
    dq_ref[0] = (dq * sm_scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    len_ref, k_ref, q_ref, v_ref, do_ref, lse_ref, di_ref,
    dk_ref, dv_ref,
    *, block_q: int, sm_scale: float, window: int, global_cls: bool = False,
):
    """Grid (B*H, S/block_k): one k-block accumulates dk/dv over q-blocks."""
    k = k_ref[0]                          # (block_k, d) input dtype
    v = v_ref[0]
    seq_len = q_ref.shape[1]
    block_k, d = k.shape
    valid_len = len_ref[pl.program_id(0)]
    k_start = pl.program_id(1) * block_k
    key_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)

    def body(j, carry):
        dk_acc, dv_acc = carry
        q_blk = q_ref[0, pl.ds(j * block_q, block_q), :]
        do_blk = do_ref[0, pl.ds(j * block_q, block_q), :]
        lse_blk = lse_ref[0, 0, pl.ds(j * block_q, block_q)]
        di_blk = di_ref[0, 0, pl.ds(j * block_q, block_q)]
        s = jax.lax.dot_general(
            q_blk, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # (block_q, block_k)
        s = jnp.where(key_pos < valid_len, s, NEG_INF)
        if window > 0:
            q_pos = j * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0
            )
            keep = jnp.abs(q_pos - key_pos) <= window
            if global_cls:
                keep = keep | (q_pos == 0) | (key_pos == 0)
            s = jnp.where(keep, s, NEG_INF)
        p = jnp.exp(s - lse_blk[:, None])
        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(do_blk.dtype), do_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_blk, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - di_blk[:, None])
        dk_acc = dk_acc + jax.lax.dot_general(
            ds.astype(q_blk.dtype), q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk_acc, dv_acc

    n_blocks = seq_len // block_q
    if window > 0:
        lo = jnp.maximum((k_start - window) // block_q, 0)
        hi = jnp.minimum(
            (k_start + block_k - 1 + window) // block_q + 1, n_blocks
        )
        if global_cls:
            # the CLS-column k-block is attended by every q-block
            hi = jnp.where(k_start == 0, n_blocks, hi)
    else:
        lo, hi = 0, n_blocks
    z = jnp.zeros((block_k, d), jnp.float32)
    if window > 0 and global_cls:
        # every k-block also receives gradient from q-block 0 (CLS row):
        # one extra leading iteration remapped to q-block 0
        start = jnp.where(lo > 0, lo - 1, lo)
        dk, dv = jax.lax.fori_loop(
            start, hi,
            lambda i, c: body(jnp.where(i < lo, 0, i), c),
            (z, z),
        )
    else:
        dk, dv = jax.lax.fori_loop(lo, hi, body, (z, z))
    # keys past valid_len contribute p=0 rows → dk/dv already 0 there
    dk_ref[0] = (dk * sm_scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_backward(qf, kf, vf, lf, of, lse, dof,
                    block_q, block_k, interpret, window, global_cls=False):
    from jax.experimental.pallas import tpu as pltpu

    bh, s, d = qf.shape
    sm_scale = 1.0 / (d ** 0.5)
    di = jnp.sum(
        of.astype(jnp.float32) * dof.astype(jnp.float32), axis=-1
    )[:, None, :]  # (B*H, 1, S) — singleton satisfies Mosaic block rules

    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, s // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, lens: (i, j, 0)),
            pl.BlockSpec((1, s, d), lambda i, j, lens: (i, 0, 0)),
            pl.BlockSpec((1, s, d), lambda i, j, lens: (i, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda i, j, lens: (i, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda i, j, lens: (i, 0, j)),
            pl.BlockSpec((1, 1, block_q), lambda i, j, lens: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j, lens: (i, j, 0)
        ),
    )
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, block_k=block_k, sm_scale=sm_scale,
            window=window, global_cls=global_cls,
        ),
        grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct((bh, s, d), qf.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(lf, qf, kf, vf, dof, lse, di)

    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, s // block_k),
        in_specs=[
            pl.BlockSpec((1, block_k, d), lambda i, j, lens: (i, j, 0)),
            pl.BlockSpec((1, s, d), lambda i, j, lens: (i, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j, lens: (i, j, 0)),
            pl.BlockSpec((1, s, d), lambda i, j, lens: (i, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda i, j, lens: (i, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda i, j, lens: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda i, j, lens: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j, lens: (i, j, 0)),
        ],
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, block_q=block_q, sm_scale=sm_scale,
            window=window, global_cls=global_cls,
        ),
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, s, d), kf.dtype),
            jax.ShapeDtypeStruct((bh, s, d), vf.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(lf, kf, qf, vf, dof, lse, di)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_folded(qf, kf, vf, lf, block_q, block_k, interpret, window,
                  global_cls):
    out, _ = _flash_forward(
        qf, kf, vf, lf, block_q, block_k, interpret, window,
        save_residuals=False, global_cls=global_cls,
    )
    return out


def _flash_folded_fwd(qf, kf, vf, lf, block_q, block_k, interpret, window,
                      global_cls):
    out, lse = _flash_forward(
        qf, kf, vf, lf, block_q, block_k, interpret, window,
        save_residuals=True, global_cls=global_cls,
    )
    return out, (qf, kf, vf, lf, out, lse)


def _flash_folded_bwd(block_q, block_k, interpret, window, global_cls,
                      res, dof):
    import numpy as _np

    qf, kf, vf, lf, of, lse = res
    dq, dk, dv = _flash_backward(
        qf, kf, vf, lf, of, lse, dof, block_q, block_k, interpret, window,
        global_cls,
    )
    dlf = _np.zeros(lf.shape, dtype=jax.dtypes.float0)  # int arg: no grad
    return dq, dk, dv, dlf


_flash_folded.defvjp(_flash_folded_fwd, _flash_folded_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "interpret", "window",
                     "global_cls"),
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
    global_cls: bool = False,  # with window: position 0 global both ways
) -> jax.Array:
    """Blockwise exact attention, differentiable (custom_vjp with flash
    backward kernels). S must be a multiple of block sizes (callers pad to
    length buckets — which encode() does anyway, mirroring the reference's
    length-bucketed batching, sentence_encoder.py:138).

    ``mask`` must be contiguous (all 1s then all 0s); it is reduced to
    per-sequence lengths delivered through per-program SMEM scalars."""
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
    lf = jnp.repeat(lengths, h, axis=0)  # (B*H,) scalar-prefetch operand

    out = _flash_folded(
        qf, kf, vf, lf, block_q, block_k, interpret, window,
        global_cls and window > 0,
    )
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Head-packed attention for small head dims (d < 128): P = 128/d heads fold
# into the 128-lane dim per program. Per head, the score dot runs lane-MASKED
# q against the full packed K — every MXU op is full 128 lanes wide (a d=32
# dot alone uses 1/4 of the systolic array's contraction depth), softmax
# stays in VMEM (no (B,H,S,S) HBM traffic), and PV packs the outputs back
# into lanes. Costs P× redundant score FLOPs at full MXU rate — a net win
# whenever attention is small next to the QKV/MLP matmuls (short S), which
# is exactly the regime where the flash kernel's 32-lane ops lose to XLA
# (measured r2: MiniLM d=32 encode 27.7% MFU vs bert-base d=64 50.1%).
# ---------------------------------------------------------------------------

def _packed_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, sm_scale: float,
                   head_dim: int):
    """One program: G batch rows x ONE lane-packed head group. Lanes hold
    P=128/head_dim heads. q_ref/k_ref/v_ref/o_ref: (G, S, 128) — a direct
    view of the natural (B, S, H*D) activation layout (heads of a group
    are contiguous there), so NO host-side pack/unpack transposes exist:
    the v2 grouped kernel still lost to XLA because its (B,S,H,D)->(B*G,
    S,128) transposes moved ~as many HBM bytes as the score tensor it
    eliminated.

    Per row: the P heads' lane-masked queries STACK along the M dim into
    one (P*S, 128) operand, so scores and PV are each ONE full-width MXU
    dot (M=P*S, K=128) instead of 2P narrow-K ones; softmax runs
    uniformly over the stacked (P*S, S) scores."""
    g = q_ref.shape[0]
    seq_len = q_ref.shape[1]
    p_heads = 128 // head_dim
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // head_dim
    key_pos = jax.lax.broadcasted_iota(jnp.int32, (1, seq_len), 1)

    for gi in range(g):                # unrolled
        q = q_ref[gi]                  # (S, 128) input dtype (bf16 MXU)
        k = k_ref[gi]
        v = v_ref[gi]
        valid_len = len_ref[pl.program_id(0) * g + gi]
        key_valid = key_pos < valid_len

        qs = jnp.concatenate(
            [
                jnp.where(lane == p, q, jnp.zeros((), q.dtype))
                for p in range(p_heads)
            ],
            axis=0,
        )                              # (P*S, 128): head p in row block p
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                   # (P*S, S)
        s = jnp.where(key_valid, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        # exact-zero weights for masked keys (finite NEG_INF would give
        # exp(0)=1 on fully-masked rows and average V)
        pr = jnp.where(s > NEG_INF / 2, jnp.exp(s - m), 0.0)
        l = jnp.sum(pr, axis=-1, keepdims=True)
        pr = pr / jnp.where(l == 0.0, 1.0, l)
        o_all = jax.lax.dot_general(
            pr.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                              # (P*S, 128): row block p x ALL
                                       # heads' lanes; head p's answer
                                       # lives in its own lane block
        out = jnp.zeros((seq_len, 128), jnp.float32)
        for p in range(p_heads):
            out = out + jnp.where(
                lane == p, o_all[p * seq_len:(p + 1) * seq_len, :], 0.0
            )
        o_ref[gi] = out.astype(o_ref.dtype)


def _packed_forward(qv, kv, vv, lengths, interpret, head_dim):
    """qv/kv/vv: (B, S, G*128) views of the natural layout."""
    from jax.experimental.pallas import tpu as pltpu

    b, s, lanes_tot = qv.shape
    n_groups = lanes_tot // 128
    g = 8 if b % 8 == 0 else (4 if b % 4 == 0 else 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // g, n_groups),
        in_specs=[
            pl.BlockSpec((g, s, 128), lambda i, j, lens: (i, 0, j)),
            pl.BlockSpec((g, s, 128), lambda i, j, lens: (i, 0, j)),
            pl.BlockSpec((g, s, 128), lambda i, j, lens: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((g, s, 128), lambda i, j, lens: (i, 0, j)),
    )
    return pl.pallas_call(
        functools.partial(
            _packed_kernel, sm_scale=1.0 / (head_dim ** 0.5),
            head_dim=head_dim,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, lanes_tot), qv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(lengths, qv, kv, vv)


@functools.partial(
    jax.jit, static_argnames=("head_dim", "block_q", "interpret")
)
def packed_attention(
    q: jax.Array,  # (B, S, H, D), D * P == 128
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    head_dim: int = 32,
    block_q: int = 128,    # unused; kept for API compatibility
    interpret: bool = False,
) -> jax.Array:
    """Exact attention via the head-packed kernel; differentiable (the
    backward recomputes through the XLA reference formula — attention is
    a small share of training FLOPs at the short S this kernel targets).
    Requires D*P==128 and H % P == 0."""
    b, s, h, d = q.shape
    assert d == head_dim and 128 % d == 0 and h % (128 // d) == 0
    if mask is None:
        lengths = jnp.full((b,), s, jnp.int32)
    else:
        lengths = jnp.sum(mask.astype(jnp.int32), axis=1)
    return _packed_core(q, k, v, lengths, mask, d, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _packed_core(q, k, v, lengths, mask, d, interpret):
    b, s, h, _ = q.shape
    view = lambda x: x.reshape(b, s, h * d)   # free: heads contiguous
    out = _packed_forward(
        view(q), view(k), view(v), lengths, interpret, d
    )
    return out.reshape(b, s, h, d)


def _packed_core_fwd(q, k, v, lengths, mask, d, interpret):
    return _packed_core(q, k, v, lengths, mask, d, interpret), (q, k, v, mask)


def _packed_core_bwd(d, interpret, res, g_out):
    import numpy as _np

    q, k, v, mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: attention_reference(q_, k_, v_, mask), q, k, v
    )
    dq, dk, dv = vjp(g_out)
    dlen = _np.zeros((q.shape[0],), dtype=jax.dtypes.float0)
    dmask = (
        None if mask is None
        else _np.zeros(mask.shape, dtype=jax.dtypes.float0)
    )
    return dq, dk, dv, dlen, dmask


_packed_core.defvjp(_packed_core_fwd, _packed_core_bwd)


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
    performer_kernel: str = "softmax",
    performer_local_heads: int = 0,
    performer_local_window: int = 64,
    window_global_cls: bool = False,
    cp_axis: Optional[str] = None,
    segment_ids: Optional[jax.Array] = None,  # (B, S): block-diagonal
                                              # packing mask (reference/
                                              # auto≤2048 impl only)
) -> jax.Array:
    """Dispatching MHA. impl: auto | flash | reference | performer |
    ring | ulysses.

    ``flash`` requires no head_mask (pruning paths use ``reference``, which
    exposes attention probabilities to the head-mask gradient).
    ``performer`` needs a (m, head_dim) random-feature matrix; with
    ``performer_local_heads`` > 0 the first N heads run exact windowed
    attention while the rest stay linear (the reference's mixed
    local+global heads, fast_attention.py:257-307).
    ``ring``/``ulysses`` are the context-parallel strategies: q/k/v/mask
    carry this device's SEQUENCE slice and ``cp_axis`` names the mesh
    axis (must be called inside shard_map — models/long_context.py wires
    the full encoder)."""
    if segment_ids is not None and impl not in ("auto", "reference"):
        raise ValueError(
            "segment_ids (packed batches) is only supported by the "
            "reference/auto attention path"
        )
    if impl in ("ring", "ulysses"):
        if cp_axis is None:
            raise ValueError(f"impl={impl!r} needs cp_axis (inside shard_map)")
        if window or window_global_cls or causal:
            raise ValueError("context-parallel attention is full+non-causal")
        if mask is None:
            mask = jnp.ones(q.shape[:2], jnp.int32)
        if impl == "ring":
            from .ring_attention import ring_attention

            out = ring_attention(q, k, v, mask, cp_axis)
        else:
            from .ulysses import ulysses_attention

            out = ulysses_attention(q, k, v, mask, cp_axis)
        if head_mask is not None:
            out = out * head_mask[None, None, :, None].astype(out.dtype)
        return out
    if impl == "performer":
        from .performer import performer_attention, performer_attention_causal

        if performer_proj is None:
            raise ValueError("performer impl needs performer_proj features")

        def linear_part(q_, k_, v_):
            return (
                performer_attention_causal(
                    q_, k_, v_, performer_proj, mask,
                    kernel=performer_kernel,
                )
                if causal
                else performer_attention(
                    q_, k_, v_, performer_proj, mask,
                    kernel=performer_kernel,
                )
            )

        lh = min(performer_local_heads, q.shape[2])
        if lh > 0:
            local = attention_reference(
                q[:, :, :lh], k[:, :, :lh], v[:, :, :lh], mask,
                window=performer_local_window, global_cls=False,
                causal=causal,   # local heads must not leak future tokens
            )
            if lh < q.shape[2]:
                glob = linear_part(q[:, :, lh:], k[:, :, lh:], v[:, :, lh:])
                out = jnp.concatenate([local, glob], axis=2)
            else:
                out = local
        else:
            out = linear_part(q, k, v)
        if head_mask is not None:
            out = out * head_mask[None, None, :, None].astype(out.dtype)
        return out
    if impl == "auto":
        # Measured on v5e (MiniLM shapes, d=32 heads): the XLA path wins
        # at every S up to 2048 — over the plain flash kernel (32-lane
        # operands waste 3/4 of every load/VPU op) AND over the
        # head-packed kernel (r3: three packed variants measured; the
        # transpose-free one lands within 4% of XLA — 18.3k vs 19.0k
        # sent/s MiniLM encode — but its P-fold redundant score FLOPs +
        # lane-mask VPU work offset the full-lane MXU and score-HBM
        # savings; docs/ROUND3.md). Flash takes over where XLA's
        # materialized score tensor stops fitting: S≥4096. All paths are
        # differentiable (custom_vjp), so the choice is safe under
        # jax.grad.
        use_flash = (
            _on_tpu()
            and head_mask is None
            and segment_ids is None
            and q.shape[1] % 128 == 0
            and q.shape[1] >= 4096
        )
        impl = "flash" if use_flash else "reference"
    if impl == "packed":
        if head_mask is not None:
            raise ValueError("packed attention does not support head_mask")
        if window or window_global_cls:
            # silently computing FULL attention would diverge from the
            # banded flash/reference paths — fail loudly like flash does
            # for head_mask
            raise ValueError(
                "packed attention does not support sliding windows; use "
                "impl='flash' or 'reference' for windowed models"
            )
        return packed_attention(
            q, k, v, mask, head_dim=q.shape[3], interpret=not _on_tpu()
        )
    if impl == "flash":
        if head_mask is not None:
            raise ValueError("flash attention does not support head_mask")
        return flash_attention(
            q, k, v, mask, interpret=not _on_tpu(), window=window,
            global_cls=window_global_cls,
        )
    return attention_reference(
        q, k, v, mask, head_mask, window=window,
        global_cls=window_global_cls, segment_ids=segment_ids,
    )
