"""Fused cosine-similarity top-k kernels.

Replaces the reference's brute-force search path — per-query
``F.cosine_similarity`` + ``torch.topk`` over host-chunked corpora
(reference: src/pipeline/search_pipeline.py:73-88, src/utils/metrics.py:81-101)
— with a single Pallas kernel that streams an HBM-resident normalized
embedding matrix through VMEM and maintains a running top-k per query block.
The full (Q, N) score matrix never exists in HBM.

Two implementations:
- ``cosine_topk_xla``: chunked matmul + ``lax.top_k`` merge. Numerical
  oracle for tests and fallback on CPU.
- ``cosine_topk_pallas``: grid (q_blocks, corpus_blocks); corpus dim is the
  inner sequential axis, a VMEM scratch carries the running (block_q, k)
  winners across corpus blocks; merge is the exact two-stage lane-class
  reduction with detect-and-fallback (see _merge_block_topk).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = jnp.float32(-jnp.inf)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x / jnp.maximum(n, eps)).astype(x.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# XLA oracle / fallback
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def cosine_topk_xla(
    queries: jax.Array,  # (Q, D) — assumed L2-normalized
    corpus: jax.Array,   # (N, D) — assumed L2-normalized
    k: int = 10,
    chunk: int = 65536,
) -> Tuple[jax.Array, jax.Array]:
    """Chunked exact top-k; avoids materialising (Q, N) for large N."""
    q, n = queries.shape[0], corpus.shape[0]
    if n <= chunk:
        scores = jnp.einsum(
            "qd,nd->qn", queries, corpus, preferred_element_type=jnp.float32
        )
        return jax.lax.top_k(scores, k)

    pad_n = _round_up(n, chunk)
    corpus_p = jnp.pad(corpus, ((0, pad_n - n), (0, 0)))
    n_chunks = pad_n // chunk
    corpus_c = corpus_p.reshape(n_chunks, chunk, -1)

    def scan_chunk(carry, xs):
        best_s, best_i = carry
        c_blk, blk_idx = xs
        s = jnp.einsum(
            "qd,nd->qn", queries, c_blk, preferred_element_type=jnp.float32
        )
        idx = blk_idx * chunk + jnp.arange(chunk, dtype=jnp.int32)
        s = jnp.where(idx[None, :] < n, s, NEG_INF)
        cs, ci_local = jax.lax.top_k(s, k)
        ci = jnp.take(idx, ci_local)
        merged_s = jnp.concatenate([best_s, cs], axis=1)
        merged_i = jnp.concatenate([best_i, ci], axis=1)
        ms, mi_local = jax.lax.top_k(merged_s, k)
        mi = jnp.take_along_axis(merged_i, mi_local, axis=1)
        return (ms, mi), None

    init = (
        jnp.full((q, k), NEG_INF, jnp.float32),
        jnp.zeros((q, k), jnp.int32),
    )
    (best_s, best_i), _ = jax.lax.scan(
        scan_chunk, init, (corpus_c, jnp.arange(n_chunks, dtype=jnp.int32))
    )
    return best_s, best_i


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------
#
# The top-k merge is two-stage (exact): stage 1 folds the (block_q, W)
# candidate scores lane-wise into (block_q, chunk) per-lane-class maxima
# (~2 cheap VPU passes); stage 2 runs the k-round masked-max merge on the
# reduced set only (k rounds over `chunk`+k lanes instead of W+k — the
# round cost drops by W/chunk). Stage 1 can hide a true top-k candidate
# when two of them share a lane class, so stage 3 *detects* that exactly —
# count of candidates strictly above the new k-th winner must be < k — and
# reruns the k rounds at full width for the (rare) offending block. Net
# effect: exact results at ~6× less merge VPU work (the two-stage lever
# named in VERDICT.md #2).

_INT_MAX = 2**31 - 1


def _exact_merge_rounds(cand_s, cand_i, k: int):
    """k rounds of (row max → pick min id among maxima → mask) over the
    candidate set. Pure VPU ops; lowers on Mosaic (no dynamic slices)."""
    block_q = cand_s.shape[0]
    kcols = jax.lax.broadcasted_iota(jnp.int32, (block_q, k), 1)

    def round_fn(i, carry):
        cand, new_s, new_i = carry
        m = jnp.max(cand, axis=1)                       # (block_q,)
        hit = cand == m[:, None]
        picked = jnp.min(
            jnp.where(hit, cand_i, _INT_MAX), axis=1
        ).astype(jnp.int32)
        sel = kcols == i
        new_s = jnp.where(sel, m[:, None], new_s)
        new_i = jnp.where(sel, picked[:, None], new_i)
        cand = jnp.where(hit & (cand_i == picked[:, None]), -jnp.inf, cand)
        return cand, new_s, new_i

    init = (
        cand_s,
        jnp.zeros((block_q, k), jnp.float32),
        jnp.zeros((block_q, k), jnp.int32),
    )
    _, new_s, new_i = jax.lax.fori_loop(0, k, round_fn, init)
    return new_s, new_i


def _merge_block_topk(
    acc_s, acc_i, s_scr, s, ids_fn, k: int,
    reduce_chunk: int = 512,
    fb_width: int = 2048,
):
    """Merge this block's candidate scores ``s`` into the running top-k
    VMEM scratch (acc_s, acc_i) — exact.

    ``s_scr`` is a (block_q, W) VMEM scratch ref: the scores round-trip
    through it because Mosaic cannot lane-slice an MXU dot result directly
    (compiler abort), while static slices of a VMEM ref are plain loads.
    ``ids_fn(lo, hi)`` returns the candidate ids for columns [lo, hi) —
    either computed from iota (brute force) or sliced from an ids ref
    (IVF); it is never a slice of a compute result.

    Path: lane-class reduce (chunk-wide max, ~2 passes) → k cheap rounds
    over ``reduce_chunk``+k lanes → exactness check (count of candidates
    strictly above the new k-th winner must stay < k) → on the rare
    collision, an exact fallback merge in ``fb_width`` slices (full-width
    rounds at W=4096 also break the compiler)."""
    width = s.shape[1]
    acc_s_prev = acc_s[...]
    acc_i_prev = acc_i[...]
    if width % reduce_chunk != 0 or width < 2 * reduce_chunk:
        full_s = jnp.concatenate([acc_s_prev, s], axis=1)
        full_i = jnp.concatenate([acc_i_prev, ids_fn(0, width)], axis=1)
        new_s, new_i = _exact_merge_rounds(full_s, full_i, k)
        acc_s[...] = new_s
        acc_i[...] = new_i
        return

    s_scr[...] = s
    n_chunks = width // reduce_chunk
    red_v = s_scr[:, 0:reduce_chunk]
    red_i = ids_fn(0, reduce_chunk)
    for t in range(1, n_chunks):
        sl = s_scr[:, t * reduce_chunk:(t + 1) * reduce_chunk]
        il = ids_fn(t * reduce_chunk, (t + 1) * reduce_chunk)
        upd = sl > red_v
        red_v = jnp.where(upd, sl, red_v)
        red_i = jnp.where(upd, il, red_i)

    cand_s = jnp.concatenate([acc_s_prev, red_v], axis=1)
    cand_i = jnp.concatenate([acc_i_prev, red_i], axis=1)
    new_s, new_i = _exact_merge_rounds(cand_s, cand_i, k)
    # Exactness check: with thr = the new k-th winner, every candidate
    # strictly above thr must be among the REPORTED winners strictly
    # above thr. Comparing against k-1 instead would let a hidden
    # candidate slip through whenever some winner ties thr exactly
    # (duplicate documents): winners [.9, .5, .5] with a hidden .8 gives
    # cnt=2 <= k-1. Ties AT thr stay ambiguous, as in any top-k.
    thr = new_s[:, k - 1][:, None]
    cnt = (
        jnp.sum(s_scr[...] > thr, axis=1)
        + jnp.sum(acc_s_prev > thr, axis=1)
    )
    cnt_rep = jnp.sum(new_s > thr, axis=1)
    bad = jnp.any(cnt > cnt_rep)
    acc_s[...] = new_s
    acc_i[...] = new_i

    @pl.when(bad)
    def _fallback():
        fs, fi = acc_s_prev, acc_i_prev
        for off in range(0, width, fb_width):
            hi = min(off + fb_width, width)
            cs = jnp.concatenate([fs, s_scr[:, off:hi]], axis=1)
            ci = jnp.concatenate([fi, ids_fn(off, hi)], axis=1)
            fs, fi = _exact_merge_rounds(cs, ci, k)
        acc_s[...] = fs
        acc_i[...] = fi


def _topk_kernel(
    q_ref,      # (block_q, D)
    c_ref,      # (block_c, D)
    out_s_ref,  # (block_q, k)
    out_i_ref,  # (block_q, k)
    acc_s,      # VMEM scratch (block_q, k) f32
    acc_i,      # VMEM scratch (block_q, k) i32
    s_scr,      # VMEM scratch (block_q, merge_width) f32 — merge staging
    *,
    k: int,
    block_c: int,
    n_total: int,
    merge_width: int,
):
    j = pl.program_id(1)
    n_c_blocks = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_s[...] = jnp.full_like(acc_s, -jnp.inf)
        acc_i[...] = jnp.zeros_like(acc_i)

    # Corpus dtype picks the MXU mode: f32 corpus → f32 dot (bit-exact vs
    # the XLA oracle — this kernel doubles as the bench's recall oracle);
    # bf16 corpus → native bf16 MXU dot with f32 accumulation (scores then
    # carry bf16 input rounding ~0.4%, so near-ties can reorder — a
    # serving option, not an oracle). Measured at 1M×384 the two run at
    # the SAME QPS: the kernel is per-grid-step bound, not matmul bound
    # (docs/ROUND3.md) — hence block_c spans several merge_width slices,
    # each processed with its own proven-shape dot + merge (any (bq,
    # ≥4096) staged dot intermediate fails to compile).
    if c_ref.dtype == jnp.bfloat16:
        q = q_ref[...].astype(jnp.bfloat16)
    else:
        q = q_ref[...].astype(jnp.float32)
    block_q = q.shape[0]
    for off in range(0, block_c, merge_width):
        c = c_ref[off:off + merge_width, :]  # sublane ref slice: plain load
        c = c.astype(q.dtype)
        s = jax.lax.dot_general(
            q, c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, merge_width) f32
        col = jax.lax.broadcasted_iota(
            jnp.int32, (block_q, merge_width), 1
        )
        # Mask out padding rows beyond the true corpus size.
        s = jnp.where(j * block_c + off + col < n_total, s, -jnp.inf)

        def ids_fn(lo, hi, _off=off):
            return j * block_c + _off + lo + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, hi - lo), 1
            )

        _merge_block_topk(acc_s, acc_i, s_scr, s, ids_fn, k)

    @pl.when(j == n_c_blocks - 1)
    def _flush():
        out_s_ref[...] = acc_s[...]
        out_i_ref[...] = acc_i[...]


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_q", "block_c", "merge_width", "interpret"),
)
def cosine_topk_pallas(
    queries: jax.Array,  # (Q, D) L2-normalized
    corpus: jax.Array,   # (N, D) L2-normalized
    k: int = 10,
    # 256-query blocks halve the per-corpus-block merge + fixed costs
    # (48.6k QPS exact at 1M x 384 vs 41.5k at 128; 512 fails to compile).
    block_q: int = 256,
    # Per-grid-step corpus span. 2048 is the measured best: wider blocks
    # (chunked into merge_width dot+merge slices) either fail to compile
    # (every bc>=4096 config except bq128/bc4096) or run slower (41.3k vs
    # 49.4k QPS at bq128/bc4096) — the r3 sweep, docs/ROUND3.md.
    block_c: int = 2048,
    # widest span the two-stage merge compiles at (Mosaic rejects the
    # 4096-wide fallback rounds)
    merge_width: int = 2048,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    q_n, d = queries.shape
    n = corpus.shape[0]
    block_q = min(block_q, _round_up(q_n, 8))
    merge_width = min(merge_width, block_c)
    if block_c % merge_width:
        raise ValueError("block_c must be a multiple of merge_width")
    pad_q = _round_up(q_n, block_q)
    pad_n = _round_up(n, block_c)
    if pad_q != q_n:
        queries = jnp.pad(queries, ((0, pad_q - q_n), (0, 0)))
    if pad_n != n:
        corpus = jnp.pad(corpus, ((0, pad_n - n), (0, 0)))

    grid = (pad_q // block_q, pad_n // block_c)
    out_s, out_i = pl.pallas_call(
        functools.partial(
            _topk_kernel, k=k, block_c=block_c, n_total=n,
            merge_width=merge_width,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_c, d), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_q, k), lambda i, j: (i, 0)),
            pl.BlockSpec((block_q, k), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pad_q, k), jnp.float32),
            jax.ShapeDtypeStruct((pad_q, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, k), jnp.float32),
            pltpu.VMEM((block_q, k), jnp.int32),
            pltpu.VMEM((block_q, merge_width), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(queries, corpus)
    return out_s[:q_n], out_i[:q_n]


def _topk_fold_kernel(
    q_ref, c_ref, out_s_ref, out_i_ref, acc_s, acc_i,
    *, k: int, block_c: int, n_total: int,
):
    """Pass A of the certified two-pass scan: fold each corpus block's
    scores into a running per-lane-class max (one compare pass — no
    per-block k-round merge), k rounds once at the last block. A lane
    class (corpus position mod block_c) keeps one winner, so two true
    top-k docs sharing a class lose the weaker — pass B detects that."""
    j = pl.program_id(1)
    n_c = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_s[...] = jnp.full_like(acc_s, -jnp.inf)
        acc_i[...] = jnp.full_like(acc_i, -1)

    if c_ref.dtype == jnp.bfloat16:
        q = q_ref[...].astype(jnp.bfloat16)
    else:
        q = q_ref[...].astype(jnp.float32)
    c = c_ref[...].astype(q.dtype)
    s = jax.lax.dot_general(
        q, c, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_c)
    block_q = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_c), 1)
    ids = j * block_c + col
    s = jnp.where(ids < n_total, s, -jnp.inf)
    upd = s > acc_s[...]
    acc_s[...] = jnp.where(upd, s, acc_s[...])
    acc_i[...] = jnp.where(upd, ids, acc_i[...])

    @pl.when(j == n_c - 1)
    def _flush():
        new_s, new_i = _exact_merge_rounds(acc_s[...], acc_i[...], k)
        out_s_ref[...] = new_s
        out_i_ref[...] = new_i


def _topk_count_kernel(
    q_ref, c_ref, thr_ref, out_cnt_ref, acc,
    *, block_c: int, n_total: int,
):
    """Pass B: exact count of corpus scores strictly above each query's
    reported k-th winner. Equality with the reported count certifies the
    fold result (same strictly-above criterion as _merge_block_topk's
    per-block check)."""
    j = pl.program_id(1)
    n_c = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    if c_ref.dtype == jnp.bfloat16:
        q = q_ref[...].astype(jnp.bfloat16)
    else:
        q = q_ref[...].astype(jnp.float32)
    c = c_ref[...].astype(q.dtype)
    s = jax.lax.dot_general(
        q, c, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    block_q = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_c), 1)
    s = jnp.where(j * block_c + col < n_total, s, -jnp.inf)
    thr = thr_ref[:, 0:1]                       # (block_q, 1) ref slice
    cnt = jnp.sum((s > thr).astype(jnp.float32), axis=1)
    acc[...] = acc[...] + cnt[:, None]

    @pl.when(j == n_c - 1)
    def _flush():
        out_cnt_ref[...] = acc[...]


@functools.partial(
    jax.jit, static_argnames=("k", "block_q", "block_c", "interpret")
)
def cosine_topk_pallas_2pass(
    queries: jax.Array,  # (Q, D) L2-normalized
    corpus: jax.Array,   # (N, D) L2-normalized
    k: int = 10,
    block_q: int = 256,
    block_c: int = 2048,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Certified two-pass exact top-k.

    The one-pass kernel pays a k-round masked-max merge per corpus block
    (~80% of its per-step cost — docs/ROUND3.md). Here pass A replaces it
    with a per-lane-class running max (deferred merge, one k-round flush
    per query block) and pass B re-streams the corpus once to COUNT
    scores strictly above each reported k-th winner: a count mismatch
    means a lane-class collision hid a true winner, and the whole call
    falls back to the proven exact kernel (`lax.cond`). Exactness is
    certified at the computed score resolution (f32 dots for an f32
    corpus — the oracle mode; bf16-input rounding applies to bf16
    corpora, as in `cosine_topk_pallas`)."""
    q_n, d = queries.shape
    n = corpus.shape[0]
    block_q = min(block_q, _round_up(q_n, 8))
    pad_q = _round_up(q_n, block_q)
    pad_n = _round_up(n, block_c)
    q_p = jnp.pad(queries, ((0, pad_q - q_n), (0, 0))) if pad_q != q_n else queries
    c_p = jnp.pad(corpus, ((0, pad_n - n), (0, 0))) if pad_n != n else corpus

    grid = (pad_q // block_q, pad_n // block_c)
    out_s, out_i = pl.pallas_call(
        functools.partial(
            _topk_fold_kernel, k=k, block_c=block_c, n_total=n
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_c, d), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_q, k), lambda i, j: (i, 0)),
            pl.BlockSpec((block_q, k), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pad_q, k), jnp.float32),
            jax.ShapeDtypeStruct((pad_q, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, block_c), jnp.float32),
            pltpu.VMEM((block_q, block_c), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_p, c_p)

    thr = out_s[:, k - 1]
    thr_in = jnp.broadcast_to(thr[:, None], (pad_q, 128))
    cnt = pl.pallas_call(
        functools.partial(_topk_count_kernel, block_c=block_c, n_total=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_c, d), lambda i, j: (j, 0)),
            pl.BlockSpec((block_q, 128), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_q, 128), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((pad_q, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_q, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_p, c_p, thr_in)[:, 0]

    cnt_rep = jnp.sum(
        (out_s > thr[:, None]).astype(jnp.float32), axis=1
    )
    valid = jnp.arange(pad_q) < q_n
    ok = jnp.all(jnp.where(valid, cnt == cnt_rep, True))

    def _fast(_):
        return out_s[:q_n], out_i[:q_n]

    def _exact(_):
        # keep the caller's geometry: both cond branches are traced, so a
        # default block_c here could fail to compile even when the
        # fallback never runs at runtime
        return cosine_topk_pallas(
            queries, corpus, k=k, block_q=block_q, block_c=block_c,
            merge_width=min(block_c, 2048), interpret=interpret,
        )

    return jax.lax.cond(ok, _fast, _exact, None)


def cosine_topk(
    queries: jax.Array,
    corpus: jax.Array,
    k: int = 10,
    impl: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    """Fused cosine top-k with auto dispatch (pallas on TPU, XLA elsewhere).

    Inputs must be L2-normalized (use :func:`l2_normalize`)."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return cosine_topk_pallas(queries, corpus, k)
    return cosine_topk_xla(queries, corpus, k)


def topk_merge(
    scores: jax.Array,  # (..., S, k) — S shards
    indices: jax.Array,  # (..., S, k)
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Merge per-shard top-k results (after an all-gather over the index
    axis) into global top-k. Shapes: leading dims broadcast, S*k candidates."""
    *lead, s, kk = scores.shape
    flat_s = scores.reshape(*lead, s * kk)
    flat_i = indices.reshape(*lead, s * kk)
    ms, mloc = jax.lax.top_k(flat_s, k)
    mi = jnp.take_along_axis(flat_i, mloc, axis=-1)
    return ms, mi


# ---------------------------------------------------------------------------
# Int8-corpus variant: corpus stored int8 (+ per-row scales) in HBM — 4×
# less memory/bandwidth; dequantization happens on-chip in the kernel.
# Backs the int8 serving path (reference's onnxruntime int8 engine,
# SURVEY.md §2.1) at kernel level.
# ---------------------------------------------------------------------------

def _topk_int8_kernel(
    q_ref,       # (block_q, D) f32
    c_ref,       # (block_c, D) int8
    scale_ref,   # (1, block_c) f32 per-row scales
    out_s_ref, out_i_ref,
    acc_s, acc_i, s_scr,
    *,
    k: int,
    block_c: int,
    n_total: int,
):
    j = pl.program_id(1)
    n_c_blocks = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_s[...] = jnp.full_like(acc_s, -jnp.inf)
        acc_i[...] = jnp.zeros_like(acc_i)

    q = q_ref[...].astype(jnp.float32)
    c = c_ref[...].astype(jnp.float32)          # on-chip dequant (VPU)
    s = jax.lax.dot_general(
        q, c, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale_ref[0][None, :]
    block_q = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_c), 1)
    global_idx = j * block_c + col
    s = jnp.where(global_idx < n_total, s, -jnp.inf)

    def ids_fn(lo, hi):
        return j * block_c + lo + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, hi - lo), 1
        )

    _merge_block_topk(acc_s, acc_i, s_scr, s, ids_fn, k)

    @pl.when(j == n_c_blocks - 1)
    def _flush():
        out_s_ref[...] = acc_s[...]
        out_i_ref[...] = acc_i[...]


@functools.partial(
    jax.jit, static_argnames=("k", "block_q", "block_c", "interpret")
)
def cosine_topk_pallas_int8(
    queries: jax.Array,        # (Q, D) f32 L2-normalized
    corpus_q: jax.Array,       # (N, D) int8
    corpus_scale: jax.Array,   # (N,) f32 per-row scale
    k: int = 10,
    block_q: int = 256,
    block_c: int = 2048,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    q_n, d = queries.shape
    n = corpus_q.shape[0]
    block_q = min(block_q, _round_up(q_n, 8))
    pad_q = _round_up(q_n, block_q)
    pad_n = _round_up(n, block_c)
    if pad_q != q_n:
        queries = jnp.pad(queries, ((0, pad_q - q_n), (0, 0)))
    if pad_n != n:
        corpus_q = jnp.pad(corpus_q, ((0, pad_n - n), (0, 0)))
        corpus_scale = jnp.pad(corpus_scale, ((0, pad_n - n),))
    scales2d = corpus_scale.reshape(1, pad_n)

    grid = (pad_q // block_q, pad_n // block_c)
    out_s, out_i = pl.pallas_call(
        functools.partial(
            _topk_int8_kernel, k=k, block_c=block_c, n_total=n
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_c, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, block_c), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((block_q, k), lambda i, j: (i, 0)),
            pl.BlockSpec((block_q, k), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pad_q, k), jnp.float32),
            jax.ShapeDtypeStruct((pad_q, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, k), jnp.float32),
            pltpu.VMEM((block_q, k), jnp.int32),
            pltpu.VMEM((block_q, block_c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(queries, corpus_q, scales2d)
    return out_s[:q_n], out_i[:q_n]
