"""IVF (inverted-file / clustered) ANN index — TPU-native replacement for
the reference's hnswlib HNSW graph index (reference:
src/pipeline/search_pipeline.py:96-175; config knobs ef/ef_construction/M →
num_clusters/num_probes, SearchConfiguration config.py:40-44).

Design (SURVEY.md §2.1, §7 stage 6):

- **Build** on device: spherical k-means (ops/kmeans.py) → clusters laid out
  as a padded (C, Mc, D) tensor + (C, Mc) id map, so every cluster scan is a
  static-shape MXU matmul. Rows overflowing a cluster's Mc slots go to
  append-only *overflow clusters* that every query scans — recall never
  silently drops from capping.
- **Query**: centroid matmul → top-P probe lists; then
  - XLA path (oracle/CPU/sharded): gather probed clusters, masked top-k;
  - Pallas path: grid (query_blocks, probes); the probed cluster id is
    *scalar-prefetched* and drives the BlockSpec index_map, so cluster
    blocks stream HBM→VMEM only for probed clusters while a VMEM scratch
    carries the running top-k (same merge as ops/topk).
  Queries in a block share a probe list (the union approximated by top-U of
  the block-max centroid scores) — scanning a colleague's cluster only adds
  candidates, never removes.
"""

from __future__ import annotations

import functools
import math
import os
import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import IndexConfig
from ..ops.kmeans import kmeans, assign_clusters, assign_clusters_topk
from ..ops.topk import (
    l2_normalize,
    topk_merge,
    _exact_merge_rounds as _topk_exact_merge_rounds,
)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _approx_merge_plan(
    k_scan: int, mc: int, approx_width: int,
    max_slots: int = 4, tol: float = 0.005,
) -> Tuple[int, int]:
    """Size the deferred lane-class fold from the query geometry.

    Returns ``(approx_width, acc_slots)`` — or ``(0, 1)`` meaning "use the
    exact two-stage merge instead". The fold keeps the top-``acc_slots``
    scores per lane class; a true top-k hit is lost iff >= acc_slots
    stronger hits share its class, so the expected relative recall loss is
    ~ k^S / ((S+1)! * w^S). We pick the smallest S that bounds the loss at
    ``tol`` AND can hold k candidates (k <= S*w) AND keeps the slot stride
    lane-aligned (Mosaic slices at offset S*w need w % 128 == 0 for S > 1
    — ADVICE r3). Small-Mc / huge-k geometries where no S qualifies fall
    back to the exact merge — which is what bounded the round-3 failure
    (k=50 at Mc~300 lost 7% recall through a single-slot fold)."""
    w = min(approx_width, mc) if approx_width else 0
    if w and mc % w:
        w = mc
    if not w:
        return 0, 1
    # tol=None = capacity-gated only: take the LARGEST feasible slot count
    # (minimum loss) — used when the caller insists on the deferred path
    sizes = range(max_slots, 0, -1) if tol is None else range(1, max_slots + 1)
    for s in sizes:
        if k_scan > s * w:
            continue
        if s > 1 and w % 128:
            continue
        if (
            tol is None
            or k_scan ** s / (math.factorial(s + 1) * w ** s) <= tol
        ):
            return w, s
    return 0, 1


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_set_donated(flat, slots, rows):
    return flat.at[slots].set(rows)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_set_1d_donated(flat, slots, vals):
    return flat.at[slots].set(vals)


_BUILD_SCATTER_CHUNK = 1 << 20


def _scatter_rows_chunked(slots, row_chunk, n, total_slots, width, dtype,
                          chunk=_BUILD_SCATTER_CHUNK):
    """Scatter n rows into a (total_slots, width) slab with bounded peak
    memory: the slab is DONATED through each jitted chunk update (the
    eager ``flat.at[slots].set(rows)`` allocates input + output slabs —
    2× slab + the full row matrix — which is what OOM'd the 4M×384
    single-chip build, docs/ROUND3.md). ``row_chunk(i, j)`` materializes
    rows [i, j) on demand (e.g. a per-chunk dtype cast), so peak =
    slab + one chunk."""
    flat = jnp.zeros((total_slots, width), dtype)
    for i in range(0, n, chunk):
        j = min(i + chunk, n)
        flat = _scatter_set_donated(flat, slots[i:j], row_chunk(i, j))
    return flat


def _affinity_group_perm(centroids: np.ndarray, group: int) -> np.ndarray:
    """Permutation putting mutually-similar clusters into consecutive
    length-``group`` runs (hierarchical greedy max-similarity matching).

    Grouped storage fetches ``group`` clusters per scan step; affinity
    ordering makes the members of each fetched slab the clusters a query
    tends to co-probe, so forced-pair fetches waste little coverage.
    Requires ``group`` a power of two and ``len(centroids) % group == 0``
    (build() rounds the cluster count accordingly)."""
    c = centroids.shape[0]
    if group & (group - 1):
        raise ValueError("group must be a power of two")
    if c % group:
        raise ValueError("cluster count must be a multiple of group")
    members = np.arange(c, dtype=np.int64)[:, None]      # (n_groups, size)
    reps = centroids.astype(np.float64)
    size = 1
    while size < group:
        n = reps.shape[0]
        sims = reps @ reps.T
        iu, ju = np.triu_indices(n, 1)
        order = np.argsort(-sims[iu, ju], kind="stable")
        used = np.zeros(n, bool)
        pair_a = np.empty(n // 2, np.int64)
        pair_b = np.empty(n // 2, np.int64)
        got = 0
        for a, b in zip(iu[order], ju[order]):
            if used[a] or used[b]:
                continue
            used[a] = used[b] = True
            pair_a[got], pair_b[got] = a, b
            got += 1
            if got == n // 2:
                break
        members = np.concatenate(
            [members[pair_a], members[pair_b]], axis=1
        )
        merged = reps[pair_a] + reps[pair_b]
        reps = merged / np.maximum(
            np.linalg.norm(merged, axis=1, keepdims=True), 1e-9
        )
        size *= 2
    return members.reshape(-1)


def _group_max(scores: jax.Array, group: int) -> jax.Array:
    """(B, C) per-centroid sims → (B, C/group) per-slab probe scores."""
    if group == 1:
        return scores
    b, c = scores.shape
    return jnp.max(scores.reshape(b, c // group, group), axis=2)


class IVFIndex:
    def __init__(
        self,
        centroids: jax.Array,     # (C, D)
        data_padded: jax.Array,   # (C_tot, Mc, D) — C_tot = C + overflow
        ids_padded: jax.Array,    # (C_tot, Mc) int32, -1 = pad
        num_base_clusters: int,
        config: IndexConfig,
        scales_padded: Optional[jax.Array] = None,  # (C_tot, Mc) f32 when
                                                    # data_padded is int8
        rescore_data: Optional[jax.Array] = None,   # (N, D) exact rows for
                                                    # the two-pass refine
        group: int = 1,           # clusters per stored scan slab: arrays
                                  # hold (C_tot/group, group*Mc, D) with
                                  # affinity-ordered clusters, so one grid
                                  # step scans `group` co-probed clusters
                                  # (the scan is bound by a fixed per-step
                                  # cost — docs/ROUND3.md)
    ):
        self.centroids = centroids
        self.data_padded = data_padded
        self.ids_padded = ids_padded
        self.scales_padded = scales_padded
        self.rescore_data = rescore_data
        self.group = group
        if data_padded.shape[1] % group:
            raise ValueError("slab width must be a multiple of group")
        if group > 1 and num_base_clusters % group:
            raise ValueError("num_base_clusters must be a multiple of group")
        # true per-cluster capacity (slots), independent of grouping
        self.cluster_cap = data_padded.shape[1] // group
        self.num_base_clusters = num_base_clusters
        # overflow/pad scan slabs appended to every probe list
        self.num_overflow = (
            data_padded.shape[0] - num_base_clusters // group
        )
        self.config = config
        # Host mirror of the flat ids slab, maintained by add()/remove():
        # without it every add() pays a full ids readback through the
        # relay + a fresh free-slot scan, which is why small-batch churn
        # measured 2.8x slower than one big batch (drives/churn.py).
        # None = not fetched yet; add() populates it lazily.
        self._ids_host: Optional[np.ndarray] = None
        # Sentinel layout (derived from shape, so persistence is free):
        # stored rows carry one extra trailing column — +2 for live rows,
        # 0 for pad/removed slots. Queries append a 1, so every live
        # score lands in [1, 3] and every dead slot scores 0: the scan
        # kernel no longer needs the per-step (1, 1, Mc) ids operand
        # (the per-grid-step fixed cost is per-OPERAND — docs/ROUND3.md),
        # computing slot ids from the scalar-prefetched probe id instead.
        self.sentinel = data_padded.shape[-1] == centroids.shape[-1] + 1

    # ------------------------------------------------------------------
    # Build
    # ------------------------------------------------------------------

    @classmethod
    def build(
        cls,
        corpus,                    # (N, D) L2-normalized
        config: IndexConfig = IndexConfig(),
        key: Optional[jax.Array] = None,
        data_dtype=jnp.float32,
        spill_choices: int = 3,
        sentinel: Optional[bool] = None,  # default: OFF. The idless scan
                                          # (sentinel column instead of a
                                          # streamed ids operand) measured
                                          # SLOWER on HW: the +1 column
                                          # widens a 128-aligned row
                                          # (384→385 pads to 512 lanes),
                                          # costing more than the tiny
                                          # (1,1,Mc) ids operand it removes
                                          # (docs/ROUND3.md). Explicit
                                          # option only; int8 can't carry
                                          # one (the per-row dequant scale
                                          # would warp it)
        group: int = 1,            # clusters per stored scan slab (power
                                   # of two). >1 fetches `group` affinity-
                                   # ordered clusters per grid step: the
                                   # scan's fixed per-step cost amortizes
                                   # over group× the coverage while probe
                                   # GRANULARITY stays at single-cluster
                                   # k-means cells (pair score = max of
                                   # member centroid sims) — unlike just
                                   # building fewer/bigger clusters, which
                                   # collapses recall (docs/ROUND3.md)
        keep_rescore: Optional[bool] = None,  # default: on for int8 builds
        rescore_dtype=jnp.bfloat16,  # rescore copy adds memory on top of
                                     # the int8 payload (bf16: 2 B/elem =
                                     # 0.75 GB at 1M×384; f32 doubles
                                     # that). Measured on the 1M bench
                                     # corpus bf16 rescore matches f32
                                     # recall (0.9934 vs 0.9914) — int8
                                     # scan error dominates, not bf16's
                                     # 0.4% resolution. Pass f32 for an
                                     # oracle-exact refine stage.
    ) -> "IVFIndex":
        """Build with a spill-balanced layout: rows overflowing their
        cluster's Mc slots go to their 2nd/3rd nearest centroid's free
        slots (probes usually cover those too); only the residue lands in
        always-scanned overflow clusters. The default cap (4× the mean
        cluster size) makes spills rare — recall stays at the pure-
        assignment level; set ``max_cluster_size`` lower to trade a little
        recall for a tighter (less HBM per probe) layout."""
        corpus = jnp.asarray(corpus)
        n, d = corpus.shape
        c = min(config.num_clusters, max(n // 32, 1))
        if group > 1:
            if group & (group - 1):
                raise ValueError("group must be a power of two")
            c = max(group, c // group * group)
        centroids, _ = kmeans(corpus, c, iters=config.kmeans_iters, key=key)
        if group > 1:
            perm = _affinity_group_perm(
                np.asarray(jax.device_get(centroids)), group
            )
            centroids = centroids[jnp.asarray(perm)]
        spill_choices = min(spill_choices, c)
        choices = np.asarray(
            assign_clusters_topk(corpus, centroids, topk=spill_choices)
        ).T  # device shape is (topk, N) — lane-padding-friendly; host .T

        mean_sz = max(int(np.ceil(n / c)), 1)
        first_counts = np.bincount(choices[:, 0], minlength=c)
        if config.max_cluster_size:
            # capacity above the densest cluster is pure padding
            mc = min(config.max_cluster_size, int(first_counts.max()))
        else:
            mc = min(int(first_counts.max()), 4 * mean_sz)
        # Large clusters round up to 512 so the query kernel's two-stage
        # lane-class merge applies (ops/topk._merge_block_topk needs
        # Mc % 512 == 0); small ones stay 8-aligned for Mosaic tiling.
        mc = _round_up(max(mc, 8), 512 if mc >= 1024 else 8)

        # Greedy balanced placement on host (ids only; vectors stay on
        # device): pass 1 fills first choices up to cap, later passes
        # spill capped rows to their next-best cluster with space.
        slot_of_row = np.full(n, -1, np.int64)
        fill = np.zeros(c, np.int64)
        for col in range(spill_choices):
            todo = np.nonzero(slot_of_row < 0)[0]
            if todo.size == 0:
                break
            cand = choices[todo, col]
            order = np.argsort(cand, kind="stable")
            rows_sorted = todo[order]
            cand_sorted = cand[order]
            # rank of each row within its candidate cluster group
            starts = np.searchsorted(cand_sorted, np.arange(c))
            rank = np.arange(cand_sorted.size) - starts[cand_sorted]
            space = mc - fill[cand_sorted]
            take = rank < space
            taken_rows = rows_sorted[take]
            taken_cl = cand_sorted[take]
            slot_of_row[taken_rows] = taken_cl * mc + fill[taken_cl] + rank[take]
            fill += np.bincount(taken_cl, minlength=c)

        leftover = np.nonzero(slot_of_row < 0)[0]
        n_over = leftover.size
        e = (n_over + mc - 1) // mc if n_over else 0
        e = _round_up(e, group)    # overflow region pads to a slab boundary
        if n_over:
            slot_of_row[leftover] = c * mc + np.arange(n_over)
        c_tot = c + e

        slot_dev = jnp.asarray(slot_of_row, jnp.int32)
        scales_padded = None
        is_int8 = config.quantize_int8 or data_dtype == jnp.int8
        if sentinel is None:
            sentinel = False
        if sentinel and is_int8:
            raise ValueError("sentinel layout is incompatible with int8")
        if is_int8:
            from ..compress.quantize import quantize_embeddings_int8

            # quantize per scatter chunk: the one-shot path upcasts the
            # FULL corpus to f32 (a 12 GB transient at 8M×384) before
            # rounding — chunking bounds that to one chunk
            flat = jnp.zeros((c_tot * mc, d), jnp.int8)
            sflat = jnp.zeros((c_tot * mc,), jnp.float32)
            for i in range(0, n, _BUILD_SCATTER_CHUNK):
                j = min(i + _BUILD_SCATTER_CHUNK, n)
                qc, sc = quantize_embeddings_int8(corpus[i:j])
                flat = _scatter_set_donated(flat, slot_dev[i:j], qc)
                sflat = _scatter_set_1d_donated(sflat, slot_dev[i:j], sc)
            scales_padded = sflat.reshape(c_tot, mc)
        else:
            width = d + 1 if sentinel else d

            def row_chunk(i, j):
                rows = corpus[i:j].astype(data_dtype)
                if sentinel:
                    rows = jnp.concatenate(
                        [rows, jnp.full((j - i, 1), 2.0, data_dtype)], axis=1
                    )
                return rows

            flat = _scatter_rows_chunked(
                slot_dev, row_chunk, n, c_tot * mc, width, data_dtype
            )
        ids_flat = np.full((c_tot * mc,), -1, np.int32)
        ids_flat[slot_of_row] = np.arange(n, dtype=np.int32)

        if keep_rescore is None:
            keep_rescore = scales_padded is not None
        n_slabs = c_tot // group
        # donated reshape: the eager 2-D → 3-D reshape allocates a second
        # full slab (6.4 GB at 8M rows — the last OOM of the 8M build);
        # donation lets XLA alias it as a bitcast
        flat = jax.jit(
            lambda x: x.reshape(n_slabs, group * mc, x.shape[1]),
            donate_argnums=0,
        )(flat)
        return cls(
            centroids=centroids,
            data_padded=flat,
            ids_padded=jnp.asarray(ids_flat.reshape(n_slabs, group * mc)),
            num_base_clusters=c,
            config=config,
            scales_padded=(
                scales_padded.reshape(n_slabs, group * mc)
                if scales_padded is not None else None
            ),
            rescore_data=(
                corpus.astype(rescore_dtype) if keep_rescore else None
            ),
            group=group,
        )

    # ------------------------------------------------------------------
    # Probe selection
    # ------------------------------------------------------------------

    def _probe_ids(self, queries: jax.Array, probes: int) -> jax.Array:
        """(B, P) probe-slab ids per query (base slabs only). With
        ``group > 1`` a slab's score is the max of its member-centroid
        sims — single-cluster probe granularity over grouped storage."""
        scores = jnp.einsum(
            "bd,cd->bc", queries, self.centroids,
            preferred_element_type=jnp.float32,
        )
        scores = _group_max(scores, self.group)
        _, ids = jax.lax.top_k(scores, probes)
        return ids.astype(jnp.int32)

    # ------------------------------------------------------------------
    # Query — XLA path (oracle / CPU / building block for sharded)
    # ------------------------------------------------------------------

    def query_xla(
        self, queries, k: int = 10, probes: Optional[int] = None,
        chunk_q: int = 16,
    ) -> Tuple[jax.Array, jax.Array]:
        probes = min(
            probes or self.config.num_probes,
            self.num_base_clusters // self.group,
        )
        q = l2_normalize(jnp.asarray(queries))
        return _ivf_query_xla(
            q, self.centroids, self.data_padded, self.ids_padded,
            self.scales_padded, self.num_base_clusters, k, probes, chunk_q,
            self.group,
        )

    # ------------------------------------------------------------------
    # Query — Pallas fast path
    # ------------------------------------------------------------------

    def query(
        self, queries, k: int = 10, probes: Optional[int] = None,
        block_q: int = 32, union_factor: int = 3, impl: str = "auto",
        k_coarse: int = 0, per_probe: bool = False,
        approx_width: int = 0,     # >0: deferred-merge scan — per-lane-
                                   # class running max per probe, ONE
                                   # k-round merge per query block
                                   # (expected recall cost ~k²/2/width;
                                   # the big QPS lever — _ivf_body)
        probes_per_step: int = 1,  # >1 (approx only): scan P probed
                                   # clusters per grid step (measured
                                   # slower on v5e; kept as an option)
        final_merge: str = "auto",  # "kernel" | "xla" | "auto": where the
                                    # deferred-merge accumulator's top-k
                                    # runs. "xla" emits the raw (B, w)
                                    # accs and selects with one lax.top_k
                                    # (k-invariant kernel cost) — HW A/B
                                    # at k=100: 201.7k QPS vs 254.5k for
                                    # the once-per-block kernel merge at
                                    # identical recall (XLA's sort-based
                                    # top_k over (16k, 2048) costs more
                                    # than the amortized k rounds), so
                                    # auto == "kernel"; "xla" kept for
                                    # k > 2048 or spread distributions
                                    # (with acc_slots=2).
        acc_slots: int = 0,         # 0=auto: _approx_merge_plan sizes the
                                    # lane-class slot count from (k, Mc) —
                                    # collision loss ~k^{S+1}/(S+1)!w^S —
                                    # falling back to the exact merge when
                                    # no slot count bounds the loss.
        dma_buffers: int = 2,        # DMA buffer depth (2-4) for the
                                     # manual pipeline below
        dma_pipeline: bool = False,  # manually double-buffered probe DMA
                                     # (one grid step per query block;
                                     # _ivf_kernel_dma) — the r4 A/B
                                     # against the auto-pipelined scan's
                                     # per-step fixed cost
    ) -> Tuple[jax.Array, jax.Array]:
        """One fused jitted call: normalize → probe-union → Pallas scan.
        (Eager intermediate ops would each cost a device round trip —
        measured 10× QPS loss through a remote-device relay.)"""
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if approx_width and per_probe:
            raise ValueError("approx_width and per_probe are exclusive")
        if final_merge in ("xla", "xla_approx", "packed") and not (
            approx_width and not per_probe and probes_per_step == 1
        ):
            raise ValueError(
                "final_merge='xla' needs the plain deferred-merge path "
                "(approx_width > 0, no per_probe/probes_per_step)"
            )
        # NOTE on tuning: ``union_factor=1`` is the bench operating point
        # for C=2048/p=56 — with fewer probes (e.g. IndexConfig.auto's
        # p≈C/37) a 64-query block's shared union needs the default
        # union_factor=3 headroom (measured: recall 0.56 at union=32 vs
        # 0.98 at union=64 on a 200k corpus, C=1024 — coverage, not the
        # merge; the deferred merge itself matches the exact merge at
        # every measured Mc incl. 776).
        if impl == "xla":
            return self.query_xla(queries, k, probes)
        n_slabs = self.num_base_clusters // self.group
        probes = min(probes or self.config.num_probes, n_slabs)
        q = jnp.asarray(queries)
        b = q.shape[0]
        block_q = min(block_q, b)
        union = min(_round_up(probes * union_factor, 8), n_slabs)
        if k_coarse == 0 and self.rescore_data is not None:
            k_coarse = 2 * k      # measured: matches 4k recall, cheaper merge
        mc = self.data_padded.shape[1]
        w = min(approx_width, mc) if approx_width else 0
        if w and mc % w:
            w = mc                # pallas clamps the same way
        k_scan = k_coarse if (
            self.rescore_data is not None and k_coarse > k
        ) else k
        if dma_pipeline and mc % 128 and jax.default_backend() == "tpu":
            # the manual ids-row DMA lane-slices the HBM operand at width
            # Mc — Mosaic requires 128-aligned slices on hardware (found
            # on-chip at Mc=360; interpret mode tolerates it). The default
            # auto-pipelined scan returns identical results, so degrade
            # rather than crash the serving path.
            warnings.warn(
                f"dma_pipeline needs a 128-aligned cluster width on TPU "
                f"(Mc={mc}); falling back to the auto-pipelined scan"
            )
            dma_pipeline = False
        if dma_pipeline:
            # the DMA kernel always folds at full slab width with its own
            # in-kernel merge — a final_merge override would be silently
            # ignored by the branch order in _ivf_query_fused
            if final_merge not in ("auto", "kernel"):
                raise ValueError(
                    "dma_pipeline uses the in-kernel merge; "
                    f"final_merge={final_merge!r} would be ignored"
                )
            if acc_slots == 0:
                # size the slot count for the full-width fold; fall back
                # to the minimum-loss feasible plan when tolerance fails
                # (the DMA kernel has no exact-merge form)
                w_dma, acc_slots = _approx_merge_plan(k_scan, mc, mc)
                if w_dma == 0:
                    w_dma, acc_slots = _approx_merge_plan(
                        k_scan, mc, mc, tol=None
                    )
                if w_dma == 0:
                    raise ValueError(
                        f"k={k_scan} too large for the full-width DMA fold "
                        f"at Mc={mc}; use the default pipeline (exact merge)"
                    )
        elif w and acc_slots == 0 and not per_probe and probes_per_step == 1:
            # collision-loss-aware slot sizing (r3 fix: a single-slot fold
            # at k=50/Mc~300 lost 7% recall); no qualifying slot count ⇒
            # exact-merge fallback. An explicit "xla" merge falls back to
            # the capacity-gated plan — the user asked for the deferred
            # accumulator, so give them the minimum-loss feasible one.
            w_req = w
            w, acc_slots = _approx_merge_plan(k_scan, mc, w_req)
            if w == 0 and final_merge in ("xla", "xla_approx", "packed"):
                w, acc_slots = _approx_merge_plan(
                    k_scan, mc, w_req, tol=None
                )
            if w == 0:
                if final_merge in ("xla", "xla_approx", "packed"):
                    raise ValueError(
                        f"k={k_scan} is too large for the deferred "
                        f"accumulator at cluster width {mc}; use "
                        f"approx_width=0 (exact merge) or a wider index"
                    )
                approx_width = 0
                acc_slots = 1
            else:
                approx_width = w
        if acc_slots == 0:
            acc_slots = 1
        # the multiprobe and DMA kernels fold at full slab width Mc, not at
        # the user-requested approx_width — guard against the accumulator
        # they actually allocate
        guard_w = mc if (dma_pipeline or probes_per_step > 1) else w
        if guard_w and w and k_scan > acc_slots * guard_w:
            # a k wider than the accumulator would return -inf/-1 tails —
            # a silent recall cliff (ADVICE r3); fail loudly instead
            raise ValueError(
                f"k={k_scan} exceeds the deferred accumulator "
                f"({acc_slots}×{guard_w}); pass approx_width=0 or more "
                f"acc_slots"
            )
        if final_merge == "auto":
            # the once-per-block in-kernel k-round merge won every HW A/B
            # incl. k=100 (254.5k vs 201.7k QPS, docs/ROUND3.md); "xla"
            # stays available for k > the merge-round budget
            final_merge = "kernel"
        s, i = _ivf_query_fused(
            q, self.centroids, self.data_padded, self.ids_padded,
            self.scales_padded,
            self.num_base_clusters, k, probes, block_q, union,
            jax.default_backend() != "tpu",
            rescore_data=self.rescore_data, k_coarse=k_coarse,
            per_probe=per_probe, approx_width=approx_width,
            probes_per_step=probes_per_step, group=self.group,
            final_merge=final_merge, acc_slots=acc_slots,
            dma_pipeline=dma_pipeline, dma_buffers=dma_buffers,
        )
        return s[:b], i[:b]

    # ------------------------------------------------------------------
    # Incremental insert (hnswlib add_items on a built index,
    # reference search_pipeline.py:154-160)
    # ------------------------------------------------------------------

    def add(self, rows, start_id: int) -> np.ndarray:
        """Insert new (already normalized) rows into the built index
        without a rebuild: each row goes to its nearest centroid's free
        slot (2nd/3rd choice on overflow); the residue appends fresh
        overflow clusters. Returns the assigned global ids
        (start_id ... start_id + n - 1)."""
        rows = jnp.asarray(rows)
        n, d = rows.shape
        g = self.group
        mc = self.cluster_cap                   # true per-cluster slots
        dw = self.data_padded.shape[-1]         # d (+1 if sentinel)
        c_tot = self.data_padded.shape[0] * g   # clusters incl. group pad
        c = self.num_base_clusters
        topk = min(3, c)
        choices = np.asarray(
            assign_clusters_topk(rows, self.centroids, topk=topk)
        ).T

        # per-TRUE-cluster view (grouped storage keeps flat slot order).
        # The host mirror makes repeated small adds cheap: only the FIRST
        # add() (or the first after load) pays the full ids readback.
        if (self._ids_host is None
                or self._ids_host.size != self.ids_padded.size):
            self._ids_host = np.array(
                jax.device_get(self.ids_padded), np.int32
            ).reshape(-1)
        ids_h = self._ids_host.reshape(-1, mc)
        # free slots per base cluster — actual holes, NOT a live count:
        # after remove() the live count no longer equals the next free
        # offset and rank-based placement would overwrite live rows
        free_of = {}

        def free_list(cl):
            if cl not in free_of:
                free_of[cl] = list(np.nonzero(ids_h[cl] < 0)[0][::-1])
            return free_of[cl]

        slot = np.full(n, -1, np.int64)
        for col in range(topk):
            todo = np.nonzero(slot < 0)[0]
            if todo.size == 0:
                break
            for i in todo:
                fl = free_list(int(choices[i, col]))
                if fl:
                    slot[i] = int(choices[i, col]) * mc + fl.pop()

        leftover = np.nonzero(slot < 0)[0]
        extra = 0
        if leftover.size:
            # fill existing overflow clusters' free slots first
            over_flat_ids = ids_h[c:].reshape(-1) if c_tot > c else np.empty(0)
            free = np.nonzero(over_flat_ids < 0)[0] if over_flat_ids.size else np.empty(0, np.int64)
            take_n = min(free.size, leftover.size)
            slot[leftover[:take_n]] = c * mc + free[:take_n]
            leftover = leftover[take_n:]
            if leftover.size:
                extra = _round_up((leftover.size + mc - 1) // mc, g)
                slot[leftover] = c_tot * mc + np.arange(leftover.size)

        if extra:
            pad_rows = extra * mc
            new_slabs = (c_tot + extra) // g
            self.data_padded = jnp.concatenate(
                [
                    self.data_padded.reshape(-1, dw),
                    jnp.zeros((pad_rows, dw), self.data_padded.dtype),
                ]
            ).reshape(new_slabs, g * mc, dw)
            self.ids_padded = jnp.concatenate(
                [
                    self.ids_padded.reshape(-1),
                    jnp.full((pad_rows,), -1, jnp.int32),
                ]
            ).reshape(new_slabs, g * mc)
            if self.scales_padded is not None:
                self.scales_padded = jnp.concatenate(
                    [
                        self.scales_padded.reshape(-1),
                        jnp.zeros((pad_rows,), jnp.float32),
                    ]
                ).reshape(new_slabs, g * mc)
            c_tot += extra
            self.num_overflow = new_slabs - c // g
            self._ids_host = np.concatenate(
                [self._ids_host, np.full(pad_rows, -1, np.int32)]
            )

        slot_dev = jnp.asarray(slot, jnp.int32)
        if self.scales_padded is not None:
            from ..compress.quantize import quantize_embeddings_int8

            q, s = quantize_embeddings_int8(rows)
            flat = self.data_padded.reshape(-1, dw).at[slot_dev].set(q)
            sflat = self.scales_padded.reshape(-1).at[slot_dev].set(s)
            self.scales_padded = sflat.reshape(c_tot // g, g * mc)
        else:
            store = rows.astype(self.data_padded.dtype)
            if self.sentinel:
                store = jnp.concatenate(
                    [store, jnp.full((n, 1), 2.0, store.dtype)], axis=1
                )
            flat = self.data_padded.reshape(-1, dw).at[slot_dev].set(store)
        self.data_padded = flat.reshape(c_tot // g, g * mc, dw)
        new_ids = np.arange(start_id, start_id + n, dtype=np.int32)
        ids_flat = self.ids_padded.reshape(-1).at[slot_dev].set(
            jnp.asarray(new_ids)
        )
        self.ids_padded = ids_flat.reshape(c_tot // g, g * mc)
        self._ids_host[slot] = new_ids
        if self.rescore_data is not None:
            need = start_id + n
            have = self.rescore_data.shape[0]
            if need > have:
                self.rescore_data = jnp.concatenate([
                    self.rescore_data,
                    jnp.zeros((need - have, d), self.rescore_data.dtype),
                ])
            self.rescore_data = self.rescore_data.at[
                jnp.asarray(new_ids)
            ].set(rows.astype(self.rescore_data.dtype))
        return new_ids

    # ------------------------------------------------------------------
    # In-place delete (hnswlib mark_deleted, reference
    # search_pipeline.py:154-175) — no rebuild: the slot's id goes to -1
    # and every query kernel already masks id<0 slots to -inf.
    # ------------------------------------------------------------------

    def remove(self, remove_ids) -> int:
        """Mark the given global ids deleted. Returns how many slots were
        cleared. O(N log M) on device via a sorted-membership test."""
        rem = np.unique(np.asarray(remove_ids, np.int64))
        if rem.size == 0:
            return 0
        rem_dev = jnp.asarray(rem, jnp.int32)
        ids_flat = self.ids_padded.reshape(-1)
        pos = jnp.clip(
            jnp.searchsorted(rem_dev, ids_flat), 0, rem.size - 1
        )
        hit = (rem_dev[pos] == ids_flat) & (ids_flat >= 0)
        new_flat = jnp.where(hit, -1, ids_flat)
        n_removed = int(jnp.sum(hit.astype(jnp.int32)))
        self.ids_padded = new_flat.reshape(self.ids_padded.shape)
        if self._ids_host is not None:
            # keep the add() free-slot mirror consistent (same sorted-
            # membership test, host-side)
            hpos = np.clip(
                np.searchsorted(rem, self._ids_host), 0, rem.size - 1
            )
            hhit = (rem[hpos] == self._ids_host) & (self._ids_host >= 0)
            self._ids_host[hhit] = -1
        if self.sentinel:
            # the idless scan masks by the sentinel column, not ids:
            # zero it so removed rows score 0 (< any live row's [1, 3])
            dshape = self.data_padded.shape
            dflat = self.data_padded.reshape(-1, dshape[-1])
            col = jnp.where(hit, 0, dflat[:, -1].astype(jnp.float32))
            self.data_padded = dflat.at[:, -1].set(
                col.astype(dflat.dtype)
            ).reshape(dshape)
        return n_removed

    # ------------------------------------------------------------------
    # Persistence (analogue of hnswlib save_index/load_index,
    # reference search_pipeline.py:106,122)
    # ------------------------------------------------------------------

    @staticmethod
    def _to_npz(x: jax.Array):
        """(host_array, dtype_tag). np.savez silently degrades bf16 to a
        void V2 dtype that np.load returns as raw bytes — persist bf16 as
        a uint16 bit view plus a tag instead."""
        h = np.asarray(jax.device_get(x))
        if x.dtype == jnp.bfloat16:
            return h.view(np.uint16), "bfloat16"
        return h, str(h.dtype)

    @staticmethod
    def _from_npz(a: np.ndarray, tag: str) -> jax.Array:
        if tag == "bfloat16":
            import ml_dtypes

            return jnp.asarray(a.view(ml_dtypes.bfloat16))
        return jnp.asarray(a)

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        extra = {}
        if self.scales_padded is not None:
            extra["scales_padded"] = np.asarray(
                jax.device_get(self.scales_padded)
            )
        if self.rescore_data is not None:
            extra["rescore_data"], extra["rescore_dtype"] = self._to_npz(
                self.rescore_data
            )
        dp, dp_tag = self._to_npz(self.data_padded)
        np.savez(
            path,
            centroids=np.asarray(jax.device_get(self.centroids)),
            data_padded=dp,
            data_dtype=dp_tag,
            ids_padded=np.asarray(jax.device_get(self.ids_padded)),
            num_base_clusters=self.num_base_clusters,
            num_clusters=self.config.num_clusters,
            num_probes=self.config.num_probes,
            group=self.group,
            **extra,
        )

    @classmethod
    def load(cls, path: str) -> "IVFIndex":
        if not os.path.exists(path) and os.path.exists(path + ".npz"):
            path = path + ".npz"   # np.savez appends the suffix
        with np.load(path) as z:
            cfg = IndexConfig(
                num_clusters=int(z["num_clusters"]),
                num_probes=int(z["num_probes"]),
            )
            # files written before the dtype tags carry plain arrays
            dp_tag = str(z["data_dtype"]) if "data_dtype" in z.files else ""
            rd_tag = (
                str(z["rescore_dtype"]) if "rescore_dtype" in z.files else ""
            )
            return cls(
                centroids=jnp.asarray(z["centroids"]),
                data_padded=cls._from_npz(z["data_padded"], dp_tag),
                ids_padded=jnp.asarray(z["ids_padded"]),
                num_base_clusters=int(z["num_base_clusters"]),
                config=cfg,
                scales_padded=(
                    jnp.asarray(z["scales_padded"])
                    if "scales_padded" in z.files else None
                ),
                rescore_data=(
                    cls._from_npz(z["rescore_data"], rd_tag)
                    if "rescore_data" in z.files else None
                ),
                group=int(z["group"]) if "group" in z.files else 1,
            )


@functools.partial(
    jax.jit,
    static_argnames=("num_base", "k", "probes", "block_q", "union",
                     "interpret", "k_coarse", "per_probe", "approx_width",
                     "probes_per_step", "group", "final_merge",
                     "acc_slots", "dma_pipeline", "dma_buffers"),
)
def _ivf_query_fused(
    queries, centroids, data_padded, ids_padded, scales_padded,
    num_base: int, k: int, probes: int, block_q: int, union: int,
    interpret: bool, rescore_data=None, k_coarse: int = 0,
    per_probe: bool = False, approx_width: int = 0,
    probes_per_step: int = 1, group: int = 1,
    final_merge: str = "kernel", acc_slots: int = 1,
    dma_pipeline: bool = False, dma_buffers: int = 2,
):
    """normalize → sort queries by nearest centroid → block-probe-union →
    pallas scan → unsort, as ONE compiled call.

    Sorting groups similar queries into the same block, so the shared
    block-union probe list covers each member's own top probes much better
    (higher recall at the same union width).

    ``group > 1``: storage holds `group` affinity-ordered clusters per
    scan slab; probe scores pool member-centroid sims with a max, so the
    union is over SLABS while probe granularity stays single-cluster."""
    q = l2_normalize(queries).astype(jnp.float32)
    b, d = q.shape
    pad_b = _round_up(b, block_q)
    if pad_b != b:
        q = jnp.pad(q, ((0, pad_b - b), (0, 0)))
    scores_flat = _group_max(jnp.einsum(
        "bd,cd->bc", q, centroids, preferred_element_type=jnp.float32
    ), group)  # (pad_b, C/group)
    if pad_b != b:
        # padding rows must not win the block-max probe union: a zero
        # query scores 0 against every centroid, which BEATS a real
        # query whose sims are all negative (the batch=1 serving case)
        row = jnp.arange(pad_b)[:, None]
        scores_flat = jnp.where(row < b, scores_flat, -1e9)
    # group queries by their top-1 centroid (padding rows sort last in
    # effect: every masked score ties at -1e9)
    top1 = jnp.argmax(scores_flat, axis=1)
    order = jnp.argsort(top1)
    q = q[order]
    scores = scores_flat[order].reshape(pad_b // block_q, block_q, -1)
    block_scores = jnp.max(scores, axis=1)
    _, probe_ids = jax.lax.top_k(block_scores, union)
    probe_ids = probe_ids.astype(jnp.int32)
    n_base_slabs = num_base // group
    n_overflow = data_padded.shape[0] - n_base_slabs
    if n_overflow:
        over = jnp.tile(
            jnp.arange(
                n_base_slabs, data_padded.shape[0], dtype=jnp.int32
            )[None],
            (probe_ids.shape[0], 1),
        )
        probe_ids = jnp.concatenate([probe_ids, over], axis=1)
    do_rescore = rescore_data is not None and k_coarse > k
    dw = data_padded.shape[-1]
    shift = jnp.float32(0.0)
    if dw == d + 1:   # sentinel layout (live rows +2, dead slots 0)
        q_kern = jnp.concatenate(
            [q, jnp.ones((q.shape[0], 1), q.dtype)], axis=1
        )
        shift = jnp.float32(2.0)
    else:
        q_kern = q
    # idless scan: the deferred-merge fold needs no per-step ids operand —
    # slot ids come from the scalar-prefetched probe id, and the sentinel
    # column keeps dead slots from winning. One streamed operand per grid
    # step instead of two (the per-step cost is per-operand).
    idless = (
        dw == d + 1 and approx_width > 0 and not per_probe
        and probes_per_step == 1 and scales_padded is None
        and final_merge == "kernel" and acc_slots == 1
    )
    # large-k final merge outside the kernel: the in-kernel k-round merge
    # is linear in k (k=100 measured 5x slower than k=10); emit_acc makes
    # the scan k-invariant and one fused XLA top_k does the selection.
    emit_acc = (
        final_merge in ("xla", "xla_approx") and approx_width > 0
        and not per_probe and probes_per_step == 1
    )

    def rescore(s_c, i_c):
        # two-pass refine (VERDICT r2 next-round #2): re-score the coarse
        # candidates exactly against the full-precision rows and take the
        # true top-k — recovers quantization-induced recall at scan speed
        # (measured: the gather + (B, k', D) einsum costs ~3ms per 16k
        # queries; the expensive part would be widening the in-kernel
        # merge, which per_probe avoids entirely)
        n_rows = rescore_data.shape[0]
        cand = rescore_data[jnp.clip(i_c, 0, n_rows - 1)]
        es = jnp.einsum(
            "bd,bkd->bk", q, cand.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        es = jnp.where(i_c >= 0, es, -jnp.inf)
        s_, tl = jax.lax.top_k(es, k)
        return s_, jnp.take_along_axis(i_c, tl, axis=1)

    if per_probe:
        # per-cluster top-k out of the kernel; cross-probe merge in XLA.
        # For the rescore path the pool is per-CLUSTER ranked — a true
        # neighbor only drops out if the coarse metric pushes it below
        # rank k inside its own cluster, a much rarer event than falling
        # below a global coarse rank k'.
        s_pp, i_pp = _ivf_query_pallas(
            q_kern, probe_ids, data_padded, ids_padded, scales_padded, k,
            block_q, interpret=interpret, per_probe=True,
        )
        pool_s = s_pp.transpose(1, 0, 2).reshape(q.shape[0], -1)
        pool_i = i_pp.transpose(1, 0, 2).reshape(q.shape[0], -1)
        if do_rescore:
            kc = min(k_coarse, pool_s.shape[1])
            cs, cl = jax.lax.top_k(pool_s, kc)
            ci = jnp.take_along_axis(pool_i, cl, axis=1)
            s, i = rescore(cs, ci)
        else:
            s, tl = jax.lax.top_k(pool_s, k)
            i = jnp.take_along_axis(pool_i, tl, axis=1)
            s = s - shift
    elif final_merge == "packed":
        # single-int32 packed accumulator: fold = elementwise max, merge
        # rounds = ONE lane reduce each, no streamed/emitted id arrays —
        # the k=100 selection-floor lever (docs/ROUND4.md)
        if scales_padded is not None:
            raise ValueError("packed fold does not support int8 scales")
        if dw != d:
            raise ValueError("packed fold is incompatible with sentinel")
        k_scan = k_coarse if do_rescore else k
        out_p = _ivf_query_pallas_packed(
            q, probe_ids, data_padded, ids_padded, k_scan, block_q,
            interpret=interpret, approx_width=approx_width,
            acc_slots=max(acc_slots, 1),
        )
        s, i = _unpack_candidates(out_p, probe_ids, ids_padded, block_q)
        if do_rescore:
            s, i = rescore(s, i)
        inv = jnp.argsort(order)
        return s[inv], i[inv]
    elif dma_pipeline:
        if scales_padded is not None:
            raise ValueError("dma_pipeline does not support int8 scales")
        k_scan = k_coarse if do_rescore else k
        s, i = _ivf_query_pallas_dma(
            q_kern, probe_ids, data_padded, ids_padded, k_scan, block_q,
            interpret=interpret, acc_slots=max(acc_slots, 1),
            n_buffers=dma_buffers,
        )
        if do_rescore:
            s, i = rescore(s, i)
        else:
            s = s - shift
        inv = jnp.argsort(order)
        return s[inv], i[inv]
    else:
        k_scan = k_coarse if do_rescore else k
        s, i = _ivf_query_pallas(
            q_kern, probe_ids, data_padded, ids_padded, scales_padded,
            k_scan,
            block_q, interpret=interpret, approx_width=approx_width,
            probes_per_step=probes_per_step, idless=idless,
            emit_acc=emit_acc,
            acc_slots=acc_slots if (emit_acc or (
                approx_width and not idless and probes_per_step == 1
            )) else 1,
        )
        if emit_acc:
            if final_merge == "xla_approx":
                # TPU-native partial reduction (approx_max_k lowers to the
                # PartialReduce op) instead of the full sort lax.top_k
                # runs — the sort dominated the k=100 xla merge on HW
                s, tl = jax.lax.approx_max_k(
                    s, k_scan, recall_target=0.99,
                )
            else:
                s, tl = jax.lax.top_k(s, k_scan)
            i = jnp.take_along_axis(i, tl, axis=1)
        if idless:
            # kernel outputs are flat SLOT ids — translate to corpus ids
            # with one tiny (B, k) gather (never streamed per step)
            ids_flat = ids_padded.reshape(-1)
            i = jnp.where(
                i >= 0, ids_flat[jnp.clip(i, 0, ids_flat.shape[0] - 1)], -1
            )
        if do_rescore:
            s, i = rescore(s, i)
        else:
            s = s - shift
    inv = jnp.argsort(order)
    return s[inv], i[inv]


# ---------------------------------------------------------------------------
# XLA query impl
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("num_base", "k", "probes", "chunk_q", "group")
)
def _ivf_query_xla(
    q, centroids, data_padded, ids_padded, scales_padded, num_base, k,
    probes, chunk_q, group=1,
):
    b, d = q.shape
    c_tot, mc, dw = data_padded.shape     # c_tot/mc = SLAB count/width
    n_base_slabs = num_base // group
    n_over = c_tot - n_base_slabs

    cscores = _group_max(jnp.einsum(
        "bd,cd->bc", q, centroids, preferred_element_type=jnp.float32
    ), group)
    shift = jnp.float32(0.0)
    if dw == d + 1:   # sentinel layout: live rows score +2, dead slots 0
        q = jnp.concatenate([q, jnp.ones((b, 1), q.dtype)], axis=1)
        shift = jnp.float32(2.0)
    _, probe = jax.lax.top_k(cscores, probes)  # (B, P)
    if n_over:
        over = jnp.tile(
            jnp.arange(n_base_slabs, c_tot, dtype=probe.dtype)[None, :],
            (b, 1),
        )
        probe = jnp.concatenate([probe, over], axis=1)
    p_tot = probe.shape[1]

    pad_b = _round_up(b, chunk_q)
    q_p = jnp.pad(q, ((0, pad_b - b), (0, 0)))
    probe_p = jnp.pad(probe, ((0, pad_b - b), (0, 0)))

    def one_chunk(args):
        qc, pc = args  # (chunk, D), (chunk, P)
        cand = data_padded[pc]          # (chunk, P, Mc, D)
        cand_ids = ids_padded[pc]       # (chunk, P, Mc)
        s = jnp.einsum(
            "qd,qpmd->qpm", qc, cand.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if scales_padded is not None:
            s = s * scales_padded[pc]   # int8 per-row dequant
        s = jnp.where(cand_ids >= 0, s, -jnp.inf)
        s = s.reshape(qc.shape[0], -1)
        cand_ids = cand_ids.reshape(qc.shape[0], -1)
        ts, tl = jax.lax.top_k(s, k)
        ti = jnp.take_along_axis(cand_ids, tl, axis=1)
        return ts, ti

    qs = q_p.reshape(-1, chunk_q, q_p.shape[1])
    ps = probe_p.reshape(-1, chunk_q, p_tot)
    ts, ti = jax.lax.map(one_chunk, (qs, ps))
    return (ts.reshape(pad_b, k) - shift)[:b], ti.reshape(pad_b, k)[:b]


# ---------------------------------------------------------------------------
# Pallas query kernel
# ---------------------------------------------------------------------------

def _ivf_body(
    q_ref, data_ref, ids_ref, scales_ref, out_s_ref, out_i_ref,
    acc_s, acc_i, s_scr, k: int, per_probe: bool = False,
    approx_width: int = 0, emit_acc: bool = False, acc_slots: int = 1,
):
    """Shared body: one (query-block, probed-cluster) step of the scan.

    Block shapes: q (block_q, D); data (1, Mc, D) — f32/bf16, or int8 with
    per-row dequant scales (1, 1, Mc); ids (1, 1, Mc) int32 (middle
    singleton keeps Mosaic's block-tiling rule satisfied).

    ``per_probe``: no running accumulator — every step writes ITS probe's
    top-k to its own output block and the cross-probe merge happens in
    XLA. Measured on HW: the k-round VMEM merge is the scan's dominant
    per-step cost once k grows (k=20 halves QPS), while a (B, U·k) XLA
    top_k is nearly free — and per-cluster top-k is exactly what the
    two-pass rescore wants as its candidate pool."""
    u = pl.program_id(1)
    n_u = pl.num_programs(1)

    if per_probe:
        acc_s[...] = jnp.full_like(acc_s, -jnp.inf)
        acc_i[...] = jnp.full_like(acc_i, -1)
    else:
        @pl.when(u == 0)
        def _init():
            acc_s[...] = jnp.full_like(acc_s, -jnp.inf)
            acc_i[...] = jnp.full_like(acc_i, -1)

    # bf16/int8 payloads run the dot in NATIVE bf16 (f32 accumulation):
    # upcasting operands to f32 would push the matmul onto the ~4x-slower
    # f32 MXU path. Measured on HW: recall@10 identical to the f32 dot at
    # every tested config (queries round to bf16; scores accumulate f32).
    if data_ref.dtype in (jnp.bfloat16, jnp.int8):
        q = q_ref[...].astype(jnp.bfloat16)
        data = data_ref[0].astype(jnp.bfloat16)
    else:
        q = q_ref[...].astype(jnp.float32)
        data = data_ref[0].astype(jnp.float32)
    ids = ids_ref[0, 0]                          # (Mc,)
    mc = data.shape[0]
    block_q = q.shape[0]

    s = jax.lax.dot_general(
        q, data, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, Mc)
    if scales_ref is not None:
        s = s * scales_ref[0, 0][None, :]
    ids_b = jnp.broadcast_to(ids[None, :], (block_q, mc))
    s = jnp.where(ids_b >= 0, s, -jnp.inf)

    def ids_fn(lo, hi):
        # slice the ids REF (plain VMEM load), never a compute result —
        # Mosaic aborts on lane-slicing vector values
        return jnp.broadcast_to(
            ids_ref[0, 0, lo:hi][None, :], (block_q, hi - lo)
        )

    if approx_width:
        # Deferred merge (the round-3 per-step-cost lever): the k-round
        # masked-max merge is ~80% of each probe step's cost (measured:
        # per-step time is invariant to DMA bytes, dot dtype, and reduce
        # width but linear in k — docs/ROUND3.md). So per step only FOLD
        # this cluster's scores into a running per-lane-class max
        # accumulator (one compare pass over Mc), and run the k rounds
        # ONCE per query block at the last probe. A lane class keeps a
        # single winner, so two true top-k hits landing in the same class
        # anywhere in the probe union lose the weaker one — expected
        # recall cost ~k²/2/approx_width (~0.1% at 2048 for k=10);
        # the exact path (approx_width=0) remains for oracles.
        w = approx_width
        s_scr[...] = s                       # stage: lane-slicing a dot
        for off in range(0, mc, w):          # result aborts Mosaic
            sl = s_scr[:, off:off + w]
            il = ids_fn(off, off + w)
            if acc_slots == 1:
                upd = sl > acc_s[...]
                acc_s[...] = jnp.where(upd, sl, acc_s[...])
                acc_i[...] = jnp.where(upd, il, acc_i[...])
            else:
                # S-slot fold (large-k mode): keep the top-S per lane
                # class — collision loss drops from ~k²/2w (2.4% of
                # k=100 at w=2048) to ~k^{S+1}/(S+1)!w^S (0.04% at S=2).
                # Each slot's loser cascades down to compete for the next
                # slot, so every lane class holds its true top-S. Slot
                # offsets are s_idx*w with w % 128 == 0 (validated in
                # _ivf_query_pallas — Mosaic lane slices need alignment).
                disp_s, disp_i = sl, il
                for s_idx in range(acc_slots):
                    a = acc_s[:, s_idx * w:(s_idx + 1) * w]
                    ai = acc_i[:, s_idx * w:(s_idx + 1) * w]
                    upd = disp_s > a
                    nds = jnp.where(upd, a, disp_s)
                    ndi = jnp.where(upd, ai, disp_i)
                    acc_s[:, s_idx * w:(s_idx + 1) * w] = jnp.where(
                        upd, disp_s, a
                    )
                    acc_i[:, s_idx * w:(s_idx + 1) * w] = jnp.where(
                        upd, disp_i, ai
                    )
                    disp_s, disp_i = nds, ndi

        @pl.when(u == n_u - 1)
        def _flush_approx():
            if emit_acc:
                # large-k mode: the k-round merge scales linearly with k
                # (k=100 ran 5x slower than k=10 — docs/ROUND3.md), so
                # emit the raw (block_q, w) accumulators and let ONE
                # fused XLA top_k outside the kernel do the selection.
                # Identical results: both paths take the exact top-k of
                # the same accumulator.
                out_s_ref[...] = acc_s[...]
                out_i_ref[...] = acc_i[...]
            else:
                new_s, new_i = _topk_exact_merge_rounds(
                    acc_s[...], acc_i[...], k
                )
                out_s_ref[...] = new_s
                out_i_ref[...] = new_i

        return

    # Two-stage exact merge (reduce → k cheap rounds → detect → fallback),
    # shared with the brute-force kernel (ops/topk._merge_block_topk).
    from ..ops.topk import _merge_block_topk

    _merge_block_topk(acc_s, acc_i, s_scr, s, ids_fn, k)

    if per_probe:
        out_s_ref[0] = acc_s[...]
        out_i_ref[0] = acc_i[...]
    else:
        @pl.when(u == n_u - 1)
        def _flush():
            out_s_ref[...] = acc_s[...]
            out_i_ref[...] = acc_i[...]


def _ivf_kernel_multiprobe(
    probes_ref, q_ref, *refs, k: int, n_data: int, has_scales: bool,
):
    """P probes per grid step (approx/deferred-merge mode only).

    The single-probe scan is bound by a ~3µs fixed per-grid-step cost
    (measured: per-step time invariant to DMA bytes, dot dtype, and — once
    the merge is deferred — to everything but the step count). Fetching P
    probed clusters per step through P scalar-prefetch-indexed operands
    divides that fixed cost by P; the marginal work per extra probe is
    just its dot + fold. approx_width == Mc here, so scores fold
    full-width into the running per-lane-class max (no staging scratch,
    no lane-slicing of dot results)."""
    P = n_data
    data_refs = refs[:P]
    ids_refs = refs[P:2 * P]
    off = 2 * P
    scales_refs = refs[off:off + P] if has_scales else None
    out_s_ref, out_i_ref, acc_s, acc_i = refs[-4:]

    u = pl.program_id(1)
    n_u = pl.num_programs(1)

    @pl.when(u == 0)
    def _init():
        acc_s[...] = jnp.full_like(acc_s, -jnp.inf)
        acc_i[...] = jnp.full_like(acc_i, -1)

    if data_refs[0].dtype in (jnp.bfloat16, jnp.int8):
        q = q_ref[...].astype(jnp.bfloat16)
    else:
        q = q_ref[...].astype(jnp.float32)
    block_q = q.shape[0]

    for p in range(P):
        data = data_refs[p][0].astype(q.dtype)
        s = jax.lax.dot_general(
            q, data, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, Mc)
        if scales_refs is not None:
            s = s * scales_refs[p][0, 0][None, :]
        ids = ids_refs[p][0, 0]
        ids_b = jnp.broadcast_to(ids[None, :], (block_q, ids.shape[0]))
        s = jnp.where(ids_b >= 0, s, -jnp.inf)
        upd = s > acc_s[...]
        acc_s[...] = jnp.where(upd, s, acc_s[...])
        acc_i[...] = jnp.where(upd, ids_b, acc_i[...])

    @pl.when(u == n_u - 1)
    def _flush():
        new_s, new_i = _topk_exact_merge_rounds(acc_s[...], acc_i[...], k)
        out_s_ref[...] = new_s
        out_i_ref[...] = new_i


def _ivf_kernel_idless(
    probes_ref, q_ref, data_ref, out_s_ref, out_i_ref, acc_s, acc_i,
    *scratch, k: int, approx_width: int,
):
    """Deferred-merge scan with NO streamed ids operand (sentinel layout).

    The per-grid-step fixed cost is per-OPERAND (docs/ROUND3.md: pps>1
    measured slower because extra operands add cost; per-step time is
    invariant to DMA bytes/dtype) — so dropping the (1, 1, Mc) ids block
    leaves `data` as the only streamed operand per step. Slot ids are
    computed from the scalar-prefetched probe id (probe*Mc + lane); dead
    slots can't win because the sentinel column pins their score at 0
    while live rows score in [1, 3]. The caller translates the flat slot
    ids back to corpus ids with one (B, k) gather."""
    i_b = pl.program_id(0)
    u = pl.program_id(1)
    n_u = pl.num_programs(1)

    @pl.when(u == 0)
    def _init():
        acc_s[...] = jnp.full_like(acc_s, -jnp.inf)
        acc_i[...] = jnp.full_like(acc_i, -1)

    if data_ref.dtype == jnp.bfloat16:
        q = q_ref[...].astype(jnp.bfloat16)
        data = data_ref[0].astype(jnp.bfloat16)
    else:
        q = q_ref[...].astype(jnp.float32)
        data = data_ref[0].astype(jnp.float32)
    mc = data.shape[0]
    block_q = q.shape[0]
    s = jax.lax.dot_general(
        q, data, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, Mc)
    base = probes_ref[i_b, u] * mc
    w = approx_width
    if w >= mc:
        # full-width fold: elementwise use of the dot result is fine
        # (only lane-SLICING it aborts Mosaic)
        il = base + jax.lax.broadcasted_iota(jnp.int32, (block_q, mc), 1)
        upd = s > acc_s[...]
        acc_s[...] = jnp.where(upd, s, acc_s[...])
        acc_i[...] = jnp.where(upd, il, acc_i[...])
    else:
        s_scr = scratch[0]
        s_scr[...] = s          # stage so the slices read a ref
        for off in range(0, mc, w):
            sl = s_scr[:, off:off + w]
            il = (base + off) + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, w), 1
            )
            upd = sl > acc_s[...]
            acc_s[...] = jnp.where(upd, sl, acc_s[...])
            acc_i[...] = jnp.where(upd, il, acc_i[...])

    @pl.when(u == n_u - 1)
    def _flush():
        new_s, new_i = _topk_exact_merge_rounds(acc_s[...], acc_i[...], k)
        out_s_ref[...] = new_s
        out_i_ref[...] = new_i


_PACK_SCORE_BITS = 14      # fixed-point cosine resolution ~1.2e-4
_PACK_U_BITS = 6           # probe index within the block union (<= 64)
_PACK_POS_BITS = 11        # row position within the cluster (Mc <= 2048)
_PACK_SCALE = (1 << _PACK_SCORE_BITS) / 2.0 - 0.25  # (s+1)*scale <= 2^14-1


def _pack_candidates(s, u, off, block_q, width):
    """(score, probe, position) → one int32 packet, ordered by score.

    Layout [30:17]=score14 [16:11]=u [10:0]=pos. Packets are unique per
    candidate (pos+u differ), so a running max IS the fold and equality
    masks exactly one element per merge round — the whole deferred merge
    runs on a single int32 array (one lane-reduce per round instead of
    two, no parallel id array; the k=100 selection floor was ~2 of the
    ~4 ms/16k-queries — see docs/ROUND4.md decomposition)."""
    s14 = jnp.clip(
        ((s + 1.0) * _PACK_SCALE), 0.0, float((1 << _PACK_SCORE_BITS) - 1)
    ).astype(jnp.int32)
    pos = off + jax.lax.broadcasted_iota(jnp.int32, (block_q, width), 1)
    return (
        (s14 << (_PACK_U_BITS + _PACK_POS_BITS))
        | (u << _PACK_POS_BITS)
        | pos
    )


def _ivf_kernel_packed(
    probes_ref, q_ref, data_ref, ids_ref, out_ref, acc_p, s_scr,
    *, k: int, approx_width: int, acc_slots: int = 1,
):
    """Deferred-merge scan with the PACKED single-int32 accumulator.

    Fold = elementwise max (no compare/select pairs, no id array); flush =
    k rounds of (max-reduce → one-hot write → equality mask). The caller
    unpacks (score, probe u, position) in XLA and gathers corpus ids with
    one (B, k) lookup."""
    u = pl.program_id(1)
    n_u = pl.num_programs(1)

    @pl.when(u == 0)
    def _init():
        acc_p[...] = jnp.zeros_like(acc_p)

    if data_ref.dtype in (jnp.bfloat16, jnp.int8):
        q = q_ref[...].astype(jnp.bfloat16)
        data = data_ref[0].astype(jnp.bfloat16)
    else:
        q = q_ref[...].astype(jnp.float32)
        data = data_ref[0].astype(jnp.float32)
    mc = data.shape[0]
    block_q = q.shape[0]
    s = jax.lax.dot_general(
        q, data, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s_scr[...] = s                  # stage: no lane-slicing of dot results
    ids_row = ids_ref[0, 0]
    w = approx_width

    for off in range(0, mc, w):
        sl = s_scr[:, off:off + w]
        p = _pack_candidates(sl, u, off, block_q, w)
        dead = jnp.broadcast_to(
            ids_row[off:off + w][None, :] < 0, p.shape
        )
        p = jnp.where(dead, 0, p)   # packet 0 = no candidate
        if acc_slots == 1:
            acc_p[...] = jnp.maximum(acc_p[...], p)
        else:
            disp = p
            for s_idx in range(acc_slots):
                a = acc_p[:, s_idx * w:(s_idx + 1) * w]
                hi = jnp.maximum(a, disp)
                lo = jnp.minimum(a, disp)
                acc_p[:, s_idx * w:(s_idx + 1) * w] = hi
                disp = lo

    @pl.when(u == n_u - 1)
    def _flush():
        kcols = jax.lax.broadcasted_iota(jnp.int32, (block_q, k), 1)

        def round_fn(r, carry):
            cand, out = carry
            m = jnp.max(cand, axis=1)                     # ONE reduce
            out = jnp.where(kcols == r, m[:, None], out)
            cand = jnp.where(cand == m[:, None], 0, cand)
            return cand, out

        _, out = jax.lax.fori_loop(
            0, k, round_fn,
            (acc_p[...], jnp.zeros((block_q, k), jnp.int32)),
        )
        out_ref[...] = out


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_q", "interpret", "approx_width",
                     "acc_slots"),
)
def _ivf_query_pallas_packed(
    q, probe_list, data_padded, ids_padded, k: int, block_q: int,
    interpret: bool = False, approx_width: int = 0, acc_slots: int = 1,
):
    """Packed-accumulator deferred scan → (B, k) int32 packets. The caller
    unpacks via _unpack_candidates."""
    b, d = q.shape
    n_blocks, u_tot = probe_list.shape
    c_tot, mc, _ = data_padded.shape
    if u_tot > (1 << _PACK_U_BITS):
        raise ValueError("packed fold needs a probe union <= 64")
    if mc > (1 << _PACK_POS_BITS):
        raise ValueError("packed fold needs Mc <= 2048")
    w = min(approx_width, mc) if approx_width else mc
    if mc % w:
        w = mc
    if k > acc_slots * w:
        raise ValueError("k exceeds acc_slots * approx_width")
    if acc_slots > 1 and w % 128:
        raise ValueError("acc_slots > 1 needs a 128-aligned width")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks, u_tot),
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j, probes: (i, 0)),
            pl.BlockSpec(
                (1, mc, d), lambda i, j, probes: (probes[i, j], 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, mc), lambda i, j, probes: (probes[i, j], 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec((block_q, k), lambda i, j, probes: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, acc_slots * w), jnp.int32),
            pltpu.VMEM((block_q, mc), jnp.float32),
        ],
    )
    (out_p,) = pl.pallas_call(
        functools.partial(
            _ivf_kernel_packed, k=k, approx_width=w, acc_slots=acc_slots,
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, k), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(probe_list, q, data_padded, ids_padded[:, None, :])
    return out_p


def _unpack_candidates(out_p, probe_list, ids_padded, block_q):
    """(B, k) packets → (scores f32, corpus ids int32) via one gather."""
    b = out_p.shape[0]
    pos = out_p & ((1 << _PACK_POS_BITS) - 1)
    u = (out_p >> _PACK_POS_BITS) & ((1 << _PACK_U_BITS) - 1)
    s14 = out_p >> (_PACK_U_BITS + _PACK_POS_BITS)
    scores = s14.astype(jnp.float32) / _PACK_SCALE - 1.0
    block = jnp.arange(b, dtype=jnp.int32)[:, None] // block_q
    slab = probe_list[block, u]             # (B, k) probed slab ids
    ids = ids_padded[slab, pos]
    empty = out_p == 0
    return jnp.where(empty, -jnp.inf, scores), jnp.where(empty, -1, ids)


def _ivf_kernel_dma(
    probes_ref, q_ref, data_hbm, ids_hbm, out_s_ref, out_i_ref,
    acc_s, acc_i, data_buf, ids_buf, sem_d, sem_i,
    *, k: int, n_probes: int, acc_slots: int = 1, n_buffers: int = 2,
):
    """Manually double-buffered probe scan (VERDICT r4 task 5).

    The auto-pipelined kernel pays a fixed ~3.3µs per GRID STEP that is
    invariant to DMA bytes, dot dtype, and merge width (docs/ROUND3.md) —
    a per-operand-fetch overhead of Mosaic's pipeline machinery. This
    variant collapses the probe axis into ONE grid step per query block
    and streams the probed cluster slabs HBM→VMEM itself with
    ``make_async_copy`` into two rotating buffers: probe u+1's slab is in
    flight while probe u's dot runs. data/ids live in ANY (HBM) memory
    space; the scalar-prefetched probe ids drive the copy offsets.

    Fold: full-slab-width per-lane-class running max (approx_width == Mc
    semantics), ``acc_slots`` slots; ONE k-round merge at the end."""
    i_b = pl.program_id(0)
    mc = data_buf.shape[1]
    block_q = q_ref.shape[0]
    w = mc

    def data_dma(slot, u):
        return pltpu.make_async_copy(
            data_hbm.at[probes_ref[i_b, u]],
            data_buf.at[slot],
            sem_d.at[slot],
        )

    def ids_dma(slot, u):
        return pltpu.make_async_copy(
            ids_hbm.at[probes_ref[i_b, u]],
            ids_buf.at[slot],
            sem_i.at[slot],
        )

    acc_s[...] = jnp.full_like(acc_s, -jnp.inf)
    acc_i[...] = jnp.full_like(acc_i, -1)
    # prime the pipeline: n_buffers - 1 copies in flight before compute
    for w0 in range(min(n_buffers - 1, n_probes)):
        data_dma(w0, w0).start()
        ids_dma(w0, w0).start()

    if q_ref.dtype == jnp.float32 and data_buf.dtype in (
        jnp.bfloat16, jnp.int8
    ):
        q = q_ref[...].astype(jnp.bfloat16)
    else:
        q = q_ref[...]

    def probe_step(u, _):
        slot = jax.lax.rem(u, n_buffers)
        nxt = jax.lax.rem(u + n_buffers - 1, n_buffers)

        @pl.when(u + n_buffers - 1 < n_probes)
        def _prefetch():
            data_dma(nxt, u + n_buffers - 1).start()
            ids_dma(nxt, u + n_buffers - 1).start()

        data_dma(slot, u).wait()
        ids_dma(slot, u).wait()
        data = data_buf[slot].astype(q.dtype)
        s = jax.lax.dot_general(
            q, data, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, Mc)
        ids = ids_buf[slot][0]
        ids_b = jnp.broadcast_to(ids[None, :], (block_q, mc))
        s = jnp.where(ids_b >= 0, s, -jnp.inf)
        if acc_slots == 1:
            upd = s > acc_s[...]
            acc_s[...] = jnp.where(upd, s, acc_s[...])
            acc_i[...] = jnp.where(upd, ids_b, acc_i[...])
        else:
            disp_s, disp_i = s, ids_b
            for s_idx in range(acc_slots):
                a = acc_s[:, s_idx * w:(s_idx + 1) * w]
                ai = acc_i[:, s_idx * w:(s_idx + 1) * w]
                upd = disp_s > a
                nds = jnp.where(upd, a, disp_s)
                ndi = jnp.where(upd, ai, disp_i)
                acc_s[:, s_idx * w:(s_idx + 1) * w] = jnp.where(
                    upd, disp_s, a
                )
                acc_i[:, s_idx * w:(s_idx + 1) * w] = jnp.where(
                    upd, disp_i, ai
                )
                disp_s, disp_i = nds, ndi
        return 0

    jax.lax.fori_loop(0, n_probes, probe_step, 0, unroll=False)
    new_s, new_i = _topk_exact_merge_rounds(acc_s[...], acc_i[...], k)
    out_s_ref[...] = new_s
    out_i_ref[...] = new_i


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_q", "interpret", "acc_slots", "n_buffers"),
)
def _ivf_query_pallas_dma(
    q,            # (B, D) padded to block_q
    probe_list,   # (B/block_q, U) int32
    data_padded,  # (C_tot, Mc, D)
    ids_padded,   # (C_tot, Mc)
    k: int,
    block_q: int,
    interpret: bool = False,
    acc_slots: int = 1,
    n_buffers: int = 2,
):
    """Double-buffered manual-DMA variant of _ivf_query_pallas (plain
    deferred-merge path only; full-width fold). A/B target for the
    per-grid-step fixed cost — see _ivf_kernel_dma."""
    b, d = q.shape
    n_blocks, u_tot = probe_list.shape
    c_tot, mc, _ = data_padded.shape
    if k > acc_slots * mc:
        raise ValueError("k exceeds acc_slots * Mc")
    if acc_slots > 1 and mc % 128:
        raise ValueError("acc_slots > 1 needs a 128-aligned Mc")
    if mc % 128 and not interpret:
        # the ids-row copy lane-slices the (C, 1, Mc) HBM operand at Mc;
        # Mosaic aborts on non-128-aligned slices (observed at Mc=360) —
        # IVFIndex.query degrades to the default pipeline before reaching
        # here; this guard protects direct callers
        raise ValueError("dma_pipeline needs a 128-aligned Mc on TPU")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, probes: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((block_q, k), lambda i, probes: (i, 0)),
            pl.BlockSpec((block_q, k), lambda i, probes: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, acc_slots * mc), jnp.float32),
            pltpu.VMEM((block_q, acc_slots * mc), jnp.int32),
            pltpu.VMEM((n_buffers, mc, d), data_padded.dtype),
            pltpu.VMEM((n_buffers, 1, mc), jnp.int32),
            pltpu.SemaphoreType.DMA((n_buffers,)),
            pltpu.SemaphoreType.DMA((n_buffers,)),
        ],
    )
    out_s, out_i = pl.pallas_call(
        functools.partial(
            _ivf_kernel_dma, k=k, n_probes=u_tot, acc_slots=acc_slots,
            n_buffers=n_buffers,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(probe_list, q, data_padded, ids_padded[:, None, :])
    return out_s, out_i


def _ivf_kernel(probes_ref, q_ref, data_ref, ids_ref,
                out_s_ref, out_i_ref, acc_s, acc_i, s_scr, *, k: int,
                per_probe: bool = False, approx_width: int = 0,
                emit_acc: bool = False, acc_slots: int = 1):
    _ivf_body(q_ref, data_ref, ids_ref, None,
              out_s_ref, out_i_ref, acc_s, acc_i, s_scr, k, per_probe,
              approx_width, emit_acc, acc_slots)


def _ivf_kernel_int8(probes_ref, q_ref, data_ref, ids_ref, scales_ref,
                     out_s_ref, out_i_ref, acc_s, acc_i, s_scr, *, k: int,
                     per_probe: bool = False, approx_width: int = 0,
                     emit_acc: bool = False, acc_slots: int = 1):
    _ivf_body(q_ref, data_ref, ids_ref, scales_ref,
              out_s_ref, out_i_ref, acc_s, acc_i, s_scr, k, per_probe,
              approx_width, emit_acc, acc_slots)


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_q", "interpret", "per_probe",
                     "approx_width", "probes_per_step", "idless",
                     "emit_acc", "acc_slots"),
)
def _ivf_query_pallas(
    q,            # (B, Dw) padded to block_q (Dw = D+1 on sentinel layouts)
    probe_list,   # (B/block_q, U) int32
    data_padded,  # (C_tot, Mc, Dw) — f32/bf16, or int8 with scales
    ids_padded,   # (C_tot, Mc)
    scales_padded,  # (C_tot, Mc) f32 or None
    k: int,
    block_q: int,
    interpret: bool = False,
    per_probe: bool = False,
    approx_width: int = 0,
    probes_per_step: int = 1,
    idless: bool = False,   # sentinel layout: no ids operand; outputs are
                            # flat slot ids (caller translates)
    emit_acc: bool = False,  # large-k mode: return the raw (B, w)
                             # deferred-merge accumulators; the caller
                             # runs ONE XLA top_k instead of k in-kernel
                             # merge rounds (k-invariant step cost)
    acc_slots: int = 1,      # 2 (emit_acc only): top-2 per lane class —
                             # collision loss ~k³/6w² instead of ~k²/2w
):
    """``per_probe=False``: returns the merged (B, k). ``per_probe=True``:
    returns per-probe top-k as (U, B, k) — the leading probe axis keeps
    the output block (block_q, k) equal to the array's last-two dims, as
    Mosaic's tiling rules require — and the caller merges in XLA."""
    b, d = q.shape
    n_blocks, u_tot = probe_list.shape
    c_tot, mc, _ = data_padded.shape
    if approx_width:
        if per_probe:
            raise ValueError("approx_width and per_probe are exclusive")
        approx_width = min(approx_width, mc)
        if mc % approx_width:
            approx_width = mc   # single fold — always valid
        if probes_per_step > 1:
            # the multiprobe kernel folds at full slab width (no staging
            # scratch) — resolve BEFORE the k-capacity check below or a
            # narrow requested width spuriously rejects a valid k
            approx_width = mc
    if emit_acc:
        if not approx_width or per_probe or probes_per_step > 1 or idless:
            raise ValueError("emit_acc needs the plain approx path")
    if acc_slots < 1:
        raise ValueError("acc_slots must be >= 1")
    if acc_slots > 1:
        if not approx_width or per_probe or probes_per_step > 1 or idless:
            raise ValueError("acc_slots > 1 needs the plain approx path")
        if approx_width % 128:
            raise ValueError(
                "acc_slots > 1 needs a 128-aligned approx_width (the slot "
                "stride is a Mosaic lane-slice offset)"
            )
    if approx_width and k > acc_slots * approx_width:
        # merge rounds beyond the accumulator width return -inf/-1 tails
        raise ValueError(
            "k exceeds acc_slots * approx_width — the deferred accumulator "
            "cannot hold k candidates"
        )
    if idless:
        if not approx_width or per_probe or probes_per_step > 1:
            raise ValueError("idless needs the plain approx path")
        if scales_padded is not None:
            raise ValueError("idless is incompatible with int8 scales")
        w = approx_width
        scratch = [
            pltpu.VMEM((block_q, w), jnp.float32),
            pltpu.VMEM((block_q, w), jnp.int32),
        ]
        if w < mc:
            scratch.append(pltpu.VMEM((block_q, mc), jnp.float32))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks, u_tot),
            in_specs=[
                pl.BlockSpec((block_q, d), lambda i, j, probes: (i, 0)),
                pl.BlockSpec(
                    (1, mc, d), lambda i, j, probes: (probes[i, j], 0, 0)
                ),
            ],
            out_specs=[
                pl.BlockSpec((block_q, k), lambda i, j, probes: (i, 0)),
                pl.BlockSpec((block_q, k), lambda i, j, probes: (i, 0)),
            ],
            scratch_shapes=scratch,
        )
        out_s, out_i = pl.pallas_call(
            functools.partial(
                _ivf_kernel_idless, k=k, approx_width=w,
            ),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((b, k), jnp.float32),
                jax.ShapeDtypeStruct((b, k), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(probe_list, q, data_padded)
        return out_s, out_i
    if probes_per_step > 1:
        if not approx_width or per_probe:
            raise ValueError("probes_per_step>1 needs the approx path")
        P = probes_per_step
        if u_tot % P:
            # pad by repeating the last probe — rescanning a cluster is
            # idempotent for the fold and deduped by the final k rounds
            pad = P - u_tot % P
            probe_list = jnp.concatenate(
                [probe_list] + [probe_list[:, -1:]] * pad, axis=1
            )
            u_tot += pad
        in_specs = [pl.BlockSpec((block_q, d), lambda i, j, probes: (i, 0))]
        operands = [probe_list, q]
        for p in range(P):
            in_specs.append(pl.BlockSpec(
                (1, mc, d),
                lambda i, j, probes, p=p: (probes[i, j * P + p], 0, 0),
            ))
            operands.append(data_padded)
        for p in range(P):
            in_specs.append(pl.BlockSpec(
                (1, 1, mc),
                lambda i, j, probes, p=p: (probes[i, j * P + p], 0, 0),
            ))
            operands.append(ids_padded[:, None, :])
        if scales_padded is not None:
            for p in range(P):
                in_specs.append(pl.BlockSpec(
                    (1, 1, mc),
                    lambda i, j, probes, p=p: (probes[i, j * P + p], 0, 0),
                ))
                operands.append(scales_padded[:, None, :])
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks, u_tot // P),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((block_q, k), lambda i, j, probes: (i, 0)),
                pl.BlockSpec((block_q, k), lambda i, j, probes: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, mc), jnp.float32),
                pltpu.VMEM((block_q, mc), jnp.int32),
            ],
        )
        out_s, out_i = pl.pallas_call(
            functools.partial(
                _ivf_kernel_multiprobe, k=k, n_data=P,
                has_scales=scales_padded is not None,
            ),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((b, k), jnp.float32),
                jax.ShapeDtypeStruct((b, k), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(*operands)
        return out_s, out_i

    in_specs = [
        pl.BlockSpec((block_q, d), lambda i, j, probes: (i, 0)),
        pl.BlockSpec((1, mc, d), lambda i, j, probes: (probes[i, j], 0, 0)),
        pl.BlockSpec((1, 1, mc), lambda i, j, probes: (probes[i, j], 0, 0)),
    ]
    operands = [probe_list, q, data_padded, ids_padded[:, None, :]]
    kernel = functools.partial(
        _ivf_kernel, k=k, per_probe=per_probe, approx_width=approx_width,
        emit_acc=emit_acc, acc_slots=acc_slots,
    )
    if scales_padded is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, mc), lambda i, j, probes: (probes[i, j], 0, 0))
        )
        operands.append(scales_padded[:, None, :])
        kernel = functools.partial(
            _ivf_kernel_int8, k=k, per_probe=per_probe,
            approx_width=approx_width, emit_acc=emit_acc,
            acc_slots=acc_slots,
        )

    if per_probe:
        out_specs = [
            pl.BlockSpec((1, block_q, k), lambda i, j, probes: (j, i, 0)),
            pl.BlockSpec((1, block_q, k), lambda i, j, probes: (j, i, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((u_tot, b, k), jnp.float32),
            jax.ShapeDtypeStruct((u_tot, b, k), jnp.int32),
        ]
        semantics = ("parallel", "parallel")
    else:
        ow = acc_slots * approx_width if emit_acc else k
        out_specs = [
            pl.BlockSpec((block_q, ow), lambda i, j, probes: (i, 0)),
            pl.BlockSpec((block_q, ow), lambda i, j, probes: (i, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, ow), jnp.float32),
            jax.ShapeDtypeStruct((b, ow), jnp.int32),
        ]
        semantics = ("parallel", "arbitrary")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks, u_tot),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM(
                (block_q, acc_slots * approx_width or k), jnp.float32
            ),
            pltpu.VMEM(
                (block_q, acc_slots * approx_width or k), jnp.int32
            ),
            pltpu.VMEM((block_q, mc), jnp.float32),
        ],
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
        ),
        interpret=interpret,
    )(*operands)
    return out_s, out_i
