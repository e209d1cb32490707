"""Semantic search + paraphrase mining pipelines.

Parity with reference src/pipeline/search_pipeline.py, TPU-native:

- ``SemanticSearchPipeline`` (:96-175): encode corpus → device-resident
  index (IVF by default, brute force for small corpora) → batched queries.
  Supports add_documents / remove_documents / save / load like the
  reference's hnswlib wrapper (add_items/mark_deleted/save_index).
- ``SentenceMiningPipeline`` (:39-93): all-pairs top-k paraphrase mining,
  implementing the *intent* (the reference's chunking and 1-D topk are
  broken — SURVEY.md headline facts).

The reference's ``APISearchPipeline`` (ONNX int8 serving, :178-226) maps to
constructing these pipelines with an int8-quantized encoder from
``compress.quantize`` — same API, quantized weights.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import IndexConfig
from ..index import BruteForceIndex, EmbeddingStore, IVFIndex
from ..ops.topk import l2_normalize
from ..utils.logging import get_logger

logger = get_logger("search")


def _pad_pow2(q_emb: jax.Array) -> jax.Array:
    """Pad a (N, D) query batch to the next power-of-2 row count by
    replicating the last row, so a serving mix of request sizes hits a
    handful of compiled shapes instead of one jit specialization per
    distinct count. (Zero pad rows would hijack the IVF kernel's
    block-max probe union; replicas are harmless.)"""
    n_q = q_emb.shape[0]
    bucket = 1
    while bucket < n_q:
        bucket *= 2
    if bucket != n_q:
        q_emb = jnp.concatenate([
            q_emb,
            jnp.broadcast_to(q_emb[-1:], (bucket - n_q, q_emb.shape[1])),
        ])
    return q_emb


def _warmup_pipeline(pipe, ks: Sequence[int], max_queries: int) -> int:
    """Precompile the serving path for every power-of-2 query bucket a
    request of up to ``max_queries`` queries can land in (including the
    bucket ABOVE max_queries when it isn't itself a power of 2), × each
    k. Returns the number of shapes warmed."""
    if not pipe.corpus:
        return 0
    n = 0
    bucket = 1
    while bucket // 2 < max(1, max_queries):
        probe = [pipe.corpus[0]] * bucket
        for k in ks:
            pipe(probe, max_num_results=k)
            n += 1
        bucket *= 2
    return n


class SemanticSearchPipeline:
    """corpus texts → embeddings (HBM) → ANN index → query API."""

    def __init__(
        self,
        encoder,                       # SentenceEncoder
        corpus: Optional[Sequence[str]] = None,
        index_config: Optional[IndexConfig] = None,  # None = size by corpus
        use_ivf: Optional[bool] = None,  # None = auto by corpus size
        capacity: Optional[int] = None,
        batch_size: int = 128,
    ):
        self.encoder = encoder
        self.index_config = index_config
        self.batch_size = batch_size
        self.corpus: List[str] = []
        self.store: Optional[EmbeddingStore] = None
        self.ivf: Optional[IVFIndex] = None
        self.use_ivf = use_ivf
        self._capacity = capacity
        if corpus:
            self.add_documents(corpus)

    # ------------------------------------------------------------------

    def _ensure_store(self, first_batch_dim: int):
        if self.store is None:
            cap = self._capacity or max(first_batch_dim * 2, 1024)
            self.store = EmbeddingStore(cap, self.encoder.embedding_dim)

    def add_documents(self, texts: Sequence[str]) -> np.ndarray:
        """Encode + append to the store (hnswlib add_items analogue,
        reference search_pipeline.py:154-160). Embeddings stay on device
        end-to-end; a built IVF index absorbs the new rows incrementally
        (no rebuild) as long as it has no tombstone remap."""
        emb = self.encoder.encode(
            texts, batch_size=self.batch_size, device_output=True
        )
        self._ensure_store(len(texts))
        while self.store.size + len(texts) > self.store.capacity:
            self.store.grow(self.store.capacity * 2)
        ids = self.store.add(emb)
        self.corpus.extend(texts)
        if self.ivf is not None and getattr(self, "_id_remap", None) is None:
            self.ivf.add(emb, start_id=int(ids[0]))
        else:
            self.ivf = None
        return ids

    def remove_documents(self, ids: Sequence[int]) -> int:
        """In-place delete (hnswlib mark_deleted): tombstone the store rows
        AND clear the IVF slots — no index rebuild on the next query.
        Returns how many rows were actually alive and got removed."""
        n_removed = self.store.mark_deleted(ids)
        if self.ivf is not None:
            if getattr(self, "_id_remap", None) is None:
                self.ivf.remove(ids)
            else:
                # index was built over remapped (compacted) ids: translate
                remap = self._id_remap
                pos = np.searchsorted(remap, np.asarray(ids))
                pos = np.clip(pos, 0, len(remap) - 1)
                hit = remap[pos] == np.asarray(ids)
                self.ivf.remove(pos[hit])
        return n_removed

    # ------------------------------------------------------------------

    def _want_ivf(self) -> bool:
        if self.use_ivf is not None:
            return self.use_ivf
        return self.store.size >= 100_000

    def _build_ivf(self):
        alive = np.asarray(jax.device_get(self.store.alive_view))
        data = self.store.view
        if not alive.all():
            # tombstones: rebuild over alive rows only, keep global ids via
            # an id remap
            alive_idx = np.nonzero(alive)[0]
            data = data[jnp.asarray(alive_idx)]
            self._id_remap = alive_idx
        else:
            self._id_remap = None
        cfg = self.index_config or IndexConfig.auto(int(data.shape[0]))
        # bf16 cluster storage: measured identical QPS and recall to f32
        # on the 1M bench corpus (native bf16 MXU dots, f32 accumulation)
        # at half the HBM footprint — docs/ROUND3.md
        self.ivf = IVFIndex.build(data, cfg, data_dtype=jnp.bfloat16)
        logger.info(
            "built IVF index: %d rows, %d clusters (+%d overflow)",
            int(data.shape[0]),
            self.ivf.num_base_clusters,
            self.ivf.num_overflow,
        )

    def __call__(
        self, queries: Sequence[str], max_num_results: int = 10
    ) -> List[List[Tuple[str, float, int]]]:
        """→ per query: [(document, score, corpus_id), ...] best-first."""
        if len(queries) == 0:
            return []
        q_emb = self.encoder.encode(
            queries, batch_size=self.batch_size, device_output=True
        )
        q_emb = _pad_pow2(q_emb)
        if self._want_ivf():
            if self.ivf is None:
                self._build_ivf()
            # deferred-merge scan for big clusters: same measured recall,
            # +44% QPS (docs/ROUND3.md); tiny clusters keep the exact
            # merge (lane-class collision loss scales as k²/2/Mc)
            mc = self.ivf.data_padded.shape[1]
            qargs = dict(
                k=max_num_results,
                # measured serving sweet spot (docs/ROUND3.md): 64-query
                # blocks sharing the config's probe count as the union
                block_q=64, union_factor=1,
                approx_width=2048 if mc >= 1024 else 0,
            )
            s, i = self.ivf.query(q_emb, **qargs)
            s, i = np.asarray(s), np.asarray(i)
            if self._id_remap is not None:
                i = np.where(i >= 0, self._id_remap[np.maximum(i, 0)], -1)
        else:
            s, i = BruteForceIndex(self.store).query(q_emb, k=max_num_results)
        out = []
        for r in range(len(queries)):
            row = []
            for score, idx in zip(s[r], i[r]):
                if idx < 0 or not np.isfinite(score):
                    continue
                row.append((self.corpus[int(idx)], float(score), int(idx)))
            out.append(row)
        return out

    # ------------------------------------------------------------------

    def warmup(self, ks: Sequence[int] = (10,), max_queries: int = 16) -> int:
        """Precompile the serving path per (query-bucket, k). First
        compiles through a remote relay take minutes; a daemon should pay
        them at startup, not on the first user request."""
        return _warmup_pipeline(self, ks, max_queries)

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        self.store.save(os.path.join(path, "store.npz"))
        if self.ivf is not None:
            self.ivf.save(os.path.join(path, "ivf.npz"))
        if getattr(self, "_id_remap", None) is not None:
            # the IVF was built over compacted (alive-only) rows: without
            # the remap a reloaded pipeline would hand out compacted
            # positions as corpus indices — wrong documents after the
            # first removed row
            np.save(
                os.path.join(path, "id_remap.npy"),
                np.asarray(self._id_remap),
            )
        with open(os.path.join(path, "corpus.txt"), "w", encoding="utf-8") as f:
            for t in self.corpus:
                f.write(t.replace("\n", " ") + "\n")

    def load_corpus(self, path: str) -> None:
        """Restore store+corpus saved by save() (index.bin analogue)."""
        self.store = EmbeddingStore.load(os.path.join(path, "store.npz"))
        with open(os.path.join(path, "corpus.txt"), encoding="utf-8") as f:
            self.corpus = [l.rstrip("\n") for l in f]
        ivf_path = os.path.join(path, "ivf.npz")
        self.ivf = IVFIndex.load(ivf_path) if os.path.exists(ivf_path) else None
        remap_path = os.path.join(path, "id_remap.npy")
        self._id_remap = (
            np.load(remap_path) if os.path.exists(remap_path) else None
        )


class ShardedSearchPipeline:
    """Serving pipeline over a corpus sharded across a device mesh — the
    north-star multi-chip shape (BASELINE.json config 5; SURVEY.md §2.2):
    each device holds a slice of the corpus, scans its shard (IVF with
    global k-means centroids, or exact brute force), and the per-shard
    top-k merges with one all-gather over ICI.

    Same request surface as ``SemanticSearchPipeline`` (__call__ /
    add_documents / remove_documents / save), so ``SearchServer`` can
    serve it unchanged. Mutation semantics differ where the sharded
    layout dictates: ``add_documents`` is a bulk-load that rebuilds the
    sharded layout (a static per-shard layout has no cheap cross-shard
    insert), while ``remove_documents`` tombstones in place on device.

    Replaces: single-process hnswlib serving, reference
    src/pipeline/search_pipeline.py:96-175, scaled past one chip's HBM.
    """

    def __init__(
        self,
        encoder,
        mesh,
        corpus: Optional[Sequence[str]] = None,
        index_config: Optional[IndexConfig] = None,
        use_ivf: Optional[bool] = None,   # None = auto by corpus size
        batch_size: int = 128,
    ):
        self.encoder = encoder
        self.mesh = mesh
        self.index_config = index_config
        self.use_ivf = use_ivf
        self.batch_size = batch_size
        self.corpus: List[str] = []
        self._emb: Optional[np.ndarray] = None   # host copy for rebuilds
        self._removed: set = set()
        self.index = None
        self.ivf = None          # mirrors SemanticSearchPipeline (/health)
        self.store = None
        if corpus:
            self.add_documents(corpus)

    # -- build ---------------------------------------------------------

    @property
    def size(self) -> int:
        return len(self.corpus) - len(self._removed)

    def _want_ivf(self) -> bool:
        if self.use_ivf is not None:
            return self.use_ivf
        return len(self.corpus) >= 100_000

    def _rebuild(self):
        from ..index.sharded import ShardedBruteForceIndex, ShardedIVFIndex

        emb = jnp.asarray(self._emb)
        if self._want_ivf():
            cfg = self.index_config or IndexConfig.auto(len(self.corpus))
            # bf16 cluster storage: measured identical QPS/recall at half
            # the per-shard HBM (docs/ROUND3.md) — matches the
            # single-device pipeline's default
            self.index = ShardedIVFIndex.build(
                self.mesh, emb, cfg, data_dtype=jnp.bfloat16,
            )
            self.ivf = self.index
            if self._removed:
                self._tombstone(sorted(self._removed))
        else:
            self.index = ShardedBruteForceIndex.build(self.mesh, emb)
            self.ivf = None
        logger.info(
            "built sharded %s index: %d rows over %d shards",
            "IVF" if self.ivf is not None else "brute-force",
            len(self.corpus),
            self.mesh.shape["index"],
        )

    def add_documents(self, texts: Sequence[str]) -> np.ndarray:
        """Bulk load: encode, extend the corpus, rebuild the sharded
        layout (per-shard capped layouts don't support cross-shard
        inserts; the build itself runs on device)."""
        emb = np.asarray(
            self.encoder.encode(list(texts), batch_size=self.batch_size),
            np.float32,
        )
        start = len(self.corpus)
        self.corpus.extend(texts)
        self._emb = (
            emb if self._emb is None else np.concatenate([self._emb, emb])
        )
        self._rebuild()
        return np.arange(start, len(self.corpus))

    # -- mutation ------------------------------------------------------

    def _tombstone(self, ids: Sequence[int]):
        """Clear global ids from the sharded IVF layout in place (the
        arrays stay sharded; XLA keeps the where() per-shard)."""
        rem = jnp.asarray(sorted(ids), jnp.int32)
        flat = self.index.ids_padded
        pos = jnp.clip(jnp.searchsorted(rem, flat), 0, rem.shape[0] - 1)
        hit = (rem[pos] == flat) & (flat >= 0)
        self.index.ids_padded = jnp.where(hit, -1, flat)
        data = self.index.data_padded
        if data.shape[-1] == self.index.centroids.shape[-1] + 1:
            # sentinel layout: the idless scan masks by the sentinel
            # column, not ids — zero it so removed rows can't win a lane
            col = jnp.where(hit, 0.0, data[..., -1].astype(jnp.float32))
            self.index.data_padded = data.at[..., -1].set(
                col.astype(data.dtype)
            )

    def remove_documents(self, ids: Sequence[int]) -> int:
        fresh = [
            int(i) for i in ids
            if 0 <= int(i) < len(self.corpus) and int(i) not in self._removed
        ]
        if not fresh:
            return 0
        self._removed.update(fresh)
        if self.ivf is not None:
            self._tombstone(fresh)
        # brute-force shards have no id map: __call__ over-fetches and
        # filters tombstones instead
        return len(fresh)

    # -- query ---------------------------------------------------------

    def __call__(
        self, queries: Sequence[str], max_num_results: int = 10
    ) -> List[List[Tuple[str, float, int]]]:
        if len(queries) == 0:
            return []
        if self.index is None:   # nothing loaded yet
            return [[] for _ in queries]
        q_emb = self.encoder.encode(
            list(queries), batch_size=self.batch_size, device_output=True
        )
        q_emb = _pad_pow2(q_emb)
        k = min(max_num_results, len(self.corpus))
        if self.ivf is None and self._removed:
            # brute-force shards have no id map: over-fetch so tombstone
            # filtering still yields k rows. Snap the over-fetched k to a
            # power of 2 — otherwise every removal changes the compiled
            # query shape (a minutes-long recompile through the relay,
            # under the serving lock).
            k = k + len(self._removed)
            b = 1
            while b < k:
                b *= 2
            k = min(b, len(self.corpus))
        s, i = self.index.query(q_emb, k=k)
        out = []
        for r in range(len(queries)):
            row = []
            for score, idx in zip(s[r], i[r]):
                idx = int(idx)
                if idx < 0 or not np.isfinite(score) or idx in self._removed:
                    continue
                row.append((self.corpus[idx], float(score), idx))
                if len(row) >= max_num_results:
                    break
            out.append(row)
        return out

    def warmup(self, ks: Sequence[int] = (10,), max_queries: int = 16) -> int:
        """Precompile the sharded serving path per (query-bucket, k) —
        same contract as SemanticSearchPipeline.warmup."""
        return _warmup_pipeline(self, ks, max_queries)

    # -- persistence (rebuild-on-load: the sharded layout is a function
    # of the mesh, so only the corpus state persists) -------------------

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        emb = (
            self._emb if self._emb is not None
            else np.zeros((0, self.encoder.embedding_dim), np.float32)
        )
        np.savez(
            os.path.join(path, "sharded_store.npz"),
            emb=emb,
            removed=np.asarray(sorted(self._removed), np.int64),
            # persist the index choice: without it a reload would re-run
            # the size heuristic and could silently swap IVF ↔ brute force
            use_ivf=np.int8(
                -1 if self.use_ivf is None else int(self.use_ivf)
            ),
            num_clusters=np.int32(
                self.index_config.num_clusters if self.index_config else -1
            ),
            num_probes=np.int32(
                self.index_config.num_probes if self.index_config else -1
            ),
        )
        with open(
            os.path.join(path, "corpus.txt"), "w", encoding="utf-8"
        ) as f:
            for t in self.corpus:
                f.write(t.replace("\n", " ") + "\n")

    @classmethod
    def load(
        cls, path: str, encoder, mesh,
        index_config: Optional[IndexConfig] = None,
        use_ivf: Optional[bool] = None,
    ) -> "ShardedSearchPipeline":
        with np.load(os.path.join(path, "sharded_store.npz")) as z:
            emb = z["emb"]
            removed = set(int(i) for i in z["removed"])
            if use_ivf is None and "use_ivf" in z.files:
                saved = int(z["use_ivf"])
                use_ivf = None if saved < 0 else bool(saved)
            if (
                index_config is None
                and "num_clusters" in z.files
                and int(z["num_clusters"]) > 0
            ):
                index_config = IndexConfig(
                    num_clusters=int(z["num_clusters"]),
                    num_probes=int(z["num_probes"]),
                )
        pipe = cls(
            encoder, mesh, index_config=index_config, use_ivf=use_ivf
        )
        pipe._removed = removed
        with open(os.path.join(path, "corpus.txt"), encoding="utf-8") as f:
            pipe.corpus = [l.rstrip("\n") for l in f]
        if emb.shape[0]:
            pipe._emb = emb
            pipe._rebuild()
        return pipe


class SentenceMiningPipeline:
    """Find likely paraphrase pairs inside a corpus (corrected intent of
    reference SentenceMiningPipeline, search_pipeline.py:39-93)."""

    def __init__(
        self,
        encoder,
        batch_size: int = 128,
        use_ivf: Optional[bool] = None,   # None = auto: IVF at ≥100k docs
                                          # (exact mining is O(N²))
    ):
        self.encoder = encoder
        self.batch_size = batch_size
        self.use_ivf = use_ivf

    def _mine_ivf(self, emb: jax.Array, k: int):
        """Approximate all-pairs mining through the IVF index: query the
        corpus against itself (one fused scan per 16k-row batch instead
        of an O(N²) matmul stream), drop self-matches."""
        n = emb.shape[0]
        cfg = IndexConfig.auto(n)
        ivf = IVFIndex.build(emb, cfg, data_dtype=jnp.bfloat16)
        mc = ivf.data_padded.shape[1]
        all_s = np.zeros((n, k), np.float32)
        all_i = np.zeros((n, k), np.int64)
        for start in range(0, n, 16384):
            stop = min(start + 16384, n)
            s, i = ivf.query(
                emb[start:stop], k=k + 1, block_q=64, union_factor=1,
                approx_width=2048 if mc >= 1024 else 0,
            )
            s_h, i_h = np.asarray(s), np.asarray(i)
            rows = np.arange(start, stop)[:, None]
            keep = i_h != rows           # drop self-match
            # first k non-self hits per row, vectorized (a per-row Python
            # loop would cost seconds of host time at the ≥100k-doc scale
            # this path auto-activates at): stable-sort self-matches last
            order = np.argsort(~keep, axis=1, kind="stable")[:, :k]
            s_sel = np.take_along_axis(s_h, order, axis=1)
            i_sel = np.take_along_axis(i_h, order, axis=1)
            valid = np.take_along_axis(keep, order, axis=1)
            all_s[start:stop] = np.where(valid, s_sel, 0.0)
            all_i[start:stop] = np.where(valid, i_sel, -1)
        return all_s, all_i

    def __call__(
        self,
        corpus: Sequence[str],
        k: int = 5,
        min_score: float = 0.0,
        queries: Optional[Sequence[str]] = None,
    ):
        """With queries=None: all-pairs mining → list of (i, j, score).
        With queries: per-query top-k over the corpus → list of lists."""
        emb = self.encoder.encode(corpus, batch_size=self.batch_size)
        want_ivf = (
            self.use_ivf if self.use_ivf is not None
            else len(corpus) >= 100_000
        )
        if queries is None and want_ivf:
            s, i = self._mine_ivf(l2_normalize(jnp.asarray(emb)), k)
            pairs = []
            for r in range(len(corpus)):
                for score, j in zip(s[r], i[r]):
                    if j >= 0 and score >= min_score and r < j:
                        pairs.append((r, int(j), float(score)))
            pairs.sort(key=lambda p: -p[2])
            return pairs
        index = BruteForceIndex.from_embeddings(l2_normalize(jnp.asarray(emb)))
        if queries is None:
            s, i = index.mine(k=k)
            pairs = []
            for r in range(len(corpus)):
                for score, j in zip(s[r], i[r]):
                    if score >= min_score and r < j:  # dedupe (i,j)/(j,i)
                        pairs.append((r, int(j), float(score)))
            pairs.sort(key=lambda p: -p[2])
            return pairs
        q_emb = self.encoder.encode(list(queries), batch_size=self.batch_size)
        s, i = index.query(q_emb, k=k)
        return [
            [
                (corpus[int(j)], float(score), int(j))
                for score, j in zip(s[r], i[r])
                if score >= min_score
            ]
            for r in range(len(queries))
        ]


def compare_models(
    teacher_encoder,
    student_encoder,
    corpus: Sequence[str],
    queries: Sequence[str],
    k: int = 10,
) -> dict:
    """Teacher/student retrieval consistency: mean top-k overlap of the two
    models' search results over the same corpus — the compression
    acceptance metric of the reference (eval_sentence_mining.py:11-34,
    eval_semantic_search.py:12-35), and exactly the recall-vs-reference
    family of the north star."""
    t_pipe = SemanticSearchPipeline(teacher_encoder, corpus=list(corpus), use_ivf=False)
    s_pipe = SemanticSearchPipeline(student_encoder, corpus=list(corpus), use_ivf=False)
    t_res = t_pipe(list(queries), max_num_results=k)
    s_res = s_pipe(list(queries), max_num_results=k)
    overlaps = []
    for tr, sr in zip(t_res, s_res):
        t_ids = {cid for _, _, cid in tr}
        s_ids = {cid for _, _, cid in sr}
        overlaps.append(len(t_ids & s_ids) / max(len(t_ids), 1))
    return {
        "mean_topk_overlap": float(np.mean(overlaps)),
        "min_topk_overlap": float(np.min(overlaps)),
        "k": k,
    }
