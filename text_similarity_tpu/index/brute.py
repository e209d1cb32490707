"""Brute-force exact-kNN index over an EmbeddingStore.

Replaces the reference's chunked host-side cosine mining
(``SentenceMiningPipeline._search``, reference search_pipeline.py:44-89 —
which also chunks incorrectly, SURVEY.md headline facts) with the fused
Pallas matmul+top-k kernel. Exact; used both for serving small corpora and
as the recall oracle for the IVF index.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.topk import cosine_topk, cosine_topk_xla, l2_normalize
from .store import EmbeddingStore


class BruteForceIndex:
    def __init__(self, store: EmbeddingStore):
        self.store = store

    @classmethod
    def from_embeddings(cls, embeddings, capacity: Optional[int] = None):
        emb = jnp.asarray(embeddings)
        cap = capacity or emb.shape[0]
        store = EmbeddingStore(cap, emb.shape[1], emb.dtype)
        store.add(emb)
        return cls(store)

    def query(
        self, queries, k: int = 10, impl: str = "auto"
    ) -> Tuple[np.ndarray, np.ndarray]:
        """→ (scores (Q, k), ids (Q, k)). Tombstoned rows never returned.

        Over-fetches 2k then host-filters tombstones (dead rows are rare;
        a fully-masked kernel pass isn't worth the extra HBM read)."""
        q = l2_normalize(jnp.asarray(queries))
        kk = min(k * 2, self.store.size)
        if self.store.quantized:
            from ..ops.topk import cosine_topk_pallas_int8
            from ..compress.quantize import int8_matmul_scores

            if impl == "auto":
                impl = (
                    "pallas" if jax.default_backend() == "tpu" else "xla"
                )
            if impl == "pallas":
                s, i = cosine_topk_pallas_int8(
                    q.astype(jnp.float32), self.store.view,
                    self.store.scales_view, k=kk,
                )
            else:
                scores = int8_matmul_scores(
                    q.astype(jnp.float32), self.store.view,
                    self.store.scales_view,
                )
                s, i = jax.lax.top_k(scores, kk)
        else:
            s, i = cosine_topk(q, self.store.view, k=kk, impl=impl)
        alive = self.store.alive_view
        s_h, i_h = np.asarray(s), np.asarray(i)
        alive_h = np.asarray(alive)
        if not alive_h.all():
            s_h = np.where(alive_h[i_h], s_h, -np.inf)
            order = np.argsort(-s_h, axis=1)
            s_h = np.take_along_axis(s_h, order, axis=1)
            i_h = np.take_along_axis(i_h, order, axis=1)
            # if >k of the 2k over-fetch were tombstoned, the tail slots
            # hold DEAD ids at -inf — mark them -1 so callers never see
            # deleted rows as results
            i_h = np.where(np.isfinite(s_h), i_h, -1)
        return s_h[:, :k], i_h[:, :k]

    def mine(
        self, k: int = 10, batch: int = 1024
    ) -> Tuple[np.ndarray, np.ndarray]:
        """All-pairs paraphrase mining: for every stored row, its top-k
        nearest others (self-match removed) — the corrected intent of
        ``SentenceMiningPipeline`` (reference search_pipeline.py:44-93)."""
        n = self.store.size
        corpus = self.store.view
        if self.store.quantized:
            # raw int8 codes would mis-rank rows (per-row scales differ):
            # dequantize once — mining is an offline sweep, the transient
            # f32 copy is acceptable
            corpus = (
                corpus.astype(jnp.float32)
                * self.store.scales_view[:, None]
            )
        alive_h = np.asarray(self.store.alive_view)
        n_dead = int((~alive_h).sum())
        k_fetch = min(k + 1 + n_dead, n)
        all_s = np.zeros((n, k), np.float32)
        all_i = np.full((n, k), -1, np.int64)
        for start in range(0, n, batch):
            stop = min(start + batch, n)
            q = corpus[start:stop]
            s, i = cosine_topk(q, corpus, k=k_fetch)
            s_h, i_h = np.asarray(s), np.asarray(i)
            rows = np.arange(start, stop)[:, None]
            # drop self-matches AND tombstoned neighbors
            keep = (i_h != rows) & alive_h[i_h]
            order = np.argsort(~keep, axis=1, kind="stable")[:, :k]
            s_sel = np.take_along_axis(s_h, order, axis=1)
            i_sel = np.take_along_axis(i_h, order, axis=1)
            valid = np.take_along_axis(keep, order, axis=1)
            all_s[start:stop] = np.where(valid, s_sel, 0.0)
            all_i[start:stop] = np.where(valid, i_sel, -1)
        if n_dead:
            all_i[~alive_h[:n]] = -1   # dead rows mine nothing
            all_s[~alive_h[:n]] = 0.0
        return all_s, all_i
