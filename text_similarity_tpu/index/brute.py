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
