"""Two-stage retrieval: bi-encoder retrieve top-k → cross-encoder rerank.

Implements the intent of the reference's ``RankingPipeline``
(src/pipeline/ranking_pipeline.py:4-46 — which contains a syntax error at
:29 and never ran; SURVEY.md headline facts): candidates from the semantic
search pipeline are re-scored with a cross-encoder as one batched TPU
inference over [query, candidate] pairs, then re-sorted.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .search import SemanticSearchPipeline


class RankingPipeline:
    def __init__(
        self,
        search: SemanticSearchPipeline,
        cross_encoder,                  # models.cross_encoder.CrossEncoder
        retrieve_k: int = 100,
        batch_size: int = 64,
    ):
        self.search = search
        self.cross_encoder = cross_encoder
        self.retrieve_k = retrieve_k
        self.batch_size = batch_size

    def __call__(
        self, queries: Sequence[str], top_k: int = 10
    ) -> List[List[Tuple[str, float, int]]]:
        """→ per query: [(document, cross_score, corpus_id)] best-first."""
        retrieved = self.search(queries, max_num_results=self.retrieve_k)
        # one flat batch over all (query, candidate) pairs → single padded
        # cross-encoder sweep instead of per-candidate calls
        flat_pairs, owners = [], []
        for qi, (q, cands) in enumerate(zip(queries, retrieved)):
            for doc, _, cid in cands:
                flat_pairs.append((q, doc))
                owners.append((qi, cid, doc))
        if not flat_pairs:
            return [[] for _ in queries]
        scores = self.cross_encoder.predict(
            flat_pairs, batch_size=self.batch_size
        )
        out: List[List[Tuple[str, float, int]]] = [[] for _ in queries]
        for (qi, cid, doc), sc in zip(owners, scores):
            out[qi].append((doc, float(sc), cid))
        for row in out:
            row.sort(key=lambda t: -t[1])
            del row[top_k:]
        return out
