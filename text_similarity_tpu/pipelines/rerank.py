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
        ce = self.cross_encoder
        tok = getattr(ce, "tokenizer", None)
        if (
            hasattr(tok, "encode_bodies") and ce.pooling == "cls"
            and ce.num_classes <= 2 and len(flat_pairs) > 2048
        ):
            # wave-pipelined packed scoring: host tokenize+pack of wave
            # i+1 overlaps the device scoring of wave i (dispatches are
            # async; one drain at the end). Measured on HW: host legs
            # were ~60% of the serial composed rerank time.
            scores = self._predict_pipelined(flat_pairs)
        else:
            scores = ce.predict(flat_pairs, batch_size=self.batch_size)
        out: List[List[Tuple[str, float, int]]] = [[] for _ in queries]
        return self._rank(out, owners, scores, queries, top_k)

    def _predict_pipelined(
        self, flat_pairs, wave: int = 8192, max_len: int = 256
    ) -> np.ndarray:
        """Wave-pipelined packed pair scoring: tokenize + pack wave i+1
        on the host while the device scores wave i. All device dispatches
        are async, so a single thread gets the overlap; scores drain once
        at the end. Requires the array tokenizer path
        (WordPieceTokenizer.encode_bodies → data.packing.pack_pair_arrays)."""
        from ..data.batching import BUCKETS, pick_bucket
        from ..data.packing import pack_pair_arrays

        ce = self.cross_encoder
        tok = ce.tokenizer
        n = len(flat_pairs)
        out = np.zeros(n, np.float32)
        pending = []
        for st in range(0, n, wave):
            chunk = flat_pairs[st:st + wave]
            a = [p[0] for p in chunk]
            b = [p[1] for p in chunk]
            ba, la = tok.encode_bodies(a, max_len - 3)
            bb, lb = tok.encode_bodies(b, max_len - 3)
            lens = np.minimum(la + lb, max_len - 3) + 3
            width = pick_bucket(int(lens.max()), BUCKETS)
            layout = pack_pair_arrays(
                ba, la, bb, lb, width,
                cls_id=tok.cls_id, sep_id=tok.sep_id, pad_id=tok.pad_id,
                max_len=min(max_len, width),
            )
            pending.append(
                (st, ce._dispatch_packed_layout(layout, width))
            )
        for st, p in pending:
            ce._collect_packed(p, out, base=st)
        return out

    def _rank(self, out, owners, scores, queries, top_k):
        for (qi, cid, doc), sc in zip(owners, scores):
            out[qi].append((doc, float(sc), cid))
        for row in out:
            row.sort(key=lambda t: -t[1])
            del row[top_k:]
        return out
