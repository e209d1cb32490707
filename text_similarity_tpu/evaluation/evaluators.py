"""Evaluators: run a model over an eval set and produce metric dicts.

Parity with reference src/evaluation/evaluators.py:
- ``ParaphraseEvaluator``  (:57-96): encode both sides of sentence pairs,
  correlation metrics (STS) or best-threshold binary metrics (PAWS/Quora)
- ``RetrievalEvaluator``   (:99-154): encode src/tgt corpora, bitext
  retrieval accuracy (Tatoeba)
- ``ClassifierEvaluator``: batched logits → accuracy/macro-F1 (the
  Learner.eval_fn path for classifiers, reference learner.py:253-336)
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from . import meters as M


class ParaphraseEvaluator:
    """Evaluate a SentenceEncoder on sentence pairs.

    mode="regression": gold are similarity scores → Pearson/Spearman.
    mode="binary": gold are 0/1 labels → best-threshold acc/F1/AP."""

    def __init__(self, encoder, mode: str = "regression", batch_size: int = 128):
        self.encoder = encoder
        self.mode = mode
        self.batch_size = batch_size

    def evaluate(
        self,
        sents_a: Sequence[str],
        sents_b: Sequence[str],
        gold: Sequence[float],
    ) -> Dict[str, float]:
        u = self.encoder.encode(sents_a, batch_size=self.batch_size)
        v = self.encoder.encode(sents_b, batch_size=self.batch_size)
        gold = np.asarray(gold)
        if self.mode == "regression":
            return M.similarity_metrics(u, v, gold)
        return M.binary_similarity_report(u, v, gold)

    def evaluate_embeddings(self, u, v, gold) -> Dict[str, float]:
        gold = np.asarray(gold)
        if self.mode == "regression":
            return M.similarity_metrics(u, v, gold)
        return M.binary_similarity_report(u, v, gold)


class RetrievalEvaluator:
    """Bitext retrieval accuracy over aligned corpora."""

    def __init__(self, encoder, batch_size: int = 128):
        self.encoder = encoder
        self.batch_size = batch_size

    def evaluate(
        self, src_sents: Sequence[str], tgt_sents: Sequence[str]
    ) -> Dict[str, float]:
        src = self.encoder.encode(src_sents, batch_size=self.batch_size)
        tgt = self.encoder.encode(tgt_sents, batch_size=self.batch_size)
        return M.retrieval_accuracy(src, tgt)


class ClassifierEvaluator:
    """Batched classifier eval: callable logits_fn(ids, mask, type_ids) →
    logits; accumulates on host only the (small) logits."""

    def __init__(self, logits_fn):
        self.logits_fn = logits_fn

    def evaluate(self, batches) -> Dict[str, float]:
        all_logits, all_labels = [], []
        for b in batches:
            logits = np.asarray(
                self.logits_fn(b["ids"], b["mask"], b.get("type_ids"))
            )
            valid = b.get("valid")
            if valid is not None:
                valid = np.asarray(valid).astype(bool)  # batches carry 0/1 ints
                logits = logits[valid]
                labels = np.asarray(b["labels"])[valid]
            else:
                labels = np.asarray(b["labels"])
            all_logits.append(logits)
            all_labels.append(labels)
        return M.classification_metrics(
            np.concatenate(all_logits), np.concatenate(all_labels)
        )
