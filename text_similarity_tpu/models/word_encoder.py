"""Word-level encoders for word-in-context (WiC) and graded word similarity
(GWSC) tasks.

Capability parity with reference src/models/word_encoder.py:8-144
(``WordEncoderModel``/``GWSCModel``: encode both sentences, pool the target
word's sub-token span, compare) and the frozen ``ContextualEmbedder``
(src/modules/contextual_embedder.py:8-86: summed last-4-layer hidden
states). The reference's WordNet sense-embedding concat (ARES/LMMS lookup,
utils.py:190-262) maps to ``sense_bank`` — an optional (S, Ds) embedding
matrix whose best-matching row (1-NN cosine against the contextual word
vector) is concatenated before scoring.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EncoderArch
from ..core.precision import Precision, DEFAULT_PRECISION
from .encoder import encoder_forward
from .pooling import word_span_pool


def contextual_word_embedding(
    enc_params: dict,
    ids, mask, span,                    # (B,S), (B,S), (B,W)
    *,
    arch: EncoderArch,
    precision: Precision = DEFAULT_PRECISION,
    last_k_layers: int = 4,
    rng=None,
    deterministic: bool = True,
) -> jax.Array:
    """Target-word vector: sum of the last k layers' hidden states pooled
    over the word's sub-token span (ContextualEmbedder semantics,
    contextual_embedder.py:38-64)."""
    out = encoder_forward(
        enc_params, ids, mask, arch=arch, precision=precision,
        output_hidden_states=True, deterministic=deterministic,
        dropout_rng=rng,
    )
    hs = out.hidden_states  # (L+1, B, S, H)
    k = min(last_k_layers, hs.shape[0])
    summed = jnp.sum(hs[-k:].astype(jnp.float32), axis=0)
    return word_span_pool(summed, span)


def match_sense(word_vecs: jax.Array, sense_bank: jax.Array) -> jax.Array:
    """1-NN cosine lookup into a sense-embedding bank → matched sense rows
    (reference utils.py:190-262)."""
    w = word_vecs / jnp.maximum(
        jnp.linalg.norm(word_vecs, axis=-1, keepdims=True), 1e-12
    )
    s = sense_bank / jnp.maximum(
        jnp.linalg.norm(sense_bank, axis=-1, keepdims=True), 1e-12
    )
    sims = w.astype(jnp.float32) @ s.astype(jnp.float32).T
    best = jnp.argmax(sims, axis=-1)
    return sense_bank[best]


class WordEncoder:
    """Twin-tower word-in-context model: cosine of the two word vectors
    (optionally sense-augmented) predicts same-sense / different-sense."""

    def __init__(
        self,
        enc_params: dict,
        arch: EncoderArch,
        tokenizer=None,
        sense_bank: Optional[jax.Array] = None,
        last_k_layers: int = 4,
        precision: Precision = DEFAULT_PRECISION,
    ):
        self.enc_params = enc_params
        self.arch = arch
        self.tokenizer = tokenizer
        self.sense_bank = sense_bank
        self.last_k_layers = last_k_layers
        self.precision = precision
        self._jit = {}

    def score_tokens(self, batch) -> np.ndarray:
        """Cosine similarity of the two target-word vectors per pair.

        Params and sense bank are jit ARGUMENTS (closure capture would bake
        them into the compiled HLO as constants)."""
        use_senses = self.sense_bank is not None
        # use_senses is baked into the traced fn: keying on it too means
        # setting sense_bank AFTER a shape was scored retraces instead of
        # silently reusing the senseless closure
        key = (batch["ids_a"].shape, use_senses)
        if key not in self._jit:
            arch = self.arch
            precision = self.precision
            last_k = self.last_k_layers

            def word_vec(enc_params, sense_bank, ids, mask, span):
                v = contextual_word_embedding(
                    enc_params, ids, mask, span,
                    arch=arch, precision=precision, last_k_layers=last_k,
                )
                if use_senses:
                    sense = match_sense(v, sense_bank)
                    v = jnp.concatenate([v, sense.astype(v.dtype)], axis=-1)
                return v

            def fn(enc_params, sense_bank,
                   ids_a, mask_a, span_a, ids_b, mask_b, span_b):
                u = word_vec(enc_params, sense_bank, ids_a, mask_a, span_a)
                v = word_vec(enc_params, sense_bank, ids_b, mask_b, span_b)
                u = u.astype(jnp.float32)
                v = v.astype(jnp.float32)
                un = jnp.maximum(jnp.linalg.norm(u, axis=-1), 1e-12)
                vn = jnp.maximum(jnp.linalg.norm(v, axis=-1), 1e-12)
                return jnp.sum(u * v, axis=-1) / (un * vn)

            self._jit[key] = jax.jit(fn)
        sense_bank = (
            self.sense_bank
            if self.sense_bank is not None
            else jnp.zeros((1, 1), jnp.float32)
        )
        return np.asarray(
            self._jit[key](
                self.enc_params, sense_bank,
                jnp.asarray(batch["ids_a"]), jnp.asarray(batch["mask_a"]),
                jnp.asarray(batch["span_a"]), jnp.asarray(batch["ids_b"]),
                jnp.asarray(batch["mask_b"]), jnp.asarray(batch["span_b"]),
            )
        )

    def evaluate_wic(self, batches) -> dict:
        """Best-threshold accuracy over cosine scores (WiC protocol,
        reference experiments/eval_wic.py:12-126)."""
        from ..evaluation.meters import best_threshold_accuracy

        scores, labels = [], []
        for b in batches:
            s = self.score_tokens(b)
            v = b["valid"].astype(bool)
            scores.append(s[v])
            labels.append(np.asarray(b["target"])[v])
        return best_threshold_accuracy(
            np.concatenate(scores), np.concatenate(labels)
        )

    def graded_similarity(self, batches) -> np.ndarray:
        """GWSC: graded word-similarity-in-context scores (cosine change),
        reference word_encoder.py:53-144. Scores are realigned to the
        ORIGINAL example order and padding rows dropped — batches arrive
        length-sorted with padded tails (same realignment evaluate_gwsc
        does; raw concatenation would pair scrambled scores with gold)."""
        scores, idxs = [], []
        for b in batches:
            s = self.score_tokens(b)
            v = np.asarray(b["valid"]).astype(bool)
            scores.append(s[v])
            idxs.append(np.asarray(b["index"])[v])
        flat_s = np.concatenate(scores)
        flat_i = np.concatenate(idxs)
        out = np.zeros(flat_i.max() + 1 if len(flat_i) else 0, np.float32)
        out[flat_i] = flat_s
        return out

    def evaluate_gwsc(self, batches, gold_scores) -> dict:
        """Graded word similarity in context: Pearson/Spearman between the
        model's cosine scores and human graded similarity change
        (reference experiments/eval_gwsc.py:10-45)."""
        from scipy.stats import pearsonr, spearmanr

        # batches arrive length-sorted/shuffled: realign every score to
        # its ORIGINAL example index before pairing with gold — without
        # this the correlations are computed over scrambled pairs
        scores, idxs = [], []
        for b in batches:
            s = self.score_tokens(b)
            v = np.asarray(b["valid"]).astype(bool)
            scores.append(s[v])
            idxs.append(np.asarray(b["index"])[v])
        scores = np.concatenate(scores)
        idxs = np.concatenate(idxs)
        order = np.argsort(idxs)
        scores = scores[order]
        gold = np.asarray(gold_scores, np.float64)[idxs[order]]
        return {
            "pearson": float(pearsonr(gold, scores)[0]),
            "spearman": float(spearmanr(gold, scores)[0]),
        }
