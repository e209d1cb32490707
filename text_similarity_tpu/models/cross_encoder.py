"""CrossEncoder — pair scoring model for reranking and pair classification.

Capability parity with the reference's cross-encoder usage: a
``TransformerWrapper`` fed [CLS] a [SEP] b [SEP] pairs (reference:
src/models/modeling.py:90-146; used for reranking in
src/pipeline/ranking_pipeline.py:30). Batches are length-bucketed and the
scoring step is jitted per shape.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EncoderArch
from ..core.precision import Precision, DEFAULT_PRECISION, precision_for
from ..core import checkpoint as ckpt
from ..data.batching import pick_bucket, BUCKETS
from ..train.steps import classifier_forward, init_classifier_head
from .encoder import init_params


class CrossEncoder:
    def __init__(
        self,
        params: dict,               # {"encoder": ..., "head": ...}
        arch: EncoderArch,
        tokenizer=None,
        num_classes: int = 1,
        pooling: str = "cls",
        precision: Precision = DEFAULT_PRECISION,
    ):
        self.params = params
        self.arch = arch
        self.tokenizer = tokenizer
        self.num_classes = num_classes
        self.pooling = pooling
        self.precision = precision
        self._jit_cache = {}

    @classmethod
    def init(
        cls, key, arch: EncoderArch, tokenizer=None, num_classes: int = 1, **kw
    ) -> "CrossEncoder":
        k1, k2 = jax.random.split(key)
        params = {
            "encoder": init_params(k1, arch),
            "head": init_classifier_head(k2, arch.hidden_size, num_classes),
        }
        return cls(params, arch, tokenizer, num_classes, **kw)

    def _jitted(self, shape):
        if shape not in self._jit_cache:
            arch, precision, pooling = self.arch, self.precision, self.pooling

            def fn(params, ids, mask, type_ids):
                logits = classifier_forward(
                    params, ids, mask, type_ids,
                    arch=arch, precision=precision, pooling=pooling,
                )
                if logits.shape[-1] == 1:
                    return logits[:, 0]
                if logits.shape[-1] == 2:
                    # probability of the positive class as the rank score
                    return jax.nn.softmax(logits, axis=-1)[:, 1]
                return logits

            self._jit_cache[shape] = jax.jit(fn)
        return self._jit_cache[shape]

    def to_int8(self) -> "CrossEncoder":
        """int8 serving quantization (see SentenceEncoder.to_int8): the
        encoder stack runs true int8 MXU dots; the tiny head dequants."""
        from ..compress.quantize import quantize_params_int8

        self.params = quantize_params_int8(self.params)
        self._jit_cache.clear()
        return self

    def score_tokens(self, ids, mask, type_ids=None) -> np.ndarray:
        ids = jnp.asarray(ids, jnp.int32)
        mask = jnp.asarray(mask, jnp.int32)
        if type_ids is None:
            type_ids = jnp.zeros_like(ids)
        else:
            type_ids = jnp.asarray(type_ids, jnp.int32)
        return np.asarray(self._jitted(ids.shape)(self.params, ids, mask, type_ids))

    def predict(
        self,
        pairs: Sequence,            # sequence of (text_a, text_b)
        batch_size: int = 64,
        max_len: int = 256,
    ) -> np.ndarray:
        """Score text pairs → (N,) relevance scores (or (N, C) logits)."""
        if self.tokenizer is None:
            raise ValueError("cross encoder has no tokenizer")
        a = [p[0] for p in pairs]
        b = [p[1] for p in pairs]
        # >2 classes: score_tokens returns raw (B, C) logits, so collect
        # an (N, C) output; binary/regression heads reduce to (N,) scores.
        out_shape = (
            (len(pairs),)
            if self.num_classes <= 2
            else (len(pairs), self.num_classes)
        )
        out = np.zeros(out_shape, np.float32)
        for start in range(0, len(pairs), batch_size):
            stop = min(start + batch_size, len(pairs))
            ids, mask, tts = self.tokenizer.encode_pair_batch(
                a[start:stop], b[start:stop], max_len=max_len
            )
            # pad to bucket + fixed batch for shape stability
            L = pick_bucket(ids.shape[1], BUCKETS)
            pb = batch_size
            ids_p = np.zeros((pb, L), np.int32)
            mask_p = np.zeros((pb, L), np.int32)
            tts_p = np.zeros((pb, L), np.int32)
            n = stop - start
            w = min(ids.shape[1], L)  # rows past the largest bucket truncate
            ids_p[:n, :w] = ids[:, :w]
            mask_p[:n, :w] = mask[:, :w]
            tts_p[:n, :w] = tts[:, :w]
            scores = self.score_tokens(ids_p, mask_p, tts_p)
            out[start:stop] = scores[:n]
        return out

    # ------------------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        ckpt.save_checkpoint(
            path, self.params, step=0,
            meta={"pooling": self.pooling, "num_classes": self.num_classes},
        )
        with open(os.path.join(path, "arch.json"), "w") as f:
            f.write(self.arch.to_json())
        if self.tokenizer is not None and hasattr(self.tokenizer, "save_vocab"):
            self.tokenizer.save_vocab(os.path.join(path, "vocab.txt"))

    @classmethod
    def load(cls, path: str, bf16: bool = True) -> "CrossEncoder":
        from ..data.tokenization import load_tokenizer

        with open(os.path.join(path, "arch.json")) as f:
            arch = EncoderArch.from_json(f.read())
        meta_dir = ckpt.latest_checkpoint(path)
        if meta_dir is None:
            raise FileNotFoundError(
                f"no step_* checkpoint under {path!r}"
            )
        num_classes = 1
        template = {
            "encoder": init_params(jax.random.PRNGKey(0), arch),
            "head": init_classifier_head(
                jax.random.PRNGKey(1), arch.hidden_size, num_classes
            ),
        }
        try:
            params, _, _, meta = ckpt.restore_checkpoint(meta_dir, template)
        except KeyError:
            # head with different class count: read meta first
            import json

            with open(os.path.join(meta_dir, "meta.json")) as f:
                meta = json.load(f)["meta"]
            num_classes = meta.get("num_classes", 2)
            template["head"] = init_classifier_head(
                jax.random.PRNGKey(1), arch.hidden_size, num_classes
            )
            params, _, _, meta = ckpt.restore_checkpoint(meta_dir, template)
        try:
            tok = load_tokenizer(path)
        except FileNotFoundError:
            tok = None
        return cls(
            params, arch, tok,
            num_classes=meta.get("num_classes", num_classes),
            pooling=meta.get("pooling", "cls"),
            precision=precision_for(bf16),
        )
