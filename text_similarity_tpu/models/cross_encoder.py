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
from .encoder import init_params, encoder_forward, dequant_weight
from .pooling import segment_first_pool


def _strip_pair_rows(ids, mask, tts):
    """Padded (N, L) pair arrays → per-pair token/type lists for packing."""
    lens = mask.sum(axis=1)
    rows = [list(ids[i, : lens[i]]) for i in range(ids.shape[0])]
    types = [list(tts[i, : lens[i]]) for i in range(ids.shape[0])]
    return rows, types


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

    def _score_of_logits(self, logits):
        if logits.shape[-1] == 1:
            return logits[..., 0]
        if logits.shape[-1] == 2:
            return jax.nn.softmax(logits, axis=-1)[..., 1]
        return logits

    def _jitted_packed(self, shape, max_segments: int):
        """Packed pair scoring: several [CLS] a [SEP] b [SEP] pairs per
        fixed-width row behind a block-diagonal mask (data/packing.py) —
        rerank pairs are short (~40 tokens vs 128-256 wide rows), so
        packing multiplies cross-encoder throughput the same way it does
        encode (docs/ROUND4.md §8). Each pair's own [CLS] pools via
        segment_first_pool."""
        key = ("packed", shape, max_segments)
        if key not in self._jit_cache:
            arch, precision = self.arch, self.precision
            if self.pooling != "cls":
                raise ValueError("packed scoring supports cls pooling only")

            def fn(params, ids, segments, positions, type_ids):
                mask = (segments > 0).astype(jnp.int32)
                out = encoder_forward(
                    params["encoder"], ids, mask, type_ids, arch=arch,
                    precision=precision, segment_ids=segments,
                    position_ids=positions,
                )
                pooled = segment_first_pool(
                    out.last_hidden_state, segments, max_segments
                )  # (R, M, H)
                enc = params["encoder"]
                if arch.has_pooler and "pooler" in enc:
                    # dense scoring (classifier_forward, pooling="cls")
                    # routes CLS through the BERT pooler tanh — the packed
                    # path must match or packed/dense scores diverge
                    pw = enc["pooler"]
                    pooled = jnp.tanh(
                        pooled.astype(jnp.float32)
                        @ dequant_weight(pw["w"]) + pw["b"]
                    )
                head = params["head"]
                logits = (
                    pooled.astype(jnp.float32) @ dequant_weight(head["w"])
                    + head["b"]
                )
                return self._score_of_logits(logits)   # (R, M) or (R, M, C)

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    # same conservative threshold as SentenceEncoder.encode — see there
    PACK_AUTO_RATIO = 1.3

    def predict_packed(
        self,
        pairs: Sequence,
        width: int = 256,
        rows_per_batch: int = 512,   # HW plateau 512-1024 rows/call;
                                     # 128-256 is relay-dispatch-bound
        max_len: int = 256,
        max_segments: int = 0,   # 0 = derive (rounded up to a power of
                                 # two to bound compile shapes)
    ) -> np.ndarray:
        """Score pairs via greedy packing — same output contract as
        ``predict`` (score i ↔ pairs[i])."""
        if self.tokenizer is None:
            raise ValueError("cross encoder has no tokenizer")
        a = [p[0] for p in pairs]
        b = [p[1] for p in pairs]
        ml = min(max_len, width)
        if hasattr(self.tokenizer, "encode_bodies"):
            # array fast path: all-C pthread tokenize per side + fully
            # vectorized pair layout — no ragged Python rows anywhere.
            # The padded build+strip it replaces measured 88% of the
            # composed rerank wall time at 25k pairs (docs/ROUND5.md).
            from ..data.packing import pack_pair_arrays

            ba, la = self.tokenizer.encode_bodies(a, ml - 3)
            bb, lb = self.tokenizer.encode_bodies(b, ml - 3)
            packed = pack_pair_arrays(
                ba, la, bb, lb, width,
                cls_id=self.tokenizer.cls_id,
                sep_id=self.tokenizer.sep_id,
                pad_id=self.tokenizer.pad_id, max_len=ml,
            )
            return self._predict_packed_layout(
                packed, len(pairs), width, rows_per_batch, max_segments
            )
        if hasattr(self.tokenizer, "encode_pair_rows"):
            # ragged middle path (tokenizers without array bodies)
            rows, types = self.tokenizer.encode_pair_rows(a, b, max_len=ml)
        else:
            ids, mask, tts = self.tokenizer.encode_pair_batch(
                a, b, max_len=ml
            )
            rows, types = _strip_pair_rows(ids, mask, tts)
        return self._predict_packed_rows(
            rows, types, len(pairs), width, rows_per_batch, max_segments
        )

    def _predict_packed_rows(
        self, rows, types, n_pairs: int, width: int,
        rows_per_batch: int = 512, max_segments: int = 0,
    ) -> np.ndarray:
        from ..data.packing import pack_sequences

        packed = pack_sequences(
            rows, width, pad_id=self.tokenizer.pad_id, row_types=types
        )
        return self._predict_packed_layout(
            packed, n_pairs, width, rows_per_batch, max_segments
        )

    def _dispatch_packed_layout(
        self, packed, width: int,
        rows_per_batch: int = 512, max_segments: int = 0,
    ):
        """Dispatch a packed layout's device work WITHOUT syncing: returns
        a list of (owners, in-flight scores). The caller can prepare the
        next batch on host while the device runs, then drain with
        ``_collect_packed``. This is the wave-pipelining hook the serving
        rerank path uses (RankingPipeline)."""
        m = int(packed["owners"].shape[1])
        if not max_segments and m > 1:
            m = 1 << (m - 1).bit_length()
        m = max_segments or m
        if packed["owners"].shape[1] > m:
            raise ValueError(
                f"layout needs {packed['owners'].shape[1]} segment slots, "
                f"max_segments={m}"
            )
        r = packed["ids"].shape[0]
        # clamp to the layout: the 512-1024 plateau was measured on ~10k-row
        # rerank sets; a small interactive call should keep a small padded
        # shape instead of padding to 512 rows (ADVICE r4)
        rows_per_batch = min(
            rows_per_batch, max(128, 1 << (r - 1).bit_length())
        )
        fn = self._jitted_packed((rows_per_batch, width), m)
        pending = []
        for st in range(0, r, rows_per_batch):
            chunk = {
                k: packed[k][st:st + rows_per_batch]
                for k in ("ids", "segments", "positions", "type_ids",
                          "owners")
            }
            pad = rows_per_batch - chunk["ids"].shape[0]
            if pad:
                for k in ("ids", "segments", "positions", "type_ids"):
                    chunk[k] = np.pad(chunk[k], ((0, pad), (0, 0)))
                chunk["owners"] = np.pad(
                    chunk["owners"], ((0, pad), (0, 0)), constant_values=-1
                )
            ow = chunk["owners"]
            if ow.shape[1] < m:
                ow = np.pad(
                    ow, ((0, 0), (0, m - ow.shape[1])), constant_values=-1
                )
            scores = fn(
                self.params,
                jnp.asarray(chunk["ids"], jnp.int32),
                jnp.asarray(chunk["segments"], jnp.int32),
                jnp.asarray(chunk["positions"], jnp.int32),
                jnp.asarray(chunk["type_ids"], jnp.int32),
            )
            pending.append((ow, scores))   # async; drain later
        return pending

    def _collect_packed(self, pending, out: np.ndarray, base: int = 0):
        """Drain in-flight packed scores into ``out`` (pair-slot order);
        ``base`` offsets owner indices (wave-pipelined callers score pair
        slices)."""
        for ow, scores in pending:
            sh = np.asarray(scores)
            sel = ow >= 0
            out[base + ow[sel]] = sh[sel]

    def _predict_packed_layout(
        self, packed, n_pairs: int, width: int,
        rows_per_batch: int = 512, max_segments: int = 0,
    ) -> np.ndarray:
        pending = self._dispatch_packed_layout(
            packed, width, rows_per_batch, max_segments
        )
        out_shape = (
            (n_pairs,)
            if self.num_classes <= 2
            else (n_pairs, self.num_classes)
        )
        out = np.zeros(out_shape, np.float32)
        self._collect_packed(pending, out)
        return out

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
        packed="auto",
    ) -> np.ndarray:
        """Score text pairs → (N,) relevance scores (or (N, C) logits).

        ``packed``: True / False / "auto". Rerank pairs are usually short
        relative to the bucket width, so auto routes them through greedy
        sequence packing (several pairs per row behind a block-diagonal
        mask, each scored at its own [CLS] via segment_first_pool) when
        the padded-token estimate clears PACK_AUTO_RATIO — identical
        scores, parity-tested."""
        if self.tokenizer is None:
            raise ValueError("cross encoder has no tokenizer")
        a = [p[0] for p in pairs]
        b = [p[1] for p in pairs]
        if (
            packed is True
            or (packed == "auto" and self.pooling == "cls"
                and len(pairs) > 8)
        ):
            fast = hasattr(self.tokenizer, "encode_bodies")
            if fast:
                # array fast path: tokenize each side once in the all-C
                # batch call; pair lengths come from body lens (final
                # packed length = min(la+lb, budget) + 3 after
                # longest-first truncation). The padded encode_pair_batch
                # this replaces was 88% of composed rerank wall time.
                ba, la = self.tokenizer.encode_bodies(a, max_len - 3)
                bb, lb = self.tokenizer.encode_bodies(b, max_len - 3)
                lens = np.minimum(la + lb, max_len - 3) + 3
            else:
                ids, mask, tts = self.tokenizer.encode_pair_batch(
                    a, b, max_len=max_len
                )
                lens = mask.sum(axis=1)
            width = pick_bucket(int(lens.max()), BUCKETS)
            # bucketed cost mirrors the loop below: per in-order chunk of
            # batch_size, rows pad to the chunk's longest bucket
            bucket_tokens = 0
            for st in range(0, len(pairs), batch_size):
                chunk_max = int(lens[st:st + batch_size].max())
                bucket_tokens += batch_size * pick_bucket(chunk_max, BUCKETS)
            est_rows = -(-int(lens.sum()) // int(width * 0.98))
            if (
                packed is True
                or bucket_tokens >= self.PACK_AUTO_RATIO * est_rows * width
            ):
                if fast:
                    from ..data.packing import pack_pair_arrays

                    layout = pack_pair_arrays(
                        ba, la, bb, lb, width,
                        cls_id=self.tokenizer.cls_id,
                        sep_id=self.tokenizer.sep_id,
                        pad_id=self.tokenizer.pad_id,
                        max_len=min(max_len, width),
                    )
                    return self._predict_packed_layout(
                        layout, len(pairs), width
                    )
                rows, types = _strip_pair_rows(ids, mask, tts)
                return self._predict_packed_rows(
                    rows, types, len(pairs), width
                )
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
