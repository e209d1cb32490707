"""SentenceEncoder — the user-facing embedding model.

Capability parity with the reference's ``SentenceTransformerWrapper``
(reference: src/models/sentence_encoder.py:72-217): tokenize → encoder →
pooling → optional projection → (normalized) sentence embeddings, plus
save/load. TPU-native differences:

- batches snap to length buckets and a fixed batch size so every shape
  compiles once (the reference re-pads per batch: sentence_encoder.py:144);
- the jitted encode step is cached per (batch, seq) shape and shards the
  batch over the mesh ``data`` axis when a mesh is provided;
- embeddings can stream straight into an HBM-resident corpus matrix
  (see index.store) without a host round-trip.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.config import EncoderArch
from ..core.mesh import DATA_AXIS
from ..core.precision import Precision, DEFAULT_PRECISION, precision_for
from ..core import checkpoint as ckpt
from ..data.batching import LengthBucketBatcher, BUCKETS, pick_bucket
from .encoder import encoder_forward, init_params
from .pooling import mean_pool, cls_pool, max_pool, segment_mean_pool


class SentenceEncoder:
    """Bi-encoder sentence embedding model (SBERT-class)."""

    def __init__(
        self,
        params: dict,
        arch: EncoderArch,
        tokenizer=None,
        pooling: str = "mean",
        mesh=None,
        precision: Precision = DEFAULT_PRECISION,
    ):
        self.params = params
        self.arch = arch
        self.tokenizer = tokenizer
        self.pooling = pooling
        self.mesh = mesh
        self.precision = precision
        self._jit_cache = {}

    # ------------------------------------------------------------------
    # Core jitted step
    # ------------------------------------------------------------------

    def _embed_fn(self):
        arch, precision, pooling = self.arch, self.precision, self.pooling

        def fn(params, ids, mask):
            out = encoder_forward(
                params, ids, mask, arch=arch, precision=precision
            )
            h = out.last_hidden_state
            if pooling == "mean":
                emb = mean_pool(h, mask)
            elif pooling == "cls":
                emb = cls_pool(h, mask)
            elif pooling == "max":
                emb = max_pool(h, mask)
            else:
                raise ValueError(f"unknown pooling {pooling}")
            if "projection" in params:
                from .encoder import dequant_weight

                pw = params["projection"]
                emb = (
                    emb.astype(jnp.float32) @ dequant_weight(pw["w"])
                    + pw["b"]
                )
            # L2 normalize in fp32 — embeddings feed cosine search.
            emb = emb.astype(jnp.float32)
            norm = jnp.sqrt(jnp.sum(emb * emb, axis=-1, keepdims=True))
            return emb / jnp.maximum(norm, 1e-12)

        return fn

    def _jitted(self, shape):
        if shape not in self._jit_cache:
            fn = self._embed_fn()
            if self.mesh is not None:
                mesh = self.mesh
                batch_sharding = NamedSharding(mesh, P(DATA_AXIS, None))
                jfn = jax.jit(
                    fn,
                    in_shardings=(None, batch_sharding, batch_sharding),
                    out_shardings=NamedSharding(mesh, P(DATA_AXIS, None)),
                )
            else:
                jfn = jax.jit(fn)
            self._jit_cache[shape] = jfn
        return self._jit_cache[shape]

    def embed_tokens(self, ids, mask) -> jax.Array:
        """Embed a pre-tokenized (B, L) batch → (B, D) normalized fp32."""
        ids = jnp.asarray(ids, jnp.int32)
        mask = jnp.asarray(mask, jnp.int32)
        return self._jitted(ids.shape)(self.params, ids, mask)

    # batches per fused call: fixed so the compiled (STACK, B, L) shape is
    # reused for any corpus size (the stack length is part of the program).
    STACK = 16

    def _jitted_many(self, shape):
        """(STACK, B, L) stacked batches → (STACK, B, D) in ONE compiled
        call (lax.map over the stack: no per-batch dispatch)."""
        key = ("many", shape)
        if key not in self._jit_cache:
            fn = self._embed_fn()

            def many(params, ids, mask):
                return jax.lax.map(
                    lambda im: fn(params, im[0], im[1]), (ids, mask)
                )

            self._jit_cache[key] = jax.jit(many)
        return self._jit_cache[key]

    def embed_token_stack(self, ids, mask) -> jax.Array:
        """Embed an (n, B, L) stack of batches → (n, B, D). Internally runs
        fixed-size chunks of STACK batches (zero-padded tail) so each
        (B, L) bucket compiles exactly once regardless of corpus size."""
        ids = np.asarray(ids, np.int32)
        mask = np.asarray(mask, np.int32)
        n, b, l = ids.shape
        outs = []
        for st in range(0, n, self.STACK):
            chunk_ids = ids[st : st + self.STACK]
            chunk_mask = mask[st : st + self.STACK]
            pad = self.STACK - chunk_ids.shape[0]
            if pad:
                chunk_ids = np.pad(chunk_ids, ((0, pad), (0, 0), (0, 0)))
                chunk_mask = np.pad(chunk_mask, ((0, pad), (0, 0), (0, 0)))
            emb = self._jitted_many(chunk_ids.shape)(
                self.params, jnp.asarray(chunk_ids), jnp.asarray(chunk_mask)
            )
            outs.append(emb[: self.STACK - pad if pad else self.STACK])
        return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

    # ------------------------------------------------------------------
    # Packed encode (data/packing.py): several short sentences per fixed
    # row, separated by a block-diagonal attention mask + per-segment
    # positions, pooled per segment. The throughput lever for short-text
    # traffic where bucketing still pads most of every row (generalizes
    # the reference's length-sorted batching, sentence_encoder.py:138).
    # ------------------------------------------------------------------

    def _jitted_packed(self, shape, max_segments: int):
        key = ("packed", shape, max_segments)
        if key not in self._jit_cache:
            arch, precision, pooling = self.arch, self.precision, self.pooling
            if pooling != "mean":
                raise ValueError(
                    "packed encode supports mean pooling only"
                )

            def fn(params, ids, segments, positions):
                mask = (segments > 0).astype(jnp.int32)
                out = encoder_forward(
                    params, ids, mask, arch=arch, precision=precision,
                    segment_ids=segments, position_ids=positions,
                )
                emb = segment_mean_pool(
                    out.last_hidden_state, segments, max_segments
                )  # (B, M, H)
                if "projection" in params:
                    from .encoder import dequant_weight

                    pw = params["projection"]
                    emb = (
                        emb.astype(jnp.float32) @ dequant_weight(pw["w"])
                        + pw["b"]
                    )
                emb = emb.astype(jnp.float32)
                norm = jnp.sqrt(jnp.sum(emb * emb, axis=-1, keepdims=True))
                return emb / jnp.maximum(norm, 1e-12)

            if self.mesh is not None:
                rows = NamedSharding(self.mesh, P(DATA_AXIS, None))
                self._jit_cache[key] = jax.jit(
                    fn,
                    in_shardings=(None, rows, rows, rows),
                    out_shardings=NamedSharding(
                        self.mesh, P(DATA_AXIS, None, None)
                    ),
                )
            else:
                self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def embed_tokens_packed(self, ids, segments, positions) -> jax.Array:
        """Embed a packed (R, W) layout → (R, max_segments, D); slot
        (r, m) holds the embedding of the row's m-th packed sequence
        (zeros for empty slots)."""
        # derive the slot count host-side BEFORE the device transfer — an
        # eager jnp.max + readback would cost a full dispatch RTT per call
        max_seg = int(np.max(np.asarray(segments)))
        ids = jnp.asarray(ids, jnp.int32)
        segments = jnp.asarray(segments, jnp.int32)
        positions = jnp.asarray(positions, jnp.int32)
        return self._jitted_packed(ids.shape, max_seg)(
            self.params, ids, segments, positions
        )

    def encode_packed(
        self,
        texts: Sequence[str],
        width: int = 128,
        rows_per_batch: int = 256,
        max_len: int = 128,
        max_segments: int = 0,   # 0 = derive from the layout (varies per
                                 # corpus → one compile per distinct value;
                                 # pass a fixed bound for serving)
        device_output: bool = False,
    ) -> np.ndarray:
        """Encode texts via greedy packing → (N, D) normalized fp32.
        Same output contract as ``encode`` (row i ↔ texts[i])."""
        row_ids = self._tokenize_rows(texts, max_len)
        return self._encode_packed_rows(
            row_ids, len(texts), width=width,
            rows_per_batch=rows_per_batch, max_segments=max_segments,
            device_output=device_output,
        )

    def _encode_packed_rows(
        self,
        row_ids,
        n_texts: int,
        width: int,
        rows_per_batch: int = 256,
        max_segments: int = 0,
        device_output: bool = False,
        round_segments: bool = False,
    ):
        """Pack pre-tokenized rows and embed → (N, D). With
        ``round_segments`` the derived segment-slot count rounds up to the
        next power of two so serving traffic with varying layouts reuses a
        handful of compiled shapes instead of one per distinct count."""
        from ..data.packing import pack_sequences

        packed = pack_sequences(
            row_ids, width, pad_id=self.tokenizer.pad_id
        )
        m = max_segments or int(packed["owners"].shape[1])
        if round_segments and not max_segments and m > 1:
            m = 1 << (m - 1).bit_length()
        if packed["owners"].shape[1] > m:
            raise ValueError(
                f"layout needs {packed['owners'].shape[1]} segment slots, "
                f"max_segments={m}"
            )
        r = packed["ids"].shape[0]
        fn = self._jitted_packed((rows_per_batch, width), m)
        pending = []
        for st in range(0, r, rows_per_batch):
            chunk = {
                k: packed[k][st:st + rows_per_batch]
                for k in ("ids", "segments", "positions", "owners")
            }
            pad = rows_per_batch - chunk["ids"].shape[0]
            if pad:
                for k in ("ids", "segments", "positions"):
                    chunk[k] = np.pad(chunk[k], ((0, pad), (0, 0)))
                chunk["owners"] = np.pad(
                    chunk["owners"], ((0, pad), (0, 0)),
                    constant_values=-1,
                )
            ow = chunk["owners"]
            if ow.shape[1] < m:
                ow = np.pad(
                    ow, ((0, 0), (0, m - ow.shape[1])), constant_values=-1
                )
            emb = fn(
                self.params,
                jnp.asarray(chunk["ids"], jnp.int32),
                jnp.asarray(chunk["segments"], jnp.int32),
                jnp.asarray(chunk["positions"], jnp.int32),
            )
            pending.append((ow, emb))  # async dispatch; sync once below

        if device_output:
            # device-side unsort: scatter (R·M, D) slot embeddings to their
            # owner rows; empty slots (-1) land in one in-bounds trash row
            # (OOB "drop" scatters clamp on this backend — CLAUDE.md rule 9)
            out_dev = jnp.zeros(
                (n_texts + 1, self.embedding_dim), jnp.float32
            )
            for ow, emb in pending:
                idx = np.where(ow >= 0, ow, n_texts).reshape(-1)
                out_dev = out_dev.at[jnp.asarray(idx)].set(
                    emb.reshape(-1, self.embedding_dim)
                )
            return out_dev[:n_texts]

        out = np.zeros((n_texts, self.embedding_dim), np.float32)
        for ow, emb in pending:
            emb_h = np.asarray(emb)   # (R, M, D)
            sel = ow >= 0
            out[ow[sel]] = emb_h[sel]
        return out

    # ------------------------------------------------------------------
    # Text API
    # ------------------------------------------------------------------

    def _tokenize_rows(self, texts: Sequence[str], max_len: int):
        """texts → list of token-id rows ([CLS] body [SEP], ≤ max_len)."""
        if self.tokenizer is None:
            raise ValueError("encoder has no tokenizer; use embed_tokens")
        if hasattr(self.tokenizer, "tokenize_many"):
            # batched native tokenization (one C call for the corpus)
            body = self.tokenizer.tokenize_many(texts)
            return [
                [self.tokenizer.cls_id] + r[: max_len - 2]
                + [self.tokenizer.sep_id]
                for r in body
            ]
        if hasattr(self.tokenizer, "tokenize_to_ids"):
            return [
                [self.tokenizer.cls_id]
                + self.tokenizer.tokenize_to_ids(t)[: max_len - 2]
                + [self.tokenizer.sep_id]
                for t in texts
            ]
        # HF adapter path: tokenize whole corpus at once
        ids_all, mask_all = self.tokenizer.encode_batch(texts, max_len)
        return [
            list(ids_all[i, : mask_all[i].sum()]) for i in range(len(texts))
        ]

    # Auto-packing engages when bucketed batches would compute ≥30% more
    # padded tokens than a packed layout (HW: packing measured 2.32× on an
    # STS-like length distribution, docs/ROUND4.md §8 — the token ratio
    # understates the win because packed rows also keep the MXU at full
    # width, so 1.3 is conservative).
    PACK_AUTO_RATIO = 1.3

    def encode(
        self,
        texts: Sequence[str],
        batch_size: int = 128,
        max_len: int = 256,
        buckets: Sequence[int] = BUCKETS,
        show_progress: bool = False,
        device_output: bool = False,
        packed="auto",
    ) -> np.ndarray:
        """Encode texts → (N, D) float32 normalized embeddings.

        Mirrors reference ``encode_text`` (sentence_encoder.py:133-173):
        length-sorted batches, per-batch padding (to a bucket), unsorted
        back to input order. With ``device_output=True`` the result stays
        in HBM (feeding the embedding store / index without a host round
        trip — the reference always bounces GPU→numpy,
        search_pipeline.py:114).

        ``packed``: True / False / "auto". Auto routes short variable-
        length traffic through greedy sequence packing (segment-masked
        rows, docs/ROUND4.md §8: 2.32× on STS-like lengths) whenever the
        estimated padded-token ratio clears PACK_AUTO_RATIO; embeddings
        are identical either way (tests/test_packing.py parity)."""
        if len(texts) == 0:
            out = np.zeros((0, self.embedding_dim), np.float32)
            return jnp.asarray(out) if device_output else out
        row_ids = self._tokenize_rows(texts, max_len)

        use_packed = packed is True
        if packed == "auto" and self.pooling == "mean" and len(texts) > 8:
            lens = np.asarray([len(r) for r in row_ids], np.int64)
            width = pick_bucket(int(lens.max()), buckets)
            # bucketed cost: same-bucket groups of batch_size rows, tail
            # batches padded to full size (LengthBucketBatcher semantics)
            bucket_tokens = 0
            blens = np.asarray([pick_bucket(int(l), buckets) for l in lens])
            for b in np.unique(blens):
                cnt = int((blens == b).sum())
                n_batches = -(-cnt // batch_size)
                bucket_tokens += n_batches * batch_size * int(b)
            # packed cost: FFD fills ≥98% of every row in practice
            est_rows = -(-int(lens.sum()) // int(width * 0.98))
            use_packed = (
                bucket_tokens >= self.PACK_AUTO_RATIO * est_rows * width
            )
        if use_packed:
            width = pick_bucket(
                max(len(r) for r in row_ids), buckets
            )
            return self._encode_packed_rows(
                row_ids, len(texts), width=width,
                device_output=device_output, round_segments=True,
            )

        batcher = LengthBucketBatcher(
            batch_size, buckets=buckets, shuffle_batches=False
        )
        # Dispatch every batch asynchronously (jit calls return immediately;
        # the device queue pipelines them), then synchronize ONCE at the
        # end — per-batch host syncs would serialize on dispatch latency.
        pending = []
        for batch in batcher.batches(row_ids, pad_id=self.tokenizer.pad_id):
            emb = self.embed_tokens(batch["ids"], batch["mask"])
            pending.append((batch, emb))

        if device_output:
            # one extra in-bounds trash row absorbs padding-row embeddings —
            # OOB "drop" scatters are clamped (not dropped) on some TPU
            # backends, which would clobber row 0 with a pad embedding
            out_dev = jnp.zeros(
                (len(texts) + 1, self.embedding_dim), jnp.float32
            )
            for b, emb in pending:
                idx = np.where(b["index"] >= 0, b["index"], len(texts))
                out_dev = out_dev.at[jnp.asarray(idx)].set(emb)
            return out_dev[: len(texts)]

        out = np.zeros((len(texts), self.embedding_dim), np.float32)
        for b, emb in pending:
            emb_h = np.asarray(emb)
            sel = b["valid"]
            out[b["index"][sel]] = emb_h[sel]
        return out

    def encode_long(
        self,
        texts: Sequence[str],
        mesh,
        max_len: int = 4096,
        strategy: str = "ring",     # ring | ulysses (models/long_context)
        batch_size: int = 8,
    ) -> np.ndarray:
        """Encode documents at sequence lengths beyond one chip's
        attention memory: the full encoder runs context-parallel over the
        mesh ``seq`` axis (exact attention — the reference could only
        approximate long context, SURVEY.md §5.7). Pooling/normalization
        match encode()."""
        from ..core.mesh import SEQ_AXIS
        from .long_context import encoder_forward_cp

        if self.tokenizer is None:
            raise ValueError("encoder has no tokenizer")
        n_seq = mesh.shape[SEQ_AXIS]
        ids, mask = self.tokenizer.encode_batch(list(texts), max_len)
        # Snap the sequence width to a power-of-2 bucket (multiple of the
        # seq axis): a width that floats with the longest document would
        # trigger a fresh minutes-long remote compile per distinct corpus
        # length — the same reason encode() buckets.
        width = ids.shape[1]
        bucket = n_seq
        while bucket < width:
            bucket *= 2
        bucket = min(bucket, max(max_len, n_seq))
        if bucket % n_seq:
            bucket = (bucket + n_seq - 1) // n_seq * n_seq
        if bucket != width:
            if bucket < width:   # max_len cap below tokenized width
                ids, mask = ids[:, :bucket], mask[:, :bucket]
            else:
                ids = np.pad(ids, ((0, 0), (0, bucket - width)))
                mask = np.pad(mask, ((0, 0), (0, bucket - width)))
        params, arch, precision, pooling = (
            self.params, self.arch, self.precision, self.pooling,
        )
        key = ("cp", strategy, mesh, batch_size)
        if key not in self._jit_cache:
            from .encoder import dequant_weight

            def fn(p, i, m):
                h = encoder_forward_cp(
                    p, i, m, arch=arch, mesh=mesh, strategy=strategy,
                    precision=precision,
                )
                # same pool → projection → L2 tail as encode()'s _embed_fn
                if pooling == "mean":
                    emb = mean_pool(h, m)
                elif pooling == "cls":
                    emb = cls_pool(h, m)
                elif pooling == "max":
                    emb = max_pool(h, m)
                else:
                    raise ValueError(f"unknown pooling {pooling}")
                if "projection" in p:
                    pw = p["projection"]
                    emb = (
                        emb.astype(jnp.float32) @ dequant_weight(pw["w"])
                        + pw["b"]
                    )
                emb = emb.astype(jnp.float32)
                norm = jnp.sqrt(jnp.sum(emb * emb, axis=-1, keepdims=True))
                return emb / jnp.maximum(norm, 1e-12)

            self._jit_cache[key] = jax.jit(fn)
        jfn = self._jit_cache[key]
        # dispatch every batch asynchronously, sync once at the end
        # (per-batch readback would serialize on the dispatch RTT)
        pending = []
        for start in range(0, len(texts), batch_size):
            stop = min(start + batch_size, len(texts))
            pad = batch_size - (stop - start)
            i_b = np.pad(ids[start:stop], ((0, pad), (0, 0)))
            m_b = np.pad(mask[start:stop], ((0, pad), (0, 0)))
            m_b[stop - start:, 0] = 1   # all-pad rows: keep one valid
                                        # position so pooling stays finite
            pending.append(
                (start, stop, jfn(params, jnp.asarray(i_b), jnp.asarray(m_b)))
            )
        out = np.zeros((len(texts), self.embedding_dim), np.float32)
        for start, stop, emb in pending:
            out[start:stop] = np.asarray(emb)[: stop - start]
        return out

    @property
    def embedding_dim(self) -> int:
        return self.arch.embedding_size

    def to_int8(self) -> "SentenceEncoder":
        """Quantize params to int8 for serving: dense layers then run
        dynamic per-token activation quantization and int8×int8→int32
        MXU dots (2× the bf16 MXU rate on v5e, half the weight HBM
        stream) — the TPU-native form of the reference's onnxruntime
        int8 serving (model_compression.py:784-791). MoE expert kernels
        quantize too (batched int8 GEMMs, ops/moe.expert_gemm); only the
        softmax-sensitive router stays fp32. Inference-only."""
        from ..compress.quantize import quantize_params_int8

        self.params = quantize_params_int8(self.params)
        self._jit_cache.clear()
        return self

    def to_bf16(self) -> "SentenceEncoder":
        """Cast params to bf16 once for serving — halves the parameter HBM
        read per forward (the per-call f32→bf16 cast otherwise reads the
        full f32 tree every batch). LayerNorm math stays fp32 inside the
        forward regardless of storage dtype."""
        self.params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            self.params,
        )
        self._jit_cache.clear()
        return self

    # ------------------------------------------------------------------
    # Persistence (analogue of save_pretrained/from_pretrained,
    # reference sentence_encoder.py:178-217 — JSON + npz, no pickle)
    # ------------------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        ckpt.save_checkpoint(path, self.params, step=0, meta={"pooling": self.pooling})
        with open(os.path.join(path, "arch.json"), "w") as f:
            f.write(self.arch.to_json())
        if self.tokenizer is not None and hasattr(self.tokenizer, "save_vocab"):
            self.tokenizer.save_vocab(os.path.join(path, "vocab.txt"))

    @classmethod
    def load(cls, path: str, mesh=None, bf16: bool = True):
        from ..data.tokenization import load_tokenizer

        with open(os.path.join(path, "arch.json")) as f:
            arch = EncoderArch.from_json(f.read())
        cdir = ckpt.latest_checkpoint(path)
        if cdir is None:
            raise FileNotFoundError(
                f"no step_* checkpoint under {path!r}"
            )
        params, _, meta = ckpt.restore_checkpoint_raw(cdir)
        if meta.get("format") == "int8" or meta.get("int8"):
            from ..compress.quantize import dequantize_params

            params = dequantize_params(
                params, jnp.bfloat16 if bf16 else jnp.float32
            )
        try:
            tok = load_tokenizer(path)
        except FileNotFoundError:
            tok = None
        return cls(
            params,
            arch,
            tokenizer=tok,
            pooling=meta.get("pooling", "mean"),
            mesh=mesh,
            precision=precision_for(bf16),
        )

    @classmethod
    def from_hf(cls, hf_model, tokenizer=None, pooling: str = "mean", **kw):
        """Build from a live transformers model (offline conversion)."""
        from .hf_convert import convert_hf_model

        params, arch = convert_hf_model(hf_model)
        return cls(params, arch, tokenizer=tokenizer, pooling=pooling, **kw)
