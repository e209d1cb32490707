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
from ..data.batching import LengthBucketBatcher, BUCKETS
from .encoder import encoder_forward, init_params
from .pooling import mean_pool, cls_pool, max_pool


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
                pw = params["projection"]
                emb = emb.astype(jnp.float32) @ pw["w"] + pw["b"]
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

    # ------------------------------------------------------------------
    # Text API
    # ------------------------------------------------------------------

    def encode(
        self,
        texts: Sequence[str],
        batch_size: int = 128,
        max_len: int = 256,
        buckets: Sequence[int] = BUCKETS,
        show_progress: bool = False,
    ) -> np.ndarray:
        """Encode texts → (N, D) float32 normalized embeddings (host).

        Mirrors reference ``encode_text`` (sentence_encoder.py:133-173):
        length-sorted batches, per-batch padding (to a bucket), unsorted
        back to input order."""
        if self.tokenizer is None:
            raise ValueError("encoder has no tokenizer; use embed_tokens")
        row_ids = [
            [self.tokenizer.cls_id]
            + self.tokenizer.tokenize_to_ids(t)[: max_len - 2]
            + [self.tokenizer.sep_id]
            if hasattr(self.tokenizer, "tokenize_to_ids")
            else None
            for t in texts
        ]
        if row_ids and row_ids[0] is None:
            # HF adapter path: tokenize whole corpus at once
            ids_all, mask_all = self.tokenizer.encode_batch(texts, max_len)
            row_ids = [
                list(ids_all[i, : mask_all[i].sum()]) for i in range(len(texts))
            ]

        batcher = LengthBucketBatcher(
            batch_size, buckets=buckets, shuffle_batches=False
        )
        out = np.zeros((len(texts), self.embedding_dim), np.float32)
        it = batcher.batches(row_ids, pad_id=self.tokenizer.pad_id)
        for batch in it:
            emb = np.asarray(self.embed_tokens(batch["ids"], batch["mask"]))
            sel = batch["valid"]
            out[batch["index"][sel]] = emb[sel]
        return out

    @property
    def embedding_dim(self) -> int:
        return self.arch.embedding_size

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
        template = init_params(jax.random.PRNGKey(0), arch)
        cdir = ckpt.latest_checkpoint(path)
        params, _, _, meta = ckpt.restore_checkpoint(cdir, template)
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
