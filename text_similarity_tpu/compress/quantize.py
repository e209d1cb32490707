"""Int8 quantization: weights + embedding-store compression.

Replaces the reference's ONNX / torch dynamic int8 quantization
(onnxruntime.quantization.quantize_dynamic and
torch.quantization.quantize_dynamic, reference
src/modules/model_compression.py:35,273,784-791) with TPU-native paths:

- ``quantize_params_int8`` / ``dequantize_params``: per-output-channel
  symmetric int8 for every ≥2-D kernel — 4× smaller checkpoints and HBM
  footprint; dequantized (to bf16) at load for serving. LayerNorm, biases
  and embeddings-LN stay fp32.
- ``quantize_embeddings_int8``: per-row symmetric int8 corpus compression
  for the embedding store; ``int8_matmul_scores`` recovers cosine scores
  with the row scales folded in — the int8 search path of BASELINE.json
  config 5.
- ``int8_dynamic_matmul``: dynamic per-tensor activation quantization +
  int8×int8→int32 dot (MXU-native) for serving-time dense layers.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _quant_leaf(w: jax.Array) -> Dict[str, jax.Array]:
    """Per-output-channel (last axis) symmetric int8, reducing only the
    contraction axis (-2). Leading axes — stacked layers L, experts E —
    each keep their own scales: a shared scale across layers/experts
    would let one outlier channel inflate every other one's quantization
    error. (For 2-D (in, out) kernels and (V, H) embedding tables the
    -2 reduction is the classic per-column scale.)"""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=w.ndim - 2, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale.astype(jnp.float32)}


def quantize_params_int8(params) -> dict:
    """Returns the quantized tree: kernels (ndim ≥ 2, name 'w' or embedding
    tables) become {"q": int8, "s": scale}; vectors stay fp32."""
    def quant(path, leaf):
        names = [str(getattr(k, "key", k)) for k in path]
        if "router" in names:
            # MoE router logits feed a softmax — precision-sensitive and
            # tiny (H, E); keep fp32
            return leaf
        # 4-D = stacked MoE expert kernels (L, E, ·, ·): per-(layer,
        # expert, out-channel) scales; moe_ffn runs them as int8 batched
        # GEMMs with dynamic per-slot activation quant
        is_kernel = 2 <= leaf.ndim <= 4 and (
            names[-1] == "w" or names[-1] in ("word", "position", "token_type")
        )
        if is_kernel:
            return _quant_leaf(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(quant, params)


def dequantize_params(qparams, dtype=jnp.bfloat16):
    """Inverse of quantize_params_int8 (q/s dicts → dense arrays)."""
    def is_qleaf(x):
        return isinstance(x, dict) and set(x.keys()) == {"q", "s"}

    def deq(x):
        if is_qleaf(x):
            return (x["q"].astype(jnp.float32) * x["s"]).astype(dtype)
        return x

    return jax.tree.map(deq, qparams, is_leaf=is_qleaf)


def save_quantized(path: str, params, meta: dict | None = None) -> None:
    """Quantize + persist (the int8 deployment artifact — the reference
    ships an int8 ONNX file, model_compression.py:883-904)."""
    import os
    from ..core.checkpoint import save_checkpoint

    q = quantize_params_int8(params)
    save_checkpoint(path, q, step=0, meta={"format": "int8", **(meta or {})})


# ---------------------------------------------------------------------------
# Embedding-store / search quantization
# ---------------------------------------------------------------------------

@jax.jit
def quantize_embeddings_int8(emb: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8: (values (N, D) int8, scales (N,) f32).

    Jitted so the upcast → scale → round → clip chain fuses into one pass
    (eager, each step materializes an (N, D) f32 temp — several GB per
    1M-row build chunk)."""
    e32 = jnp.asarray(emb, jnp.float32)
    amax = jnp.max(jnp.abs(e32), axis=1)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(
        jnp.round(e32 / scale[:, None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def int8_matmul_scores(
    queries: jax.Array,        # (Q, D) fp32 normalized
    corpus_q: jax.Array,       # (N, D) int8
    corpus_scale: jax.Array,   # (N,)
) -> jax.Array:
    """Approximate cosine scores against an int8 corpus: quantize the query
    per-row, int8×int8→int32 on the MXU, rescale."""
    qq, qs = quantize_embeddings_int8(queries)
    acc = jax.lax.dot_general(
        qq, corpus_q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * qs[:, None] * corpus_scale[None, :]


def int8_dynamic_matmul(x: jax.Array, w_q: jax.Array, w_s: jax.Array):
    """Serving-time dense layer: dynamic per-tensor activation int8
    (torch quantize_dynamic semantics) + MXU int8 dot."""
    x32 = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(x32))
    xs = jnp.maximum(ax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x32 / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * xs * w_s.reshape(
        (1,) * (acc.ndim - 1) + (-1,)
    )
