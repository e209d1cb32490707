"""Structured pruning: gradient-based head / FFN-neuron importance and
weight rewiring.

Parity with the reference's FastFormers pruning
(src/modules/model_compression.py:305-585: head importance from grads of a
head mask and FFN importance over an eval set :356-441, layerwise
normalization :443-447, importance-sorted re-concatenation of Q/K/V and FFN
weights :455-568, config patch :570-585) and the HF masking path
(:587-782).

TPU-native: head importance is the gradient of the loss wrt the (L, H)
head-mask input of the stock forward — no hooks; FFN importance is a
first-order Taylor score |W ⊙ ∂L/∂W| reduced over the output axis — no
forward modification; the rewire is a per-layer gather on the stacked
(L, ...) parameter pytree, producing a genuinely smaller dense model."""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EncoderArch
from ..core.precision import Precision, FP32_PRECISION
from ..train.steps import classifier_forward
from ..models import losses as L
from ..utils.logging import get_logger

logger = get_logger("prune")


def head_importance(
    params: dict,                 # {"encoder": ..., "head": ...}
    arch: EncoderArch,
    batches,                      # classifier batches (ids/mask/labels/valid)
    pooling: str = "cls",
    normalize_layers: bool = True,
) -> np.ndarray:
    """(L, num_heads) |∂loss/∂head_mask| accumulated over the eval set
    (reference compute_heads_importance / prune_rewire grads pass)."""

    def loss_wrt_mask(hm, p, batch):
        # params are an ARGUMENT, not a closure capture — captured arrays
        # bake into the HLO as constants (CLAUDE.md rule 1: ~10-minute
        # remote compiles for a 22M-param model)
        logits = classifier_forward(
            p, batch["ids"], batch["mask"], batch.get("type_ids"),
            arch=arch, precision=FP32_PRECISION, pooling=pooling,
            head_mask=hm,
        )
        return L.cross_entropy_loss(logits, batch["labels"], batch.get("valid"))

    grad_fn = jax.jit(jax.grad(loss_wrt_mask, argnums=0))
    hm = jnp.ones((arch.num_layers, arch.num_heads), jnp.float32)
    acc = np.zeros((arch.num_layers, arch.num_heads), np.float64)
    for b in batches:
        g = grad_fn(hm, params, jax.tree.map(jnp.asarray, b))
        acc += np.abs(np.asarray(g, np.float64))
    if normalize_layers:
        norm = np.linalg.norm(acc, axis=1, keepdims=True)
        acc = acc / np.maximum(norm, 1e-20)
    return acc


def ffn_importance(
    params: dict,
    arch: EncoderArch,
    batches,
    pooling: str = "cls",
    normalize_layers: bool = True,
) -> np.ndarray:
    """(L, intermediate) Taylor importance |W_out ⊙ ∂loss/∂W_out| summed
    over the output axis — equivalent to the grad-of-a-neuron-mask score
    without modifying the forward."""

    def loss_wrt_params(p, batch):
        logits = classifier_forward(
            p, batch["ids"], batch["mask"], batch.get("type_ids"),
            arch=arch, precision=FP32_PRECISION, pooling=pooling,
        )
        return L.cross_entropy_loss(logits, batch["labels"], batch.get("valid"))

    grad_fn = jax.jit(jax.grad(loss_wrt_params))
    acc = np.zeros((arch.num_layers, arch.intermediate_size), np.float64)
    w_out = np.asarray(params["encoder"]["layers"]["mlp"]["out"]["w"], np.float64)
    for b in batches:
        g = grad_fn(params, jax.tree.map(jnp.asarray, b))
        g_out = np.asarray(
            g["encoder"]["layers"]["mlp"]["out"]["w"], np.float64
        )  # (L, I, H)
        acc += np.abs(g_out * w_out).sum(axis=2)
    if normalize_layers:
        norm = np.linalg.norm(acc, axis=1, keepdims=True)
        acc = acc / np.maximum(norm, 1e-20)
    return acc


def head_mask_from_importance(
    importance: np.ndarray, keep_fraction: float
) -> np.ndarray:
    """Binary (L, H) mask keeping the top fraction of heads *per layer*
    (the HF mask_heads analogue, reference model_compression.py:709-748)."""
    l, h = importance.shape
    keep = max(int(round(h * keep_fraction)), 1)
    mask = np.zeros((l, h), np.float32)
    for i in range(l):
        top = np.argsort(-importance[i])[:keep]
        mask[i, top] = 1.0
    return mask


def prune_rewire(
    params: dict,                 # full encoder params (stacked layers)
    arch: EncoderArch,
    head_imp: np.ndarray,         # (L, num_heads)
    ffn_imp: np.ndarray,          # (L, intermediate)
    target_heads: int,
    target_ffn: int,
) -> Tuple[dict, EncoderArch]:
    """Slice the stacked params down to the top-importance heads / FFN
    neurons per layer (importance-sorted, reference sort_by_importance
    :282-303 + rewire :455-568). Returns (new_params, new_arch)."""
    l, nh = head_imp.shape
    hd = arch.head_dim
    h = arch.hidden_size
    assert target_heads <= nh and target_ffn <= arch.intermediate_size

    # per-layer top head / neuron indices, importance-sorted
    head_idx = np.stack(
        [np.sort(np.argsort(-head_imp[i])[:target_heads]) for i in range(l)]
    )  # (L, target_heads) — sorted for locality
    ffn_idx = np.stack(
        [np.sort(np.argsort(-ffn_imp[i])[:target_ffn]) for i in range(l)]
    )

    layers = params["layers"]
    hi = jnp.asarray(head_idx)
    fi = jnp.asarray(ffn_idx)

    def slice_qkv(w):   # (L, H, H) → (L, H, target_heads*hd)
        w4 = w.reshape(l, h, nh, hd)
        sel = jnp.take_along_axis(w4, hi[:, None, :, None], axis=2)
        return sel.reshape(l, h, target_heads * hd)

    def slice_qkv_b(b):  # (L, H) → (L, target_heads*hd)
        b3 = b.reshape(l, nh, hd)
        sel = jnp.take_along_axis(b3, hi[:, :, None], axis=1)
        return sel.reshape(l, target_heads * hd)

    def slice_o(w):     # (L, H, H) → (L, target_heads*hd, H)
        w4 = w.reshape(l, nh, hd, h)
        sel = jnp.take_along_axis(w4, hi[:, :, None, None], axis=1)
        return sel.reshape(l, target_heads * hd, h)

    def slice_ffn_in(w):   # (L, H, I) → (L, H, target_ffn)
        return jnp.take_along_axis(w, fi[:, None, :], axis=2)

    def slice_ffn_in_b(b):  # (L, I) → (L, target_ffn)
        return jnp.take_along_axis(b, fi, axis=1)

    def slice_ffn_out(w):  # (L, I, H) → (L, target_ffn, H)
        return jnp.take_along_axis(w, fi[:, :, None], axis=1)

    new_layers = {
        "attn": {
            "q": {"w": slice_qkv(layers["attn"]["q"]["w"]),
                  "b": slice_qkv_b(layers["attn"]["q"]["b"])},
            "k": {"w": slice_qkv(layers["attn"]["k"]["w"]),
                  "b": slice_qkv_b(layers["attn"]["k"]["b"])},
            "v": {"w": slice_qkv(layers["attn"]["v"]["w"]),
                  "b": slice_qkv_b(layers["attn"]["v"]["b"])},
            "o": {"w": slice_o(layers["attn"]["o"]["w"]),
                  "b": layers["attn"]["o"]["b"]},
        },
        "attn_ln": layers["attn_ln"],
        "mlp": {
            "in": {"w": slice_ffn_in(layers["mlp"]["in"]["w"]),
                   "b": slice_ffn_in_b(layers["mlp"]["in"]["b"])},
            "out": {"w": slice_ffn_out(layers["mlp"]["out"]["w"]),
                    "b": layers["mlp"]["out"]["b"]},
        },
        "mlp_ln": layers["mlp_ln"],
    }
    new_params = dict(params)
    new_params["layers"] = new_layers
    new_arch = arch.replace(
        num_heads=target_heads,
        intermediate_size=target_ffn,
        head_dim_override=hd,
    )
    logger.info(
        "pruned %d→%d heads, %d→%d ffn dims per layer",
        nh, target_heads, arch.intermediate_size, target_ffn,
    )
    return new_params, new_arch
