"""Optimizer setup: AdamW with no-decay parameter groups + linear warmup —
semantics of reference src/training/learner.py:53-78 (HF
``get_linear_schedule_with_warmup`` + AdamW with bias/LayerNorm excluded
from weight decay), built on optax. Gradient clipping and accumulation are
composed here too (learner.py:123-128,152-159)."""

from __future__ import annotations

from typing import Optional

import jax
import optax

from ..core.config import TrainConfig


def _no_decay_mask(params):
    """True where weight decay applies: kernels named ``w`` and embedding
    tables. Biases, LayerNorm scales/biases and other vectors are excluded
    (learner.py:56-66). NOTE: layer-STACKED biases are (L, H) — ndim alone
    would decay every attention/MLP bias in the scan stack, so the leaf
    NAME decides."""
    def mask_leaf(path, p):
        names = [str(getattr(k, "key", k)) for k in path]
        if any(n in ("ln", "attn_ln", "mlp_ln") for n in names):
            return False
        if names and names[-1] in ("b", "bias", "scale"):
            return False
        return p.ndim >= 2

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def linear_warmup_schedule(lr: float, total_steps: int, warmup_steps: int):
    """Linear warmup then linear decay to 0 (HF linear schedule)."""
    warmup_steps = max(warmup_steps, 1)

    def schedule(step):
        warm = step / warmup_steps
        decay = (total_steps - step) / max(total_steps - warmup_steps, 1)
        import jax.numpy as jnp

        return lr * jnp.clip(jnp.minimum(warm, decay), 0.0, 1.0)

    return schedule


def make_optimizer(
    cfg: TrainConfig,
    total_steps: int,
    params_example=None,
    warmup_steps: Optional[int] = None,
) -> optax.GradientTransformation:
    if warmup_steps is None:
        warmup_steps = int(total_steps * cfg.warmup_ratio)
    if cfg.grad_accum_steps > 1:
        # MultiSteps advances the inner schedule count once per OPTIMIZER
        # step (every k micro-steps), while callers pass micro-step
        # totals: unscaled, warmup/decay would run k× too slowly and
        # never finish (verified: k=4 → count 2 after 8 updates)
        total_steps = max(total_steps // cfg.grad_accum_steps, 1)
        warmup_steps = warmup_steps // cfg.grad_accum_steps
    schedule = linear_warmup_schedule(cfg.lr, total_steps, warmup_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
            mask=_no_decay_mask if params_example is None else _no_decay_mask(params_example),
        ),
    )
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx
