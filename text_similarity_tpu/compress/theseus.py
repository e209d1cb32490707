"""BERT-of-Theseus compression: stochastic successor-layer replacement.

Parity with the reference's vendored theseus models + driver
(src/models/bert_of_theseus.py:514-634 — each successor "slot" is
Bernoulli-sampled per forward to replace its block of ``compress_ratio``
predecessor layers; src/modules/replacement_scheduler.py:12-43 — constant /
linear ramp of the replacing rate; src/modules/model_compression.py:47-257
— the training driver that finally swaps successors in).

TPU-native: predecessor params reshape to (slots, ratio, ...) and successor
params to (slots, ...); one ``lax.scan`` over slots computes both the
predecessor block and the successor layer and selects by a per-slot
Bernoulli gate — trace-stable (no Python branching on sampled values), and
gradients flow only to successors (predecessors are stop_gradient'ed)."""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EncoderArch, TrainConfig
from ..core.precision import Precision, DEFAULT_PRECISION, precision_for
from ..models.encoder import (
    transformer_layer,
    encoder_forward,
    init_params,
)
from ..models.pooling import mean_pool, cls_pool
from ..utils.logging import get_logger

logger = get_logger("theseus")


class ReplacementScheduler:
    """Replacing-rate schedule (reference replacement_scheduler.py:12-43):
    constant, or linear ramp base + k·step clipped to 1."""

    def __init__(self, base_rate: float = 0.3, k: float = 0.0):
        self.base_rate = base_rate
        self.k = k

    def rate(self, step: int) -> float:
        return float(min(1.0, self.base_rate + self.k * step))


def theseus_encoder_forward(
    pred_layers: dict,        # stacked (L, ...)
    succ_layers: dict,        # stacked (S, ...), L = S * ratio
    embeddings: dict,         # shared embedding params
    input_ids, attention_mask,
    *,
    arch: EncoderArch,
    replace_rate,             # scalar in [0, 1] (traced ok)
    rng: jax.Array,
    precision: Precision = DEFAULT_PRECISION,
    deterministic_layers: bool = True,
):
    """Forward through the mixed predecessor/successor stack."""
    if arch.num_experts > 0:
        raise ValueError(
            "MoE archs are not supported by theseus compression (the "
            "mixed stack would silently drop the load-balance aux loss)"
        )
    l = jax.tree.leaves(pred_layers)[0].shape[0]
    s = jax.tree.leaves(succ_layers)[0].shape[0]
    assert l % s == 0, f"{l} predecessor layers not divisible by {s} slots"
    ratio = l // s

    # embeddings only — the old layer_gate=0 trick ran the whole L-layer
    # scan and threw the result away (gates are runtime values, XLA can't
    # DCE the scan body), doubling every theseus train step
    from ..models.encoder import embed_inputs

    if attention_mask is None:
        attention_mask = jnp.ones(input_ids.shape, jnp.int32)
    base = embed_inputs(
        embeddings, input_ids, attention_mask, None,
        arch=arch, precision=precision, deterministic=True,
    )

    pred_blocked = jax.tree.map(
        lambda p: jax.lax.stop_gradient(
            p.reshape(s, ratio, *p.shape[1:]).astype(precision.compute_dtype)
        ),
        pred_layers,
    )
    succ_stacked = jax.tree.map(
        lambda p: p.astype(precision.compute_dtype), succ_layers
    )
    gates = jax.random.bernoulli(rng, replace_rate, (s,)).astype(
        precision.compute_dtype
    )

    def slot_body(hx, scanned):
        pred_blk, succ_lp, gate = scanned

        def pred_path(x):
            def inner(x2, lp):
                return (
                    transformer_layer(
                        x2, lp, attention_mask, arch=arch,
                        precision=precision, deterministic=True,
                    ),
                    None,
                )
            out, _ = jax.lax.scan(inner, x, pred_blk)
            return out

        succ_out = transformer_layer(
            hx, succ_lp, attention_mask, arch=arch, precision=precision,
            deterministic=deterministic_layers,
        )
        out = gate * succ_out + (1.0 - gate) * pred_path(hx)
        return out.astype(hx.dtype), None

    final, _ = jax.lax.scan(slot_body, base, (pred_blocked, succ_stacked, gates))
    return final


def init_successors_from_predecessors(
    pred_layers: dict, num_slots: int
) -> dict:
    """Successor slot i initializes from the first layer of its predecessor
    block (the reference deep-copies predecessor layers into scc_layer,
    model_compression.py:100-109)."""
    l = jax.tree.leaves(pred_layers)[0].shape[0]
    ratio = l // num_slots
    idx = jnp.arange(num_slots) * ratio
    return jax.tree.map(lambda p: p[idx], pred_layers)


class TheseusDistiller:
    """Compress an encoder to ``num_slots`` layers by theseus replacement
    training on a classification or bi-encoder objective."""

    def __init__(
        self,
        teacher_params: dict,          # stock encoder params
        arch: EncoderArch,
        num_slots: int,
        scheduler: Optional[ReplacementScheduler] = None,
        train_config: TrainConfig = TrainConfig(lr=2e-5, epochs=1),
    ):
        self.teacher_params = teacher_params
        self.arch = arch
        self.num_slots = num_slots
        self.scheduler = scheduler or ReplacementScheduler(0.3, 5e-4)
        self.cfg = train_config
        self.succ = init_successors_from_predecessors(
            teacher_params["layers"], num_slots
        )

    def make_train_step(self, tx, num_classes: int, pooling: str = "mean"):
        """Bi-encoder softmax/classification theseus train step: trainable
        = successor layers + head; rate enters as a batch scalar. The frozen
        predecessor/embedding params are explicit step arguments — closure
        capture would bake them into the HLO as constants (GBs per compile).
        Call: step(state, batch, rate, pred_layers, embeddings)."""
        arch = self.arch
        precision = precision_for(self.cfg.bf16)

        def embed(succ, pred_layers, embeddings, ids, mask, rate, rng):
            h = theseus_encoder_forward(
                pred_layers, succ, embeddings, ids, mask,
                arch=arch, replace_rate=rate, rng=rng, precision=precision,
            )
            return mean_pool(h, mask) if pooling == "mean" else cls_pool(h, mask)

        from ..models import losses as L

        def loss_fn(params, batch, rate, rng, pred_layers, embeddings):
            r1, r2 = jax.random.split(rng)
            u = embed(params["succ"], pred_layers, embeddings,
                      batch["ids_a"], batch["mask_a"], rate, r1)
            v = embed(params["succ"], pred_layers, embeddings,
                      batch["ids_b"], batch["mask_b"], rate, r2)
            head = params["head"]
            loss, logits = L.softmax_loss(
                u, v, head["w"], head["b"], batch["target"], batch.get("valid")
            )
            return loss, logits

        import optax

        def step(state, batch, rate, pred_layers, embeddings):
            rng, sub = jax.random.split(state.rng)
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rate, sub, pred_layers, embeddings
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            from ..train.steps import TrainState

            return TrainState(new_params, new_opt, state.step + 1, rng), {
                "loss": loss
            }

        return jax.jit(step, donate_argnums=(0,))

    def compressed_params(self, succ: Optional[dict] = None) -> dict:
        """Final student: successors swapped in (reference
        model_compression.py:178-195), embeddings/pooler carried over."""
        out = dict(self.teacher_params)
        out["layers"] = succ if succ is not None else self.succ
        return out

    @property
    def compressed_arch(self) -> EncoderArch:
        return self.arch.replace(num_layers=self.num_slots)
