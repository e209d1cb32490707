"""Train/eval step factories.

The reference's training runtime is ``Learner`` — a Python loop running
fp16-autocast forward/backward per batch with host syncs every step
(reference: src/training/learner.py:104-251). Here each step is one jitted,
donated, mesh-sharded function: forward (twin-tower or cross-encoder), loss,
grad, clip, AdamW update — all on device; metrics return as a small scalar
pytree (no per-step host transfers of activations).

Parallelism: batch shards over the mesh ``data`` axis, parameters are
replicated (or TP-sharded via models.encoder.param_pspecs) — XLA inserts the
gradient psum automatically from the shardings.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import EncoderArch, TrainConfig
from ..core.mesh import DATA_AXIS
from ..core.precision import Precision, DEFAULT_PRECISION
from ..models.encoder import EncoderOutput, encoder_forward, dequant_weight
from ..models.pooling import mean_pool, cls_pool
from ..models import losses as L


class TrainState(NamedTuple):
    params: Any           # {"encoder": ..., "head": ...}
    opt_state: Any
    step: jax.Array       # scalar int32
    rng: jax.Array        # PRNG key


def init_train_state(params: dict, tx: optax.GradientTransformation, seed: int = 0):
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(seed),
    )


def _encoder_out(
    enc_params, ids, mask, type_ids=None, *, arch, precision, rng=None,
    deterministic=True, head_mask=None, layer_gate=None, remat=False,
    performer_step=None, pp_mesh=None, pp_microbatches=None,
):
    """``encoder_forward`` with an optional pipeline-parallel tower: with
    ``pp_mesh`` the layer stack runs GPipe-microbatched over the mesh
    ``pipe`` axis, composed with DP (models/pipeline.py; grads flow
    through the ppermute handoffs via AD). Every train-step factory
    routes its encoder forwards through here so ``pp_mesh=`` works
    uniformly across objectives."""
    if pp_mesh is None:
        return encoder_forward(
            enc_params, ids, mask, type_ids, arch=arch, precision=precision,
            deterministic=deterministic, dropout_rng=rng,
            head_mask=head_mask, layer_gate=layer_gate,
            remat=remat, performer_step=performer_step,
        )
    if layer_gate is not None:
        raise ValueError("layer_gate is not supported with pp_mesh")
    if head_mask is not None:
        raise ValueError("head_mask is not supported with pp_mesh")
    if arch.num_experts > 0:
        raise ValueError(
            "MoE archs are not supported with pp_mesh (the pipelined "
            "stack would drop the load-balance aux loss); use DP/TP/EP"
        )
    from ..models.pipeline import encoder_forward_pp

    hidden = encoder_forward_pp(
        enc_params, ids, mask, arch=arch, mesh=pp_mesh,
        microbatches=pp_microbatches, precision=precision,
        token_type_ids=type_ids, deterministic=deterministic,
        dropout_rng=rng, performer_step=performer_step, remat=bool(remat),
    )
    pooler_out = None
    if arch.has_pooler and "pooler" in enc_params:
        # same tail as encoder_forward (models/encoder.py pooler block)
        pw = enc_params["pooler"]
        cls = hidden[:, 0, :].astype(jnp.float32)
        pooler_out = jnp.tanh(
            cls @ dequant_weight(pw["w"]) + pw["b"]
        ).astype(hidden.dtype)
    return EncoderOutput(hidden, pooler_out, None)


def _moe_stats_of(out) -> jax.Array:
    """(2,) [load-balance aux, dropped-token fraction] of an EncoderOutput
    (zeros for dense archs — and for the PP forward, which rejects MoE)."""
    if out.moe_aux is None:
        return jnp.zeros((2,), jnp.float32)
    drop = out.moe_drop if out.moe_drop is not None else jnp.zeros((), jnp.float32)
    return jnp.stack([out.moe_aux, drop])


def _embed(
    enc_params, ids, mask, *, arch, precision, pooling, rng, deterministic,
    layer_gate=None, remat=False, performer_step=None,
    pp_mesh=None, pp_microbatches=None,
):
    """→ (pooled (B, D), (2,) [moe aux, moe drop] — zeros for dense)."""
    out = _encoder_out(
        enc_params, ids, mask, arch=arch, precision=precision, rng=rng,
        deterministic=deterministic, layer_gate=layer_gate, remat=remat,
        performer_step=performer_step,
        pp_mesh=pp_mesh, pp_microbatches=pp_microbatches,
    )
    if pooling == "cls":
        pooled = cls_pool(out.last_hidden_state, mask)
    else:
        pooled = mean_pool(out.last_hidden_state, mask)
    if "projection" in enc_params:
        # dimension-reducing head (trains against PCA-reduced teacher
        # targets in compress/distill.py; matches SentenceEncoder.encode)
        pw = enc_params["projection"]
        pooled = pooled.astype(jnp.float32) @ pw["w"] + pw["b"]
    return pooled, _moe_stats_of(out)


def init_sharded_train_state(
    params: dict,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    param_specs=None,
    seed: int = 0,
) -> TrainState:
    """Build a mesh-placed TrainState. ``param_specs``: optional pytree of
    PartitionSpec for params (e.g. models.encoder.param_pspecs for TP);
    defaults to replication. Params are sharded *first*, then ``tx.init``
    runs on the sharded params so optimizer moments inherit the same
    layouts; jitted steps then propagate shardings from their inputs — no
    in_shardings plumbing needed."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    if param_specs is None:
        params = jax.tree.map(lambda x: put(x, P()), params)
    else:
        params = jax.tree.map(put, params, param_specs)
    opt_state = tx.init(params)
    return TrainState(
        params=params,
        opt_state=opt_state,
        step=jax.device_put(jnp.zeros((), jnp.int32), NamedSharding(mesh, P())),
        rng=jax.device_put(jax.random.PRNGKey(seed), NamedSharding(mesh, P())),
    )


def shard_batch_for(mesh: Optional[Mesh], batch):
    if mesh is None:
        return batch
    from ..core.mesh import shard_batch

    return shard_batch(mesh, batch)


def _redraw_step(arch: EncoderArch, state: "TrainState"):
    """Performer feature-redraw plumbing: when the arch redraws its random
    features every N steps (reference FastAttention.redraw_projection_matrix,
    fast_attention.py:137-188), the training step must thread the live step
    counter into the forward so the projection epoch advances during
    training. Returns ``state.step`` for such archs, else None (static —
    keeps non-performer traces free of the extra operand)."""
    if arch.attention_type == "performer" and arch.performer_redraw_every > 0:
        return state.step
    return None


def _pair_objective(loss_type, params, u, v, target, valid, margin):
    """The SBERT pair-loss switch (reference modules.py losses), shared by
    the dense and packed bi-encoder steps. Returns (loss, aux metrics)."""
    aux = {}
    if loss_type == "softmax":
        head = params["head"]
        loss, logits = L.softmax_loss(
            u, v, head["w"], head["b"], target, valid
        )
        aux["accuracy"] = _masked_accuracy(logits, target, valid)
    elif loss_type == "cosine_mse":
        loss, _ = L.cosine_mse_loss(u, v, target, valid)
    elif loss_type == "contrastive":
        loss, _ = L.contrastive_loss(u, v, target, margin, valid)
    elif loss_type == "online_contrastive":
        loss, _ = L.online_contrastive_loss(u, v, target, margin, valid)
    elif loss_type == "mnrl":
        loss, _ = L.multiple_negatives_loss(u, v, valid=valid)
    elif loss_type == "distill_mse":
        loss = L.distill_mse_loss(u, target, valid)
    else:
        raise ValueError(f"unknown loss {loss_type}")
    return loss, aux


# ---------------------------------------------------------------------------
# Bi-encoder (SBERT) training step
# ---------------------------------------------------------------------------

def make_bi_encoder_train_step(
    arch: EncoderArch,
    tx: optax.GradientTransformation,
    loss_type: str = "cosine_mse",   # softmax | cosine_mse | contrastive |
                                     # online_contrastive | mnrl | distill_mse
    pooling: str = "mean",
    precision: Precision = DEFAULT_PRECISION,
    margin: float = 0.5,
    remat: bool = False,
    pp_mesh: Optional[Mesh] = None,       # pipeline parallelism: layer
    pp_microbatches: Optional[int] = None,  # stages over the pipe axis
) -> Callable:
    """Returns step(state, batch) → (state, metrics).

    batch: ids_a, mask_a, ids_b, mask_b, target (labels or scores or
    teacher embeddings), valid (B,) — fixed shapes.
    Twin towers share the encoder (reference parallel_mode,
    sentence_encoder.py:100-113). With ``pp_mesh`` each tower forward
    runs pipeline-parallel over the mesh ``pipe`` axis (composing with
    ``data``); the backward pipeline falls out of AD."""

    def loss_fn(params, batch, rng, performer_step):
        enc = params["encoder"]
        # Two separate tower passes (shared weights). A fused single pass
        # over the concatenated (2B, S) batch was measured-and-rejected
        # in r3: ~10% SLOWER on v5e (1966 vs 2203 pairs/s MiniLM b=256)
        # — XLA pipelines two B-sized scans better than one 2B scan.
        r1, r2 = jax.random.split(rng)
        u, moe_u = _embed(
            enc, batch["ids_a"], batch["mask_a"], arch=arch,
            precision=precision, pooling=pooling, rng=r1, deterministic=False,
            remat=remat, performer_step=performer_step,
            pp_mesh=pp_mesh, pp_microbatches=pp_microbatches,
        )
        v, moe_v = _embed(
            enc, batch["ids_b"], batch["mask_b"], arch=arch,
            precision=precision, pooling=pooling, rng=r2, deterministic=False,
            remat=remat, performer_step=performer_step,
            pp_mesh=pp_mesh, pp_microbatches=pp_microbatches,
        )
        valid = batch.get("valid")
        target = batch.get("target")
        loss, aux = _pair_objective(
            loss_type, params, u, v, target, valid, margin
        )
        if arch.num_experts > 0:
            moe = 0.5 * (moe_u + moe_v)
            loss = loss + arch.moe_aux_weight * moe[0]
            aux["moe_aux"] = moe[0]
            aux["moe_drop"] = moe[1]
        return loss, aux

    def step(state: TrainState, batch) -> tuple:
        rng, sub = jax.random.split(state.rng)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, sub, _redraw_step(arch, state)
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **aux}
        return (
            TrainState(new_params, new_opt, state.step + 1, rng),
            metrics,
        )

    # Shardings propagate from the input state/batch (see shard_train_state);
    # donation keeps params+moments in place.
    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Cross-encoder / sequence classifier training step
# ---------------------------------------------------------------------------

def classifier_forward(
    params, ids, mask, type_ids, *, arch, precision, pooling="cls",
    rng=None, deterministic=True, head_mask=None, layer_gate=None,
    pp_mesh=None, pp_microbatches=None, with_moe_aux=False,
):
    """Encoder → pool → linear head → logits. The TransformerWrapper
    forward (reference modeling.py:101-116). ``with_moe_aux=True`` returns
    ``(logits, (2,) [moe aux, moe drop])`` for MoE archs."""
    out = _encoder_out(
        params["encoder"], ids, mask, type_ids, arch=arch,
        precision=precision, deterministic=deterministic, rng=rng,
        head_mask=head_mask, layer_gate=layer_gate,
        pp_mesh=pp_mesh, pp_microbatches=pp_microbatches,
    )
    if pooling == "cls":
        if out.pooler_output is not None:
            pooled = out.pooler_output
        else:
            pooled = cls_pool(out.last_hidden_state, mask)
    else:
        pooled = mean_pool(out.last_hidden_state, mask)
    head = params["head"]
    logits = (
        pooled.astype(jnp.float32) @ dequant_weight(head["w"]) + head["b"]
    )
    return (logits, _moe_stats_of(out)) if with_moe_aux else logits


def init_classifier_head(key, in_dim: int, num_classes: int) -> dict:
    return {
        "w": jax.random.normal(key, (in_dim, num_classes), jnp.float32) * 0.02,
        "b": jnp.zeros((num_classes,), jnp.float32),
    }


def _masked_accuracy(logits, labels, valid):
    pred = jnp.argmax(logits, axis=-1)
    hit = (pred == labels).astype(jnp.float32)
    if valid is None:
        return jnp.mean(hit)
    w = valid.astype(jnp.float32)
    return jnp.sum(hit * w) / jnp.maximum(jnp.sum(w), 1.0)


def make_classifier_train_step(
    arch: EncoderArch,
    tx: optax.GradientTransformation,
    pooling: str = "cls",
    precision: Precision = DEFAULT_PRECISION,
    pp_mesh: Optional[Mesh] = None,
    pp_microbatches: Optional[int] = None,
) -> Callable:
    """Cross-encoder / document-classifier step. batch: ids, mask,
    type_ids, labels, valid. ``pp_mesh`` runs the encoder
    pipeline-parallel (see make_bi_encoder_train_step)."""

    def loss_fn(params, batch, rng):
        logits, moe = classifier_forward(
            params, batch["ids"], batch["mask"], batch.get("type_ids"),
            arch=arch, precision=precision, pooling=pooling,
            rng=rng, deterministic=False,
            pp_mesh=pp_mesh, pp_microbatches=pp_microbatches,
            with_moe_aux=True,
        )
        valid = batch.get("valid")
        loss = L.cross_entropy_loss(logits, batch["labels"], valid)
        aux = {"accuracy": _masked_accuracy(logits, batch["labels"], valid)}
        if arch.num_experts > 0:
            loss = loss + arch.moe_aux_weight * moe[0]
            aux["moe_aux"] = moe[0]
            aux["moe_drop"] = moe[1]
        return loss, aux

    def step(state: TrainState, batch):
        rng, sub = jax.random.split(state.rng)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, sub
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_opt, state.step + 1, rng),
            {"loss": loss, **aux},
        )

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# PACKED training steps — several short sequences per fixed-width row
# behind a block-diagonal attention mask (data/packing.py). This carries
# the measured 2.3-2.6× sequence-packing inference win (docs/ROUND4.md)
# into the train loop: the MXU work per step scales with real tokens, not
# with rows × padded width. Supersedes the reference's smart batching for
# training (src/dataset/dataset.py:386-418) the same way the packed
# encode/predict paths supersede it for inference.
# ---------------------------------------------------------------------------


def _scatter_segments(emb: jax.Array, owners: jax.Array, n_slots: int):
    """Map per-segment outputs back to per-example slots.

    emb (R, M, D) — segment_*_pool output for packed rows; owners (R, M)
    — each segment's original example index, -1 = empty slot. Returns
    (n_slots, D). Empty slots scatter into an explicit in-bounds trash row
    (this TPU backend clamps OOB scatter indices instead of dropping them —
    CLAUDE.md env rule 9), which is sliced off. Each real example owns
    exactly one segment, so `add` is an exact (and order-safe) `set`."""
    r, m, d = emb.shape
    flat = emb.reshape(r * m, d)
    own = owners.reshape(r * m)
    idx = jnp.where(own >= 0, own, n_slots)
    out = jnp.zeros((n_slots + 1, d), flat.dtype).at[idx].add(flat)
    return out[:n_slots]


def _packed_embed(
    enc_params, ids, segments, positions, owners, n_slots, *,
    arch, precision, pooling, rng, deterministic, remat=False,
):
    """Packed-row analogue of ``_embed``: encoder with block-diagonal
    attention + per-segment pooling + owner scatter → ((n_slots, D) pooled,
    (2,) moe stats). Rows where segments == 0 everywhere are padding."""
    from ..models.pooling import segment_mean_pool, segment_first_pool

    mask = (segments > 0).astype(jnp.int32)
    out = encoder_forward(
        enc_params, ids, mask, arch=arch, precision=precision,
        deterministic=deterministic, dropout_rng=rng, remat=remat,
        segment_ids=segments, position_ids=positions,
    )
    m = owners.shape[1]
    if pooling == "cls":
        pooled = segment_first_pool(out.last_hidden_state, segments, m)
    else:
        pooled = segment_mean_pool(out.last_hidden_state, segments, m)
    if "projection" in enc_params:
        pw = enc_params["projection"]
        pooled = pooled.astype(jnp.float32) @ pw["w"] + pw["b"]
    emb = _scatter_segments(pooled, owners, n_slots)
    return emb, _moe_stats_of(out)


def make_packed_bi_encoder_train_step(
    arch: EncoderArch,
    tx: optax.GradientTransformation,
    loss_type: str = "cosine_mse",
    pooling: str = "mean",
    precision: Precision = DEFAULT_PRECISION,
    margin: float = 0.5,
    remat: bool = False,
) -> Callable:
    """Packed twin-tower step. batch (data/pairs.build_packed_pair_batches):
      ids_a/segments_a/positions_a (R, W), owners_a (R, M) — tower-a rows,
      each holding several packed sentences; same ``_b``; target (P,),
      valid (P,) where P = per-batch pair capacity. owners map each packed
      segment back to its pair slot, so the loss sees exactly the dense
      step's (u, v, target, valid) contract — grads match the dense step
      on the same pair set (parity-gated in tests/test_packed_train.py).

    Towers pack independently (a 3-sentence row on side a need not align
    with side b); the owner scatter restores pair alignment. Performer
    attention has no block-diagonal form here, and PP's microbatch split
    would cut across packed rows — both unsupported by design."""
    if arch.attention_type == "performer":
        raise ValueError("packed training requires block-diagonal attention "
                         "(attention_type='standard'/'window')")

    def loss_fn(params, batch, rng):
        enc = params["encoder"]
        n_slots = batch["target"].shape[0]
        r1, r2 = jax.random.split(rng)
        u, moe_u = _packed_embed(
            enc, batch["ids_a"], batch["segments_a"], batch["positions_a"],
            batch["owners_a"], n_slots, arch=arch, precision=precision,
            pooling=pooling, rng=r1, deterministic=False, remat=remat,
        )
        v, moe_v = _packed_embed(
            enc, batch["ids_b"], batch["segments_b"], batch["positions_b"],
            batch["owners_b"], n_slots, arch=arch, precision=precision,
            pooling=pooling, rng=r2, deterministic=False, remat=remat,
        )
        valid = batch.get("valid")
        loss, aux = _pair_objective(
            loss_type, params, u, v, batch.get("target"), valid, margin
        )
        if arch.num_experts > 0:
            moe = 0.5 * (moe_u + moe_v)
            loss = loss + arch.moe_aux_weight * moe[0]
            aux["moe_aux"] = moe[0]
            aux["moe_drop"] = moe[1]
        return loss, aux

    def step(state: TrainState, batch) -> tuple:
        rng, sub = jax.random.split(state.rng)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, sub
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_opt, state.step + 1, rng),
            {"loss": loss, **aux},
        )

    return jax.jit(step, donate_argnums=(0,))


def packed_classifier_forward(
    params, ids, segments, positions, type_ids, owners, n_slots, *,
    arch, precision, rng=None, deterministic=True, remat=False,
    with_moe_aux=False,
):
    """Packed cross-encoder forward: several [CLS] a [SEP] b [SEP] pairs
    per row → per-pair logits (n_slots, C). Mirrors ``classifier_forward``
    with pooling='cls' exactly — including the BERT pooler tanh when the
    arch has one — so packed and dense scores/losses agree."""
    enc = params["encoder"]
    mask = (segments > 0).astype(jnp.int32)
    out = encoder_forward(
        enc, ids, mask, type_ids, arch=arch, precision=precision,
        deterministic=deterministic, dropout_rng=rng, remat=remat,
        segment_ids=segments, position_ids=positions,
    )
    from ..models.pooling import segment_first_pool

    m = owners.shape[1]
    pooled = segment_first_pool(out.last_hidden_state, segments, m)
    if arch.has_pooler and "pooler" in enc:
        pw = enc["pooler"]
        pooled = jnp.tanh(
            pooled.astype(jnp.float32) @ dequant_weight(pw["w"]) + pw["b"]
        )
    head = params["head"]
    logits = (
        pooled.astype(jnp.float32) @ dequant_weight(head["w"]) + head["b"]
    )  # (R, M, C)
    logits = _scatter_segments(logits, owners, n_slots)
    return (logits, _moe_stats_of(out)) if with_moe_aux else logits


def make_packed_classifier_train_step(
    arch: EncoderArch,
    tx: optax.GradientTransformation,
    precision: Precision = DEFAULT_PRECISION,
    remat: bool = False,
) -> Callable:
    """Packed cross-encoder / pair-classifier step. batch
    (build_packed_pair_batches(mode='cross')): ids/segments/positions/
    type_ids (R, W), owners (R, M), labels (P,), valid (P,)."""
    if arch.attention_type == "performer":
        raise ValueError("packed training requires block-diagonal attention")

    def loss_fn(params, batch, rng):
        n_slots = batch["labels"].shape[0]
        logits, moe = packed_classifier_forward(
            params, batch["ids"], batch["segments"], batch["positions"],
            batch.get("type_ids"), batch["owners"], n_slots,
            arch=arch, precision=precision, rng=rng, deterministic=False,
            remat=remat, with_moe_aux=True,
        )
        valid = batch.get("valid")
        loss = L.cross_entropy_loss(logits, batch["labels"], valid)
        aux = {"accuracy": _masked_accuracy(logits, batch["labels"], valid)}
        if arch.num_experts > 0:
            loss = loss + arch.moe_aux_weight * moe[0]
            aux["moe_aux"] = moe[0]
            aux["moe_drop"] = moe[1]
        return loss, aux

    def step(state: TrainState, batch):
        rng, sub = jax.random.split(state.rng)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, sub
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_opt, state.step + 1, rng),
            {"loss": loss, **aux},
        )

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Token classification (NER) — reference src/training/train_ner.py:81-180
# ---------------------------------------------------------------------------

def token_classifier_forward(
    params, ids, mask, *, arch, precision, rng=None, deterministic=True,
    pp_mesh=None, pp_microbatches=None, with_moe_aux=False,
):
    """Encoder → per-token linear head → (B, S, num_tags) logits."""
    out = _encoder_out(
        params["encoder"], ids, mask, arch=arch, precision=precision,
        deterministic=deterministic, rng=rng,
        pp_mesh=pp_mesh, pp_microbatches=pp_microbatches,
    )
    head = params["head"]
    h = out.last_hidden_state.astype(jnp.float32)
    logits = jnp.einsum("bsh,ht->bst", h, head["w"]) + head["b"]
    return (logits, _moe_stats_of(out)) if with_moe_aux else logits


def make_token_classifier_train_step(
    arch: EncoderArch,
    tx: optax.GradientTransformation,
    precision: Precision = DEFAULT_PRECISION,
    pp_mesh: Optional[Mesh] = None,
    pp_microbatches: Optional[int] = None,
) -> Callable:
    """batch: ids, mask, tags (B, S) with -100 = ignored position (sub-word
    continuations / padding, the standard NER labeling scheme)."""

    def loss_fn(params, batch, rng):
        logits, moe = token_classifier_forward(
            params, batch["ids"], batch["mask"], arch=arch,
            precision=precision, rng=rng, deterministic=False,
            pp_mesh=pp_mesh, pp_microbatches=pp_microbatches,
            with_moe_aux=True,
        )
        tags = batch["tags"]
        valid = (tags >= 0) & (batch["mask"] > 0)
        safe_tags = jnp.maximum(tags, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe_tags[..., None], axis=-1)[..., 0]
        w = valid.astype(jnp.float32)
        loss = jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
        pred = jnp.argmax(logits, axis=-1)
        acc = jnp.sum((pred == tags) * w) / jnp.maximum(jnp.sum(w), 1.0)
        aux = {"accuracy": acc}
        if arch.num_experts > 0:
            loss = loss + arch.moe_aux_weight * moe[0]
            aux["moe_aux"] = moe[0]
            aux["moe_drop"] = moe[1]
        return loss, aux

    def step(state: TrainState, batch):
        rng, sub = jax.random.split(state.rng)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, sub
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_opt, state.step + 1, rng),
            {"loss": loss, **aux},
        )

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Word-in-context (WiC) training — reference src/training/train_wic.py:19-110
# (WordEncoderModel twin towers over target-word spans)
# ---------------------------------------------------------------------------

def make_word_encoder_train_step(
    arch: EncoderArch,
    tx: optax.GradientTransformation,
    precision: Precision = DEFAULT_PRECISION,
    margin: float = 0.5,
    loss_type: str = "contrastive",
    pp_mesh: Optional[Mesh] = None,
    pp_microbatches: Optional[int] = None,
) -> Callable:
    """batch: ids_a/mask_a/span_a, ids_b/mask_b/span_b, target (0/1),
    valid. Towers share the encoder; each side pools the target word's
    sub-token span; contrastive loss on the word-vector cosine."""
    from ..models.pooling import word_span_pool

    def word_vec(enc, ids, mask, span, rng):
        out = _encoder_out(
            enc, ids, mask, arch=arch, precision=precision,
            deterministic=False, rng=rng,
            pp_mesh=pp_mesh, pp_microbatches=pp_microbatches,
        )
        return word_span_pool(out.last_hidden_state, span), _moe_stats_of(out)

    def loss_fn(params, batch, rng):
        enc = params["encoder"]
        r1, r2 = jax.random.split(rng)
        u, moe_u = word_vec(
            enc, batch["ids_a"], batch["mask_a"], batch["span_a"], r1
        )
        v, moe_v = word_vec(
            enc, batch["ids_b"], batch["mask_b"], batch["span_b"], r2
        )
        valid = batch.get("valid")
        if loss_type == "online_contrastive":
            loss, _ = L.online_contrastive_loss(
                u, v, batch["target"], margin, valid
            )
        else:
            loss, _ = L.contrastive_loss(u, v, batch["target"], margin, valid)
        aux = {}
        if arch.num_experts > 0:
            moe = 0.5 * (moe_u + moe_v)
            loss = loss + arch.moe_aux_weight * moe[0]
            aux["moe_aux"] = moe[0]
            aux["moe_drop"] = moe[1]
        return loss, aux

    def step(state: TrainState, batch):
        rng, sub = jax.random.split(state.rng)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, sub
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_opt, state.step + 1, rng),
            {"loss": loss, **aux},
        )

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Masked-LM pretraining — the objective behind the reference's long-model
# re-pretraining loop (src/scripts/make_long_transformer.py:84-110, which
# delegates to HF's Trainer+DataCollatorForLanguageModeling). Here it is a
# first-class jitted step so converted long-context models can be re-adapted
# on TPU (pairs with hf_convert.extend_positions + window attention).
# ---------------------------------------------------------------------------

def mlm_mask_batch(
    rng: jax.Array,
    ids: jax.Array,              # (B, S) int32
    mask: jax.Array,             # (B, S) 1 = real token
    vocab_size: int,
    mask_token_id: int,
    mask_prob: float = 0.15,
    special_ids=(0, 1, 2, 3, 4),  # token ids never masked (PAD/UNK/CLS/...)
):
    """BERT-style dynamic masking on device: of the selected 15%,
    80% → [MASK], 10% → random token, 10% → unchanged.
    Returns (corrupted_ids, labels) with labels=-100 on unselected spots.

    ``special_ids`` must list the ACTUAL special-token ids of the vocab —
    HF vocabularies put [CLS]/[SEP]/[MASK] at 100+, not 0..4, and masking
    them would corrupt the objective. Random replacement tokens sample
    the full vocab (HF DataCollatorForLanguageModeling behavior)."""
    r_sel, r_op, r_tok = jax.random.split(rng, 3)
    specials = jnp.asarray(sorted(special_ids), jnp.int32)
    pos = jnp.clip(
        jnp.searchsorted(specials, ids), 0, specials.shape[0] - 1
    )
    is_special = specials[pos] == ids
    eligible = (mask > 0) & ~is_special
    sel = (jax.random.uniform(r_sel, ids.shape) < mask_prob) & eligible
    labels = jnp.where(sel, ids, -100)
    op = jax.random.uniform(r_op, ids.shape)
    rand_tok = jax.random.randint(r_tok, ids.shape, 0, vocab_size)
    corrupted = jnp.where(
        sel & (op < 0.8),
        mask_token_id,
        jnp.where(sel & (op >= 0.9), rand_tok, ids),
    )
    return corrupted.astype(ids.dtype), labels.astype(jnp.int32)


def mlm_forward(
    params, ids, mask, *, arch, precision, rng=None, deterministic=True,
    performer_step=None, pp_mesh=None, pp_microbatches=None,
    with_moe_aux=False,
):
    """Encoder → tied-embedding output head → (B, S, V) logits. The output
    projection shares the word-embedding matrix (standard BERT weight
    tying); ``params["mlm_bias"]`` holds the per-vocab bias."""
    out = _encoder_out(
        params["encoder"], ids, mask, arch=arch, precision=precision,
        deterministic=deterministic, rng=rng, performer_step=performer_step,
        pp_mesh=pp_mesh, pp_microbatches=pp_microbatches,
    )
    emb = params["encoder"]["embeddings"]["word"]
    h = out.last_hidden_state.astype(jnp.float32)
    logits = jnp.einsum(
        "bsh,vh->bsv", h, emb.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    if "mlm_bias" in params:
        logits = logits + params["mlm_bias"]
    return (logits, _moe_stats_of(out)) if with_moe_aux else logits


def make_mlm_train_step(
    arch: EncoderArch,
    tx: optax.GradientTransformation,
    mask_token_id: int,
    precision: Precision = DEFAULT_PRECISION,
    mask_prob: float = 0.15,
    special_ids=(0, 1, 2, 3, 4),
    pp_mesh: Optional[Mesh] = None,
    pp_microbatches: Optional[int] = None,
) -> Callable:
    """batch: ids, mask. Masking is dynamic (re-sampled per step from the
    state rng — matches HF's DataCollatorForLanguageModeling behavior).
    Pass the tokenizer's real special-token ids via ``special_ids``.
    ``pp_mesh`` runs the encoder pipeline-parallel (see
    make_bi_encoder_train_step)."""

    def loss_fn(params, batch, rng, performer_step):
        r_mask, r_drop = jax.random.split(rng)
        corrupted, labels = mlm_mask_batch(
            r_mask, batch["ids"], batch["mask"], arch.vocab_size,
            mask_token_id, mask_prob, special_ids=special_ids,
        )
        logits, moe = mlm_forward(
            params, corrupted, batch["mask"], arch=arch, precision=precision,
            rng=r_drop, deterministic=False, performer_step=performer_step,
            pp_mesh=pp_mesh, pp_microbatches=pp_microbatches,
            with_moe_aux=True,
        )
        loss = L.mlm_loss(logits, labels)
        n_pred = jnp.sum((labels >= 0).astype(jnp.float32))
        aux = {"masked_tokens": n_pred}
        if arch.num_experts > 0:
            loss = loss + arch.moe_aux_weight * moe[0]
            aux["moe_aux"] = moe[0]
            aux["moe_drop"] = moe[1]
        return loss, aux

    def step(state: TrainState, batch):
        rng, sub = jax.random.split(state.rng)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, sub, _redraw_step(arch, state)
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_opt, state.step + 1, rng),
            {"loss": loss, **aux},
        )

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# FastFormers multi-signal distillation — teacher-logits KL + hidden-state
# matching (+ hard-label CE) for classifiers. Reference:
# src/modules/model_compression.py:1189-1333 (FastFormersDistiller).
# ---------------------------------------------------------------------------

def make_fastformers_distill_step(
    student_arch: EncoderArch,
    teacher_arch: EncoderArch,
    tx: optax.GradientTransformation,
    pooling: str = "cls",
    precision: Precision = DEFAULT_PRECISION,
    temperature: float = 2.0,
    alpha_kl: float = 1.0,
    alpha_state: float = 1.0,
    alpha_ce: float = 0.0,
    layer_map=None,   # (Ls+1,) teacher hidden index per student layer —
                      # pass when the student was initialized from a
                      # specific keep_layers subset
) -> Callable:
    """Returns step(state, batch, teacher_params) → (state, metrics).

    The teacher forward runs in-loop (frozen, no grads) producing logits +
    per-layer hidden states; the student matches logits through a
    temperature-scaled KL and hidden states through a layer-mapped MSE —
    the reference's FastFormers recipe, jitted end-to-end."""
    if student_arch.num_experts > 0 or teacher_arch.num_experts > 0:
        raise ValueError(
            "MoE archs are not supported by the FastFormers distill step "
            "(it would silently drop the student's load-balance aux loss)"
        )

    def tower(params, arch_, batch, rng, deterministic):
        out = encoder_forward(
            params["encoder"], batch["ids"], batch["mask"],
            batch.get("type_ids"), arch=arch_, precision=precision,
            deterministic=deterministic, dropout_rng=rng,
            output_hidden_states=True,
        )
        if pooling == "cls":
            pooled = (
                out.pooler_output
                if out.pooler_output is not None
                else cls_pool(out.last_hidden_state, batch["mask"])
            )
        else:
            pooled = mean_pool(out.last_hidden_state, batch["mask"])
        head = params["head"]
        logits = pooled.astype(jnp.float32) @ head["w"] + head["b"]
        return logits, out.hidden_states

    def loss_fn(params, batch, teacher_params, rng):
        t_logits, t_hidden = tower(
            teacher_params, teacher_arch, batch, rng, True
        )
        t_logits = jax.lax.stop_gradient(t_logits)
        t_hidden = jax.lax.stop_gradient(t_hidden)
        s_logits, s_hidden = tower(params, student_arch, batch, rng, False)
        valid = batch.get("valid")
        kl = L.kl_distill_loss(s_logits, t_logits, temperature, valid)
        st = L.hidden_state_mse(
            s_hidden, t_hidden, batch["mask"], layer_map=layer_map
        )
        loss = alpha_kl * kl + alpha_state * st
        aux = {"kl": kl, "state_mse": st}
        if alpha_ce > 0 and "labels" in batch:
            ce = L.cross_entropy_loss(s_logits, batch["labels"], valid)
            loss = loss + alpha_ce * ce
            aux["ce"] = ce
            aux["accuracy"] = _masked_accuracy(
                s_logits, batch["labels"], valid
            )
        return loss, aux

    def step(state: TrainState, batch, teacher_params):
        rng, sub = jax.random.split(state.rng)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, teacher_params, sub
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_opt, state.step + 1, rng),
            {"loss": loss, **aux},
        )

    return jax.jit(step, donate_argnums=(0,))
