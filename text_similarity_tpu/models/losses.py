"""Training losses.

Parity with reference src/modules/modules.py:252-443 (implemented correctly;
several reference variants are partially broken — SURVEY.md headline facts):

- ``softmax_loss``          ← SoftmaxLoss (:262-280): SBERT concat
                              [u; v; |u−v|] → linear classifier → CE
- ``cosine_mse_loss``       ← CosineSimilarityLoss (:330-346): MSE between
                              cos(u,v) and the gold similarity score (STS)
- ``contrastive_loss``      ← ContrastiveSimilarityLoss (:292-304)
- ``online_contrastive_loss``← OnlineContrastiveSimilarityLoss (:307-327):
                              hard-pair mining inside the batch
- ``distill_mse_loss``      ← SimpleDistillationLoss (:349-365)
- ``multiple_negatives_loss``: in-batch negatives InfoNCE (standard SBERT
  companion loss; strengthens the paraphrase-mining capability)
- ``cross_entropy_loss``    : sequence classification head (cross-encoder /
                              document classifier paths)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _cos(u: jax.Array, v: jax.Array, eps: float = 1e-8) -> jax.Array:
    u = u.astype(jnp.float32)
    v = v.astype(jnp.float32)
    un = jnp.maximum(jnp.linalg.norm(u, axis=-1), eps)
    vn = jnp.maximum(jnp.linalg.norm(v, axis=-1), eps)
    return jnp.sum(u * v, axis=-1) / (un * vn)


def sbert_concat(u: jax.Array, v: jax.Array) -> jax.Array:
    """[u; v; |u−v|] — the merge the reference hard-codes in its bi-encoder
    forward (sentence_encoder.py:111-113)."""
    return jnp.concatenate([u, v, jnp.abs(u - v)], axis=-1)


def cross_entropy_loss(
    logits: jax.Array, labels: jax.Array, valid: Optional[jax.Array] = None
):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if valid is None:
        return jnp.mean(nll)
    w = valid.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def softmax_loss(
    u: jax.Array,
    v: jax.Array,
    w: jax.Array,   # classifier weight (3H, C)
    b: jax.Array,   # (C,)
    labels: jax.Array,
    valid: Optional[jax.Array] = None,
):
    """Returns (loss, logits)."""
    feats = sbert_concat(u, v).astype(jnp.float32)
    logits = feats @ w + b
    return cross_entropy_loss(logits, labels, valid), logits


def cosine_mse_loss(
    u: jax.Array, v: jax.Array, scores: jax.Array,
    valid: Optional[jax.Array] = None,
):
    """STS regression loss. Returns (loss, predicted cosine)."""
    c = _cos(u, v)
    err = jnp.square(c - scores.astype(jnp.float32))
    if valid is None:
        return jnp.mean(err), c
    w = valid.astype(jnp.float32)
    return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0), c


def contrastive_loss(
    u: jax.Array, v: jax.Array, labels: jax.Array,
    margin: float = 0.5,
    valid: Optional[jax.Array] = None,
):
    """Cosine-distance margin contrastive (labels 1 = similar)."""
    d = 1.0 - _cos(u, v)
    lab = labels.astype(jnp.float32)
    per = lab * jnp.square(d) + (1.0 - lab) * jnp.square(
        jnp.maximum(margin - d, 0.0)
    )
    per = 0.5 * per
    if valid is None:
        return jnp.mean(per), d
    w = valid.astype(jnp.float32)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0), d


def online_contrastive_loss(
    u: jax.Array, v: jax.Array, labels: jax.Array,
    margin: float = 0.5,
    valid: Optional[jax.Array] = None,
):
    """Hard-pair mining version (reference modules.py:307-327): keep only
    positive pairs farther than the closest negative and negative pairs
    closer than the farthest positive.

    Implemented with masked reductions (static shapes; the reference uses
    boolean indexing, which is shape-dynamic and does not jit)."""
    d = 1.0 - _cos(u, v)
    lab = labels.astype(jnp.float32)
    if valid is not None:
        w = valid.astype(jnp.float32)
    else:
        w = jnp.ones_like(lab)
    pos_mask = lab * w
    neg_mask = (1.0 - lab) * w

    inf = jnp.float32(jnp.inf)
    neg_min = jnp.min(jnp.where(neg_mask > 0, d, inf))
    pos_max = jnp.max(jnp.where(pos_mask > 0, d, -inf))

    hard_pos = pos_mask * (d > neg_min)
    hard_neg = neg_mask * (d < pos_max)
    pos_loss = jnp.square(d) * hard_pos
    neg_loss = jnp.square(jnp.maximum(margin - d, 0.0)) * hard_neg
    n = jnp.maximum(jnp.sum(hard_pos) + jnp.sum(hard_neg), 1.0)
    return (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / n, d


def distill_mse_loss(
    student_emb: jax.Array,
    teacher_emb: jax.Array,
    valid: Optional[jax.Array] = None,
):
    """Embedding-matching distillation (reference modules.py:349-365 /
    multilingual make_multilingual.py flow)."""
    err = jnp.mean(
        jnp.square(
            student_emb.astype(jnp.float32) - teacher_emb.astype(jnp.float32)
        ),
        axis=-1,
    )
    if valid is None:
        return jnp.mean(err)
    w = valid.astype(jnp.float32)
    return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0)


def multiple_negatives_loss(
    u: jax.Array, v: jax.Array, scale: float = 20.0,
    valid: Optional[jax.Array] = None,
):
    """In-batch negatives: maximize cos(u_i, v_i) against all v_j."""
    un = u / jnp.maximum(
        jnp.linalg.norm(u.astype(jnp.float32), axis=-1, keepdims=True), 1e-8
    )
    vn = v / jnp.maximum(
        jnp.linalg.norm(v.astype(jnp.float32), axis=-1, keepdims=True), 1e-8
    )
    sim = (un.astype(jnp.float32) @ vn.astype(jnp.float32).T) * scale
    labels = jnp.arange(sim.shape[0])
    if valid is not None:
        # exclude padded rows as both anchors and negatives
        vmask = valid.astype(bool)
        sim = jnp.where(vmask[None, :], sim, -1e9)
        logp = jax.nn.log_softmax(sim, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        w = valid.astype(jnp.float32)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0), sim
    logp = jax.nn.log_softmax(sim, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll), sim


def mlm_loss(
    logits: jax.Array,       # (B, S, V)
    labels: jax.Array,       # (B, S) int32, -100 = not predicted
):
    """Masked-LM cross entropy over predicted positions only (the
    objective of the reference's long-model re-pretraining loop,
    make_long_transformer.py:84-110, which delegates to HF's MLM trainer)."""
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    w = valid.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def hidden_state_mse(
    student_hidden: jax.Array,   # (Ls+1, B, S, H)
    teacher_hidden: jax.Array,   # (Lt+1, B, S, H)
    mask: Optional[jax.Array] = None,  # (B, S)
    layer_map: Optional[jax.Array] = None,  # (Ls+1,) teacher index per
                                            # student layer (emb at 0)
):
    """Layer-mapped hidden-state matching (FastFormers state distillation,
    reference model_compression.py:1189-1333): student layer i aligns with
    teacher layer ``layer_map[i]`` when given (a student initialized from
    teacher layers keep_layers must align with THOSE layers, not a uniform
    resample), else the uniform i * (Lt/Ls) skip mapping; both include the
    embedding layer at index 0."""
    ls = student_hidden.shape[0] - 1
    lt = teacher_hidden.shape[0] - 1
    if layer_map is not None:
        idx = jnp.asarray(layer_map, jnp.int32)
    else:
        idx = jnp.round(
            jnp.arange(ls + 1) * (lt / max(ls, 1))
        ).astype(jnp.int32)
    mapped = teacher_hidden[idx]
    err = jnp.mean(
        jnp.square(
            student_hidden.astype(jnp.float32) - mapped.astype(jnp.float32)
        ),
        axis=-1,
    )  # (Ls+1, B, S)
    if mask is None:
        return jnp.mean(err)
    w = mask.astype(jnp.float32)[None]
    return jnp.sum(err * w) / jnp.maximum(jnp.sum(w) * (ls + 1), 1.0)


def kl_distill_loss(
    student_logits: jax.Array,
    teacher_logits: jax.Array,
    temperature: float = 2.0,
    valid: Optional[jax.Array] = None,
):
    """Logit distillation (FastFormers-style, reference
    model_compression.py:1189-1333)."""
    t = temperature
    sp = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, axis=-1)
    tp = jax.nn.softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    kl = jnp.sum(tp * (jnp.log(jnp.maximum(tp, 1e-12)) - sp), axis=-1) * t * t
    if valid is None:
        return jnp.mean(kl)
    w = valid.astype(jnp.float32)
    return jnp.sum(kl * w) / jnp.maximum(jnp.sum(w), 1.0)
