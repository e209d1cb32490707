"""Distillation: layer-drop student init + embedding-matching training.

Parity with the reference's ``SentenceEncoderDistiller``
(src/modules/model_compression.py:1070-1186 — SBERT-style: initialize the
student by keeping a subset of teacher layers, train with MSE to the
teacher's sentence embeddings) and the multilingual teacher→student flow
(src/training/make_multilingual.py:18-127 — teacher encodes the source
side, the student learns to embed both sides to the teacher's vector).

TPU-native notes: layers are stacked on a leading axis, so "keep layers
[0, 2, 4]" is a single gather — no module surgery. Teacher targets are
precomputed in one batched inference sweep (the reference recomputes
teacher embeddings inside the train loop per step,
dataset.py:242-245/modules.py:349-365; precomputation removes the teacher
from the hot loop entirely)."""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EncoderArch, TrainConfig
from ..core.precision import precision_for
from ..data.pairs import build_distill_batches
from ..train import (
    make_optimizer,
    make_bi_encoder_train_step,
    init_train_state,
)
from ..utils.logging import get_logger

logger = get_logger("distill")


def extract_student_layers(
    teacher_params: dict, keep_layers: Sequence[int]
) -> dict:
    """Student params = teacher with a subset of layers (stacked-axis
    gather). Embeddings/pooler/projection are shared as-is."""
    idx = jnp.asarray(list(keep_layers), jnp.int32)
    # Copy non-layer leaves: the student will be trained with donated
    # buffers, and sharing references with the live teacher would let
    # donation delete the teacher's params out from under it.
    student = {
        k: jax.tree.map(jnp.array, v)
        for k, v in teacher_params.items()
        if k != "layers"
    }
    student["layers"] = jax.tree.map(
        lambda p: p[idx], teacher_params["layers"]
    )
    return student


def every_other_layers(num_layers: int, keep: int) -> List[int]:
    """Evenly spaced layer subset, always keeping the last layer
    (the reference keeps alternating layers, model_compression.py:1101-1113)."""
    if keep >= num_layers:
        return list(range(num_layers))
    idx = np.linspace(0, num_layers - 1, keep)
    return sorted({int(round(i)) for i in idx})


class SentenceEncoderDistiller:
    """Distill a SentenceEncoder teacher into a shallower student."""

    def __init__(
        self,
        teacher,                       # SentenceEncoder
        keep_layers: Optional[Sequence[int]] = None,
        num_student_layers: Optional[int] = None,
        train_config: TrainConfig = TrainConfig(lr=1e-4, epochs=1),
    ):
        self.teacher = teacher
        if keep_layers is None:
            keep_layers = every_other_layers(
                teacher.arch.num_layers,
                num_student_layers or teacher.arch.num_layers // 2,
            )
        self.keep_layers = list(keep_layers)
        self.cfg = train_config
        self.student_arch = teacher.arch.replace(
            num_layers=len(self.keep_layers)
        )

    def distill(
        self,
        sentences: Sequence[str],
        eval_fn: Optional[Callable] = None,
        src_sentences: Optional[Sequence[str]] = None,
        batch_size: Optional[int] = None,
        max_len: int = 128,
    ):
        """Train the student to match teacher embeddings on ``sentences``.

        Multilingual mode: pass ``src_sentences`` (teacher encodes these —
        e.g. English sources) while the student embeds ``sentences`` (e.g.
        target-language side). Returns a student SentenceEncoder."""
        from ..models.sentence_encoder import SentenceEncoder

        bs = batch_size or self.cfg.batch_size
        teacher_inputs = list(src_sentences or sentences)
        logger.info("computing teacher targets for %d sentences", len(teacher_inputs))
        teacher_emb = self.teacher.encode(teacher_inputs, batch_size=bs)

        # multilingual mode: build_distill_batches trains the student on
        # BOTH sides against the teacher's source embedding
        # (make_multilingual semantics, reference make_multilingual.py)
        batches = build_distill_batches(
            self.teacher.tokenizer, list(sentences), teacher_emb,
            batch_size=bs, max_len=max_len, seed=self.cfg.seed,
            src_sentences=(
                list(src_sentences) if src_sentences is not None else None
            ),
        )

        student_params = extract_student_layers(
            self.teacher.params, self.keep_layers
        )
        params = {"encoder": student_params}
        total_steps = len(batches) * self.cfg.epochs
        tx = make_optimizer(self.cfg, total_steps, params_example=params)
        state = init_train_state(params, tx, seed=self.cfg.seed)
        step = make_bi_encoder_train_step(
            self.student_arch, tx, loss_type="distill_mse",
            pooling=self.teacher.pooling,
            precision=precision_for(self.cfg.bf16),
            # remat=False crashes this environment's remote XLA compiler
            # on the bi-encoder backward (docs/ROUND3.md) — and halves
            # activation HBM either way
            remat=True,
        )

        for epoch in range(self.cfg.epochs):
            pend = []
            for b in batches:
                state, m = step(state, jax.tree.map(jnp.asarray, b))
                pend.append(m["loss"])
            losses = [float(x) for x in jax.device_get(pend)]
            logger.info(
                "distill epoch %d: mse %.6f -> %.6f",
                epoch, losses[0], np.mean(losses[-10:]),
            )
            if eval_fn is not None:
                logger.info("eval: %s", eval_fn(state))

        student = SentenceEncoder(
            state.params["encoder"],
            self.student_arch,
            tokenizer=self.teacher.tokenizer,
            pooling=self.teacher.pooling,
            precision=self.teacher.precision,
        )
        return student


def pca_reduce(emb: np.ndarray, dim: int):
    """PCA projection of teacher embeddings to ``dim`` — lets a student
    with a SMALLER output width learn teacher geometry (reference
    DistillationStrategy, model_compression.py:937-984). Returns
    (reduced (N, dim), (mean, components)). Shared math: ops/pca.py."""
    from ..ops.pca import pca_fit_transform

    reduced, mu, comp = pca_fit_transform(emb, dim)
    return np.asarray(reduced), (np.asarray(mu), np.asarray(comp))


class DimReducingDistiller(SentenceEncoderDistiller):
    """Layer-drop + width-reducing distillation: the student keeps a layer
    subset AND gains a fresh (H, student_dim) projection head trained
    against PCA-reduced teacher embeddings."""

    def __init__(self, teacher, student_dim: int, **kw):
        super().__init__(teacher, **kw)
        self.student_dim = student_dim
        self.student_arch = self.student_arch.replace(
            projection_dim=student_dim
        )
        self.pca = None

    def distill(
        self,
        sentences,
        eval_fn: Optional[Callable] = None,
        src_sentences: Optional[Sequence[str]] = None,
        batch_size=None,
        max_len: int = 128,
    ):
        # same signature as the base class — a **kw sink here silently
        # dropped src_sentences (teacher would encode the wrong language)
        # and eval_fn (callbacks never invoked)
        from ..models.sentence_encoder import SentenceEncoder

        bs = batch_size or self.cfg.batch_size
        teacher_inputs = list(src_sentences or sentences)
        teacher_emb = self.teacher.encode(teacher_inputs, batch_size=bs)
        reduced, self.pca = pca_reduce(
            np.asarray(teacher_emb), self.student_dim
        )

        batches = build_distill_batches(
            self.teacher.tokenizer, list(sentences), reduced,
            batch_size=bs, max_len=max_len, seed=self.cfg.seed,
            src_sentences=(
                list(src_sentences) if src_sentences is not None else None
            ),
        )
        student_params = extract_student_layers(
            self.teacher.params, self.keep_layers
        )
        key = jax.random.PRNGKey(self.cfg.seed)
        h = self.teacher.arch.hidden_size
        student_params["projection"] = {
            "w": jax.random.normal(key, (h, self.student_dim), jnp.float32)
            * 0.02,
            "b": jnp.zeros((self.student_dim,), jnp.float32),
        }
        params = {"encoder": student_params}
        total_steps = len(batches) * self.cfg.epochs
        tx = make_optimizer(self.cfg, total_steps, params_example=params)
        state = init_train_state(params, tx, seed=self.cfg.seed)
        step = make_bi_encoder_train_step(
            self.student_arch, tx, loss_type="distill_mse",
            pooling=self.teacher.pooling,
            precision=precision_for(self.cfg.bf16),
            # remat=False crashes this environment's remote XLA compiler
            # on the bi-encoder backward (docs/ROUND3.md) — and halves
            # activation HBM either way
            remat=True,
        )
        first = last = None
        for epoch in range(self.cfg.epochs):
            pend = []
            for b in batches:
                state, m = step(state, jax.tree.map(jnp.asarray, b))
                pend.append(m["loss"])
            losses = [float(x) for x in jax.device_get(pend)]
            if first is None:
                first = losses[0]
            last = float(np.mean(losses[-10:]))
            if eval_fn is not None:
                logger.info("eval: %s", eval_fn(state))
            logger.info(
                "dim-reduce distill epoch %d: mse %.6f -> %.6f",
                epoch, losses[0], last,
            )
        return SentenceEncoder(
            state.params["encoder"], self.student_arch,
            tokenizer=self.teacher.tokenizer, pooling=self.teacher.pooling,
            precision=self.teacher.precision,
        )


class FastFormersDistiller:
    """Multi-signal classifier distillation: teacher-logits KL +
    layer-mapped hidden-state MSE (+ optional hard-label CE). Drives
    train.steps.make_fastformers_distill_step over token batches.
    Reference: FastFormersDistiller, model_compression.py:1189-1333."""

    def __init__(
        self,
        teacher_params: dict,            # {"encoder","head"}
        teacher_arch: EncoderArch,
        keep_layers: Optional[Sequence[int]] = None,
        num_student_layers: Optional[int] = None,
        train_config: TrainConfig = TrainConfig(lr=5e-5, epochs=1),
        temperature: float = 2.0,
        alpha_kl: float = 1.0,
        alpha_state: float = 1.0,
        alpha_ce: float = 0.0,
        pooling: str = "cls",
    ):
        self.teacher_params = teacher_params
        self.teacher_arch = teacher_arch
        if keep_layers is None:
            keep_layers = every_other_layers(
                teacher_arch.num_layers,
                num_student_layers or teacher_arch.num_layers // 2,
            )
        self.keep_layers = list(keep_layers)
        self.student_arch = teacher_arch.replace(
            num_layers=len(self.keep_layers)
        )
        self.cfg = train_config
        self.kw = dict(
            temperature=temperature, alpha_kl=alpha_kl,
            alpha_state=alpha_state, alpha_ce=alpha_ce, pooling=pooling,
        )

    def distill(self, batches: Sequence[dict]):
        """batches: dicts with ids/mask(/type_ids/labels/valid). Returns
        (student_params, metrics_history)."""
        from ..train.steps import make_fastformers_distill_step

        student_params = {
            "encoder": extract_student_layers(
                self.teacher_params["encoder"], self.keep_layers
            ),
            "head": jax.tree.map(jnp.array, self.teacher_params["head"]),
        }
        total_steps = max(len(batches) * self.cfg.epochs, 1)
        tx = make_optimizer(
            self.cfg, total_steps, params_example=student_params
        )
        state = init_train_state(student_params, tx, seed=self.cfg.seed)
        # the student's layer i was initialized from teacher layer
        # keep_layers[i] — the state MSE must align with THOSE hidden
        # states (uniform resampling would pull the student off its init)
        layer_map = np.asarray(
            [0] + [k + 1 for k in self.keep_layers], np.int32
        )
        step = make_fastformers_distill_step(
            self.student_arch, self.teacher_arch, tx,
            precision=precision_for(self.cfg.bf16), layer_map=layer_map,
            **self.kw,
        )
        history = []
        for epoch in range(self.cfg.epochs):
            pend = []
            for b in batches:
                state, m = step(
                    state, jax.tree.map(jnp.asarray, b), self.teacher_params
                )
                pend.append(m)
            got = jax.device_get(pend)
            history.extend(
                {k: float(v) for k, v in m.items()} for m in got
            )
            logger.info(
                "fastformers epoch %d: loss %.4f -> %.4f (kl %.4f)",
                epoch, history[0]["loss"], history[-1]["loss"],
                history[-1]["kl"],
            )
        return state.params, history
