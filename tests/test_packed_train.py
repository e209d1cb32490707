"""Packed training steps: the sequence-packing throughput win carried into
the train loop (train/steps.make_packed_*_train_step + data/pairs.
build_packed_pair_batches). The gate that matters: packed loss AND the
post-step parameters must match the dense step on the same pair set — the
objective is unchanged, only the batch layout is.

Supersedes training-side smart batching (reference src/dataset/dataset.py:
386-418)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from text_similarity_tpu.core.config import ARCH_PRESETS, TrainConfig
from text_similarity_tpu.core.precision import FP32_PRECISION
from text_similarity_tpu.data.pairs import (
    build_pair_batches,
    build_packed_pair_batches,
)
from text_similarity_tpu.data.tokenization import (
    WordPieceTokenizer,
    train_wordpiece_vocab,
)
from text_similarity_tpu.models import init_params
from text_similarity_tpu.train import (
    init_train_state,
    make_bi_encoder_train_step,
    make_classifier_train_step,
    make_packed_bi_encoder_train_step,
    make_packed_classifier_train_step,
)
from text_similarity_tpu.train.steps import init_classifier_head

ARCH = ARCH_PRESETS["tiny-test"].replace(
    hidden_dropout=0.0, attention_dropout=0.0, has_pooler=False
)
ARCH_POOLER = ARCH.replace(has_pooler=True)

WORDS = [
    "cat", "dog", "sat", "on", "the", "mat", "rug", "big", "small", "red",
    "blue", "fast", "slow", "bird", "fish", "ran", "jumped", "house",
    "tree", "river",
]


@pytest.fixture(scope="module")
def tok():
    corpus = [" ".join(WORDS)] * 3
    return WordPieceTokenizer(train_wordpiece_vocab(corpus, 256, min_freq=1))


def _pairs(n=24, seed=0):
    rng = np.random.RandomState(seed)
    pairs, targets = [], []
    for _ in range(n):
        la, lb = rng.randint(2, 9), rng.randint(2, 9)
        pairs.append((
            " ".join(rng.choice(WORDS, la)),
            " ".join(rng.choice(WORDS, lb)),
        ))
        targets.append(float(rng.rand()))
    return pairs, targets


def _fresh_state(params, tx):
    # steps donate their state; give each step its own copy of the arrays
    return init_train_state(jax.tree.map(jnp.array, params), tx)


def _tree_allclose(a, b, rtol=2e-3, atol=1e-5):
    flat_a, _ = jax.tree.flatten(a)
    flat_b, _ = jax.tree.flatten(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(x, np.float64), np.asarray(y, np.float64),
            rtol=rtol, atol=atol,
        )


# ---------------------------------------------------------------------------
# builder invariants
# ---------------------------------------------------------------------------

def test_packed_builder_covers_every_pair_once(tok):
    pairs, targets = _pairs(40)
    batches = build_packed_pair_batches(
        tok, pairs, targets, rows_per_side=4, width=32, shuffle=False
    )
    assert len(batches) >= 2          # forced multi-batch by tiny rows
    shapes = {
        k: b[k].shape for b in batches for k in b
    }  # constant across batches (one compile)
    for b in batches:
        for k, v in b.items():
            assert v.shape == shapes[k], k
    seen_a, seen_b = [], []
    for b in batches:
        n_valid = int(b["valid"].sum())
        for side, seen in (("a", seen_a), ("b", seen_b)):
            own = b[f"owners_{side}"]
            local = own[own >= 0]
            # each valid pair owns exactly one segment per side
            assert sorted(local.tolist()) == list(range(n_valid))
            # owners beyond the valid count never appear
            assert local.max() < n_valid
            seen.append(n_valid)
    assert sum(seen_a) == len(pairs)


def test_packed_builder_roundtrips_tokens(tok):
    """Re-assemble each pair's tokens from the packed rows via owners and
    compare with direct tokenization."""
    pairs, targets = _pairs(16, seed=3)
    batches = build_packed_pair_batches(
        tok, pairs, targets, rows_per_side=8, width=32, shuffle=False
    )
    got_targets = []
    for b in batches:
        n_valid = int(b["valid"].sum())
        got_targets.extend(b["target"][:n_valid].tolist())
        own = b["owners_a"]
        for r in range(own.shape[0]):
            for mslot in range(own.shape[1]):
                o = own[r, mslot]
                if o < 0:
                    continue
                seg_tok = b["ids_a"][r][b["segments_a"][r] == mslot + 1]
                assert seg_tok[0] == tok.cls_id
                assert seg_tok[-1] == tok.sep_id
    # every target shows up exactly once across batches
    assert sorted(got_targets) == sorted(
        np.asarray(targets, np.float32).tolist()
    )


# ---------------------------------------------------------------------------
# parity gates: packed step == dense step (loss and updated params)
# ---------------------------------------------------------------------------

def _one_dense_batch(tok, pairs, targets, loss="cosine_mse"):
    dt = np.int32 if loss == "softmax" else np.float32
    batches = build_pair_batches(
        tok, pairs, targets, batch_size=len(pairs), max_len=32,
        shuffle=False, target_dtype=dt,
    )
    assert len(batches) == 1
    return jax.tree.map(jnp.asarray, batches[0])


def _one_packed_batch(tok, pairs, targets, loss="cosine_mse", mode="bi"):
    dt = np.int32 if loss == "softmax" else np.float32
    batches = build_packed_pair_batches(
        tok, pairs, targets, rows_per_side=16, width=32,
        shuffle=False, target_dtype=dt, mode=mode,
    )
    assert len(batches) == 1
    return jax.tree.map(jnp.asarray, batches[0])


@pytest.mark.parametrize("loss", ["cosine_mse", "mnrl", "softmax"])
def test_packed_bi_step_matches_dense(tok, loss):
    pairs, targets = _pairs(24, seed=1)
    if loss == "softmax":
        targets = [int(t * 3) for t in targets]

    params = {"encoder": init_params(jax.random.PRNGKey(0), ARCH)}
    if loss == "softmax":
        params["head"] = init_classifier_head(
            jax.random.PRNGKey(1), 3 * ARCH.hidden_size, 3
        )
    tx = optax.sgd(0.1)

    dense_step = make_bi_encoder_train_step(
        ARCH, tx, loss_type=loss, precision=FP32_PRECISION
    )
    packed_step = make_packed_bi_encoder_train_step(
        ARCH, tx, loss_type=loss, precision=FP32_PRECISION
    )
    s_dense, m_dense = dense_step(
        _fresh_state(params, tx), _one_dense_batch(tok, pairs, targets, loss)
    )
    s_packed, m_packed = packed_step(
        _fresh_state(params, tx), _one_packed_batch(tok, pairs, targets, loss)
    )
    np.testing.assert_allclose(
        float(m_dense["loss"]), float(m_packed["loss"]), rtol=1e-4
    )
    _tree_allclose(s_dense.params, s_packed.params)


def test_packed_classifier_step_matches_dense_with_pooler(tok):
    """Cross-encoder objective, arch WITH the BERT pooler — the packed
    forward must route each segment's [CLS] through the pooler tanh just
    like the dense classifier_forward does."""
    pairs, targets = _pairs(20, seed=2)
    labels = [int(t * 2) for t in targets]

    params = {
        "encoder": init_params(jax.random.PRNGKey(0), ARCH_POOLER),
        "head": init_classifier_head(
            jax.random.PRNGKey(1), ARCH_POOLER.hidden_size, 2
        ),
    }
    tx = optax.sgd(0.1)
    dense_step = make_classifier_train_step(
        ARCH_POOLER, tx, pooling="cls", precision=FP32_PRECISION
    )
    packed_step = make_packed_classifier_train_step(
        ARCH_POOLER, tx, precision=FP32_PRECISION
    )

    dt = np.int32
    dense_b = build_pair_batches(
        tok, pairs, labels, batch_size=len(pairs), max_len=32,
        mode="cross", shuffle=False, target_dtype=dt,
    )[0]
    packed_b = _one_packed_batch(tok, pairs, labels, "softmax", mode="cross")

    s_dense, m_dense = dense_step(
        _fresh_state(params, tx), jax.tree.map(jnp.asarray, dense_b)
    )
    s_packed, m_packed = packed_step(
        _fresh_state(params, tx), packed_b
    )
    np.testing.assert_allclose(
        float(m_dense["loss"]), float(m_packed["loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(m_dense["accuracy"]), float(m_packed["accuracy"]), rtol=1e-5
    )
    _tree_allclose(s_dense.params, s_packed.params)


def test_packed_bi_train_descends(tok):
    pairs, targets = _pairs(32, seed=4)
    params = {"encoder": init_params(jax.random.PRNGKey(0), ARCH)}
    tx = optax.adamw(1e-3)
    step = make_packed_bi_encoder_train_step(
        ARCH, tx, loss_type="cosine_mse", precision=FP32_PRECISION
    )
    batches = build_packed_pair_batches(
        tok, pairs, targets, rows_per_side=8, width=32, shuffle=False
    )
    state = init_train_state(params, tx)
    losses = []
    for _ in range(6):
        for b in batches:
            state, m = step(state, jax.tree.map(jnp.asarray, b))
            losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_packed_rejects_performer():
    arch = ARCH.replace(attention_type="performer")
    with pytest.raises(ValueError):
        make_packed_bi_encoder_train_step(arch, optax.sgd(0.1))
    with pytest.raises(ValueError):
        make_packed_classifier_train_step(arch, optax.sgd(0.1))


# ---------------------------------------------------------------------------
# CrossEncoder packed scoring with a pooler arch (inference-side fix)
# ---------------------------------------------------------------------------

def test_cross_encoder_packed_scores_match_dense_with_pooler(tok):
    from text_similarity_tpu.models.cross_encoder import CrossEncoder

    pairs, _ = _pairs(24, seed=5)
    ce = CrossEncoder.init(
        jax.random.PRNGKey(0), ARCH_POOLER, tokenizer=tok,
        num_classes=2, precision=FP32_PRECISION,
    )
    dense = ce.predict(pairs, packed=False)
    packed = ce.predict(pairs, packed=True)
    np.testing.assert_allclose(dense, packed, rtol=2e-3, atol=1e-4)
