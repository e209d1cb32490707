"""Structured logits, sense utils, NER step, profiling harness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_structured_logits_smoothing():
    from text_similarity_tpu.ops.segment import structured_logits

    logits = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    # edges: class 1 neighbors class 0 (so smoothing pulls logit 1 up)
    src = jnp.asarray([0], jnp.int32)
    dst = jnp.asarray([1], jnp.int32)
    w = jnp.asarray([1.0])
    out = np.asarray(structured_logits(logits, src, dst, w, alpha=0.5))
    assert out[0, 1] == pytest.approx(0.5)
    assert out[0, 0] == pytest.approx(0.5)   # no in-edges → only self part
    assert out[0, 2] == pytest.approx(0.0)


def test_sense_bank_roundtrip(tmp_path):
    from text_similarity_tpu.utils.senses import (
        load_sense_embeddings,
        build_sense_bank,
        reduce_dim,
        save_sense_bank,
        load_sense_bank_npz,
        sense_key_lemma,
    )

    p = tmp_path / "ares.txt"
    rng = np.random.RandomState(0)
    lines = ["3 8"]
    for key in ["bank%1:14:00::", "bank%1:17:01::", "fox%1:05:00::"]:
        vec = " ".join(f"{x:.4f}" for x in rng.randn(8))
        lines.append(f"{key} {vec}")
    p.write_text("\n".join(lines))

    bank = load_sense_embeddings(str(p))
    assert len(bank) == 3
    assert sense_key_lemma("bank%1:14:00::") == "bank"

    mat, keys = build_sense_bank(bank, restrict_lemmas=["bank"])
    assert mat.shape == (2, 8)

    red = reduce_dim(bank, 2)
    assert next(iter(red.values())).shape == (2,)

    save_sense_bank(str(tmp_path / "bank.npz"), bank)
    loaded = load_sense_bank_npz(str(tmp_path / "bank.npz"))
    np.testing.assert_allclose(
        loaded["fox%1:05:00::"], bank["fox%1:05:00::"]
    )


def test_match_sense_picks_nearest():
    from text_similarity_tpu.models.word_encoder import match_sense

    bank = jnp.asarray(np.eye(4, dtype=np.float32))
    word_vecs = jnp.asarray([[0.1, 0.9, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]])
    matched = np.asarray(match_sense(word_vecs, bank))
    np.testing.assert_array_equal(matched[0], [0, 1, 0, 0])
    np.testing.assert_array_equal(matched[1], [0, 0, 0, 1])


def test_ner_step_loss_decreases():
    from text_similarity_tpu.core.config import ARCH_PRESETS, TrainConfig
    from text_similarity_tpu.models import init_params
    from text_similarity_tpu.train import make_optimizer, init_train_state
    from text_similarity_tpu.train.steps import (
        make_token_classifier_train_step,
        init_classifier_head,
    )

    arch = ARCH_PRESETS["tiny-test"].replace(
        hidden_dropout=0.0, attention_dropout=0.0
    )
    cfg = TrainConfig(lr=1e-3, warmup_ratio=0.0, bf16=False)
    params = {
        "encoder": init_params(jax.random.PRNGKey(0), arch),
        "head": init_classifier_head(jax.random.PRNGKey(1), arch.hidden_size, 3),
    }
    tx = make_optimizer(cfg, 30, params_example=params)
    state = init_train_state(params, tx)
    step = make_token_classifier_train_step(arch, tx)
    rng = np.random.RandomState(0)
    batch = {
        "ids": jnp.asarray(rng.randint(5, arch.vocab_size, (4, 16)), jnp.int32),
        "mask": jnp.ones((4, 16), jnp.int32),
        "tags": jnp.asarray(rng.randint(0, 3, (4, 16)), jnp.int32),
    }
    losses = []
    for _ in range(15):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses


def test_benchmark_fn():
    from text_similarity_tpu.utils.profiling import benchmark_fn

    f = jax.jit(lambda x: x @ x)
    x = jnp.ones((64, 64))
    res = benchmark_fn(f, x, warmup=1, iters=3, items_per_call=64)
    assert res["mean_ms"] > 0 and "throughput_per_sec" in res


def test_extend_positions():
    from text_similarity_tpu.core.config import ARCH_PRESETS
    from text_similarity_tpu.models import init_params
    from text_similarity_tpu.models.hf_convert import extend_positions

    arch = ARCH_PRESETS["tiny-test"]
    params = init_params(jax.random.PRNGKey(0), arch)
    new_params, new_arch = extend_positions(params, arch, 300)
    assert new_arch.max_position == 300
    emb = np.asarray(params["embeddings"]["position"])
    new = np.asarray(new_params["embeddings"]["position"])
    assert new.shape[0] == 300
    np.testing.assert_array_equal(new[: emb.shape[0]], emb)  # prefix kept
    np.testing.assert_array_equal(new[emb.shape[0] : 2 * emb.shape[0]], emb)


def test_activations():
    from text_similarity_tpu.models.encoder import _act

    x = jnp.linspace(-3, 3, 7)
    for name in ("mish", "swish", "penalized_tanh", "gelu", "gelu_new", "relu"):
        y = np.asarray(_act(name)(x))
        assert np.isfinite(y).all()
    # penalized tanh: negative side scaled by 0.25
    pt = np.asarray(_act("penalized_tanh")(jnp.asarray([-1.0, 1.0])))
    assert pt[0] == pytest.approx(0.25 * np.tanh(-1.0))
    assert pt[1] == pytest.approx(np.tanh(1.0))


def test_wic_word_encoder_scores():
    from text_similarity_tpu.core.config import ARCH_PRESETS
    from text_similarity_tpu.core.precision import FP32_PRECISION
    from text_similarity_tpu.models import init_params
    from text_similarity_tpu.models.word_encoder import WordEncoder
    from text_similarity_tpu.data.tokenization import (
        WordPieceTokenizer, train_wordpiece_vocab,
    )
    from text_similarity_tpu.data.pairs import build_word_batches

    corpus = ["the bank closed early", "the river bank flooded",
              "a quick fox runs", "money in the bank"]
    tok = WordPieceTokenizer(train_wordpiece_vocab(corpus, 512, min_freq=1))
    arch = ARCH_PRESETS["tiny-test"].replace(vocab_size=tok.vocab_size)
    enc = WordEncoder(
        init_params(jax.random.PRNGKey(0), arch), arch, tokenizer=tok,
        precision=FP32_PRECISION,
    )
    examples = [
        {"word": "bank", "idx1": 1, "idx2": 2,
         "sent1": "the bank closed early", "sent2": "the river bank flooded",
         "label": 0},
        {"word": "bank", "idx1": 1, "idx2": 3,
         "sent1": "the bank closed early", "sent2": "money in the bank",
         "label": 1},
    ]
    batches = build_word_batches(tok, examples, batch_size=2)
    res = enc.evaluate_wic(batches)
    assert 0.0 <= res["accuracy"] <= 1.0
    g = enc.evaluate_gwsc(batches, [0.2, 0.9])
    assert -1.0 <= g["spearman"] <= 1.0


def test_gwsc_scores_align_after_batch_shuffle():
    """evaluate_gwsc must realign length-sorted/shuffled batches to the
    original example order before pairing with gold (review regression)."""
    from text_similarity_tpu.core.config import ARCH_PRESETS
    from text_similarity_tpu.core.precision import FP32_PRECISION
    from text_similarity_tpu.data.pairs import build_word_batches
    from text_similarity_tpu.data.tokenization import (
        WordPieceTokenizer, train_wordpiece_vocab,
    )
    from text_similarity_tpu.models import init_params
    from text_similarity_tpu.models.word_encoder import WordEncoder

    corpus = ["short words here now", "a much longer sentence with many more words inside it"]
    vocab = train_wordpiece_vocab(corpus, 256, min_freq=1)
    tok = WordPieceTokenizer(vocab)
    arch = ARCH_PRESETS["tiny-test"].replace(vocab_size=tok.vocab_size)
    enc = WordEncoder(
        init_params(jax.random.PRNGKey(0), arch), arch, tokenizer=tok,
        precision=FP32_PRECISION,
    )
    # mixed lengths force length-sorting to permute example order;
    # varying word indices give distinct per-example scores
    examples = [
        {"sent1": corpus[i % 2], "idx1": i % 3,
         "sent2": corpus[(i + 1) % 2], "idx2": (i + 1) % 3, "label": 1}
        for i in range(6)
    ]
    gold = [0.1, 0.9, 0.2, 0.8, 0.3, 0.7]
    batches = build_word_batches(tok, examples, batch_size=2, seed=3)
    r1 = enc.evaluate_gwsc(batches, gold)
    # per-example scores in original order must be invariant to batching
    scores, idxs = [], []
    for b in batches:
        s = enc.score_tokens(b)
        v = np.asarray(b["valid"]).astype(bool)
        scores.append(s[v])
        idxs.append(np.asarray(b["index"])[v])
    order = np.argsort(np.concatenate(idxs))
    aligned = np.concatenate(scores)[order]
    from scipy.stats import pearsonr

    expect = float(pearsonr(np.asarray(gold), aligned)[0])
    assert abs(r1["pearson"] - expect) < 1e-9
