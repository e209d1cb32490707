"""Tokenization + batching tests."""

import numpy as np
import pytest

from text_similarity_tpu.data.tokenization import (
    WordPieceTokenizer,
    train_wordpiece_vocab,
)
from text_similarity_tpu.data.batching import (
    LengthBucketBatcher,
    pick_bucket,
    pad_to_bucket,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast dark fox leaped over a sleepy dog",
    "machine learning on tensor processing units",
    "semantic similarity of sentences",
    "the dog sleeps while the fox runs",
] * 4


def _tok():
    vocab = train_wordpiece_vocab(CORPUS, vocab_size=512, min_freq=1)
    return WordPieceTokenizer(vocab)


def test_wordpiece_roundtrip_known_words():
    tok = _tok()
    ids = tok.tokenize_to_ids("the quick fox")
    assert len(ids) >= 3
    assert tok.unk_id not in ids  # all words seen in training corpus


def test_wordpiece_unseen_word_uses_subwords_or_unk():
    tok = _tok()
    ids = tok.tokenize_to_ids("zzzzqqqq")
    assert len(ids) >= 1  # never crashes


def test_encode_batch_shapes_and_mask():
    tok = _tok()
    ids, mask = tok.encode_batch(["the fox", "a sleepy dog runs far away"], max_len=16)
    assert ids.shape == mask.shape
    assert (ids[mask == 0] == tok.pad_id).all()
    assert ids[0, 0] == tok.cls_id
    row_len = mask[0].sum()
    assert ids[0, row_len - 1] == tok.sep_id


def test_encode_pair_batch_types():
    tok = _tok()
    ids, mask, tts = tok.encode_pair_batch(
        ["the fox"], ["the dog sleeps"], max_len=32
    )
    n = mask[0].sum()
    seps = np.where(ids[0, :n] == tok.sep_id)[0]
    assert len(seps) == 2
    assert (tts[0, : seps[0] + 1] == 0).all()
    assert (tts[0, seps[0] + 1 : seps[1] + 1] == 1).all()


def test_bucket_batcher_static_shapes():
    rows = [[1] * n for n in (3, 5, 9, 17, 20, 33, 60, 2, 64, 100)]
    batcher = LengthBucketBatcher(batch_size=4, shuffle_batches=False)
    seen = set()
    covered = np.zeros(len(rows), bool)
    for b in batcher.batches(rows):
        assert b["ids"].shape[0] == 4
        assert b["ids"].shape[1] in (16, 32, 64, 128, 256, 512)
        seen.add(b["ids"].shape)
        covered[b["index"][b["valid"]]] = True
    assert covered.all()


def test_pick_bucket_and_pad():
    assert pick_bucket(10) == 16
    assert pick_bucket(17) == 32
    ids = np.ones((2, 20), np.int32)
    mask = np.ones((2, 20), np.int32)
    pi, pm = pad_to_bucket(ids, mask)
    assert pi.shape == (2, 32)
    assert pm[:, 20:].sum() == 0


def test_word_spans_alignment():
    tok = _tok()
    spans = tok.token_spans("the quick fox")
    assert [w for w, _ in spans] == ["the", "quick", "fox"]
    # positions are consecutive starting at 1 ([CLS] at 0)
    flat = [p for _, ps in spans for p in ps]
    assert flat == list(range(1, len(flat) + 1))


def test_word_batches_span_with_punctuation():
    """WiC indices count whitespace tokens; punctuation before the target
    must not shift the extracted span (review regression)."""
    from text_similarity_tpu.data.pairs import build_word_batches
    from text_similarity_tpu.data.tokenization import (
        WordPieceTokenizer, train_wordpiece_vocab,
    )

    corpus = ["the cat which slept purred loudly today fox"]
    vocab = train_wordpiece_vocab(corpus, 256, min_freq=1)
    tok = WordPieceTokenizer(vocab)
    sent = "the cat, which slept, purred today"
    # whitespace tokens: [the, cat,, which, slept,, purred, today]
    # idx 4 = "purred"
    ex = {"sent1": sent, "idx1": 4, "sent2": sent, "idx2": 4, "label": 1}
    batches = build_word_batches(tok, [ex], batch_size=1, shuffle=False)
    b = batches[0]
    span = b["span_a"][0]
    pos = span[span >= 0]
    assert len(pos) > 0
    ids = b["ids_a"][0]
    purred_ids = tok._wordpiece("purred")
    got = [int(ids[p]) for p in pos]
    assert got == purred_ids[: len(got)], (got, purred_ids)


def test_pair_batches_cap_bucket_nonstandard_max_len():
    """max_len not in BUCKETS (e.g. 100) must not crash the cross-mode
    builder (pick_bucket used to return 128 and the (100,) slice blew up
    on assignment)."""
    from text_similarity_tpu.data.pairs import build_pair_batches

    corpus = ["some words here " * 12, "short", "a medium sentence here"]
    tok = WordPieceTokenizer(train_wordpiece_vocab(corpus, 256, min_freq=1))
    pairs = [(corpus[0], corpus[1]), (corpus[2], corpus[0])]
    for mode in ("cross", "bi"):
        batches = build_pair_batches(
            tok, pairs, [0.1, 0.9], batch_size=2, max_len=100, mode=mode,
        )
        for b in batches:
            key = "ids" if mode == "cross" else "ids_a"
            assert b[key].shape[1] <= 100


def test_pair_batches_with_encode_batch_only_tokenizer():
    """Tokenizers exposing only encode_batch (the HF tokenizer.json
    adapter shape) must work in the bi/sequence/distill builders."""
    from text_similarity_tpu.data.pairs import (
        build_pair_batches, build_sequence_batches,
    )

    corpus = ["alpha beta gamma", "delta epsilon", "zeta eta theta iota"]
    inner = WordPieceTokenizer(train_wordpiece_vocab(corpus, 256, min_freq=1))

    class _BatchOnly:
        pad_id = inner.pad_id
        cls_id = inner.cls_id
        sep_id = inner.sep_id
        vocab_size = inner.vocab_size

        def encode_batch(self, texts, max_len=128, pad_to=None):
            return inner.encode_batch(texts, max_len, pad_to)

    tok = _BatchOnly()
    batches = build_pair_batches(
        tok, [(corpus[0], corpus[1])], [1.0], batch_size=1, mode="bi",
    )
    assert batches and batches[0]["mask_a"].sum() > 0
    sb = build_sequence_batches(tok, corpus, [0, 1, 0], batch_size=2)
    assert sb and sb[0]["mask"].sum() > 0


def test_encode_batch_pad_to_too_small_raises():
    corpus = ["many words in this sentence " * 4]
    tok = WordPieceTokenizer(train_wordpiece_vocab(corpus, 256, min_freq=1))
    with pytest.raises(ValueError):
        tok.encode_batch(corpus, max_len=128, pad_to=4)


def test_vocab_file_crlf(tmp_path):
    corpus = ["hello world"]
    tok = WordPieceTokenizer(train_wordpiece_vocab(corpus, 64, min_freq=1))
    p = tmp_path / "vocab.txt"
    tok.save_vocab(str(p))
    # rewrite with CRLF line endings
    p.write_bytes(p.read_bytes().replace(b"\n", b"\r\n"))
    tok2 = WordPieceTokenizer.from_vocab_file(str(p))
    a = tok.tokenize_to_ids("hello world")
    b = tok2.tokenize_to_ids("hello world")
    assert a == b and len(a) > 0


def test_load_wic_gold_mismatch_raises(tmp_path):
    from text_similarity_tpu.data.datasets import load_wic

    data = tmp_path / "wic.tsv"
    data.write_text(
        "bank\tN\t1-2\tthe bank closed\tthe river bank\n"
        "run\tV\t0-0\truns fast\ta long run\n"
    )
    gold = tmp_path / "gold.txt"
    gold.write_text("T\n")   # one label for two rows
    with pytest.raises(ValueError):
        load_wic(str(data), str(gold))


def test_best_threshold_ties_and_tiny_inputs():
    from text_similarity_tpu.evaluation.meters import (
        best_threshold_accuracy, best_threshold_f1,
    )

    # all scores tied: no realizable cut — accuracy is the better of the
    # constant predictors, never the inflated mid-tie value
    r = best_threshold_accuracy(
        np.array([0.5, 0.5, 0.5, 0.5]), np.array([1, 0, 1, 0])
    )
    assert r["accuracy"] == 0.5
    # 0/1-pair inputs: no -1 sentinel
    assert best_threshold_accuracy(np.array([]), np.array([]))["accuracy"] == 0.0
    assert best_threshold_accuracy(
        np.array([0.9]), np.array([1])
    )["accuracy"] in (0.0, 1.0)
    f = best_threshold_f1(
        np.array([0.5, 0.5]), np.array([1, 0])
    )
    assert f["f1"] == 0.0   # no realizable separating threshold
