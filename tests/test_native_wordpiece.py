"""Native (C) WordPiece matcher: exact parity with the Python matcher and a
throughput sanity check."""

import time

import numpy as np
import pytest

from text_similarity_tpu.data.tokenization import (
    WordPieceTokenizer,
    train_wordpiece_vocab,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "internationalization and localization efforts",
    "tokenizers accelerate preprocessing pipelines",
    "unicode: naïve café résumé 東京 zürich",
    "byte pair encoding versus wordpiece segmentation",
] * 4


@pytest.fixture(scope="module")
def vocab():
    return train_wordpiece_vocab(CORPUS, vocab_size=2048, min_freq=1)


def _native_available():
    from text_similarity_tpu.native import get_lib

    return get_lib() is not None


def test_native_lib_builds():
    assert _native_available(), "C toolchain present but native lib failed"


def test_native_matches_python(vocab):
    tok_native = WordPieceTokenizer(vocab, use_native=True)
    tok_python = WordPieceTokenizer(vocab, use_native=False)
    assert tok_native._native is not None

    rng = np.random.RandomState(0)
    texts = CORPUS + [
        "completely unseen zzyzzyx words qqq",
        "MIXED Case And PUNCTUATION!!! with-hyphens and digits 12345",
        "",
        "a",
        "ё unicode ünïcödé ßtraße 日本語のテキスト",
        "x" * 150,  # over max_word_chars → unk
    ]
    # plus random char soup
    for _ in range(20):
        texts.append(
            "".join(rng.choice(list("abcdefgh ij.km'no"), rng.randint(1, 80)))
        )
    for t in texts:
        assert tok_native.tokenize_to_ids(t) == tok_python.tokenize_to_ids(t), t


def test_tokenize_many_parity(vocab):
    tok_native = WordPieceTokenizer(vocab, use_native=True)
    tok_python = WordPieceTokenizer(vocab, use_native=False)
    texts = CORPUS + ["zzyzzyx unseen", "", "x" * 150]
    got = tok_native.tokenize_many(texts)
    want = tok_python.tokenize_many(texts)
    assert got == want


def test_native_batch_faster_than_python(vocab):
    tok_native = WordPieceTokenizer(vocab, use_native=True)
    tok_python = WordPieceTokenizer(vocab, use_native=False)
    texts = CORPUS * 200

    def best_of(tok, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            tok.tokenize_many(texts)
            best = min(best, time.perf_counter() - t0)
        return best

    native_dt = best_of(tok_native)
    python_dt = best_of(tok_python)
    # batched C matcher must win (word-splitting cost is shared)
    assert native_dt < python_dt, (native_dt, python_dt)
