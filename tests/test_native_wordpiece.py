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
    # batched C matcher must win (word-splitting cost is shared); 20%
    # slack absorbs scheduler noise on the 1-CPU CI host
    assert native_dt < python_dt * 1.2, (native_dt, python_dt)


def test_encode_batch_padded_matches_python_path():
    """The pthread C batch path must be byte-exact with the sequential
    Python path for ASCII, and fall back per-row for non-ASCII docs."""
    vocab = train_wordpiece_vocab(
        ["the quick brown fox jumps", "punctuation, here! and-there",
         "numbers 123 and under_scores mix"], 256, min_freq=1,
    )
    tok_native = WordPieceTokenizer(vocab, use_native=True)
    tok_py = WordPieceTokenizer(vocab, use_native=False)
    if tok_native._native is None:
        import pytest
        pytest.skip("no C compiler")
    texts = [
        "The quick brown fox JUMPS over, the lazy dog!",
        "punctuation,,,   here!  and-there...",
        "under_scores and 123 numbers",
        "café au lait — unicode résumé",   # non-ASCII row
        "",
        "a",
        "x" * 300,                                          # over-long word
    ]
    ids_n, mask_n = tok_native.encode_batch(texts, max_len=32)
    ids_p, mask_p = tok_py.encode_batch(texts, max_len=32)
    L = max(ids_n.shape[1], ids_p.shape[1])

    def pad(a, fill):
        out = np.full((a.shape[0], L), fill, a.dtype)
        out[:, : a.shape[1]] = a
        return out

    np.testing.assert_array_equal(
        pad(ids_n, tok_py.pad_id), pad(ids_p, tok_py.pad_id)
    )
    np.testing.assert_array_equal(pad(mask_n, 0), pad(mask_p, 0))


def test_encode_batch_padded_truncation_and_threads():
    vocab = train_wordpiece_vocab(["word " * 50], 128, min_freq=1)
    tok = WordPieceTokenizer(vocab, use_native=True)
    if tok._native is None:
        import pytest
        pytest.skip("no C compiler")
    texts = ["word " * 200] * 64    # every row truncates at max_len
    ids, mask, lens, needs = tok._native.encode_batch_padded(
        texts, 16, tok.cls_id, tok.sep_id, tok.pad_id, n_threads=7
    )
    assert ids.shape == (64, 16)
    assert (lens == 16).all() and not needs.any()
    assert (ids[:, 0] == tok.cls_id).all()
    assert (ids[:, 15] == tok.sep_id).all()
    assert (mask == 1).all()
    # all rows identical (same text) regardless of which thread ran them
    assert (ids == ids[0]).all()


def test_encode_batch_control_byte_whitespace_parity():
    """ASCII 0x1c-0x1f are str.split() whitespace in Python; the C path
    must agree (review regression: they became [UNK] tokens)."""
    vocab = train_wordpiece_vocab(["alpha beta gamma"], 128, min_freq=1)
    tok_native = WordPieceTokenizer(vocab, use_native=True)
    tok_py = WordPieceTokenizer(vocab, use_native=False)
    if tok_native._native is None:
        import pytest
        pytest.skip("no C compiler")
    texts = ["alpha\x1cbeta", "alpha\x1dbeta\x1egamma", "\x1falpha"]
    ids_n, mask_n = tok_native.encode_batch(texts, max_len=16)
    ids_p, mask_p = tok_py.encode_batch(texts, max_len=16)
    L = max(ids_n.shape[1], ids_p.shape[1])

    def pad(a, fill):
        out = np.full((a.shape[0], L), fill, a.dtype)
        out[:, : a.shape[1]] = a
        return out

    np.testing.assert_array_equal(
        pad(ids_n, tok_py.pad_id), pad(ids_p, tok_py.pad_id)
    )
