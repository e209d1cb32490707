"""Dataset loader + batch builder tests over synthetic fixture files."""

import gzip
import json

import numpy as np
import pytest

from text_similarity_tpu.data import datasets as D
from text_similarity_tpu.data.pairs import (
    build_pair_batches,
    build_sequence_batches,
    build_distill_batches,
    build_word_batches,
)
from text_similarity_tpu.data.tokenization import (
    WordPieceTokenizer,
    train_wordpiece_vocab,
)


@pytest.fixture(scope="module")
def tok():
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "a bank can be a river bank or a money bank",
        "machine learning is fun and fast",
    ]
    return WordPieceTokenizer(train_wordpiece_vocab(corpus, 512, min_freq=1))


def test_load_sts(tmp_path):
    p = tmp_path / "sts.tsv"
    p.write_text(
        "main-captions\tMSRvid\t2012\t0001\t4.25\ta man is singing\ta man sings\n"
        "one\ttwo\n"  # malformed (2 cols) → skipped
        "a dog runs\ta dog is running\t5.0\n"
    )
    rows = D.load_sts(str(p))
    assert len(rows) == 2
    assert abs(rows[0][2] - 0.85) < 1e-9
    assert rows[1] == ("a dog runs", "a dog is running", 1.0)


def test_load_nli(tmp_path):
    p = tmp_path / "nli.tsv"
    p.write_text(
        "a man eats\ta person eats\tentailment\n"
        "a man eats\ta man sleeps\tcontradiction\n"
        "a man eats\ta man eats pasta\tneutral\n"
    )
    rows = D.load_nli(str(p))
    assert [r[2] for r in rows] == [0, 2, 1]


def test_load_paws_quora(tmp_path):
    p = tmp_path / "paws.tsv"
    p.write_text("id\tsentence1\tsentence2\tlabel\n1\tfoo bar\tbar foo\t1\n2\tx\ty\t0\n")
    rows = D.load_paws(str(p))
    assert rows == [("foo bar", "bar foo", 1), ("x", "y", 0)]
    q = tmp_path / "quora.tsv"
    q.write_text("1\t2\t3\thow to cook rice\tcooking rice how\t1\n")
    rows = D.load_quora(str(q))
    assert rows == [("how to cook rice", "cooking rice how", 1)]


def test_load_parallel_gz(tmp_path):
    p = tmp_path / "par.tsv.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write("hello world\thallo welt\ngood day\tguten tag\n")
    rows = D.load_parallel(str(p))
    assert rows[1] == ("good day", "guten tag")


def test_load_wic(tmp_path):
    d = tmp_path / "wic.tsv"
    d.write_text("bank\tN\t1-2\tthe bank closed\tthe river bank\n")
    g = tmp_path / "gold.txt"
    g.write_text("F\n")
    rows = D.load_wic(str(d), str(g))
    assert rows[0]["idx1"] == 1 and rows[0]["idx2"] == 2
    assert rows[0]["label"] == 0


def test_load_conll(tmp_path):
    p = tmp_path / "ner.txt"
    p.write_text("John B-PER\nworks O\n\nParis B-LOC\n")
    sents = D.load_conll_ner(str(p))
    assert len(sents) == 2
    assert sents[0]["tags"] == ["B-PER", "O"]


def test_load_documents_json(tmp_path):
    p = tmp_path / "docs.jsonl"
    recs = [{"text": "w " * 100, "label": "news"}]
    p.write_text("\n".join(json.dumps(r) for r in recs))
    docs = D.load_documents_json(str(p), max_paragraph_words=30)
    assert len(docs) == 4  # 100 words → ceil(100/30)
    assert all(d["label"] == "news" for d in docs)


def test_stratified_split_and_kfold():
    examples = list(range(100))
    labels = [i % 4 for i in examples]
    train, test = D.stratified_split(examples, labels, 0.2, seed=1)
    assert len(train) + len(test) == 100
    # stratification: each label ~5 in test
    from collections import Counter

    c = Counter(x % 4 for x in test)
    assert all(4 <= v <= 6 for v in c.values())

    seen = set()
    for tr, va in D.stratified_kfold(examples, labels, k=5):
        assert len(tr) + len(va) == 100
        seen.update(va)
    assert seen == set(examples)


def test_build_pair_batches_bi(tok):
    pairs = [("the quick fox", "a lazy dog"), ("bank of the river", "money bank")] * 5
    targets = [0.9, 0.1] * 5
    batches = build_pair_batches(tok, pairs, targets, batch_size=4, shuffle=False)
    assert sum(int(b["valid"].sum()) for b in batches) == 10
    for b in batches:
        assert b["ids_a"].shape == b["ids_b"].shape
        assert b["ids_a"].shape[0] == 4


def test_build_pair_batches_cross(tok):
    pairs = [("quick fox", "lazy dog")] * 3
    batches = build_pair_batches(
        tok, pairs, [1, 0, 1], batch_size=4, mode="cross",
        target_dtype=np.int32,
    )
    b = batches[0]
    assert "type_ids" in b and b["type_ids"].max() == 1
    assert b["valid"].sum() == 3


def test_build_sequence_batches(tok):
    texts = ["the fox runs fast"] * 7
    batches = build_sequence_batches(tok, texts, [1] * 7, batch_size=4)
    assert sum(int(b["valid"].sum()) for b in batches) == 7


def test_build_distill_batches(tok):
    sents = ["quick fox", "lazy dog", "river bank"]
    temb = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    batches = build_distill_batches(tok, sents, temb, batch_size=4)
    b = batches[0]
    assert b["target"].shape == (4, 16)
    assert b["valid"].sum() == 3


def test_build_word_batches(tok):
    examples = [
        {"word": "bank", "idx1": 1, "idx2": 2,
         "sent1": "the bank closed", "sent2": "the river bank", "label": 0},
        {"word": "fox", "idx1": 2, "idx2": 1,
         "sent1": "a quick fox runs", "sent2": "the fox sleeps", "label": 1},
    ]
    batches = build_word_batches(tok, examples, batch_size=2)
    b = batches[0]
    assert (b["span_a"][:2] >= -1).all()
    # every valid row has at least one span index
    assert (b["span_a"][:2, 0] >= 0).all()
    assert (b["span_b"][:2, 0] >= 0).all()


def test_word_batches_span_points_at_word(tok):
    examples = [
        {"word": "bank", "idx1": 1, "idx2": 3,
         "sent1": "the bank closed", "sent2": "a man robs the bank", "label": 1},
    ]
    b = build_word_batches(tok, examples, batch_size=1)[0]
    # decode the span positions of sent1: should map to "bank" pieces
    ids = b["ids_a"][0]
    span = [p for p in b["span_a"][0] if p >= 0]
    toks = [tok.ids_to_tokens[int(ids[p])] for p in span]
    assert "".join(toks).replace("##", "") == "bank"


def test_load_gwsc(tmp_path):
    p = tmp_path / "gwsc.tsv"
    p.write_text(
        "bank\t1\t3\tthe bank closed early\tmoney in the bank\t3.5\n"
        "fox\tthe quick fox runs\ta fox slept today\t1.25\n"
    )
    rows = D.load_gwsc(str(p))
    assert len(rows) == 2
    assert rows[0]["idx1"] == 1 and rows[0]["score"] == 3.5
    # 4-column variant finds the word position by match
    assert rows[1]["idx1"] == 2 and rows[1]["idx2"] == 1
