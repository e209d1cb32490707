"""CLI smoke tests: real end-to-end runs of the training/eval/search
subcommands on tiny synthetic datasets."""

import json
import os

import numpy as np
import pytest

from text_similarity_tpu.cli.main import main

SENTS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast dark fox leaped over a sleepy dog",
    "machine learning on tensor processing units",
    "semantic similarity of sentences",
    "the dog sleeps while the fox runs",
    "investors worried about interest rates",
    "the cat sat on the mat",
    "a kitten rested on a rug",
]


@pytest.fixture()
def sts_file(tmp_path):
    p = tmp_path / "sts.tsv"
    rng = np.random.RandomState(0)
    lines = []
    for i in range(16):
        a, b = SENTS[i % 8], SENTS[(i + 1) % 8]
        lines.append(f"{a}\t{b}\t{rng.uniform(0, 5):.2f}")
    p.write_text("\n".join(lines))
    return str(p)


def _base_args(tmp_path, extra):
    return extra + [
        "--arch", "tiny-test", "--vocab-size", "512", "--fp32",
        "--save-path", str(tmp_path / "run"),
        "--batch-size", "4", "--epochs", "1", "--max-len", "32",
    ]


def test_cli_train_and_eval_sts(tmp_path, sts_file, capsys):
    main(_base_args(tmp_path, ["train-sts", "--data", sts_file, "--no-eval"]))
    assert os.path.exists(tmp_path / "run" / "arch.json")
    main([
        "eval-sts", "--model", str(tmp_path / "run"), "--data", sts_file,
        "--fp32", "--save-path", str(tmp_path / "x"),
    ])
    out = capsys.readouterr().out
    # eval prints the full metric bundle as json
    assert "spearman_cosine" in out and "pearson_dot" in out


def test_cli_train_nli(tmp_path):
    p = tmp_path / "nli.tsv"
    lines = [
        f"{SENTS[i % 8]}\t{SENTS[(i + 3) % 8]}\t{lab}"
        for i, lab in enumerate(
            ["entailment", "neutral", "contradiction"] * 4
        )
    ]
    p.write_text("\n".join(lines))
    main(_base_args(tmp_path, ["train-nli", "--data", str(p)]))
    assert os.path.exists(tmp_path / "run" / "LATEST")


def test_cli_search_and_mine(tmp_path, capsys):
    # train a tiny model first so search can load it
    sts = tmp_path / "sts.tsv"
    sts.write_text("\n".join(f"{a}\t{b}\t3.0" for a, b in zip(SENTS, SENTS[1:] + SENTS[:1])))
    main(_base_args(tmp_path, ["train-sts", "--data", str(sts), "--no-eval"]))
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(SENTS))
    main([
        "search", "--model", str(tmp_path / "run"), "--corpus", str(corpus),
        "--query", SENTS[0], "--top-k", "3", "--fp32",
        "--save-path", str(tmp_path / "x"), "--clusters", "2", "--probes", "2",
    ])
    out = capsys.readouterr().out
    assert SENTS[0] in out  # self-retrieval

    main([
        "mine", "--corpus", str(corpus), "--model", str(tmp_path / "run"),
        "--min-score", "-1", "--fp32", "--save-path", str(tmp_path / "x"),
    ])
    out = capsys.readouterr().out
    assert len(out.splitlines()) > 0


def test_cli_quantize_and_export(tmp_path):
    sts = tmp_path / "sts.tsv"
    sts.write_text("\n".join(f"{a}\t{b}\t3.0" for a, b in zip(SENTS, SENTS[1:] + SENTS[:1])))
    main(_base_args(tmp_path, ["train-sts", "--data", str(sts), "--no-eval"]))
    main([
        "quantize", "--model", str(tmp_path / "run"), "--fp32",
        "--save-path", str(tmp_path / "int8"),
    ])
    assert os.path.exists(tmp_path / "int8" / "LATEST")
    main([
        "export", "--model", str(tmp_path / "run"), "--fp32",
        "--save-path", str(tmp_path / "bundle"),
        "--batch-sizes", "2", "--seq-lens", "16",
    ])
    assert os.path.exists(tmp_path / "bundle" / "manifest.json")


def test_cli_theseus(tmp_path):
    sts = tmp_path / "sts.tsv"
    sts.write_text("\n".join(f"{a}\t{b}\t3.0" for a, b in zip(SENTS, SENTS[1:] + SENTS[:1])))
    main(_base_args(tmp_path, ["train-sts", "--data", str(sts), "--no-eval"]))
    paws = tmp_path / "paws.tsv"
    paws.write_text(
        "id\tsentence1\tsentence2\tlabel\n"
        + "\n".join(
            f"{i}\t{SENTS[i % 8]}\t{SENTS[(i + 1) % 8]}\t{i % 2}"
            for i in range(16)
        )
    )
    main([
        "theseus", "--model", str(tmp_path / "run"), "--data", str(paws),
        "--slots", "1", "--fp32", "--batch-size", "4", "--epochs", "1",
        "--max-len", "32", "--save-path", str(tmp_path / "theseus"),
    ])
    from text_similarity_tpu.models.sentence_encoder import SentenceEncoder

    student = SentenceEncoder.load(str(tmp_path / "theseus"))
    assert student.arch.num_layers == 1
    emb = student.encode(list(SENTS[:2]))
    assert emb.shape == (2, student.arch.hidden_size)


def test_cli_classification_then_prune(tmp_path):
    import json as _json

    docs = tmp_path / "docs.jsonl"
    docs.write_text(
        "\n".join(
            _json.dumps({"text": s, "label": ["a", "b"][i % 2]})
            for i, s in enumerate(SENTS * 2)
        )
    )
    main(_base_args(tmp_path, ["train-classification", "--data", str(docs)]))
    main([
        "prune", "--model", str(tmp_path / "run"), "--data", str(docs),
        "--target-heads", "2", "--target-ffn", "64", "--fp32",
        "--batch-size", "4", "--epochs", "1", "--max-len", "32",
        "--save-path", str(tmp_path / "pruned"),
    ])
    import os as _os

    assert _os.path.exists(tmp_path / "pruned" / "arch.json")
    from text_similarity_tpu.core.config import EncoderArch

    with open(tmp_path / "pruned" / "arch.json") as f:
        arch = EncoderArch.from_json(f.read())
    assert arch.num_heads == 2 and arch.intermediate_size == 64


def test_cli_quantized_model_loads(tmp_path):
    sts = tmp_path / "sts.tsv"
    sts.write_text("\n".join(f"{a}\t{b}\t3.0" for a, b in zip(SENTS, SENTS[1:] + SENTS[:1])))
    main(_base_args(tmp_path, ["train-sts", "--data", str(sts), "--no-eval"]))
    main([
        "quantize", "--model", str(tmp_path / "run"), "--fp32",
        "--save-path", str(tmp_path / "int8"),
    ])
    # vocab must ride along for the loaded model to encode
    import shutil

    shutil.copy(tmp_path / "run" / "vocab.txt", tmp_path / "int8" / "vocab.txt")
    from text_similarity_tpu.models.sentence_encoder import SentenceEncoder

    enc8 = SentenceEncoder.load(str(tmp_path / "int8"), bf16=False)
    enc = SentenceEncoder.load(str(tmp_path / "run"), bf16=False)
    a = enc.encode(list(SENTS[:3]))
    b = enc8.encode(list(SENTS[:3]))
    cos = np.sum(a * b, axis=1)
    assert cos.min() > 0.98


def test_cli_train_wic(tmp_path):
    wic = tmp_path / "wic.tsv"
    wic.write_text(
        "fox\tN\t3-2\tthe quick brown fox jumps\ta fast dark fox leaped\n"
        "cat\tN\t1-1\tthe cat sat quietly\tthe cat rested calmly\n"
        "dog\tN\t2-4\tthe lazy dog slept\tthe fox ran from a dog\n"
        "mat\tN\t5-3\tthe cat sat on a mat\ta soft mat lay there\n"
    )
    gold = tmp_path / "gold.txt"
    gold.write_text("T\nT\nF\nT\n")
    main(_base_args(tmp_path, [
        "train-wic", "--data", str(wic), "--gold", str(gold),
    ]))
    out = json.loads(open(tmp_path / "run" / "results.jsonl").readline())
    assert "train" in out


def test_cli_train_cross_encoder_and_rerank(tmp_path):
    paws = tmp_path / "paws.tsv"
    paws.write_text(
        "id\ts1\ts2\tlabel\n"
        + "\n".join(
            f"{i}\t{SENTS[i % 8]}\t{SENTS[(i + 1) % 8]}\t{i % 2}"
            for i in range(16)
        )
    )
    main(_base_args(tmp_path, [
        "train-cross-encoder", "--data", str(paws),
    ]))
    from text_similarity_tpu.models.cross_encoder import CrossEncoder

    ce = CrossEncoder.load(str(tmp_path / "run"), bf16=False)
    scores = ce.predict([(SENTS[0], SENTS[1]), (SENTS[2], SENTS[3])])
    assert scores.shape == (2,)
    assert np.isfinite(scores).all()


def test_cli_pretrain_long(tmp_path, capsys):
    docs = tmp_path / "docs.txt"
    docs.write_text("\n".join((s + " ") * 6 for s in SENTS * 2))
    main(_base_args(tmp_path, [
        "pretrain-long", "--data", str(docs),
        "--target-len", "64", "--window", "8", "--mask-prob", "0.3",
        "--lr", "3e-4", "--warmup-ratio", "0.0",
    ]) + ["--epochs", "3"])
    out = capsys.readouterr().out
    res = json.loads(out.strip().splitlines()[-1])
    assert res["target_len"] == 64
    # the long model re-adapts: MLM loss must drop over the run
    assert res["mlm_loss_last"] < res["mlm_loss_first"]
    # saved model reloads with the extended positions + window arch
    from text_similarity_tpu.models.sentence_encoder import SentenceEncoder

    enc = SentenceEncoder.load(str(tmp_path / "run"), bf16=False)
    assert enc.arch.max_position >= 64
    assert enc.arch.attention_window == 8


def test_cli_eval_classification(tmp_path, capsys):
    import json as _json

    docs = tmp_path / "docs.jsonl"
    docs.write_text(
        "\n".join(
            _json.dumps({"text": s, "label": ["a", "b"][i % 2]})
            for i, s in enumerate(SENTS * 2)
        )
    )
    main(_base_args(tmp_path, ["train-classification", "--data", str(docs)]))
    capsys.readouterr()
    main([
        "eval-classification", "--model", str(tmp_path / "run"),
        "--data", str(docs), "--fp32", "--batch-size", "4", "--max-len", "32",
        "--save-path", str(tmp_path / "x"),
    ])
    out = capsys.readouterr().out
    res = json.loads(out.strip().splitlines()[-1])
    assert res["n"] == 16
    assert 0.0 <= res["accuracy"] <= 1.0
    assert set(res["per_class"]) <= {"a", "b"}


def test_cli_cluster(tmp_path, capsys):
    sts = tmp_path / "sts.tsv"
    sts.write_text("\n".join(f"{a}\t{b}\t3.0" for a, b in zip(SENTS, SENTS[1:] + SENTS[:1])))
    main(_base_args(tmp_path, ["train-sts", "--data", str(sts), "--no-eval"]))
    capsys.readouterr()
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(SENTS))
    main([
        "cluster", "--model", str(tmp_path / "run"), "--corpus", str(corpus),
        "--num-clusters", "2", "--fp32", "--save-path", str(tmp_path / "x"),
    ])
    out = capsys.readouterr().out
    rows = [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]
    assert len(rows) == 2
    assert sum(r["size"] for r in rows) == len(SENTS)


def test_cli_topics_with_lexicon(tmp_path, capsys):
    from text_similarity_tpu.utils.lexicon import demo_lexicon

    sts = tmp_path / "sts.tsv"
    sts.write_text("\n".join(f"{a}\t{b}\t3.0" for a, b in zip(SENTS, SENTS[1:] + SENTS[:1])))
    main(_base_args(tmp_path, ["train-sts", "--data", str(sts), "--no-eval"]))
    capsys.readouterr()
    lex = tmp_path / "lex.json"
    demo_lexicon().to_json(str(lex))
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(SENTS * 2))
    main([
        "topics", "--model", str(tmp_path / "run"), "--corpus", str(corpus),
        "--num-topics", "2", "--fp32", "--save-path", str(tmp_path / "x"),
        "--lexicon", str(lex),
    ])
    out = capsys.readouterr().out
    # one row per topic: id, size, [words], names (possibly empty string)
    assert len(out.strip().splitlines()) == 2


def test_cli_train_moe(tmp_path, sts_file):
    """--experts N trains an MoE bi-encoder end to end and the saved arch
    round-trips the MoE fields (SentenceEncoder.load reconstructs the
    expert stack)."""
    main(_base_args(tmp_path, [
        "train-sts", "--data", sts_file, "--no-eval",
        "--experts", "2", "--expert-top-k", "1",
    ]))
    arch = json.loads((tmp_path / "run" / "arch.json").read_text())
    assert arch["num_experts"] == 2 and arch["expert_top_k"] == 1
    from text_similarity_tpu.models.sentence_encoder import SentenceEncoder

    enc = SentenceEncoder.load(str(tmp_path / "run"), bf16=False)
    assert enc.params["layers"]["mlp"]["in"]["w"].shape[1] == 2
    emb = enc.encode(SENTS[:4])
    assert np.isfinite(np.asarray(emb)).all()


def test_cli_encode_packed_matches_bucketed(tmp_path, capsys):
    """`encode` writes (N, D) embeddings; --packed (greedy packing +
    block-diagonal attention) matches the bucketed path row-for-row."""
    sts = tmp_path / "sts.tsv"
    sts.write_text("\n".join(
        f"{a}\t{b}\t3.0" for a, b in zip(SENTS, SENTS[1:] + SENTS[:1])
    ))
    main(_base_args(tmp_path, ["train-sts", "--data", str(sts), "--no-eval"]))
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(SENTS))
    main([
        "encode", "--model", str(tmp_path / "run"), "--corpus", str(corpus),
        "--out", str(tmp_path / "emb.npy"), "--fp32",
        "--save-path", str(tmp_path / "x"), "--width", "32",
    ])
    main([
        "encode", "--model", str(tmp_path / "run"), "--corpus", str(corpus),
        "--out", str(tmp_path / "emb_packed.npy"), "--fp32", "--packed",
        "--save-path", str(tmp_path / "x"), "--width", "32",
    ])
    a = np.load(tmp_path / "emb.npy")
    b = np.load(tmp_path / "emb_packed.npy")
    assert a.shape == b.shape == (len(SENTS), a.shape[1])
    np.testing.assert_allclose(a, b, atol=2e-4)
