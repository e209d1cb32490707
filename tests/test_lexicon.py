"""Tests for the offline taxonomy lexicon + hypernym topic naming
(reference: src/pipeline/topic_modeling.py:120-127, 171-190)."""

import numpy as np

from text_similarity_tpu.utils.lexicon import (
    Lexicon,
    common_hypernyms_for_words,
    demo_lexicon,
    name_topics,
)


def test_lowest_common_hypernyms_depth():
    lx = demo_lexicon()
    # siblings under mammal → mammal (not the shallower animal/entity)
    assert lx.lowest_common_hypernyms("dog.n.01", "cat.n.01") == ["mammal.n.01"]
    # mammal × bird → animal
    assert lx.lowest_common_hypernyms("dog.n.01", "eagle.n.01") == ["animal.n.01"]
    # unrelated branches → root
    assert lx.lowest_common_hypernyms("dog.n.01", "car.n.01") == ["entity.n.01"]
    # self is its own deepest common ancestor
    assert lx.lowest_common_hypernyms("dog.n.01", "dog.n.01") == ["dog.n.01"]


def test_name_topics_coverage_and_specificity():
    lx = demo_lexicon()
    topics = {
        0: [("dog", 1.0), ("kitten", 0.9), ("horse", 0.8)],
        1: [("car", 1.0), ("truck", 0.9), ("bike", 0.8)],
        2: [("apple", 1.0), ("banana", 0.9), ("bread", 0.8)],
        3: [("qwertyuiop", 1.0)],  # absent from lexicon
    }
    names = name_topics(topics, lx, n_names=1)
    assert names[0] == ["mammal"]
    assert names[1] == ["vehicle"]
    assert names[2] == ["food"]
    assert names[3] == []


def test_coverage_beats_depth():
    lx = demo_lexicon()
    # three mammals + one bird: animal covers 4 words, mammal only 3 —
    # coverage ranks first, then depth breaks ties
    ranked = common_hypernyms_for_words(
        ["dog", "cat", "horse", "eagle"], lx
    )
    assert ranked[0][0] == "animal.n.01" and ranked[0][1] == 4
    # mammal should still rank above the root among 3-coverage candidates
    three_cov = [s for s, cov, _ in ranked if cov == 3]
    assert three_cov[0] == "mammal.n.01"


def test_json_roundtrip(tmp_path):
    lx = demo_lexicon()
    p = str(tmp_path / "lex.json")
    lx.to_json(p)
    lx2 = Lexicon.from_json(p)
    assert lx2.synsets("puppy") == ["dog.n.01"]
    assert lx2.lowest_common_hypernyms("dog.n.01", "cat.n.01") == ["mammal.n.01"]
    assert lx2.name("mammal.n.01") == "mammal"


def test_ancestors_hop_distances():
    lx = demo_lexicon()
    d = lx.ancestors("dog.n.01")
    assert d["dog.n.01"] == 0
    assert d["mammal.n.01"] == 1
    assert d["animal.n.01"] == 2
    assert d["entity.n.01"] == 3


def test_multi_parent_dag():
    # a synset with two hypernym parents: depth takes the LONGEST path,
    # LCH handles the diamond
    h = {
        "root": [],
        "a": ["root"],
        "b": ["root"],
        "c": ["a", "b"],       # diamond
        "deep1": ["a"],
        "deep2": ["deep1"],
    }
    lx = Lexicon({"c": ["c"], "deep": ["deep2"], "b": ["b"]}, h)
    assert lx.depth("c") == 2
    assert lx.depth("deep2") == 3
    assert lx.lowest_common_hypernyms("c", "deep2") == ["a"]
    assert lx.lowest_common_hypernyms("c", "b") == ["b"]


def test_pipeline_name_topics_integration():
    """TopicModelingPipeline.name_topics names clusters from their
    c-TF-IDF words via the lexicon, end to end without an encoder."""
    from text_similarity_tpu.pipelines.topic import TopicModelingPipeline

    class _StubEncoder:
        def encode(self, corpus, batch_size=128):
            # two well-separated blobs in 8-d: animal docs vs vehicle docs
            rng = np.random.RandomState(0)
            out = []
            for c in corpus:
                base = (
                    np.eye(8)[0] if "dog" in c or "cat" in c else np.eye(8)[4]
                )
                out.append(base + 0.01 * rng.randn(8))
            return np.asarray(out, np.float32)

    corpus = (
        ["the dog chased the cat", "a cat and a dog played"] * 4
        + ["the car passed the truck", "a truck and a car raced"] * 4
    )
    pipe = TopicModelingPipeline(
        _StubEncoder(), num_topics=2, reduce_dim=0, lexicon=demo_lexicon()
    )
    res = pipe(corpus)
    assert set(res["names"].keys()) == set(res["topics"].keys())
    joined = {t: " ".join(ns) for t, ns in res["names"].items()}
    # one topic must be named from the animal branch, the other vehicle
    values = sorted(joined.values())
    assert any("mammal" in v or "animal" in v for v in values), res["names"]
    assert any("vehicle" in v or "car" in v or "truck" in v for v in values), res["names"]
