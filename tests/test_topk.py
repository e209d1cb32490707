"""Fused cosine top-k: pallas kernel (interpret mode on CPU) vs XLA oracle vs
numpy argsort."""

import numpy as np
import jax.numpy as jnp

from text_similarity_tpu.ops.topk import (
    cosine_topk_pallas,
    cosine_topk_xla,
    l2_normalize,
    topk_merge,
)


def _data(q=7, n=999, d=128, seed=0):
    rng = np.random.RandomState(seed)
    queries = l2_normalize(jnp.asarray(rng.randn(q, d), jnp.float32))
    corpus = l2_normalize(jnp.asarray(rng.randn(n, d), jnp.float32))
    return queries, corpus


def _numpy_topk(queries, corpus, k):
    scores = np.asarray(queries, np.float32) @ np.asarray(corpus, np.float32).T
    idx = np.argsort(-scores, axis=1)[:, :k]
    s = np.take_along_axis(scores, idx, axis=1)
    return s, idx


def test_xla_topk_matches_numpy():
    q, c = _data()
    s, i = cosine_topk_xla(q, c, k=10, chunk=256)
    ns, ni = _numpy_topk(q, c, 10)
    np.testing.assert_allclose(np.asarray(s), ns, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), ni)


def test_pallas_topk_matches_numpy():
    q, c = _data(q=5, n=700, d=128, seed=1)
    s, i = cosine_topk_pallas(q, c, k=10, block_q=8, block_c=256, interpret=True)
    ns, ni = _numpy_topk(q, c, 10)
    np.testing.assert_allclose(np.asarray(s), ns, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), ni)


def test_pallas_topk_single_block():
    q, c = _data(q=3, n=100, d=64, seed=2)
    s, i = cosine_topk_pallas(q, c, k=5, block_q=8, block_c=128, interpret=True)
    ns, ni = _numpy_topk(q, c, 5)
    np.testing.assert_allclose(np.asarray(s), ns, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), ni)


def test_topk_merge():
    rng = np.random.RandomState(3)
    # 4 shards × top-8 each, global ids disjoint per shard
    scores = jnp.asarray(rng.rand(4, 8), jnp.float32)
    indices = jnp.asarray(
        np.arange(32).reshape(4, 8) + 1000, jnp.int32
    )
    ms, mi = topk_merge(scores, indices, k=8)
    flat_s = np.asarray(scores).reshape(-1)
    flat_i = np.asarray(indices).reshape(-1)
    order = np.argsort(-flat_s)[:8]
    np.testing.assert_allclose(np.asarray(ms), flat_s[order], atol=1e-7)
    np.testing.assert_array_equal(np.asarray(mi), flat_i[order])


def test_pallas_topk_int8_close_to_exact():
    from text_similarity_tpu.compress.quantize import quantize_embeddings_int8
    from text_similarity_tpu.ops.topk import cosine_topk_pallas_int8

    q, c = _data(q=6, n=640, d=128, seed=4)
    cq, cs = quantize_embeddings_int8(c)
    s, i = cosine_topk_pallas_int8(
        q, cq, cs, k=10, block_q=8, block_c=128, interpret=True
    )
    ns, ni = _numpy_topk(q, c, 10)
    # int8 rounding can flip near-ties; require >= 90% overlap and top-1 hit
    overlap = np.mean([
        len(set(np.asarray(i)[r]) & set(ni[r])) / 10 for r in range(6)
    ])
    assert overlap >= 0.9, overlap
    np.testing.assert_array_equal(np.asarray(i)[:, 0], ni[:, 0])


def test_pallas_exact_with_score_ties_and_lane_collision():
    """Regression: a hidden lane-class collision must be detected even
    when reported winners tie at the k-th score (the strict-above count
    equals the reported-above count only when nothing is hidden)."""
    import jax

    d, n, k = 8, 2048, 3
    base = np.zeros((n, d), np.float32)
    base[:, 0] = 0.5          # everything ties at 0.5
    base[0, 0] = 0.9          # best
    base[512, 0] = 0.8        # second best — SAME lane class as col 0
    q = np.zeros((4, d), np.float32)
    q[:, 0] = 1.0
    corpus = jnp.asarray(base)
    queries = jnp.asarray(q)
    s, i = cosine_topk_pallas(
        queries, corpus, k=k, block_q=8, block_c=2048, interpret=True
    )
    s_o, i_o = cosine_topk_xla(queries, corpus, k=k)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_o), atol=1e-6)
    # 0 and 512 must both be found (0.9 and 0.8); third is any 0.5 doc
    for r in range(4):
        assert {0, 512} <= set(np.asarray(i)[r]), np.asarray(i)[r]


def test_pallas_bf16_corpus_near_exact():
    """A bf16 corpus flips the kernel to native bf16 MXU dots (serving
    path): results must agree with the exact f32 kernel up to bf16 input
    rounding — here, high top-10 overlap on a well-separated corpus."""
    rng = np.random.RandomState(11)
    corpus = l2_normalize(jnp.asarray(rng.randn(4096, 64), jnp.float32))
    queries = l2_normalize(jnp.asarray(rng.randn(32, 64), jnp.float32))
    _, exact_i = cosine_topk_pallas(queries, corpus, k=10, interpret=True)
    _, b16_i = cosine_topk_pallas(
        queries, corpus.astype(jnp.bfloat16), k=10, interpret=True
    )
    exact_i, b16_i = np.asarray(exact_i), np.asarray(b16_i)
    overlap = np.mean([
        len(set(exact_i[r]) & set(b16_i[r])) / 10 for r in range(32)
    ])
    assert overlap >= 0.95, overlap


def test_two_pass_certified_exact():
    """Pass A (deferred lane-class fold) + pass B (count certification):
    results must be index-exact vs the XLA oracle on random corpora."""
    from text_similarity_tpu.ops.topk import cosine_topk_pallas_2pass

    rng = np.random.RandomState(3)
    corpus = l2_normalize(jnp.asarray(rng.randn(4096 + 77, 64), jnp.float32))
    queries = l2_normalize(jnp.asarray(rng.randn(40, 64), jnp.float32))
    _, oi = cosine_topk_xla(queries, corpus, k=10)
    _, ti = cosine_topk_pallas_2pass(queries, corpus, k=10, interpret=True)
    oi, ti = np.asarray(oi), np.asarray(ti)
    for r in range(40):
        assert set(oi[r]) == set(ti[r]), (r, oi[r], ti[r])


def test_two_pass_collision_falls_back_exact():
    """Two top-k docs sharing a lane class (positions ≡ mod block_c) hide
    one in pass A; certification must detect it and the fallback must
    restore exactness."""
    from text_similarity_tpu.ops.topk import cosine_topk_pallas_2pass

    rng = np.random.RandomState(4)
    d = 64
    corpus = rng.randn(4096, d).astype(np.float32) * 0.01
    target = rng.randn(d).astype(np.float32)
    # two near-duplicates of the query at the SAME lane class (block_c
    # = 2048 apart) → same fold lane; both belong in the top-10
    corpus[5] = target + 0.001 * rng.randn(d)
    corpus[5 + 2048] = target + 0.001 * rng.randn(d)
    corpus = l2_normalize(jnp.asarray(corpus))
    queries = l2_normalize(jnp.asarray(target[None, :].repeat(8, axis=0)))
    _, oi = cosine_topk_xla(queries, corpus, k=10)
    _, ti = cosine_topk_pallas_2pass(queries, corpus, k=10, interpret=True)
    oi, ti = np.asarray(oi), np.asarray(ti)
    for r in range(8):
        assert {5, 5 + 2048} <= set(ti[r]), ti[r]
        assert set(oi[r]) == set(ti[r])
