"""Sharded index over the fake 8-device CPU mesh: per-shard top-k +
all-gather merge must match the single-device oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from text_similarity_tpu.core.config import IndexConfig
from text_similarity_tpu.core.mesh import make_mesh
from text_similarity_tpu.index import BruteForceIndex
from text_similarity_tpu.index.sharded import (
    ShardedBruteForceIndex,
    ShardedIVFIndex,
)
from text_similarity_tpu.ops.topk import l2_normalize


def _corpus(n=2000, d=64, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return jnp.asarray(x)


def _clustered_corpus(n, d, n_centers, seed=0):
    """IVF-meaningful corpus: gaussian blobs (neighbors share clusters)."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_centers, d).astype(np.float32)
    assign = rng.randint(0, n_centers, n)
    return l2_normalize(jnp.asarray(
        centers[assign] * 3.0 + rng.randn(n, d).astype(np.float32)
    ))


def test_sharded_brute_force_matches_oracle(eight_devices):
    mesh = make_mesh(data=1, model=1, index=8)
    x = _corpus(2000, 64)
    q = _corpus(32, 64, seed=1)

    sharded = ShardedBruteForceIndex.build(mesh, x)
    s, i = sharded.query(q, k=10)

    oracle = BruteForceIndex.from_embeddings(x)
    os_, oi = oracle.query(q, k=10, impl="xla")
    np.testing.assert_array_equal(i, oi)
    np.testing.assert_allclose(s, os_, atol=1e-5)


def test_sharded_ivf_recall(eight_devices):
    mesh = make_mesh(data=1, model=1, index=8)
    x = _clustered_corpus(4000, 64, 48)
    q = l2_normalize(x[:32] + 0.01)

    cfg = IndexConfig(num_clusters=64, num_probes=6, kmeans_iters=6)
    sharded = ShardedIVFIndex.build(mesh, x, cfg)
    s, i = sharded.query(q, k=10)

    oracle = BruteForceIndex.from_embeddings(x)
    _, oi = oracle.query(q, k=10, impl="xla")
    recall = np.mean([
        len(set(i[r]) & set(oi[r])) / 10 for r in range(len(q))
    ])
    assert recall >= 0.9, recall
    # ids are valid and unique per row
    assert (i >= 0).all() and (i < 4000).all()


def test_sharded_ivf_pallas_kernel_path(eight_devices):
    """The Pallas IVF kernel (interpret mode on CPU) inside shard_map:
    must match the XLA gather path's recall."""
    mesh = make_mesh(data=1, model=1, index=8)
    x = _clustered_corpus(4000, 64, 48)
    q = l2_normalize(x[:32] + 0.01)

    cfg = IndexConfig(num_clusters=64, num_probes=8, kmeans_iters=6)
    sharded = ShardedIVFIndex.build(mesh, x, cfg)
    # force pallas impl in the query fn
    fn = sharded._make_query(10, 8, impl="pallas")
    import jax as _jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    qd = _jax.device_put(q, NamedSharding(mesh, P()))
    from text_similarity_tpu.index.sharded import _unpack_results

    packed = fn(qd, sharded.centroids, sharded.data_padded, sharded.ids_padded)
    _, i = _unpack_results(packed, 10)

    from text_similarity_tpu.index import BruteForceIndex

    oracle = BruteForceIndex.from_embeddings(x)
    _, oi = oracle.query(q, k=10, impl="xla")
    recall = np.mean([
        len(set(i[r]) & set(oi[r])) / 10 for r in range(len(q))
    ])
    assert recall >= 0.9, recall


def test_sharded_bruteforce_negative_scores_with_padding(eight_devices):
    mesh8 = make_mesh(data=1, model=1, index=8)
    """Zero-padding rows (score 0) must not displace real negative-score
    neighbors from the per-shard top-k (review regression)."""
    from text_similarity_tpu.index.sharded import ShardedBruteForceIndex
    from text_similarity_tpu.ops.topk import cosine_topk_xla, l2_normalize

    rng = np.random.RandomState(0)
    n = 100   # pads to 128 over 8 shards → 28 zero rows on the last shard
    emb = l2_normalize(jnp.asarray(rng.randn(n, 16), jnp.float32))
    idx = ShardedBruteForceIndex.build(mesh8, emb)
    # query anti-aligned with the corpus: every true score is negative
    q = -emb[-4:]
    s, i = idx.query(q, k=5)
    s_o, i_o = cosine_topk_xla(l2_normalize(q), emb, k=5)
    np.testing.assert_allclose(s, np.asarray(s_o), atol=1e-5)
    np.testing.assert_array_equal(i, np.asarray(i_o))
    assert np.isfinite(s).all() and (i < n).all()


def test_sharded_ivf_query_slices_padded_batch(eight_devices):
    mesh8 = make_mesh(data=1, model=1, index=8)
    """Non-multiple-of-block_q query batches return exactly len(queries)
    rows (review regression: pallas pad rows leaked through)."""
    from text_similarity_tpu.core.config import IndexConfig
    from text_similarity_tpu.index.sharded import ShardedIVFIndex
    from text_similarity_tpu.ops.topk import l2_normalize

    rng = np.random.RandomState(1)
    emb = l2_normalize(jnp.asarray(rng.randn(512, 16), jnp.float32))
    sivf = ShardedIVFIndex.build(
        mesh8, emb, IndexConfig(num_clusters=16, num_probes=4, kmeans_iters=2)
    )
    s, i = sivf.query(emb[:20], k=3)       # 20 is not a block_q multiple
    assert s.shape == (20, 3) and i.shape == (20, 3)
    assert (i[:, 0] == np.arange(20)).all()


def test_sharded_ivf_global_clusters_256k_recall(eight_devices):
    """North-star parity gate (BASELINE config 5; gate raised 64k → 256k
    per VERDICT r4 task 4): sharded IVF with globally-consistent k-means
    must reach recall@10 >= 0.95 vs the sharded brute-force oracle on a
    262k-row clustered corpus."""
    mesh = make_mesh(data=1, model=1, index=8)
    rng = np.random.RandomState(7)
    n, d, n_centers = 262144, 64, 512
    centers = rng.randn(n_centers, d).astype(np.float32)
    # sort rows by center: shards see DISJOINT regions of the space —
    # the regime where shard-local k-means mis-models the global geometry
    assign = np.sort(rng.randint(0, n_centers, n))
    x = l2_normalize(jnp.asarray(
        centers[assign] * 3.0 + rng.randn(n, d).astype(np.float32)
    ))
    q = l2_normalize(x[:: n // 64][:64] + 0.05)

    cfg = IndexConfig(num_clusters=512, num_probes=20, kmeans_iters=5)
    sharded = ShardedIVFIndex.build(mesh, x, cfg)
    assert sharded.centroids.shape[0] == 512  # global clusters, not per-shard
    _, i = sharded.query(q, k=10)

    oracle = ShardedBruteForceIndex.build(mesh, x)
    _, oi = oracle.query(q, k=10)
    recall = np.mean([
        len(set(i[r]) & set(oi[r])) / 10 for r in range(len(q))
    ])
    assert recall >= 0.95, recall


def test_sharded_ivf_large_k_multislot_fold(eight_devices):
    """k=50 through the per-shard Pallas scan (interpret mode on the CPU
    mesh): a 128-aligned per-shard Mc engages the multi-slot deferred
    fold inside shard_map (asserted via the shared plan — ADVICE r3 found
    the old test never reached the path it named); recall@50 must match
    the all-gather-merged brute-force oracle."""
    from text_similarity_tpu.index.ivf import _approx_merge_plan

    mesh = make_mesh(data=1, model=1, index=8)
    x = _clustered_corpus(8192, 32, 24)
    q = l2_normalize(x[:32] + 0.01)

    cfg = IndexConfig(
        num_clusters=4, num_probes=3, kmeans_iters=5, max_cluster_size=256,
    )
    sharded = ShardedIVFIndex.build(mesh, x, cfg)
    mc = sharded.data_padded.shape[1]
    assert mc == 256, mc  # cap engaged → 128-aligned per-shard width
    w, slots = _approx_merge_plan(50, mc, 2048)
    assert w == 256 and slots >= 2  # multi-slot fold engaged
    _, i = sharded.query(q, k=50, impl="pallas")

    oracle = BruteForceIndex.from_embeddings(x)
    _, oi = oracle.query(q, k=50, impl="xla")
    i = np.asarray(i)
    recall = np.mean([
        len(set(i[r]) & set(oi[r])) / 50 for r in range(len(q))
    ])
    assert recall >= 0.9, recall


def test_sharded_ivf_large_k_small_mc_exact_fallback(eight_devices):
    """Small misaligned per-shard Mc + large k: the plan falls back to the
    exact merge inside shard_map (the r3 recall cliff shipped a 0.928);
    recall@50 must match the oracle."""
    mesh = make_mesh(data=1, model=1, index=8)
    x = _clustered_corpus(8192, 32, 24)
    q = l2_normalize(x[:32] + 0.01)

    cfg = IndexConfig(num_clusters=4, num_probes=3, kmeans_iters=5)
    sharded = ShardedIVFIndex.build(mesh, x, cfg)
    _, i = sharded.query(q, k=50, impl="pallas")

    oracle = BruteForceIndex.from_embeddings(x)
    _, oi = oracle.query(q, k=50, impl="xla")
    i = np.asarray(i)
    recall = np.mean([
        len(set(i[r]) & set(oi[r])) / 50 for r in range(len(q))
    ])
    assert recall >= 0.9, recall


def test_single_shard_fast_path_matches_shard_map(eight_devices):
    """At index=1 the shard_map wrapper + identity all-gather are pure
    overhead (30.6% QPS on HW, docs/ROUND4.md §4) — the fast path must
    return identical results to the forced shard_map path for both index
    types."""
    mesh = make_mesh(data=8, model=1, index=1)

    x = _corpus(1200, 64)
    q = _corpus(24, 64, seed=3)
    bf = ShardedBruteForceIndex.build(mesh, x)
    s_fast, i_fast = bf.query(q, k=10)             # auto → fast path
    s_map, i_map = bf.query(q, k=10, use_shard_map=True)
    np.testing.assert_array_equal(i_fast, i_map)
    np.testing.assert_allclose(s_fast, s_map, atol=1e-6)

    xc = _clustered_corpus(3000, 64, 32)
    qc = l2_normalize(xc[:24] + 0.01)
    cfg = IndexConfig(num_clusters=32, num_probes=6, kmeans_iters=5)
    ivf = ShardedIVFIndex.build(mesh, xc, cfg)
    s_fast, i_fast = ivf.query(qc, k=10)
    s_map, i_map = ivf.query(qc, k=10, use_shard_map=True)
    np.testing.assert_array_equal(i_fast, i_map)
    np.testing.assert_allclose(s_fast, s_map, atol=1e-6)
