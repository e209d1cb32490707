"""Index tests: store semantics, brute-force exactness, k-means sanity,
IVF recall vs brute force (the north-star property, SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from text_similarity_tpu.core.config import IndexConfig
from text_similarity_tpu.index import EmbeddingStore, BruteForceIndex, IVFIndex
from text_similarity_tpu.ops.kmeans import kmeans, assign_clusters
from text_similarity_tpu.ops.topk import l2_normalize


def _clustered_corpus(n=4000, d=64, n_clusters=20, seed=0):
    """Gaussian-mixture corpus — realistic skew for IVF."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, d) * 3
    sizes = rng.multinomial(n, rng.dirichlet([2.0] * n_clusters))
    rows = []
    for c, s in zip(centers, sizes):
        rows.append(c[None, :] + rng.randn(s, d))
    x = np.concatenate(rows).astype(np.float32)
    rng.shuffle(x)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return jnp.asarray(x)


def test_store_add_query_delete():
    store = EmbeddingStore(capacity=64, dim=8)
    rng = np.random.RandomState(0)
    x = rng.randn(10, 8).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    ids = store.add(x)
    assert list(ids) == list(range(10))
    idx = BruteForceIndex(store)
    s, i = idx.query(x[:3], k=1)
    np.testing.assert_array_equal(i[:, 0], [0, 1, 2])  # self is nearest
    store.mark_deleted([1])
    s, i = idx.query(x[1:2], k=1)
    assert i[0, 0] != 1  # tombstoned row not returned


def test_store_save_load(tmp_path):
    store = EmbeddingStore(capacity=16, dim=4)
    x = np.eye(4, dtype=np.float32)
    store.add(x)
    store.mark_deleted([2])
    p = str(tmp_path / "store.npz")
    store.save(p)
    loaded = EmbeddingStore.load(p)
    assert loaded.size == 4
    np.testing.assert_allclose(np.asarray(loaded.view), x, atol=1e-6)
    assert not bool(loaded.alive[2])


def test_kmeans_clusters_separable():
    x = _clustered_corpus(n=2000, d=32, n_clusters=8)
    centroids, assign = kmeans(x, 8, iters=15)
    # same-cluster points should be much closer to their centroid
    a = np.asarray(assign)
    assert len(np.unique(a)) == 8
    c = np.asarray(centroids)
    sims = np.asarray(x) @ c.T
    np.testing.assert_array_equal(np.argmax(sims, 1), a)


def test_brute_force_mine_excludes_self():
    x = _clustered_corpus(n=300, d=32)
    idx = BruteForceIndex.from_embeddings(x)
    s, i = idx.mine(k=3, batch=128)
    rows = np.arange(300)[:, None]
    assert (i != rows).all()


def test_ivf_recall_vs_brute_force():
    x = _clustered_corpus(n=4000, d=64, n_clusters=20)
    cfg = IndexConfig(num_clusters=32, num_probes=8, kmeans_iters=10)
    ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0))
    queries = x[:64] + 0.01 * jax.random.normal(
        jax.random.PRNGKey(1), (64, 64)
    )
    queries = l2_normalize(queries)

    brute = BruteForceIndex.from_embeddings(x)
    _, true_i = brute.query(queries, k=10)

    for impl in ("xla", "pallas"):
        _, ivf_i = ivf.query(queries, k=10, impl=impl)
        ivf_i = np.asarray(ivf_i)
        recall = np.mean([
            len(set(ivf_i[r]) & set(true_i[r])) / 10 for r in range(64)
        ])
        assert recall >= 0.95, f"{impl} recall {recall}"


def test_ivf_save_load(tmp_path):
    x = _clustered_corpus(n=1000, d=32)
    cfg = IndexConfig(num_clusters=16, num_probes=4, kmeans_iters=5)
    ivf = IVFIndex.build(x, cfg)
    p = str(tmp_path / "ivf.npz")
    ivf.save(p)
    loaded = IVFIndex.load(p)
    q = x[:8]
    s1, i1 = ivf.query_xla(q, k=5)
    s2, i2 = loaded.query_xla(q, k=5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_ivf_overflow_clusters_preserve_recall():
    """Force tiny Mc so overflow clusters are exercised."""
    x = _clustered_corpus(n=1000, d=32, n_clusters=4)  # few, fat clusters
    cfg = IndexConfig(
        num_clusters=8, num_probes=8, kmeans_iters=5, max_cluster_size=64
    )
    ivf = IVFIndex.build(x, cfg)
    assert ivf.num_overflow > 0  # capping definitely triggered
    brute = BruteForceIndex.from_embeddings(x)
    q = l2_normalize(x[:32])
    _, ti = brute.query(q, k=5)
    _, ii = ivf.query_xla(q, k=5)  # all probes → must be exact
    ii = np.asarray(ii)
    recall = np.mean([len(set(ii[r]) & set(ti[r])) / 5 for r in range(32)])
    assert recall == 1.0, recall


def test_int8_store_query():
    """int8 embedding store: 4x smaller, query results match fp32 closely."""
    x = _clustered_corpus(n=500, d=64)
    store8 = EmbeddingStore(512, 64, quantized=True)
    store8.add(x)
    idx8 = BruteForceIndex(store8)
    idx = BruteForceIndex.from_embeddings(x)

    q = l2_normalize(x[:16] + 0.01)
    s8, i8 = idx8.query(q, k=5, impl="xla")
    s, i = idx.query(q, k=5, impl="xla")
    overlap = np.mean([len(set(i8[r]) & set(i[r])) / 5 for r in range(16)])
    assert overlap >= 0.9, overlap
    # int8 store really is int8
    assert store8.data.dtype == jnp.int8


def test_int8_store_pallas_interpret():
    x = _clustered_corpus(n=300, d=64, seed=3)
    store8 = EmbeddingStore(512, 64, quantized=True)
    store8.add(x)
    from text_similarity_tpu.ops.topk import cosine_topk_pallas_int8

    q = l2_normalize(x[:4])
    s, i = cosine_topk_pallas_int8(
        q, store8.view, store8.scales_view, k=3, block_q=8, block_c=128,
        interpret=True,
    )
    # self-retrieval survives quantization
    np.testing.assert_array_equal(np.asarray(i)[:, 0], np.arange(4))


def test_ivf_int8_recall():
    """int8 IVF (quantized cluster storage + on-chip dequant) keeps recall."""
    x = _clustered_corpus(n=4000, d=64, n_clusters=20)
    cfg = IndexConfig(
        num_clusters=32, num_probes=8, kmeans_iters=10, quantize_int8=True
    )
    ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0))
    assert ivf.data_padded.dtype == jnp.int8
    assert ivf.scales_padded is not None
    queries = l2_normalize(
        x[:64] + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (64, 64))
    )
    brute = BruteForceIndex.from_embeddings(x)
    _, true_i = brute.query(queries, k=10)
    for impl in ("xla", "pallas"):
        _, ivf_i = ivf.query(queries, k=10, impl=impl)
        ivf_i = np.asarray(ivf_i)
        recall = np.mean([
            len(set(ivf_i[r]) & set(true_i[r])) / 10 for r in range(64)
        ])
        assert recall >= 0.93, f"{impl} int8 recall {recall}"


def test_ivf_int8_save_load(tmp_path):
    x = _clustered_corpus(n=1000, d=32)
    cfg = IndexConfig(
        num_clusters=16, num_probes=4, kmeans_iters=5, quantize_int8=True
    )
    ivf = IVFIndex.build(x, cfg)
    p = str(tmp_path / "ivf8.npz")
    ivf.save(p)
    loaded = IVFIndex.load(p)
    assert loaded.scales_padded is not None
    s1, i1 = ivf.query_xla(x[:8], k=5)
    s2, i2 = loaded.query_xla(x[:8], k=5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_ivf_incremental_add():
    """add() inserts into the built index without rebuild; new rows are
    retrievable and old recall is unchanged."""
    x = _clustered_corpus(n=2000, d=64, n_clusters=10)
    cfg = IndexConfig(num_clusters=16, num_probes=8, kmeans_iters=8)
    ivf = IVFIndex.build(x[:1500], cfg, key=jax.random.PRNGKey(0))
    new_ids = ivf.add(x[1500:], start_id=1500)
    np.testing.assert_array_equal(new_ids, np.arange(1500, 2000))

    # new rows are retrievable (self-query returns their global id)
    q = x[1500:1532]
    _, i = ivf.query_xla(q, k=1)
    hit = np.mean(np.asarray(i)[:, 0] == np.arange(1500, 1532))
    assert hit >= 0.9, hit

    # old rows still retrievable
    _, i_old = ivf.query_xla(x[:32], k=1)
    assert np.mean(np.asarray(i_old)[:, 0] == np.arange(32)) >= 0.9


def test_ivf_incremental_add_overflow_growth():
    """Adding more rows than free slots grows overflow clusters."""
    x = _clustered_corpus(n=400, d=32, n_clusters=4)
    cfg = IndexConfig(
        num_clusters=4, num_probes=4, kmeans_iters=5, max_cluster_size=64
    )
    ivf = IVFIndex.build(x[:250], cfg)
    before = ivf.data_padded.shape[0]
    ivf.add(x[250:], start_id=250)
    # 4*64=256 slots < 400 rows → overflow clusters must have grown
    assert ivf.data_padded.shape[0] > before or ivf.num_overflow > 0
    _, i = ivf.query_xla(x[250:258], k=1)
    assert np.mean(np.asarray(i)[:, 0] == np.arange(250, 258)) >= 0.9


def test_ivf_remove_in_place():
    """mark_deleted analogue: removed ids vanish from results, no rebuild."""
    from text_similarity_tpu.core.config import IndexConfig
    from text_similarity_tpu.index.ivf import IVFIndex
    from text_similarity_tpu.ops.topk import l2_normalize

    rng = np.random.RandomState(0)
    corpus = l2_normalize(jnp.asarray(rng.randn(512, 32), jnp.float32))
    ivf = IVFIndex.build(corpus, IndexConfig(num_clusters=8, num_probes=8))
    q = corpus[:8]
    _, before = ivf.query_xla(q, k=3)
    assert (np.asarray(before)[:, 0] == np.arange(8)).all()
    n = ivf.remove(np.arange(8))   # delete the queries' own rows
    assert n == 8
    _, after = ivf.query_xla(q, k=3)
    assert not np.isin(np.asarray(after), np.arange(8)).any()
    # idempotent / unknown ids are no-ops
    assert ivf.remove(np.arange(8)) == 0
    assert ivf.remove([99999]) == 0


def test_ivf_query_batch1_matches_batched():
    """Single-query serving path: batch=1 recall must match the batched
    path (padding rows must not hijack the probe union)."""
    from text_similarity_tpu.core.config import IndexConfig
    from text_similarity_tpu.index.ivf import IVFIndex
    from text_similarity_tpu.ops.topk import l2_normalize

    rng = np.random.RandomState(1)
    corpus = l2_normalize(jnp.asarray(rng.randn(1024, 32), jnp.float32))
    ivf = IVFIndex.build(corpus, IndexConfig(num_clusters=16, num_probes=4))
    # adversarial query: negative similarity against most centroids
    q = -corpus[5:6] + 0.01 * jnp.asarray(rng.randn(1, 32), jnp.float32)
    s1, i1 = ivf.query(q, k=5, impl="pallas")
    sb, ib = ivf.query(jnp.tile(q, (16, 1)), k=5, impl="pallas")
    np.testing.assert_array_equal(np.asarray(i1)[0], np.asarray(ib)[0])


def test_ivf_add_after_remove_reuses_holes():
    """add() must place new rows into REAL holes (remove() punches them),
    never overwrite live rows (review regression: index corruption)."""
    from text_similarity_tpu.core.config import IndexConfig
    from text_similarity_tpu.index.ivf import IVFIndex
    from text_similarity_tpu.ops.topk import l2_normalize

    rng = np.random.RandomState(3)
    corpus = l2_normalize(jnp.asarray(rng.randn(256, 16), jnp.float32))
    ivf = IVFIndex.build(corpus, IndexConfig(num_clusters=4, num_probes=4))
    assert ivf.remove([7]) == 1
    new_rows = l2_normalize(jnp.asarray(rng.randn(3, 16), jnp.float32))
    new_ids = ivf.add(new_rows, start_id=256)
    # every original live doc still retrievable by its own vector
    for probe in (0, 1, 100, 200):
        if probe == 7:
            continue
        _, i = ivf.query_xla(corpus[probe:probe + 1], k=1)
        assert int(np.asarray(i)[0, 0]) == probe, probe
    # and the new rows are present
    _, i = ivf.query_xla(new_rows, k=1)
    np.testing.assert_array_equal(np.asarray(i)[:, 0], new_ids)
    # removed id stays gone
    ids_now = np.asarray(jax.device_get(ivf.ids_padded))
    assert not (ids_now == 7).any()


def test_embedding_store_quantized_roundtrip(tmp_path):
    from text_similarity_tpu.index.store import EmbeddingStore
    from text_similarity_tpu.ops.topk import l2_normalize

    rng = np.random.RandomState(0)
    emb = np.asarray(l2_normalize(jnp.asarray(rng.randn(32, 16), jnp.float32)))
    st = EmbeddingStore(64, 16, quantized=True)
    st.add(emb)
    st.mark_deleted([3])
    p = str(tmp_path / "store.npz")
    st.save(p)
    st2 = EmbeddingStore.load(p)
    assert st2.quantized and st2.scales is not None
    # dequantized rows match the original to int8 tolerance
    deq = np.asarray(st2.data[:32], np.float32) * np.asarray(st2.scales[:32])[:, None]
    np.testing.assert_allclose(deq, emb, atol=0.02)
    assert not bool(st2.alive[3])


def test_ivf_save_load_without_npz_suffix(tmp_path):
    from text_similarity_tpu.core.config import IndexConfig
    from text_similarity_tpu.index.ivf import IVFIndex
    from text_similarity_tpu.ops.topk import l2_normalize

    corpus = l2_normalize(
        jnp.asarray(np.random.RandomState(0).randn(128, 16), jnp.float32)
    )
    ivf = IVFIndex.build(corpus, IndexConfig(num_clusters=4, num_probes=4))
    ivf.save(str(tmp_path / "idx"))          # np.savez appends .npz
    ivf2 = IVFIndex.load(str(tmp_path / "idx"))
    _, i = ivf2.query_xla(corpus[:4], k=1)
    np.testing.assert_array_equal(np.asarray(i)[:, 0], np.arange(4))


def test_ivf_int8_two_pass_rescore_recovers_recall():
    """Two-pass query (int8 coarse scan -> exact bf16 re-score of the
    top-k' candidates, VERDICT r2 next-round #2): on a corpus of
    near-duplicates, int8 quantization scrambles fine-grained ranks;
    the rescore must recover them. Probes cover every cluster so the
    difference isolates quantization, not coverage."""
    rng = np.random.RandomState(5)
    # tie width (32 near-duplicates) < k_coarse (40): the int8 scan's
    # candidate set covers the whole duplicate group, so the exact f32
    # rescore can fully restore the fine-grained ranking
    d, n_clusters, per = 64, 8, 32
    centers = rng.randn(n_clusters, d).astype(np.float32)
    rows = np.repeat(centers, per, axis=0) + 0.004 * rng.randn(
        n_clusters * per, d
    ).astype(np.float32)
    x = l2_normalize(jnp.asarray(rows))
    queries = l2_normalize(
        x[:: per][:n_clusters].astype(jnp.float32)
        + 0.002 * jnp.asarray(rng.randn(n_clusters, d), jnp.float32)
    )
    cfg = IndexConfig(
        num_clusters=n_clusters, num_probes=n_clusters, kmeans_iters=8,
        quantize_int8=True,
    )
    # rescore must be f32 here: the duplicates are separated by ~0.4% —
    # right at bf16 resolution — so the default bf16 rescore copy cannot
    # re-rank them (measured: recall stays ~0.31). Real corpora separate
    # top-10 neighbors far more coarsely (bench 1M: bf16 == f32 recall).
    ivf = IVFIndex.build(
        x, cfg, key=jax.random.PRNGKey(0), rescore_dtype=jnp.float32
    )
    assert ivf.rescore_data is not None     # kept by default for int8

    brute = BruteForceIndex.from_embeddings(x)
    _, true_i = brute.query(queries, k=10)

    def recall(ii):
        ii = np.asarray(ii)
        return np.mean([
            len(set(ii[r]) & set(np.asarray(true_i)[r])) / 10
            for r in range(len(queries))
        ])

    # accumulator path (per_probe=False): the scan keeps a GLOBAL coarse
    # top-k', so even a 32-wide duplicate tie fits inside k'=40 and the
    # exact rescore can recover the true ranking. (The per-probe pool is
    # only k-deep per cluster by design — its recall is gated on the real
    # bench corpus instead, where exact ties are rare.)
    _, raw_i = ivf.query(
        queries, k=10, impl="pallas", k_coarse=-1, per_probe=False
    )
    _, ref_i = ivf.query(
        queries, k=10, impl="pallas", k_coarse=40, per_probe=False
    )
    r_raw, r_ref = recall(raw_i), recall(ref_i)
    assert r_ref >= 0.98, (r_raw, r_ref)
    assert r_ref > r_raw + 0.05, (r_raw, r_ref)


def test_ivf_rescore_after_add(tmp_path):
    """rescore_data stays consistent through add() and save/load."""
    x = _clustered_corpus(n=1024, d=32)
    cfg = IndexConfig(
        num_clusters=16, num_probes=16, kmeans_iters=5, quantize_int8=True
    )
    ivf = IVFIndex.build(x, cfg)
    new_rows = l2_normalize(
        jax.random.normal(jax.random.PRNGKey(3), (8, 32))
    )
    ids = ivf.add(new_rows, start_id=1024)
    assert ivf.rescore_data.shape[0] >= 1032
    _, qi = ivf.query(new_rows, k=1, impl="pallas")
    assert (np.asarray(qi)[:, 0] == ids).all()
    p = str(tmp_path / "ivf_rs.npz")
    ivf.save(p)
    loaded = IVFIndex.load(p)
    assert loaded.rescore_data is not None
    _, qi2 = loaded.query(new_rows, k=1, impl="pallas")
    assert (np.asarray(qi2)[:, 0] == ids).all()


def test_ivf_save_load_bf16_and_int8_rescore(tmp_path):
    """bf16 storage (and the int8 build's bf16 rescore copy) must survive
    save/load bit-exactly — np.savez silently degrades raw bf16 arrays to
    void bytes (r3 review finding), so the npz stores uint16 bit views
    with dtype tags."""
    x = _clustered_corpus(n=1000, d=32)
    cfg = IndexConfig(num_clusters=16, num_probes=16, kmeans_iters=5)

    bf = IVFIndex.build(x, cfg, data_dtype=jnp.bfloat16)
    p = str(tmp_path / "bf16.npz")
    bf.save(p)
    lb = IVFIndex.load(p)
    assert lb.data_padded.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(lb.data_padded, np.float32),
        np.asarray(bf.data_padded, np.float32),
    )
    q = x[:8]
    _, i1 = bf.query_xla(q, k=5)
    _, i2 = lb.query_xla(q, k=5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    q8 = IVFIndex.build(x, cfg, data_dtype=jnp.int8)
    assert q8.rescore_data is not None
    assert q8.rescore_data.dtype == jnp.bfloat16  # default rescore dtype
    p8 = str(tmp_path / "int8.npz")
    q8.save(p8)
    l8 = IVFIndex.load(p8)
    assert l8.rescore_data.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(l8.rescore_data, np.float32),
        np.asarray(q8.rescore_data, np.float32),
    )


def test_ivf_approx_merge_recall():
    """Deferred-merge scan (approx_width): per-lane-class running max per
    probe, ONE k-round merge per block. On a clustered corpus recall must
    stay within a hair of the exact merge (collision loss ~k^2/2/width)."""
    x = _clustered_corpus(n=4000, d=64, n_clusters=20)
    cfg = IndexConfig(num_clusters=32, num_probes=8, kmeans_iters=10)
    ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0))
    queries = l2_normalize(
        x[:64] + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (64, 64))
    )
    brute = BruteForceIndex.from_embeddings(x)
    _, true_i = brute.query(queries, k=10)
    _, exact_i = ivf.query(queries, k=10, impl="pallas")
    exact_rec = np.mean([
        len(set(np.asarray(exact_i)[r]) & set(true_i[r])) / 10
        for r in range(64)
    ])
    for pps in (1, 2, 4):
        _, ai = ivf.query(
            queries, k=10, impl="pallas", approx_width=2048,
            probes_per_step=pps,
        )
        ai = np.asarray(ai)
        rec = np.mean([
            len(set(ai[r]) & set(true_i[r])) / 10 for r in range(64)
        ])
        assert rec >= exact_rec - 0.02, (pps, rec, exact_rec)


def test_ivf_approx_merge_int8_rescore():
    """approx merge composes with the int8 coarse scan + exact rescore."""
    x = _clustered_corpus(n=4000, d=64, n_clusters=20)
    cfg = IndexConfig(num_clusters=32, num_probes=8, kmeans_iters=10)
    ivf8 = IVFIndex.build(
        x, cfg, key=jax.random.PRNGKey(0), data_dtype=jnp.int8
    )
    queries = l2_normalize(
        x[:64] + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (64, 64))
    )
    brute = BruteForceIndex.from_embeddings(x)
    _, true_i = brute.query(queries, k=10)
    _, ai = ivf8.query(
        queries, k=10, impl="pallas", approx_width=2048, k_coarse=20,
    )
    ai = np.asarray(ai)
    rec = np.mean([
        len(set(ai[r]) & set(true_i[r])) / 10 for r in range(64)
    ])
    assert rec >= 0.9, rec


def test_ivf_approx_rejects_per_probe():
    x = _clustered_corpus(n=1000, d=32)
    cfg = IndexConfig(num_clusters=16, num_probes=4, kmeans_iters=5)
    ivf = IVFIndex.build(x, cfg)
    with pytest.raises(ValueError):
        ivf.query(
            x[:8], k=5, impl="pallas", approx_width=512, per_probe=True
        )


def test_ivf_sentinel_idless_scores_and_recall():
    """Sentinel layout (opt-in; measured slower than the ids-operand
    layout on HW — docs/ROUND3.md): the idless approx scan — no streamed
    ids operand, slot ids from the scalar-prefetched probe — returns true
    cosine scores (shift removed) and brute-force-level recall."""
    x = _clustered_corpus(n=4000, d=64, n_clusters=20)
    cfg = IndexConfig(num_clusters=32, num_probes=8, kmeans_iters=10)
    ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0), sentinel=True)
    assert ivf.sentinel and ivf.data_padded.shape[-1] == 65
    queries = l2_normalize(
        x[:64] + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (64, 64))
    )
    brute = BruteForceIndex.from_embeddings(x)
    _, true_i = brute.query(queries, k=10)
    s, i = ivf.query(queries, k=10, impl="pallas", approx_width=512)
    s, i = np.asarray(s), np.asarray(i)
    rec = np.mean([
        len(set(i[r]) & set(true_i[r])) / 10 for r in range(64)
    ])
    assert rec >= 0.95, rec
    # scores are real cosines: recompute from the raw corpus
    xh = np.asarray(x)
    qh = np.asarray(queries)
    for r in range(0, 64, 7):
        for c in range(10):
            if i[r, c] < 0:
                continue
            want = float(qh[r] @ xh[i[r, c]])
            assert abs(s[r, c] - want) < 1e-3, (r, c, s[r, c], want)


def test_ivf_sentinel_remove_then_add_idless():
    """remove() zeroes the sentinel column, so the idless scan (which
    never reads ids) drops removed rows too; add() writes it back."""
    rng = np.random.RandomState(0)
    corpus = l2_normalize(jnp.asarray(rng.randn(512, 32), jnp.float32))
    ivf = IVFIndex.build(
        corpus, IndexConfig(num_clusters=8, num_probes=8), sentinel=True
    )
    assert ivf.sentinel
    q = corpus[:8]
    _, before = ivf.query(q, k=3, impl="pallas", approx_width=256)
    assert (np.asarray(before)[:, 0] == np.arange(8)).all()
    assert ivf.remove(np.arange(8)) == 8
    _, after = ivf.query(q, k=3, impl="pallas", approx_width=256)
    assert not np.isin(np.asarray(after), np.arange(8)).any()
    # re-insert fresh rows into the freed slots; they must be findable
    new_rows = l2_normalize(jnp.asarray(rng.randn(4, 32), jnp.float32))
    new_ids = ivf.add(new_rows, start_id=512)
    _, qi = ivf.query(new_rows, k=1, impl="pallas", approx_width=256)
    assert (np.asarray(qi)[:, 0] == new_ids).all()


def test_ivf_sentinel_off_default():
    x = _clustered_corpus(n=1000, d=32)
    cfg = IndexConfig(num_clusters=16, num_probes=6, kmeans_iters=5)
    ivf = IVFIndex.build(x, cfg)
    assert not ivf.sentinel and ivf.data_padded.shape[-1] == 32
    _, i_a = ivf.query(x[:16], k=5, impl="pallas", approx_width=512)
    _, i_b = ivf.query_xla(x[:16], k=5)
    assert (np.asarray(i_a)[:, 0] == np.asarray(i_b)[:, 0]).all()


def test_ivf_sentinel_save_load_roundtrip(tmp_path):
    x = _clustered_corpus(n=1000, d=32)
    cfg = IndexConfig(num_clusters=16, num_probes=6, kmeans_iters=5)
    ivf = IVFIndex.build(x, cfg, sentinel=True)
    assert ivf.sentinel
    p = str(tmp_path / "sent.npz")
    ivf.save(p)
    loaded = IVFIndex.load(p)
    assert loaded.sentinel
    _, i1 = ivf.query(x[:8], k=5, impl="pallas", approx_width=256)
    _, i2 = loaded.query(x[:8], k=5, impl="pallas", approx_width=256)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_ivf_fuzz_mutations_vs_oracle():
    """Property test: a random sequence of add/remove batches on a live
    IVF index must keep queries consistent with a brute-force oracle over
    the surviving rows (top-1 exactness on self-queries + no ghosts)."""
    rng = np.random.RandomState(42)
    d = 32
    base = l2_normalize(jnp.asarray(rng.randn(512, d), np.float32))
    ivf = IVFIndex.build(
        base, IndexConfig(num_clusters=8, num_probes=8, kmeans_iters=4)
    )
    rows = {i: np.asarray(base[i]) for i in range(512)}
    next_id = 512
    for step in range(6):
        op = rng.choice(["add", "remove"])
        if op == "add":
            nb = rng.randint(1, 9)
            new = l2_normalize(jnp.asarray(rng.randn(nb, d), np.float32))
            ids = ivf.add(new, start_id=next_id)
            for j, gid in enumerate(ids):
                rows[int(gid)] = np.asarray(new[j])
            next_id += nb
        else:
            alive = sorted(rows)
            kill = rng.choice(alive, size=min(8, len(alive)), replace=False)
            removed = ivf.remove(kill)
            assert removed == len(set(kill.tolist()))
            for gid in kill:
                rows.pop(int(gid))
        # verify: every live queried row self-retrieves; no dead ids
        probe_ids = rng.choice(sorted(rows), size=8, replace=False)
        q = jnp.asarray(np.stack([rows[int(i)] for i in probe_ids]))
        for impl, kw in (
            ("xla", {}),
            ("pallas", {"approx_width": 256}),
            ("pallas", {}),
        ):
            s, i = ivf.query(q, k=4, impl=impl, **kw)
            i = np.asarray(i)
            assert (i[:, 0] == probe_ids).all(), (step, impl, kw, i[:, 0])
            hit_ids = i[i >= 0]
            assert set(hit_ids.tolist()) <= set(rows), (step, impl, kw)


# ---------------------------------------------------------------------------
# Grouped (affinity-slab) storage: `group` clusters per scan step
# ---------------------------------------------------------------------------

def test_affinity_group_perm_is_valid_and_affine():
    from text_similarity_tpu.index.ivf import _affinity_group_perm

    rng = np.random.RandomState(0)
    cent = rng.randn(32, 16).astype(np.float32)
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    for g in (2, 4, 8):
        perm = _affinity_group_perm(cent, g)
        assert sorted(perm.tolist()) == list(range(32))
        # grouped members should be more similar than random pairs
        sims = cent @ cent.T
        grouped = [
            sims[perm[i], perm[j]]
            for b in range(0, 32, g)
            for i in range(b, b + g)
            for j in range(i + 1, b + g)
        ]
        off = sims[np.triu_indices(32, 1)]
        assert np.mean(grouped) > np.mean(off)
    with pytest.raises(ValueError):
        _affinity_group_perm(cent, 3)


def test_ivf_grouped_recall_and_layout():
    """group=2/4 keeps recall at the probes×group cluster coverage and
    stores (C/g, g*Mc, D) slabs (the per-step fixed-cost amortizer)."""
    x = _clustered_corpus(n=4000, d=64, n_clusters=20)
    cfg = IndexConfig(num_clusters=32, num_probes=8, kmeans_iters=10)
    queries = l2_normalize(
        x[:64] + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (64, 64))
    )
    brute = BruteForceIndex.from_embeddings(x)
    _, true_i = brute.query(queries, k=10)

    for g in (2, 4):
        ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0), group=g)
        assert ivf.group == g
        assert ivf.num_base_clusters % g == 0
        assert ivf.data_padded.shape[0] == (
            ivf.num_base_clusters // g + ivf.num_overflow
        )
        assert ivf.data_padded.shape[1] == g * ivf.cluster_cap
        for impl, kw in (
            ("xla", {}),
            ("pallas", {}),
            ("pallas", {"approx_width": 512}),
        ):
            _, ivf_i = ivf.query(queries, k=10, impl=impl, probes=8 // g * 2,
                                 **kw)
            ivf_i = np.asarray(ivf_i)
            recall = np.mean([
                len(set(ivf_i[r]) & set(true_i[r])) / 10 for r in range(64)
            ])
            assert recall >= 0.95, f"g={g} {impl} {kw} recall {recall}"


def test_ivf_grouped_mutation_and_persistence(tmp_path):
    """add/remove/save/load keep working on the grouped flat layout."""
    rng = np.random.RandomState(3)
    x = _clustered_corpus(n=2000, d=64, n_clusters=10, seed=3)
    cfg = IndexConfig(num_clusters=16, num_probes=8, kmeans_iters=8,
                      max_cluster_size=256)
    ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0), group=2)

    new = l2_normalize(jnp.asarray(rng.randn(300, 64), np.float32))
    ids = ivf.add(new, start_id=2000)
    assert (np.asarray(ids) == np.arange(2000, 2300)).all()
    # appended overflow keeps the slab geometry
    assert ivf.data_padded.shape[1] == 2 * ivf.cluster_cap
    s, i = ivf.query(new[:32], k=1, probes=8, approx_width=512,
                     impl="pallas")
    assert (np.asarray(i)[:, 0] == np.arange(2000, 2032)).all()

    assert ivf.remove(np.arange(2000, 2016)) == 16
    _, i = ivf.query(new[:16], k=4, probes=8, impl="pallas")
    assert not np.isin(np.asarray(i), np.arange(2000, 2016)).any()

    path = str(tmp_path / "grouped.npz")
    ivf.save(path)
    back = IVFIndex.load(path)
    assert back.group == 2 and back.cluster_cap == ivf.cluster_cap
    q = l2_normalize(jnp.asarray(rng.randn(32, 64), np.float32))
    _, i1 = ivf.query(q, k=10, probes=8, impl="xla")
    _, i2 = back.query(q, k=10, probes=8, impl="xla")
    assert (np.asarray(i1) == np.asarray(i2)).all()


def test_index_config_auto_tightens_cap_for_huge_corpora():
    """≥3M rows: auto() caps clusters at ~2× mean so the padded slab fits
    single-chip HBM (docs/ROUND3.md 4M envelope); smaller corpora keep the
    default 4×-mean cap (measured better recall at 1M)."""
    from text_similarity_tpu.core.config import IndexConfig

    assert IndexConfig.auto(1_000_000).max_cluster_size == 0
    big = IndexConfig.auto(4_000_000)
    assert big.num_clusters == 4096
    assert big.max_cluster_size == 2048


def test_assign_clusters_chunked_matches_unchunked():
    """The dynamic-slice chunked assignment (no padded corpus copy) must
    agree with a single-chunk pass at every ragged tail size, and
    assign_clusters_topk returns the (topk, N) lane-friendly layout."""
    from text_similarity_tpu.ops.kmeans import (
        assign_clusters, assign_clusters_topk,
    )

    cents = l2_normalize(
        jax.random.normal(jax.random.PRNGKey(0), (16, 32))
    )
    for n in (64, 65, 127, 100):
        x = l2_normalize(jax.random.normal(jax.random.PRNGKey(n), (n, 32)))
        ref = np.asarray(assign_clusters(x, cents, chunk=n))
        got = np.asarray(assign_clusters(x, cents, chunk=32))
        np.testing.assert_array_equal(got, ref)
        reft = np.asarray(assign_clusters_topk(x, cents, topk=3, chunk=n))
        gott = np.asarray(assign_clusters_topk(x, cents, topk=3, chunk=32))
        assert reft.shape == (3, n)
        np.testing.assert_array_equal(gott, reft)
        np.testing.assert_array_equal(reft[0], ref)


def test_ivf_final_merge_xla_matches_kernel():
    """emit_acc mode: the XLA final top_k selects from the SAME deferred
    accumulator the in-kernel k-round merge would — results must match
    id-for-id on tie-free data (ref: hnswlib knn_query k parity,
    reference/src/pipeline/search_pipeline.py:193-226)."""
    x = _clustered_corpus(n=4000, d=64, n_clusters=20)
    cfg = IndexConfig(num_clusters=32, num_probes=8, kmeans_iters=10)
    ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0))
    queries = l2_normalize(
        x[:64] + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (64, 64))
    )
    sk, ik = ivf.query(
        queries, k=10, impl="pallas", approx_width=2048,
        final_merge="kernel", acc_slots=1,
    )
    sx, ix = ivf.query(
        queries, k=10, impl="pallas", approx_width=2048, final_merge="xla",
        acc_slots=1,
    )
    for r in range(64):
        assert set(np.asarray(ik)[r]) == set(np.asarray(ix)[r]), r
    np.testing.assert_allclose(
        np.sort(np.asarray(sk), axis=1), np.sort(np.asarray(sx), axis=1),
        rtol=1e-5,
    )


def test_ivf_approx_merge_plan():
    """Unit-test the collision-loss-aware slot sizing (the r3 recall-cliff
    fix): small k at wide folds stays single-slot (the bench operating
    point), large k picks more slots, misaligned small-Mc geometry falls
    back to the exact merge."""
    from text_similarity_tpu.index.ivf import _approx_merge_plan

    assert _approx_merge_plan(10, 4096, 2048) == (2048, 1)   # bench point
    assert _approx_merge_plan(100, 4096, 2048) == (2048, 2)  # rerank k=100
    # Mc=352 is only 8-aligned → multi-slot blocked → exact fallback
    assert _approx_merge_plan(50, 352, 2048) == (0, 1)
    # 128-aligned small Mc: multi-slot engages
    w, s = _approx_merge_plan(50, 256, 2048)
    assert w == 256 and s >= 2 and 50 <= s * w
    # k beyond every slot count → exact fallback
    assert _approx_merge_plan(9000, 2048, 2048) == (0, 1)
    # tiny fold width + k <= 32 must not crash or under-provision
    # (ADVICE r3: w < k_scan <= 32 raised in the kernel before the fix)
    w, s = _approx_merge_plan(16, 8, 2048)
    assert (w, s) == (0, 1)
    # capacity-only plan (explicit xla merge): largest feasible slots
    w, s = _approx_merge_plan(50, 256, 2048, tol=None)
    assert w == 256 and s == 4


def test_ivf_large_k_auto_small_mc_recall():
    """k=50 on a small-Mc (misaligned) index: the auto plan must fall back
    to the exact merge instead of the single-slot fold that lost 7%
    recall in r3 — recall@50 tracks the exact-merge path."""
    x = _clustered_corpus(n=4000, d=64, n_clusters=20)
    cfg = IndexConfig(num_clusters=32, num_probes=8, kmeans_iters=10)
    ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0))
    queries = l2_normalize(
        x[:32] + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (32, 64))
    )
    brute = BruteForceIndex.from_embeddings(x)
    _, true_i = brute.query(queries, k=50)
    _, exact_i = ivf.query(queries, k=50, impl="pallas")
    _, auto_i = ivf.query(
        queries, k=50, impl="pallas", approx_width=2048,
    )
    exact_rec = np.mean([
        len(set(np.asarray(exact_i)[r]) & set(true_i[r])) / 50
        for r in range(32)
    ])
    rec = np.mean([
        len(set(np.asarray(auto_i)[r]) & set(true_i[r])) / 50
        for r in range(32)
    ])
    assert rec >= exact_rec - 0.03, (rec, exact_rec)


def test_ivf_large_k_multislot_fold_recall():
    """128-aligned Mc + k=50: the auto plan engages the multi-slot
    deferred fold (asserted, not assumed — ADVICE r3 found the old tests
    never triggered the path they named); recall@50 must track the
    exact-merge path."""
    from text_similarity_tpu.index.ivf import _approx_merge_plan

    x = _clustered_corpus(n=4000, d=64, n_clusters=20)
    cfg = IndexConfig(
        num_clusters=16, num_probes=8, kmeans_iters=10,
        max_cluster_size=256,
    )
    ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0))
    mc = ivf.data_padded.shape[1]
    assert mc == 256, mc  # cap engaged → 128-aligned width
    w, s = _approx_merge_plan(50, mc, 2048)
    assert w == 256 and s >= 2  # multi-slot fold engaged
    queries = l2_normalize(
        x[:32] + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (32, 64))
    )
    brute = BruteForceIndex.from_embeddings(x)
    _, true_i = brute.query(queries, k=50)
    _, exact_i = ivf.query(queries, k=50, impl="pallas")
    _, auto_i = ivf.query(
        queries, k=50, impl="pallas", approx_width=2048,
    )
    exact_rec = np.mean([
        len(set(np.asarray(exact_i)[r]) & set(true_i[r])) / 50
        for r in range(32)
    ])
    rec = np.mean([
        len(set(np.asarray(auto_i)[r]) & set(true_i[r])) / 50
        for r in range(32)
    ])
    assert rec >= exact_rec - 0.02, (rec, exact_rec)


def test_ivf_multislot_kernel_vs_xla_merge_match():
    """With the SAME slot count, the in-kernel k-round merge and the XLA
    final top_k select from the same multi-slot accumulator — results
    must match id-for-id."""
    x = _clustered_corpus(n=4000, d=64, n_clusters=20)
    cfg = IndexConfig(
        num_clusters=16, num_probes=8, kmeans_iters=10,
        max_cluster_size=256,
    )
    ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0))
    queries = l2_normalize(
        x[:64] + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (64, 64))
    )
    sk, ik = ivf.query(
        queries, k=50, impl="pallas", approx_width=256,
        final_merge="kernel", acc_slots=2,
    )
    sx, ix = ivf.query(
        queries, k=50, impl="pallas", approx_width=256,
        final_merge="xla", acc_slots=2,
    )
    for r in range(64):
        assert set(np.asarray(ik)[r]) == set(np.asarray(ix)[r]), r
    np.testing.assert_allclose(
        np.sort(np.asarray(sk), axis=1), np.sort(np.asarray(sx), axis=1),
        rtol=1e-5,
    )


def test_ivf_k_exceeding_accumulator_raises():
    """Explicit slot counts too small for k fail loudly instead of
    returning -inf/-1 tails (ADVICE r3: the silent recall cliff)."""
    x = _clustered_corpus(n=2000, d=32, n_clusters=10)
    cfg = IndexConfig(
        num_clusters=8, num_probes=4, kmeans_iters=5, max_cluster_size=128,
    )
    ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0))
    assert ivf.data_padded.shape[1] == 128
    with pytest.raises(ValueError):
        ivf.query(
            x[:8], k=200, impl="pallas", approx_width=128, acc_slots=1,
        )


def test_ivf_large_k_int8_rescore_xla_merge():
    """int8 coarse scan + exact rescore composes with the XLA final
    merge at large k (the rerank-top-100 serving shape)."""
    x = _clustered_corpus(n=4000, d=64, n_clusters=20)
    cfg = IndexConfig(num_clusters=32, num_probes=8, kmeans_iters=10)
    ivf8 = IVFIndex.build(
        x, cfg, key=jax.random.PRNGKey(0), data_dtype=jnp.int8
    )
    queries = l2_normalize(
        x[:32] + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (32, 64))
    )
    brute = BruteForceIndex.from_embeddings(x)
    _, true_i = brute.query(queries, k=50)
    _, ai = ivf8.query(
        queries, k=50, impl="pallas", approx_width=2048, k_coarse=100,
    )
    rec = np.mean([
        len(set(np.asarray(ai)[r]) & set(true_i[r])) / 50
        for r in range(32)
    ])
    assert rec >= 0.85, rec


def test_ivf_emit_acc_rejects_bad_combos():
    x = _clustered_corpus(n=1000, d=32)
    cfg = IndexConfig(num_clusters=16, num_probes=4, kmeans_iters=5)
    ivf = IVFIndex.build(x, cfg)
    with pytest.raises(ValueError):
        # explicit xla merge without the deferred accumulator
        ivf.query(x[:8], k=5, impl="pallas", final_merge="xla")


def test_ivf_dma_pipeline_matches_default():
    """The manually double-buffered DMA scan (_ivf_kernel_dma) must return
    the same results as the default auto-pipelined deferred-merge scan —
    it is a pure scheduling change (VERDICT r4 task 5)."""
    x = _clustered_corpus(n=4000, d=64, n_clusters=20)
    cfg = IndexConfig(num_clusters=32, num_probes=8, kmeans_iters=10)
    ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0))
    queries = l2_normalize(
        x[:64] + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (64, 64))
    )
    mc = ivf.data_padded.shape[1]
    sd, idd = ivf.query(
        queries, k=10, impl="pallas", dma_pipeline=True,
    )
    sr, idr = ivf.query(
        queries, k=10, impl="pallas", approx_width=mc, acc_slots=1,
    )
    for r in range(64):
        assert set(np.asarray(idd)[r]) == set(np.asarray(idr)[r]), r
    np.testing.assert_allclose(
        np.sort(np.asarray(sd), axis=1), np.sort(np.asarray(sr), axis=1),
        rtol=1e-5,
    )


def test_ivf_dma_pipeline_multislot_recall():
    """DMA scan with a multi-slot fold at k=50: recall tracks the exact
    path (the large-k serving shape on the DMA variant)."""
    x = _clustered_corpus(n=4000, d=64, n_clusters=20)
    cfg = IndexConfig(
        num_clusters=16, num_probes=8, kmeans_iters=10,
        max_cluster_size=256,
    )
    ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0))
    queries = l2_normalize(
        x[:32] + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (32, 64))
    )
    brute = BruteForceIndex.from_embeddings(x)
    _, true_i = brute.query(queries, k=50)
    _, exact_i = ivf.query(queries, k=50, impl="pallas")
    _, dma_i = ivf.query(queries, k=50, impl="pallas", dma_pipeline=True)
    exact_rec = np.mean([
        len(set(np.asarray(exact_i)[r]) & set(true_i[r])) / 50
        for r in range(32)
    ])
    rec = np.mean([
        len(set(np.asarray(dma_i)[r]) & set(true_i[r])) / 50
        for r in range(32)
    ])
    assert rec >= exact_rec - 0.02, (rec, exact_rec)


def test_ivf_dma_pipeline_buffer_depths_match():
    """3- and 4-deep DMA buffering return identical results to 2-deep
    (scheduling only — the HW A/B knob must not change semantics)."""
    x = _clustered_corpus(n=2000, d=32, n_clusters=10)
    cfg = IndexConfig(num_clusters=16, num_probes=6, kmeans_iters=5)
    ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0))
    q = l2_normalize(x[:32] + 0.01)
    _, i2 = ivf.query(q, k=5, impl="pallas", dma_pipeline=True)
    for nb in (3, 4):
        _, ib = ivf.query(
            q, k=5, impl="pallas", dma_pipeline=True, dma_buffers=nb
        )
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(ib))


def test_ivf_dma_pipeline_rejects_final_merge_override():
    """dma_pipeline always merges in-kernel; a final_merge override would
    be silently ignored by branch precedence — must raise (review r4)."""
    x = _clustered_corpus(n=2000, d=32, n_clusters=10)
    cfg = IndexConfig(num_clusters=16, num_probes=6, kmeans_iters=5)
    ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0))
    q = l2_normalize(x[:8] + 0.01)
    mc = ivf.data_padded.shape[1]
    for fm in ("xla", "xla_approx", "packed"):
        with pytest.raises(ValueError):
            ivf.query(
                q, k=5, impl="pallas", dma_pipeline=True,
                approx_width=mc, final_merge=fm,
            )


def test_ivf_dma_pipeline_plans_slots_when_width_plan_fails():
    """A user approx_width whose slot plan fails must not drop the DMA
    path to a single-slot fold (review r4): the DMA planner always sizes
    the full-width fold, so the result matches the auto-planned call."""
    x = _clustered_corpus(n=2000, d=32, n_clusters=30)
    cfg = IndexConfig(
        num_clusters=32, num_probes=16, kmeans_iters=5,
        max_cluster_size=128,
    )
    ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0))
    q = l2_normalize(x[:16] + 0.01)
    mc = ivf.data_padded.shape[1]
    k = max(8, int(mc * 0.75))   # large enough that a narrow-width plan
                                 # fails but the full-width plan needs >1 slot
    _, i_req = ivf.query(
        q, k=k, impl="pallas", dma_pipeline=True, approx_width=8,
    )
    _, i_auto = ivf.query(q, k=k, impl="pallas", dma_pipeline=True)
    np.testing.assert_array_equal(np.asarray(i_req), np.asarray(i_auto))


def test_ivf_dma_unaligned_mc_guard():
    """On hardware the manual ids-row DMA lane-slices at Mc, which Mosaic
    rejects unless 128-aligned (found on-chip at Mc=360). The kernel
    wrapper must refuse non-interpret lowering; IVFIndex.query degrades
    to the default pipeline on TPU backends before reaching it."""
    from text_similarity_tpu.index.ivf import _ivf_query_pallas_dma

    q = jnp.zeros((8, 32), jnp.float32)
    probes = jnp.zeros((1, 4), jnp.int32)
    data = jnp.zeros((4, 360, 32), jnp.float32)   # Mc=360: 8- but not
    ids = jnp.zeros((4, 360), jnp.int32)          # 128-aligned
    with pytest.raises(ValueError, match="128-aligned"):
        _ivf_query_pallas_dma(
            q, probes, data, ids, k=5, block_q=8, interpret=False,
        )


def test_ivf_multiprobe_large_k_uses_full_width_guard():
    """probes_per_step>1 folds at full slab width Mc — a k wider than the
    user-requested approx_width but within Mc must not raise (review r4),
    and recall must track the exact path."""
    x = _clustered_corpus(n=2000, d=32, n_clusters=10)
    cfg = IndexConfig(num_clusters=16, num_probes=8, kmeans_iters=5)
    ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0))
    q = l2_normalize(x[:16] + 0.01)
    mc = ivf.data_padded.shape[1]
    # k just above the requested width: the old guard raised 9 > 1*8 even
    # though the kernel folds at mc; kept small because the multiprobe
    # fold is single-slot (collision loss grows ~k/2Mc by design)
    k = 9
    assert k <= mc
    s, i = ivf.query(
        q, k=k, impl="pallas", approx_width=8, probes_per_step=2,
    )
    _, i_exact = ivf.query(q, k=k, impl="pallas")
    rec = np.mean([
        len(set(np.asarray(i)[r]) & set(np.asarray(i_exact)[r])) / k
        for r in range(16)
    ])
    assert rec >= 0.9, rec


def test_ivf_final_merge_xla_approx():
    """final_merge='xla_approx' (approx_max_k partial reduction instead of
    the full sort) returns near-identical results — on CPU approx_max_k
    is exact, so results match the 'xla' merge id-for-id."""
    x = _clustered_corpus(n=4000, d=64, n_clusters=20)
    cfg = IndexConfig(
        num_clusters=16, num_probes=8, kmeans_iters=10,
        max_cluster_size=256,
    )
    ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0))
    q = l2_normalize(x[:32] + 0.01)
    _, ix = ivf.query(
        q, k=50, impl="pallas", approx_width=256, final_merge="xla",
        acc_slots=2,
    )
    _, ia = ivf.query(
        q, k=50, impl="pallas", approx_width=256, final_merge="xla_approx",
        acc_slots=2,
    )
    same = np.mean([
        len(set(np.asarray(ix)[r]) & set(np.asarray(ia)[r])) / 50
        for r in range(32)
    ])
    assert same >= 0.98, same


def test_ivf_packed_fold_matches_exact_sets():
    """final_merge='packed' (single-int32 packed accumulator) returns the
    same candidate SETS as the standard deferred path at both k=10 and
    k=50, with scores within the 14-bit fixed-point resolution."""
    x = _clustered_corpus(n=4000, d=64, n_clusters=20)
    cfg = IndexConfig(
        num_clusters=16, num_probes=8, kmeans_iters=10,
        max_cluster_size=256,
    )
    ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0))
    q = l2_normalize(
        x[:64] + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (64, 64))
    )
    for k in (10, 50):
        sr, ir = ivf.query(q, k=k, impl="pallas", approx_width=256)
        sp, ip = ivf.query(
            q, k=k, impl="pallas", approx_width=256, final_merge="packed",
        )
        overlap = np.mean([
            len(set(np.asarray(ir)[r]) & set(np.asarray(ip)[r])) / k
            for r in range(64)
        ])
        # 14-bit score ties can swap borderline candidates
        assert overlap >= 0.98, (k, overlap)
        np.testing.assert_allclose(
            np.sort(np.asarray(sp), axis=1),
            np.sort(np.asarray(sr), axis=1), atol=2e-4,
        )


def test_ivf_packed_fold_recall_vs_oracle():
    x = _clustered_corpus(n=4000, d=64, n_clusters=20)
    cfg = IndexConfig(num_clusters=32, num_probes=8, kmeans_iters=10)
    ivf = IVFIndex.build(x, cfg, key=jax.random.PRNGKey(0))
    q = l2_normalize(
        x[:32] + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (32, 64))
    )
    brute = BruteForceIndex.from_embeddings(x)
    _, ti = brute.query(q, k=10)
    _, pi = ivf.query(
        q, k=10, impl="pallas", approx_width=2048, final_merge="packed",
    )
    pi = np.asarray(pi)
    rec = np.mean([len(set(pi[r]) & set(ti[r])) / 10 for r in range(32)])
    assert rec >= 0.95, rec


def test_ivf_recall_retention_after_churn():
    """Recall-retention gate (VERDICT r4 #3): after a 10% remove / 10%
    re-add churn cycle, recall@10 vs the exact oracle over the live rows
    must stay within 2 points of the fresh-build recall on the same
    corpus — the live-index property hnswlib's add_items/mark_deleted
    promises (reference search_pipeline.py:154-175)."""
    from text_similarity_tpu.ops.topk import cosine_topk_xla

    n, d, churn = 4000, 64, 400
    corpus = _clustered_corpus(n=n, d=d)
    cfg = IndexConfig(num_clusters=32, num_probes=12, kmeans_iters=8)
    ivf = IVFIndex.build(corpus, cfg)

    rng = np.random.RandomState(7)
    queries = l2_normalize(
        corpus[:64] + 0.1 * jnp.asarray(rng.randn(64, d), jnp.float32)
    )

    def recall(ix, live, id_map):
        # oracle over the live matrix; positions -> global ids
        _, opos = cosine_topk_xla(queries, live, k=10)
        oracle = id_map[np.asarray(opos)]
        _, ii = ix.query(queries, k=10)
        ii = np.asarray(ii)
        return np.mean([
            len(set(ii[r]) & set(oracle[r])) / 10 for r in range(64)
        ])

    id0 = np.arange(n, dtype=np.int64)
    rec_fresh = recall(ivf, corpus, id0)

    removed = rng.choice(n, churn, replace=False)
    assert ivf.remove(removed) == churn
    new_rows = l2_normalize(jnp.asarray(rng.randn(churn, d), jnp.float32))
    ivf.add(new_rows, start_id=n)

    live = corpus.at[jnp.asarray(removed)].set(new_rows)
    id_map = id0.copy()
    id_map[removed] = n + np.arange(churn)
    rec_churn = recall(ivf, live, id_map)

    assert rec_churn >= rec_fresh - 0.02, (rec_churn, rec_fresh)
    # and removed ids never come back
    _, ii = ivf.query(queries, k=10)
    ghosts = set(np.asarray(ii).ravel().tolist()) & set(removed.tolist())
    assert not ghosts
