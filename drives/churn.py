"""HW churn benchmark for the live IVF index (VERDICT r4 #3).

Measures on one TPU chip, at 1M x 384 (bench corpus recipe):
  - fresh build:   QPS + recall@10
  - remove 10%:    wall time + rows/s (tombstone path, ivf.remove)
  - re-add 10%:    wall time + rows/s at two batch shapes (1 x 100k,
                   10 x 10k) on separate index copies loaded from a
                   saved snapshot, so the shapes are comparable
  - post-churn:    QPS + recall@10 vs the exact oracle over LIVE rows
  - fresh rebuild over the same live set: QPS + recall@10 (the "pay
    the rebuild" alternative churn competes with)

The hnswlib capability this speaks to: add_items/mark_deleted on a live
index (reference src/pipeline/search_pipeline.py:154-175).

Run (relay up):  cd /root/repo && python -u drives/churn.py
Smoke (CPU):     TS_CHURN_N=20000 TS_CHURN_SMOKE=1 python drives/churn.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

if os.environ.get("TS_CHURN_SMOKE"):
    jax.config.update("jax_platforms", "cpu")

from text_similarity_tpu.core.cache import setup_compile_cache  # noqa: E402

setup_compile_cache()

import jax.numpy as jnp  # noqa: E402

from text_similarity_tpu.core.config import IndexConfig  # noqa: E402
from text_similarity_tpu.index.ivf import IVFIndex  # noqa: E402
from text_similarity_tpu.ops.topk import (  # noqa: E402
    cosine_topk_pallas,
    cosine_topk_xla,
    l2_normalize,
)

N = int(os.environ.get("TS_CHURN_N", 1_000_000))
D = int(os.environ.get("TS_CHURN_D", 384))
Q = int(os.environ.get("TS_CHURN_Q", 16384))
N_RECALL = 256
K = 10
CHURN_FRAC = 0.10
QARGS = dict(union_factor=1, block_q=64,
             approx_width=2048 if N >= 500_000 else 0)
ITERS = 5


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(row):
    print(json.dumps(row), flush=True)


def make_corpus(key, n, centers):
    assign = jax.random.randint(jax.random.fold_in(key, 2), (n,), 0, 4096)
    return l2_normalize(
        centers[assign] * 3.0
        + jax.random.normal(jax.random.fold_in(key, 3), (n, D), jnp.float32)
    )


def build(data, tag):
    cfg = IndexConfig(num_clusters=2048, num_probes=56, kmeans_iters=8)
    if N < 500_000:  # smoke: let auto pick a sane tiny geometry
        cfg = IndexConfig.auto(int(data.shape[0]))
    t0 = time.time()
    ivf = IVFIndex.build(
        data, cfg, key=jax.random.PRNGKey(7), data_dtype=jnp.bfloat16
    )
    log(f"[{tag}] build: {time.time() - t0:.1f}s "
        f"({ivf.num_base_clusters} clusters +{ivf.num_overflow} overflow)")
    return ivf


def qps_recall(ivf, queries, oracle_sets, tag):
    """Sustained QPS (best-of-3 of ITERS batches) + recall@10 against the
    caller's oracle id sets (which encode liveness)."""
    _, i = ivf.query(queries, k=K, **QARGS)   # compile + warm
    i = np.asarray(i)
    rec = np.mean([
        len(set(i[r]) & oracle_sets[r]) / K for r in range(N_RECALL)
    ])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs = [ivf.query(queries, k=K, **QARGS) for _ in range(ITERS)]
        for _, ii in outs:
            np.asarray(ii)
        best = min(best, (time.time() - t0) / ITERS)
    qps = Q / best
    log(f"[{tag}] {qps:.0f} QPS, recall@10={rec:.4f}")
    return qps, rec


def oracle_rows_for(queries, data):
    """Exact top-10 over `data` -> (N_RECALL, K) local row indices."""
    fn = (cosine_topk_pallas if jax.default_backend() == "tpu"
          else cosine_topk_xla)
    _, oi = fn(queries[:N_RECALL], data, k=K)
    return np.asarray(oi)


def to_sets(oi, ids):
    return [set(int(ids[j]) for j in oi[r]) for r in range(N_RECALL)]


def main():
    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)
    centers = jax.random.normal(kc, (4096, D), jnp.float32)
    corpus = make_corpus(kc, N, centers)
    queries = l2_normalize(
        corpus[:Q] + 0.1 * jax.random.normal(kq, (Q, D), jnp.float32)
    )
    corpus.block_until_ready()
    log(f"corpus on device: {N}x{D}")

    n_churn = int(N * CHURN_FRAC)
    rng = np.random.default_rng(3)
    # never remove oracle-query neighbors' host rows ... actually DO allow
    # removing them: that is the point of the retention test. Remove a
    # uniform 10%.
    remove_ids = np.sort(rng.choice(N, size=n_churn, replace=False))
    new_rows = make_corpus(jax.random.fold_in(kc, 99), n_churn, centers)
    new_rows.block_until_ready()

    # ---- fresh build + baseline numbers --------------------------------
    ivf = build(corpus, "fresh")
    all_ids = np.arange(N)
    o_fresh = to_sets(oracle_rows_for(queries, corpus), all_ids)
    fresh_qps, fresh_rec = qps_recall(ivf, queries, o_fresh, "fresh")
    emit({"phase": "fresh", "qps": round(fresh_qps, 1),
          "recall_at_10": round(float(fresh_rec), 4)})

    snap = "/tmp/churn_snapshot.npz"
    t0 = time.time()
    ivf.save(snap)
    log(f"snapshot save: {time.time() - t0:.1f}s")

    # ---- remove 10% ----------------------------------------------------
    t0 = time.time()
    n_removed = ivf.remove(remove_ids)
    # remove() is device-async on the ids slab; force completion
    ivf.ids_padded.block_until_ready()
    dt = time.time() - t0
    assert n_removed == n_churn, (n_removed, n_churn)
    emit({"phase": "remove", "rows": n_churn, "seconds": round(dt, 3),
          "rows_per_s": round(n_churn / dt, 1)})

    # ---- re-add 10% new rows (two batch shapes, each from the same
    # post-remove state) --------------------------------------------------
    add_stats = []
    chunk10 = max(1, n_churn // 10)
    for tag, chunk in ((f"1x{n_churn}", n_churn),
                       (f"10x{chunk10}", chunk10)):
        inst = IVFIndex.load(snap)
        inst.remove(remove_ids)
        inst.ids_padded.block_until_ready()
        t0 = time.time()
        for st in range(0, n_churn, chunk):
            inst.add(new_rows[st:st + chunk], start_id=N + st)
        inst.ids_padded.block_until_ready()
        np.asarray(jax.device_get(inst.ids_padded[0, :1]))
        dt = time.time() - t0
        add_stats.append((tag, dt, inst))
        emit({"phase": "add", "batching": tag, "rows": n_churn,
              "seconds": round(dt, 3),
              "rows_per_s": round(n_churn / dt, 1)})

    # keep the single-batch instance for the post-churn quality check
    churned = add_stats[0][2]

    # ---- post-churn quality --------------------------------------------
    keep = np.ones(N, bool)
    keep[remove_ids] = False
    keep_idx = np.nonzero(keep)[0]
    live_data = jnp.concatenate(
        [corpus[jnp.asarray(keep_idx)], new_rows]
    )
    live_ids = np.concatenate([keep_idx, N + np.arange(n_churn)])
    o_rows = oracle_rows_for(queries, live_data)
    o_live = to_sets(o_rows, live_ids)
    churn_qps, churn_rec = qps_recall(churned, queries, o_live, "churned")
    emit({"phase": "post_churn", "qps": round(churn_qps, 1),
          "recall_at_10": round(float(churn_rec), 4),
          "recall_drop_vs_fresh": round(float(fresh_rec - churn_rec), 4)})

    # removed ids must not resurface
    _, i = churned.query(queries[:N_RECALL], k=K, **QARGS)
    i = np.asarray(i)
    removed_set = set(remove_ids.tolist())
    leaked = sum(1 for r in range(N_RECALL) for x in i[r]
                 if int(x) in removed_set)
    emit({"phase": "tombstone_leak_check", "leaked": leaked})

    # ---- fresh rebuild over the live set (the alternative) -------------
    del ivf
    for _, _, inst in add_stats[1:]:
        del inst
    t0 = time.time()
    rebuilt = build(live_data, "rebuild")
    rebuild_s = time.time() - t0
    # rebuilt index ids are LOCAL rows of live_data, not global ids
    o_local = to_sets(o_rows, np.arange(live_data.shape[0]))
    rq, rr = qps_recall(rebuilt, queries, o_local, "rebuild")
    emit({"phase": "rebuild", "build_seconds": round(rebuild_s, 1),
          "qps": round(rq, 1), "recall_at_10": round(float(rr), 4)})


if __name__ == "__main__":
    main()
