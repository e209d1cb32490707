"""HW load test of the HTTP serving daemon (VERDICT r4 #2b).

Drives the production `SearchServer` (pipelines/serve.py) end-to-end over
HTTP on one TPU chip: a 1M-doc synthetic corpus is encoded and indexed
through `SemanticSearchPipeline`, then concurrent clients hammer
  A. /search batch=1  through the micro-batcher (interactive traffic)
  B. /search batch=16
  C. /search batch=256          (bulk traffic)
  D. /rerank batch=256, retrieve_k=100, top 10 (search + cross-encoder)
reporting queries/s and request p50/p95 per phase, plus the server's own
/metrics snapshot. This is the served form of the reference
APISearchPipeline + RankingPipeline (search_pipeline.py:178-226,
ranking_pipeline.py:14-43).

Run (relay up):  cd /root/repo && python -u drives/serve_load.py
Smoke (CPU):     TS_SERVE_N=2000 TS_SERVE_SMOKE=1 python drives/serve_load.py
"""

import json
import os
import sys
import threading
import time
from http.client import HTTPConnection

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

SMOKE = bool(os.environ.get("TS_SERVE_SMOKE"))
if SMOKE:
    jax.config.update("jax_platforms", "cpu")

from text_similarity_tpu.core.cache import setup_compile_cache  # noqa: E402

setup_compile_cache()

from text_similarity_tpu.core.config import ARCH_PRESETS  # noqa: E402
from text_similarity_tpu.core.precision import precision_for  # noqa: E402
from text_similarity_tpu.data.tokenization import (  # noqa: E402
    WordPieceTokenizer,
    train_wordpiece_vocab,
)
from text_similarity_tpu.models import init_params  # noqa: E402
from text_similarity_tpu.models.sentence_encoder import SentenceEncoder  # noqa: E402
from text_similarity_tpu.models.cross_encoder import CrossEncoder  # noqa: E402
from text_similarity_tpu.pipelines import (  # noqa: E402
    SemanticSearchPipeline,
    RankingPipeline,
)
from text_similarity_tpu.pipelines.serve import SearchServer  # noqa: E402

N_DOCS = int(os.environ.get("TS_SERVE_N", 1_000_000))
DURATION = float(os.environ.get("TS_SERVE_DURATION", 20.0))
ARCH = os.environ.get("TS_SERVE_ARCH", "tiny-test" if SMOKE else "minilm-l6")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(row):
    print(json.dumps(row), flush=True)


def make_texts(n, rng, n_words=4000):
    """Synthetic sentences, STS-like lengths (median ~10 words)."""
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = ["".join(rng.choice(letters, rng.integers(3, 9)))
             for _ in range(n_words)]
    words = np.array(words)
    lens = np.clip(np.round(np.exp(rng.normal(2.3, 0.4, n))), 4, 24)
    lens = lens.astype(int)
    flat = rng.integers(0, n_words, int(lens.sum()))
    texts, off = [], 0
    for L in lens:
        texts.append(" ".join(words[flat[off:off + L]]))
        off += L
    return texts


def post(conn_host, port, path, payload):
    conn = HTTPConnection(conn_host, port)
    body = json.dumps(payload)
    t0 = time.monotonic()
    conn.request("POST", path, body,
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    dt = time.monotonic() - t0
    conn.close()
    if resp.status != 200:
        raise RuntimeError(f"{path} -> {resp.status}: {data[:200]}")
    return dt, json.loads(data)


def load_phase(name, port, path, queries, batch, n_threads, k,
               duration, extra=None):
    """n_threads clients send `batch`-query requests for `duration`
    seconds; returns aggregate q/s + client-side p50/p95 per request.
    An untimed warm round absorbs any remaining remote compiles for this
    phase's request shape (a production daemon pays these at startup)."""
    warm_sizes = sorted({
        b for b in (1, 2, 4, 8, 16, 32, batch) if b <= max(batch, 32)
    })
    for w, wb in enumerate(warm_sizes):
        payload = {"queries": list(queries[w * wb:(w + 1) * wb]), "k": k}
        if extra:
            payload.update(extra)
        post("127.0.0.1", port, path, payload)
    stop = time.monotonic() + duration
    lat, counts = [], [0]
    lock = threading.Lock()
    rng_local = np.random.default_rng(1234)
    idx = rng_local.integers(0, len(queries), 65536)

    def worker(wid):
        j = wid * 131
        while time.monotonic() < stop:
            qs = [queries[idx[(j + t) % len(idx)]] for t in range(batch)]
            j += batch
            payload = {"queries": qs, "k": k}
            if extra:
                payload.update(extra)
            dt, _ = post("127.0.0.1", port, path, payload)
            with lock:
                lat.append(dt)
                counts[0] += batch
    t0 = time.monotonic()
    threads = [threading.Thread(target=worker, args=(w,))
               for w in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    lat_ms = np.sort(np.asarray(lat)) * 1e3
    row = {
        "phase": name, "path": path, "batch": batch,
        "clients": n_threads, "requests": len(lat),
        "queries_per_s": round(counts[0] / wall, 1),
        "p50_ms": round(float(lat_ms[len(lat_ms) // 2]), 1),
        "p95_ms": round(float(
            lat_ms[min(len(lat_ms) - 1,
                       max(0, int(np.ceil(len(lat_ms) * 0.95)) - 1))]
        ), 1),
    }
    emit(row)
    return row


def main():
    rng = np.random.default_rng(0)
    t0 = time.time()
    texts = make_texts(N_DOCS, rng)
    log(f"synthetic corpus: {N_DOCS} docs in {time.time() - t0:.1f}s")

    vocab = train_wordpiece_vocab(texts[:20000], vocab_size=8000,
                                  min_freq=1)
    tok = WordPieceTokenizer(vocab)
    arch = ARCH_PRESETS[ARCH].replace(vocab_size=tok.vocab_size)
    bf16 = not SMOKE
    enc = SentenceEncoder(
        init_params(jax.random.PRNGKey(0), arch), arch, tokenizer=tok,
        precision=precision_for(bf16),
    )
    pipe = SemanticSearchPipeline(enc, batch_size=1024)

    t0 = time.time()
    pipe.add_documents(texts)
    log(f"encode+store {N_DOCS} docs: {time.time() - t0:.1f}s "
        f"({N_DOCS / (time.time() - t0):.0f} docs/s)")

    t0 = time.time()
    pipe(["warm trigger"], max_num_results=10)  # builds IVF at >=100k
    log(f"first query (index build + compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    pipe.warmup(ks=(10,), max_queries=256)
    log(f"warmup: {time.time() - t0:.1f}s")

    ce = CrossEncoder.init(
        jax.random.PRNGKey(1), arch, tokenizer=tok, num_classes=1,
        precision=precision_for(bf16),
    )
    reranker = RankingPipeline(pipe, ce, retrieve_k=100, batch_size=512)
    t0 = time.time()
    reranker(["warm trigger rerank"], top_k=10)
    log(f"rerank warm: {time.time() - t0:.1f}s")

    server = SearchServer(pipe, port=0, batch_window=0.005,
                          reranker=reranker)
    port = server.port
    srv_thread = threading.Thread(target=server.serve_forever, daemon=True)
    srv_thread.start()
    log(f"server on 127.0.0.1:{port}")

    queries = texts[: min(len(texts), 65536)]
    dur = 3.0 if SMOKE else DURATION
    phases = os.environ.get("TS_SERVE_PHASES", "ABCD")

    if "A" in phases:
        load_phase("A_search_b1_microbatch", port, "/search", queries,
                   batch=1, n_threads=32, k=10, duration=dur)
    if "B" in phases:
        load_phase("B_search_b16", port, "/search", queries,
                   batch=16, n_threads=8, k=10, duration=dur)
    if "C" in phases:
        load_phase("C_search_b256", port, "/search", queries,
                   batch=256, n_threads=4, k=10, duration=dur)
    if "D" in phases:
        load_phase("D_rerank_b256_k100", port, "/rerank", queries,
                   batch=256, n_threads=2, k=10,
                   duration=dur * (1 if SMOKE else 3))
    if "E" in phases:  # single-client rerank: in-call rate, no lock queue
        load_phase("E_rerank_b256_1client", port, "/rerank", queries,
                   batch=256, n_threads=1, k=10,
                   duration=dur * (1 if SMOKE else 3))

    conn = HTTPConnection("127.0.0.1", port)
    conn.request("GET", "/metrics")
    metrics = json.loads(conn.getresponse().read())
    conn.close()
    emit({"phase": "server_metrics", "metrics": metrics})
    server.shutdown()


if __name__ == "__main__":
    main()
