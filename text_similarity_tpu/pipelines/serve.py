"""HTTP serving daemon for the semantic-search pipeline.

The reference serves search through ``APISearchPipeline`` — an ONNX int8
encoder + hnswlib index meant to sit behind an API process
(src/pipeline/search_pipeline.py:178-226). The TPU-native equivalent is a
small JSON-over-HTTP daemon wrapping ``SemanticSearchPipeline``: encode
and ANN query run on device in large batches; the HTTP layer is
stdlib-only (no framework dependency).

Endpoints (all JSON):

- ``GET  /health``          → ``{"status": "ok", "size": N, "ivf": bool}``
- ``POST /search``          ``{"queries": [...], "k": 10}`` →
  ``{"results": [[{"document", "score", "id"}, ...], ...]}``
- ``POST /encode``          ``{"texts": [...]}`` → ``{"embeddings": [[...]]}``
- ``POST /add``             ``{"texts": [...]}`` → ``{"ids": [...]}``
- ``POST /remove``          ``{"ids": [...]}`` → ``{"removed": n}``
- ``POST /save``            ``{"path": "..."}`` → ``{"saved": path}``
- ``GET  /metrics``         → per-endpoint request/error counts and
  p50/p95 latency (ms) over the last 1024 requests

A single device executes all requests: handlers serialize through one
lock (XLA dispatch is not thread-safe per design here; batching happens
inside the pipeline, so concurrency buys nothing on one chip).
"""

from __future__ import annotations

import json
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from ..utils.logging import get_logger

logger = get_logger("serve")


class _MicroBatcher:
    """Coalesce concurrent /search requests into one device call.

    TPU throughput is batch-bound (one fused dispatch costs the same
    relay round trip whether it carries 1 or 16k queries — CLAUDE.md
    perf notes), so under concurrent load the winning serving shape is:
    take the first waiting request, linger ``window`` seconds for
    companions, run ONE pipeline call over the concatenated queries, and
    scatter the per-request slices back. Single-request latency pays at
    most ``window``; aggregate QPS approaches the batched kernel rate."""

    def __init__(self, pipeline, lock, window: float, max_batch: int = 4096):
        self.pipeline = pipeline
        self.lock = lock           # the server's pipeline mutation lock
        self.window = window
        self.max_batch = max_batch
        self._cv = threading.Condition()
        self._queue: deque = deque()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, queries, k: int):
        item = {
            "q": queries, "k": k, "ev": threading.Event(),
            "res": None, "err": None,
        }
        with self._cv:
            self._queue.append(item)
            self._cv.notify()
        item["ev"].wait()
        if item["err"] is not None:
            raise item["err"]
        return item["res"]

    def _loop(self):
        while True:
            with self._cv:
                while not self._queue:
                    self._cv.wait()
                first = self._queue.popleft()
            if self.window > 0:
                time.sleep(self.window)   # linger for companions
            batch = [first]
            with self._cv:
                while (
                    self._queue
                    and self._queue[0]["k"] == first["k"]
                    and sum(len(b["q"]) for b in batch) < self.max_batch
                ):
                    batch.append(self._queue.popleft())
            all_q = [q for b in batch for q in b["q"]]
            # quantize the aggregate to a power of two: every distinct
            # query count otherwise compiles fresh device shapes down the
            # encode path (through a remote relay that is seconds per
            # shape, measured in drives/serve_load.py phase A) — pad with
            # a repeat of the first query and drop the tail results
            n_real = len(all_q)
            n_pad = 1 << (n_real - 1).bit_length() if n_real > 1 else 1
            all_q = all_q + [all_q[0]] * (n_pad - n_real)
            try:
                with self.lock:
                    results = self.pipeline(
                        all_q, max_num_results=first["k"]
                    )
                results = results[:n_real]
                off = 0
                for b in batch:
                    b["res"] = results[off:off + len(b["q"])]
                    off += len(b["q"])
            except Exception as e:  # surface to every waiting request
                for b in batch:
                    b["err"] = e
            for b in batch:
                b["ev"].set()


class _EndpointStats:
    """Per-endpoint request counters + a latency reservoir (last 1024
    samples) for /metrics. Thread-safe via one tiny lock."""

    def __init__(self):
        self._lock = threading.Lock()
        self.counts: dict = {}
        self.errors: dict = {}
        self._lat: dict = {}

    def record(self, path: str, seconds: float, ok: bool):
        with self._lock:
            self.counts[path] = self.counts.get(path, 0) + 1
            if not ok:
                self.errors[path] = self.errors.get(path, 0) + 1
            buf = self._lat.setdefault(path, deque(maxlen=1024))
            buf.append(seconds)

    def snapshot(self) -> dict:
        with self._lock:
            out = {}
            for path, n in self.counts.items():
                lats = np.sort(np.asarray(self._lat[path])) * 1e3
                p50 = float(lats[len(lats) // 2])
                p95 = float(lats[max(0, int(np.ceil(len(lats) * 0.95)) - 1)])
                out[path] = {
                    "requests": int(n),
                    "errors": int(self.errors.get(path, 0)),
                    "latency_ms_p50": round(p50, 3),
                    "latency_ms_p95": round(p95, 3),
                }
            return out


class SearchServer:
    """Owns the pipeline, the lock, and the HTTP server object."""

    def __init__(
        self,
        pipeline,
        host: str = "127.0.0.1",
        port: int = 8080,
        batch_window: float = 0.0,  # >0: micro-batch concurrent /search
                                    # requests (seconds of linger)
        reranker=None,              # pipelines.rerank.RankingPipeline over
                                    # the same search pipeline: serves
                                    # POST /rerank (retrieve + cross-
                                    # encoder re-score; the served form of
                                    # the reference ranking_pipeline.py)
    ):
        self.pipeline = pipeline
        self.reranker = reranker
        self.stats = _EndpointStats()
        self.lock = threading.Lock()
        self.batcher = (
            _MicroBatcher(pipeline, self.lock, batch_window)
            if batch_window > 0 else None
        )
        server = self

        class Handler(BaseHTTPRequestHandler):
            # quiet default request logging; route through our logger
            def log_message(self, fmt, *args):  # noqa: N802
                logger.debug("%s " + fmt, self.address_string(), *args)

            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _read_json(self) -> Optional[dict]:
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    return json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError):
                    return None

            def do_GET(self):  # noqa: N802
                if self.path == "/metrics":
                    return self._reply(200, server.stats.snapshot())
                if self.path != "/health":
                    return self._reply(404, {"error": "unknown endpoint"})
                with server.lock:
                    p = server.pipeline
                    if getattr(p, "store", None) is not None:
                        size = p.store.size
                    else:   # sharded pipeline: no single-device store
                        size = getattr(p, "size", 0)
                    self._reply(
                        200,
                        {"status": "ok", "size": int(size),
                         "ivf": p.ivf is not None,
                         "sharded": hasattr(p, "mesh")},
                    )

            ENDPOINTS = {
                "/search", "/rerank", "/encode", "/add", "/remove",
                "/save",
            }

            def do_POST(self):  # noqa: N802
                # monotonic: a wall-clock step would poison the latency
                # reservoir; record only KNOWN endpoints so a scanner
                # POSTing random paths can't grow /metrics unboundedly
                t0 = time.monotonic()
                known = self.path in self.ENDPOINTS
                ok = False
                try:
                    req = self._read_json()
                    if req is None:
                        return self._reply(400, {"error": "invalid JSON body"})
                    if self.path == "/search" and server.batcher is not None:
                        # the batcher worker takes the pipeline lock —
                        # waiting under it here would deadlock
                        out = server._search_batched(req)
                        ok = True
                        return self._reply(200, out)
                    handler = {
                        "/search": server._search,
                        "/rerank": server._rerank,
                        "/encode": server._encode,
                        "/add": server._add,
                        "/remove": server._remove,
                        "/save": server._save,
                    }.get(self.path)
                    if handler is None:
                        return self._reply(404, {"error": "unknown endpoint"})
                    with server.lock:
                        out = handler(req)
                    ok = True
                    self._reply(200, out)
                except (KeyError, TypeError, ValueError) as e:
                    self._reply(400, {"error": f"{type(e).__name__}: {e}"})
                except Exception as e:  # unexpected: 500, keep serving
                    logger.exception("request failed")
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})
                finally:
                    if known:
                        server.stats.record(
                            self.path, time.monotonic() - t0, ok
                        )

        class _Server(ThreadingHTTPServer):
            # http.server's default listen backlog is 5: any burst of >5
            # concurrent connects gets RST at the kernel before a handler
            # thread ever runs (measured: 32-client load test dropped
            # connections, drives/serve_load.py). Device work is the
            # bottleneck, not accept — queue deep.
            request_queue_size = 128
            daemon_threads = True

        self.httpd = _Server((host, port), Handler)

    # -- request handlers (called under self.lock) -------------------------

    @staticmethod
    def _format_results(results) -> dict:
        return {
            "results": [
                [
                    {"document": doc, "score": score, "id": idx}
                    for doc, score, idx in row
                ]
                for row in results
            ]
        }

    def _search(self, req: dict) -> dict:
        queries = req["queries"]
        if isinstance(queries, str):
            queries = [queries]
        k = int(req.get("k", 10))
        return self._format_results(
            self.pipeline(queries, max_num_results=k)
        )

    def _rerank(self, req: dict) -> dict:
        if self.reranker is None:
            raise ValueError("server started without a reranker model")
        queries = req["queries"]
        if isinstance(queries, str):
            queries = [queries]
        k = int(req.get("k", 10))
        return self._format_results(self.reranker(queries, top_k=k))

    def _search_batched(self, req: dict) -> dict:
        queries = req["queries"]
        if isinstance(queries, str):
            queries = [queries]
        k = int(req.get("k", 10))
        return self._format_results(self.batcher.submit(queries, k))

    def _encode(self, req: dict) -> dict:
        texts = req["texts"]
        if isinstance(texts, str):
            texts = [texts]
        emb = self.pipeline.encoder.encode(texts)
        return {"embeddings": np.asarray(emb, np.float32).tolist()}

    def _add(self, req: dict) -> dict:
        texts = req["texts"]
        if isinstance(texts, str):
            texts = [texts]
        ids = self.pipeline.add_documents(texts)
        return {"ids": np.asarray(ids).tolist()}

    def _remove(self, req: dict) -> dict:
        ids = [int(i) for i in req["ids"]]
        n = self.pipeline.remove_documents(ids)
        return {"removed": int(n)}

    def _save(self, req: dict) -> dict:
        path = str(req["path"])
        self.pipeline.save(path)
        return {"saved": path}

    # -- lifecycle ---------------------------------------------------------

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def serve_forever(self):
        logger.info("serving on %s:%d", *self.httpd.server_address[:2])
        self.httpd.serve_forever()

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()
