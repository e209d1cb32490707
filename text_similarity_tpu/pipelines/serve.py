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

A single device executes all requests: handlers serialize through one
lock (XLA dispatch is not thread-safe per design here; batching happens
inside the pipeline, so concurrency buys nothing on one chip).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from ..utils.logging import get_logger

logger = get_logger("serve")


class SearchServer:
    """Owns the pipeline, the lock, and the HTTP server object."""

    def __init__(self, pipeline, host: str = "127.0.0.1", port: int = 8080):
        self.pipeline = pipeline
        self.lock = threading.Lock()
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
                if self.path != "/health":
                    return self._reply(404, {"error": "unknown endpoint"})
                with server.lock:
                    p = server.pipeline
                    size = p.store.size if p.store is not None else 0
                    self._reply(
                        200,
                        {"status": "ok", "size": int(size),
                         "ivf": p.ivf is not None},
                    )

            def do_POST(self):  # noqa: N802
                req = self._read_json()
                if req is None:
                    return self._reply(400, {"error": "invalid JSON body"})
                try:
                    handler = {
                        "/search": server._search,
                        "/encode": server._encode,
                        "/add": server._add,
                        "/remove": server._remove,
                        "/save": server._save,
                    }.get(self.path)
                    if handler is None:
                        return self._reply(404, {"error": "unknown endpoint"})
                    with server.lock:
                        self._reply(200, handler(req))
                except (KeyError, TypeError, ValueError) as e:
                    self._reply(400, {"error": f"{type(e).__name__}: {e}"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.httpd.daemon_threads = True

    # -- request handlers (called under self.lock) -------------------------

    def _search(self, req: dict) -> dict:
        queries = req["queries"]
        if isinstance(queries, str):
            queries = [queries]
        k = int(req.get("k", 10))
        results = self.pipeline(queries, max_num_results=k)
        return {
            "results": [
                [
                    {"document": doc, "score": score, "id": idx}
                    for doc, score, idx in row
                ]
                for row in results
            ]
        }

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
        self.pipeline.remove_documents(ids)
        return {"removed": len(ids)}

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
