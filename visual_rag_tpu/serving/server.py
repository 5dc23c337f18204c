"""HTTP search service with dynamic batching onto the fused TPU path.

The reference serves by pointing qdrant-client at a Qdrant server; here the
engine lives in-process, so the serving layer's job is the TPU-shaped one:
coalesce concurrent requests into ONE fused batch dispatch
(``RetrievalEngine.search_embedded_batch``) — per-query dispatches waste the
chip on tunnel/dispatch latency, while a batch of 64-256 queries amortizes
it into the >1000 QPS regime (BENCH_SUMMARY.md).

Stdlib only (ThreadingHTTPServer + a batcher thread): no framework deps.

  POST /search   {"embedding": [[...dim floats...], ...] | "query": "text",
                  "mode": "two_stage", "top_k": 10, "prefetch_k": 200}
  GET  /healthz  liveness + corpus size
  GET  /stats    request/batch counters (batching observability)

``embedding`` serves precomputed query token matrices; ``query`` requires
the server to own a ``VisualEmbedder`` (embedder=... at construction).
"""

from __future__ import annotations

import json
import logging
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class _Pending:
    embedding: np.ndarray
    options: Dict[str, Any]
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[List[Dict[str, Any]]] = None
    error: Optional[str] = None
    # optional completion hook (async server bridges to an asyncio future);
    # called from the batcher worker thread AFTER result/error is set
    callback: Optional[Any] = None


def decode_embedding_request(req: Dict[str, Any], embedder=None) -> np.ndarray:
    """Wire-format decoder shared by both HTTP front ends.

    Accepts ``embedding`` (nested lists), ``embedding_b64`` (+shape/dtype;
    the fast binary format), or ``query`` text (needs an embedder).
    """
    if "embedding_b64" in req:  # binary wire format: ~4x smaller, no
        import base64               # float parsing on the hot path

        shape = req.get("shape")
        if not (isinstance(shape, list) and len(shape) == 2):
            raise ValueError("embedding_b64 needs shape: [n_tokens, dim]")
        dtype_name = str(req.get("dtype", "float32"))
        if dtype_name not in ("float32", "float16"):
            raise ValueError(
                f"unsupported dtype {dtype_name!r}: use float32 or float16")
        dtype = np.dtype(dtype_name)
        raw = base64.b64decode(req["embedding_b64"])
        expect = int(shape[0]) * int(shape[1]) * dtype.itemsize
        if len(raw) != expect:
            raise ValueError(
                f"embedding_b64 has {len(raw)} bytes, shape/dtype imply {expect}")
        return np.frombuffer(raw, dtype=dtype).reshape(shape).astype(np.float32)
    if "embedding" in req:
        emb = np.asarray(req["embedding"], dtype=np.float32)
        if emb.ndim != 2:
            raise ValueError(
                f"embedding must be [n_tokens, dim], got shape {emb.shape}")
        return emb
    if "query" in req:
        if embedder is None:
            raise ValueError(
                "server has no embedder; send 'embedding' instead of 'query'")
        return embedder.embed_query(str(req["query"]))
    raise ValueError("request needs 'embedding', 'embedding_b64', or 'query'")


class DynamicBatcher:
    """Coalesces concurrent search requests into fused engine batches.

    Requests queue up; the worker drains everything available (bounded by
    ``max_batch``), waiting at most ``max_wait_ms`` after the first request
    for stragglers to fill the batch. Requests with differing search options
    still share a batch only when the options match (options define the jit
    program); mixed options split into per-option sub-batches.
    """

    def __init__(self, engine, max_batch: int = 256, max_wait_ms: float = 5.0):
        self.engine = engine
        self.max_batch = int(max_batch)
        self.max_wait = float(max_wait_ms) / 1e3
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self.stats = {"requests": 0, "batches": 0, "max_batch_seen": 0,
                      "drain_ms": 0.0, "dispatch_ms": 0.0, "finish_ms": 0.0,
                      "idle_ms": 0.0}
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit_nowait(self, embedding: np.ndarray, options: Dict[str, Any],
                      callback=None) -> _Pending:
        """Enqueue without blocking; completion via ``callback`` (called from
        the worker thread once result/error is set)."""
        p = _Pending(embedding=embedding, options=options, callback=callback)
        self._q.put(p)
        return p

    def submit(self, embedding: np.ndarray, options: Dict[str, Any],
               timeout: float = 30.0) -> List[Dict[str, Any]]:
        p = _Pending(embedding=embedding, options=options)
        self._q.put(p)
        if not p.done.wait(timeout):
            raise TimeoutError("search timed out in batcher")
        if p.error is not None:
            raise RuntimeError(p.error)
        return p.result  # type: ignore[return-value]

    def close(self):
        self._stop.set()
        self._q.put(None)  # type: ignore[arg-type]
        self._worker.join(timeout=5)

    # -- worker ---------------------------------------------------------------

    def _drain(self, first: _Pending) -> List[_Pending]:
        batch = [first]
        deadline = time.monotonic() + self.max_wait
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:
                self._stop.set()
                break
            batch.append(item)
        return batch

    def _run(self):
        # Depth-1 pipeline over the engine's dispatch/finish split: batch i's
        # device work overlaps batch i+1's collection + host prep, so the
        # batcher's cycle time is max(device, collection) instead of their
        # sum. Both RetrievalEngine and ShardedEngine implement the split;
        # the synchronous fallback only triggers for custom engine objects
        # without _dispatch_batch.
        pipelined = hasattr(self.engine, "_dispatch_batch")
        in_flight: List[Any] = []  # [(group, handle)]
        while not self._stop.is_set():
            t_idle = time.monotonic()
            try:
                # with a batch in flight, never stall waiting for new work:
                # an empty queue means finish the in-flight batch NOW (its
                # device results are likely ready) instead of adding latency
                item = self._q.get_nowait() if in_flight else self._q.get()
            except queue.Empty:
                item = None
            self.stats["idle_ms"] += (time.monotonic() - t_idle) * 1e3
            if item is None and not in_flight:
                if self._stop.is_set():
                    return
                continue
            groups: List[List[_Pending]] = []
            if item is not None:
                t_drain = time.monotonic()
                batch = self._drain(item)
                self.stats["drain_ms"] += (time.monotonic() - t_drain) * 1e3
                self.stats["requests"] += len(batch)
                self.stats["batches"] += 1
                self.stats["max_batch_seen"] = max(
                    self.stats["max_batch_seen"], len(batch))
                by_opts: Dict[str, List[_Pending]] = {}
                for p in batch:
                    by_opts.setdefault(
                        json.dumps(p.options, sort_keys=True), []).append(p)
                groups = list(by_opts.values())
            if not pipelined:
                for group in groups:
                    self._run_group_sync(group)
                continue
            dispatched: List[Any] = []
            t_disp = time.monotonic()
            for group in groups:
                try:
                    handle = self.engine._dispatch_batch(
                        [p.embedding for p in group], **group[0].options)
                    dispatched.append((group, handle))
                except Exception as ex:
                    self._fail_group(group, ex)
            self.stats["dispatch_ms"] += (time.monotonic() - t_disp) * 1e3
            # finish the PREVIOUS round while this round runs on device
            t_fin = time.monotonic()
            for group, handle in in_flight:
                self._finish_group(group, handle)
            self.stats["finish_ms"] += (time.monotonic() - t_fin) * 1e3
            in_flight = dispatched
        for group, handle in in_flight:
            self._finish_group(group, handle)

    def _finish_group(self, group: List[_Pending], handle) -> None:
        try:
            results = self.engine._finish_batch(handle)
            for p, r in zip(group, results):
                p.result = r
        except Exception as ex:  # pragma: no cover - surfaced to callers
            logger.exception("batch finish failed")
            for p in group:
                p.error = f"{type(ex).__name__}: {ex}"
        finally:
            for p in group:
                p.done.set()
                if p.callback is not None:
                    p.callback(p)

    def _fail_group(self, group: List[_Pending], ex: Exception) -> None:
        logger.exception("batch dispatch failed")
        for p in group:
            p.error = f"{type(ex).__name__}: {ex}"
            p.done.set()
            if p.callback is not None:
                p.callback(p)

    def _run_group_sync(self, group: List[_Pending]):
        opts = group[0].options
        try:
            results = self.engine.search_embedded_batch(
                [p.embedding for p in group], **opts)
            for p, r in zip(group, results):
                p.result = r
        except Exception as ex:  # pragma: no cover - surfaced to callers
            logger.exception("batch search failed")
            for p in group:
                p.error = f"{type(ex).__name__}: {ex}"
        finally:
            for p in group:
                p.done.set()
                if p.callback is not None:
                    p.callback(p)


class SearchServer:
    """Threaded HTTP server over a RetrievalEngine (+ optional embedder)."""

    def __init__(self, engine, embedder=None, host: str = "127.0.0.1",
                 port: int = 0, max_batch: int = 256, max_wait_ms: float = 5.0):
        self.engine = engine
        self.embedder = embedder
        self.batcher = DynamicBatcher(engine, max_batch=max_batch,
                                      max_wait_ms=max_wait_ms)
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # HTTP/1.1 keep-alive: without it every request pays a TCP
            # handshake + slow-start; responses always carry Content-Length
            # so persistent connections are safe.
            protocol_version = "HTTP/1.1"
            # Nagle + delayed-ACK on keep-alive connections stalls small
            # request/response pairs ~40 ms each — fatal for a batching
            # server (requests trickle in and batches never fill).
            disable_nagle_algorithm = True

            def log_message(self, *a):  # route through logging, not stderr
                logger.debug("http: " + a[0], *a[1:])

            def _send(self, code: int, payload: Dict[str, Any]):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"status": "ok",
                                     "num_docs": len(outer.engine.index.manifest)})
                elif self.path == "/stats":
                    self._send(200, dict(outer.batcher.stats))
                elif self.path == "/search":
                    self._send(405, {"error": "POST /search with a JSON body"})
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})

            def do_POST(self):
                if self.path != "/search":
                    self._send(404, {"error": f"unknown path {self.path}"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError) as ex:
                    self._send(400, {"error": f"bad JSON: {ex}"})
                    return
                try:
                    emb = outer._embedding_from(req)
                except (ValueError, TypeError) as ex:  # e.g. bogus 'dtype'
                    self._send(400, {"error": str(ex)})
                    return
                opts = {k: req[k] for k in
                        ("mode", "top_k", "prefetch_k", "stage1_mode",
                         "stage1_k", "stage2_k") if k in req}
                try:
                    results = outer.batcher.submit(emb, opts)
                except (TimeoutError, RuntimeError) as ex:
                    self._send(500, {"error": str(ex)})
                    return
                self._send(200, {"results": results})

        class Server(ThreadingHTTPServer):
            # default listen backlog (5) resets connections under bursts of
            # concurrent clients — exactly the load pattern batching serves
            request_queue_size = 128
            daemon_threads = True

        self._httpd = Server((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)

    def _embedding_from(self, req: Dict[str, Any]) -> np.ndarray:
        return decode_embedding_request(req, self.embedder)

    def start(self) -> "SearchServer":
        self._thread.start()
        logger.info("search server on http://%s:%d", self.host, self.port)
        return self

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        self.batcher.close()
        self._thread.join(timeout=5)
