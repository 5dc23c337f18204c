"""Asyncio HTTP search server: the high-throughput serving front end.

The stdlib ThreadingHTTPServer front end caps around ~300 QPS even with a
no-op engine (thread-per-connection + BaseHTTPRequestHandler parsing under
the GIL). This server replaces it with ONE event loop doing minimal HTTP/1.1
parsing (readuntil header block, readexactly body) and bridges requests to
the same pipelined :class:`DynamicBatcher` via asyncio futures — stdlib only,
same wire protocol and endpoints as :class:`SearchServer`:

  POST /search, GET /healthz, GET /stats
"""

from __future__ import annotations

import asyncio
import json
import logging
import threading
from typing import Any, Dict, Optional

from visual_rag_tpu.serving.server import DynamicBatcher

logger = logging.getLogger(__name__)

_MAX_HEADER = 64 * 1024
_MAX_BODY = 256 * 1024 * 1024


class AsyncSearchServer:
    """Event-loop HTTP server over a RetrievalEngine (+ optional embedder).

    Same constructor/start/stop surface as SearchServer; the loop runs in a
    dedicated thread so it embeds in synchronous programs and the CLI.
    """

    def __init__(self, engine, embedder=None, host: str = "127.0.0.1",
                 port: int = 0, max_batch: int = 256, max_wait_ms: float = 5.0):
        self.engine = engine
        self.embedder = embedder
        self.batcher = DynamicBatcher(engine, max_batch=max_batch,
                                      max_wait_ms=max_wait_ms)
        self._host_arg, self._port_arg = host, port
        self.host: Optional[str] = None
        self.port: Optional[int] = None
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._thread: Optional[threading.Thread] = None
        self._started = threading.Event()
        self._server: Optional[asyncio.AbstractServer] = None

    # -- request handling -----------------------------------------------------

    def _embedding_from(self, req: Dict[str, Any]):
        from visual_rag_tpu.serving.server import decode_embedding_request

        return decode_embedding_request(req, self.embedder)

    async def _handle_search(self, body: bytes) -> tuple:
        try:
            req = json.loads(body or b"{}")
        except (ValueError, json.JSONDecodeError) as ex:
            return 400, {"error": f"bad JSON: {ex}"}
        try:
            emb = self._embedding_from(req)
        except (ValueError, TypeError) as ex:
            return 400, {"error": str(ex)}
        opts = {k: req[k] for k in
                ("mode", "top_k", "prefetch_k", "stage1_mode",
                 "stage1_k", "stage2_k") if k in req}
        loop = asyncio.get_running_loop()
        fut: asyncio.Future = loop.create_future()

        def on_done(p):  # called from the batcher worker thread
            def resolve():
                if fut.cancelled():
                    return
                if p.error is not None:
                    fut.set_exception(RuntimeError(p.error))
                else:
                    fut.set_result(p.result)

            loop.call_soon_threadsafe(resolve)

        self.batcher.submit_nowait(emb, opts, callback=on_done)
        try:
            results = await asyncio.wait_for(fut, timeout=30.0)
        except asyncio.TimeoutError:
            return 500, {"error": "search timed out in batcher"}
        except RuntimeError as ex:
            return 500, {"error": str(ex)}
        return 200, {"results": results}

    async def _client(self, reader: asyncio.StreamReader,
                      writer: asyncio.StreamWriter):
        try:
            sock = writer.get_extra_info("socket")
            if sock is not None:
                import socket as _s

                sock.setsockopt(_s.IPPROTO_TCP, _s.TCP_NODELAY, 1)
            while True:
                try:
                    head = await reader.readuntil(b"\r\n\r\n")
                except (asyncio.IncompleteReadError, ConnectionResetError):
                    return
                except asyncio.LimitOverrunError:
                    return
                if len(head) > _MAX_HEADER:
                    return
                lines = head.decode("latin1").split("\r\n")
                try:
                    method, path, _version = lines[0].split(" ", 2)
                except ValueError:
                    return
                headers = {}
                for ln in lines[1:]:
                    if ":" in ln:
                        k, v = ln.split(":", 1)
                        headers[k.strip().lower()] = v.strip()
                n = int(headers.get("content-length", 0) or 0)
                if n < 0 or n > _MAX_BODY:
                    return
                body = await reader.readexactly(n) if n else b""
                keep = headers.get("connection", "keep-alive").lower() != "close"

                if method == "POST" and path == "/search":
                    code, payload = await self._handle_search(body)
                elif method == "GET" and path == "/healthz":
                    code, payload = 200, {
                        "status": "ok",
                        "num_docs": len(self.engine.index.manifest)}
                elif method == "GET" and path == "/stats":
                    code, payload = 200, dict(self.batcher.stats)
                elif path == "/search":
                    code, payload = 405, {"error": "POST /search with a JSON body"}
                else:
                    code, payload = 404, {"error": f"unknown path {path}"}
                out = json.dumps(payload).encode()
                reason = {200: "OK", 400: "Bad Request", 404: "Not Found",
                          405: "Method Not Allowed",
                          500: "Internal Server Error"}.get(code, "Status")
                writer.write(
                    (f"HTTP/1.1 {code} {reason}\r\nContent-Type: application/json\r\n"
                     f"Content-Length: {len(out)}\r\n"
                     f"Connection: {'keep-alive' if keep else 'close'}\r\n"
                     f"\r\n").encode() + out)
                await writer.drain()
                if not keep:
                    return
        except Exception:  # pragma: no cover - connection-level failures
            logger.debug("connection handler error", exc_info=True)
        finally:
            try:
                writer.close()
            except Exception:
                pass

    # -- lifecycle ------------------------------------------------------------

    def _run_loop(self):
        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        self._loop = loop

        async def boot():
            self._server = await asyncio.start_server(
                self._client, self._host_arg, self._port_arg,
                limit=_MAX_HEADER, backlog=512)
            addr = self._server.sockets[0].getsockname()
            self.host, self.port = addr[0], addr[1]
            self._started.set()

        loop.run_until_complete(boot())
        try:
            loop.run_forever()
        finally:
            loop.run_until_complete(loop.shutdown_asyncgens())
            loop.close()

    def start(self) -> "AsyncSearchServer":
        self._thread = threading.Thread(target=self._run_loop, daemon=True)
        self._thread.start()
        if not self._started.wait(10):
            raise RuntimeError("async server failed to start")
        logger.info("async search server on http://%s:%d", self.host, self.port)
        return self

    def stop(self):
        if self._loop is not None:
            def shutdown():
                if self._server is not None:
                    self._server.close()
                self._loop.stop()

            self._loop.call_soon_threadsafe(shutdown)
        if self._thread is not None:
            self._thread.join(timeout=5)
        self.batcher.close()
