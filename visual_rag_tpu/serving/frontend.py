"""Front-end worker process: SO_REUSEPORT HTTP listener -> backend socket.

Run as ``python -m visual_rag_tpu.serving.frontend --host H --port P
--backend /path/backend.sock`` (spawned by workers.MultiWorkerServer). Does
ALL of the per-request CPU work that previously serialized under one GIL —
HTTP/1.1 parsing, JSON decode, base64 embedding decode — and forwards ready
numpy arrays to the engine backend over a pickled, id-multiplexed unix
socket. Never imports jax; never touches the TPU.

Endpoints (wire parity with server.SearchServer / aserver.AsyncSearchServer):
  POST /search, GET /healthz, GET /stats
"""

from __future__ import annotations

import argparse
import asyncio
import itertools
import json
import sys
from typing import Any, Dict

import numpy as np

_MAX_HEADER = 64 * 1024
_MAX_BODY = 256 * 1024 * 1024


def _decode_embedding_local(req: Dict[str, Any]):
    """Numpy-only subset of serving.server.decode_embedding_request: text
    queries pass through to the backend (the model lives there)."""
    if "embedding_b64" in req:
        import base64

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
        return None  # backend embeds text queries
    raise ValueError("request needs 'embedding', 'embedding_b64', or 'query'")


class BackendClient:
    """One multiplexed connection to the engine backend."""

    def __init__(self, path: str, num_docs: int = -1):
        self.path = path
        self.num_docs = num_docs
        self._ids = itertools.count(1)
        self._pending: Dict[int, asyncio.Future] = {}
        self._writer = None
        self._wlock = asyncio.Lock()

    async def connect(self):
        from visual_rag_tpu.serving.workers import read_frames

        reader, self._writer = await asyncio.open_unix_connection(self.path)

        async def pump():
            async for rid, obj in read_frames(reader):
                fut = self._pending.pop(rid, None)
                if fut is not None and not fut.cancelled():
                    fut.set_result(obj)
            for fut in self._pending.values():
                if not fut.cancelled():
                    fut.set_exception(ConnectionError("backend closed"))
            self._pending.clear()

        asyncio.ensure_future(pump())

    async def call(self, msg: Dict[str, Any]) -> Dict[str, Any]:
        from visual_rag_tpu.serving.workers import write_frame

        rid = next(self._ids)
        fut = asyncio.get_running_loop().create_future()
        self._pending[rid] = fut
        async with self._wlock:
            write_frame(self._writer, rid, msg)
            await self._writer.drain()
        return await fut


async def _client(reader, writer, backend: BackendClient):
    try:
        while True:
            try:
                head = await reader.readuntil(b"\r\n\r\n")
            except (asyncio.IncompleteReadError, asyncio.LimitOverrunError,
                    ConnectionResetError):
                return
            if len(head) > _MAX_HEADER:
                return
            lines = head.decode("latin-1").split("\r\n")
            try:
                method, path, _ = lines[0].split(" ", 2)
            except ValueError:
                return
            headers = {}
            for ln in lines[1:]:
                if ":" in ln:
                    k, v = ln.split(":", 1)
                    headers[k.strip().lower()] = v.strip()
            length = int(headers.get("content-length", 0) or 0)
            if length > _MAX_BODY:
                return
            body = await reader.readexactly(length) if length else b""

            status, payload = await _route(method, path, body, backend)
            data = json.dumps(payload).encode()
            writer.write(
                f"HTTP/1.1 {status} {'OK' if status == 200 else 'ERR'}\r\n"
                f"Content-Type: application/json\r\n"
                f"Content-Length: {len(data)}\r\nConnection: keep-alive\r\n"
                f"\r\n".encode() + data)
            await writer.drain()
            if headers.get("connection", "").lower() == "close":
                return
    finally:
        try:
            writer.close()
        except Exception:
            pass


async def _route(method: str, path: str, body: bytes, backend: BackendClient):
    if method == "GET" and path == "/healthz":
        return 200, {"status": "ok", "num_docs": backend.num_docs}
    if method == "GET" and path == "/stats":
        out = await backend.call({"op": "stats"})
        return 200, out.get("stats", {})
    if method == "POST" and path == "/search":
        try:
            req = json.loads(body or b"{}")
        except (ValueError, json.JSONDecodeError) as ex:
            return 400, {"error": f"bad JSON: {ex}"}
        try:
            emb = _decode_embedding_local(req)
        except (ValueError, TypeError) as ex:
            return 400, {"error": str(ex)}
        opts = {k: req[k] for k in
                ("mode", "top_k", "prefetch_k", "stage1_mode",
                 "stage1_k", "stage2_k") if k in req}
        msg = {"op": "search", "embedding": emb, "options": opts}
        if emb is None:
            msg["query"] = req["query"]
        out = await backend.call(msg)
        if out.get("ok"):
            return 200, {"results": out["results"]}
        return out.get("status", 500), {"error": out.get("error", "backend error")}
    return 404, {"error": f"no route {method} {path}"}


async def amain(args) -> None:
    from visual_rag_tpu.serving.workers import reuseport_socket

    backend = BackendClient(args.backend, num_docs=args.num_docs)
    await backend.connect()
    sock = reuseport_socket(args.host, args.port)
    server = await asyncio.start_server(
        lambda r, w: _client(r, w, backend), sock=sock,
        limit=_MAX_HEADER + 16)
    async with server:
        await server.serve_forever()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--backend", required=True, help="backend unix socket path")
    ap.add_argument("--worker-id", type=int, default=0)
    ap.add_argument("--num-docs", type=int, default=-1,
                    help="corpus size echoed by /healthz (wire parity)")
    args = ap.parse_args()
    try:
        asyncio.run(amain(args))
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
