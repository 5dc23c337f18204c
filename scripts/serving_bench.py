"""HTTP serving throughput bench: warm QPS over keep-alive connections.

Measures the full network path (JSON + base64 wire, dynamic batching) against
the direct-engine QPS on the same corpus, reporting the serving/direct ratio
(VERDICT r1 item 10 target: >= 0.7 at bs >= 64).

Usage: python scripts/serving_bench.py [--docs 3000] [--clients 64]
"""

import argparse
import base64
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def build_engine(num_docs: int):
    from visual_rag_tpu.index.synth import synthetic_index
    from visual_rag_tpu.retrieval import RetrievalEngine

    idx = synthetic_index(num_docs, min_tokens=320, max_tokens=832,
                          pooled_rows=12)
    return RetrievalEngine(idx)


_CLIENT_SNIPPET = r"""
import http.client, json, sys, threading, time
host, port, n_threads, per_thread = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
payload = sys.stdin.buffer.read()
lat, errors = [], []
def loop():
    import socket
    conn = http.client.HTTPConnection(host, port)
    conn.connect()
    conn.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    for _ in range(per_thread):
        t0 = time.time()
        try:
            conn.request("POST", "/search", body=payload,
                         headers={"Content-Type": "application/json"})
            r = conn.getresponse(); body = r.read()
            if r.status != 200:
                errors.append(body[:200].decode("utf8", "replace")); return
        except Exception as ex:
            errors.append(repr(ex)); return
        lat.append(time.time() - t0)
    conn.close()
ts = [threading.Thread(target=loop) for _ in range(n_threads)]
[t.start() for t in ts]; [t.join() for t in ts]
print(json.dumps({"lat": lat, "errors": errors}))
"""


def run_load(host, port, payload, clients, per_client, procs=4):
    """Drive load from SUBPROCESSES: in-process client threads would steal
    the GIL from the batcher/handlers and poison the measurement."""
    import subprocess

    payload_bytes = json.dumps(payload).encode()
    per_proc_threads = max(1, clients // procs)
    workers = [subprocess.Popen(
        [sys.executable, "-c", _CLIENT_SNIPPET, str(host), str(port),
         str(per_proc_threads), str(per_client)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE)
        for _ in range(procs)]
    # feed EVERY worker's stdin up front (fits the 64KB pipe buffer) —
    # otherwise workers block on stdin until their communicate() turn and
    # the "concurrent" load runs sequentially
    for w in workers:
        w.stdin.write(payload_bytes)
        w.stdin.close()
    t0 = time.time()
    outs = []
    for w in workers:
        outs.append(json.loads(w.stdout.read()))
        w.wait()
    wall = time.time() - t0
    latencies = [x for o in outs for x in o["lat"]]
    errors = [x for o in outs for x in o["errors"]]
    return len(latencies) / wall, latencies, errors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=3000)
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--per-client", type=int, default=30)
    ap.add_argument("--max-batch", type=int, default=256)
    ap.add_argument("--max-wait-ms", type=float, default=8.0)
    ap.add_argument("--server", choices=["async", "threaded"], default="async")
    args = ap.parse_args()

    from visual_rag_tpu.serving import AsyncSearchServer, SearchServer

    engine = build_engine(args.docs)
    rng = np.random.default_rng(0)
    q = rng.standard_normal((20, 128)).astype(np.float32)

    # direct-engine reference QPS at the batcher's operating point
    queries = [q] * args.max_batch
    engine.search_embedded_batch(queries, mode="two_stage", top_k=10,
                                 prefetch_k=200, with_payload=False)
    t0 = time.time()
    for _ in range(3):
        engine.search_embedded_batch(queries, mode="two_stage", top_k=10,
                                     prefetch_k=200, with_payload=False)
    direct_qps = 3 * args.max_batch / (time.time() - t0)

    # warm every batch-size bucket the batcher can produce, or bucket
    # compiles (0.5-5 s each) land inside the measurement as p95 spikes
    engine.warmup(modes=("two_stage",),
                  batch_sizes=(1, 2, 4, 8, 16, 32, 64, 128, 256),
                  prefetch_k=200)
    cls = AsyncSearchServer if args.server == "async" else SearchServer
    server = cls(engine, max_batch=args.max_batch,
                 max_wait_ms=args.max_wait_ms)
    server.start()
    payload = {
        "embedding_b64": base64.b64encode(q.tobytes()).decode(),
        "shape": [20, 128], "dtype": "float32",
        "mode": "two_stage", "top_k": 10, "prefetch_k": 200,
    }
    # warm the HTTP path + compile
    run_load(server.host, server.port, payload, 8, 3)
    qps, lat, errors = run_load(server.host, server.port, payload,
                                args.clients, args.per_client)
    assert not errors, errors[:3]
    lat = np.asarray(lat)
    out = {
        "docs": args.docs, "clients": args.clients, "server": args.server,
        "direct_qps": round(direct_qps, 1),
        "http_qps": round(qps, 1),
        "ratio": round(qps / direct_qps, 3),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1000, 1),
        "p95_ms": round(float(np.percentile(lat, 95)) * 1000, 1),
        **{k: round(v, 1) if isinstance(v, float) else v
           for k, v in server.batcher.stats.items()},
    }
    print(json.dumps(out))
    server.stop()


if __name__ == "__main__":
    main()
