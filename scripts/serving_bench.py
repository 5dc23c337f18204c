"""HTTP serving throughput bench: warm QPS over keep-alive connections.

Measures the full network path (JSON + base64 wire, dynamic batching) against
the direct-engine QPS on the same corpus, reporting the serving/direct ratio
(VERDICT r1 item 10 target: >= 0.7 at bs >= 64).

Usage: python scripts/serving_bench.py [--docs 3000] [--clients 64]
"""

import argparse
import base64
import http.client
import json
import sys
import threading
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


def client_loop(host, port, payload_bytes, n_requests, latencies, errors):
    conn = http.client.HTTPConnection(host, port)
    for _ in range(n_requests):
        t0 = time.time()
        try:
            conn.request("POST", "/search", body=payload_bytes,
                         headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            body = resp.read()
            if resp.status != 200:
                errors.append(body[:200])
                return
        except Exception as ex:  # connection died: record and bail
            errors.append(repr(ex))
            return
        latencies.append(time.time() - t0)
    conn.close()


def run_load(host, port, payload, clients, per_client):
    payload_bytes = json.dumps(payload).encode()
    latencies: list = []
    errors: list = []
    threads = [threading.Thread(
        target=client_loop,
        args=(host, port, payload_bytes, per_client, latencies, errors))
        for _ in range(clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    return len(latencies) / wall, latencies, errors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=3000)
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--per-client", type=int, default=30)
    ap.add_argument("--max-batch", type=int, default=256)
    ap.add_argument("--max-wait-ms", type=float, default=8.0)
    args = ap.parse_args()

    from visual_rag_tpu.serving import SearchServer

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

    server = SearchServer(engine, max_batch=args.max_batch,
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
        "docs": args.docs, "clients": args.clients,
        "direct_qps": round(direct_qps, 1),
        "http_qps": round(qps, 1),
        "ratio": round(qps / direct_qps, 3),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1000, 1),
        "p95_ms": round(float(np.percentile(lat, 95)) * 1000, 1),
        "batches": server.batcher.stats["batches"],
        "max_batch_seen": server.batcher.stats["max_batch_seen"],
    }
    print(json.dumps(out))
    server.stop()


if __name__ == "__main__":
    main()
