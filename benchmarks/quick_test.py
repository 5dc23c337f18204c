"""End-to-end in-memory smoke test: exhaustive vs two-stage (reference parity).

Mirrors reference benchmarks/quick_test.py: build a small synthetic corpus,
embed queries, compare exhaustive MaxSim against two-stage retrieval, print
metrics@{1,3,5,10} and the speed comparison.

Run: python -m benchmarks.quick_test [--docs 200] [--queries 20]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from visual_rag_tpu.index import CollectionSchema, IndexBuilder
from visual_rag_tpu.retrieval import RetrievalEngine
from visual_rag_tpu.utils.metrics import ndcg_at_k, recall_at_k


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=200)
    parser.add_argument("--queries", type=int, default=20)
    parser.add_argument("--prefetch-k", type=int, default=20)
    parser.add_argument("--dim", type=int, default=128)
    args = parser.parse_args(argv)

    rng = np.random.default_rng(0)
    d, dim = args.docs, args.dim

    # Synthetic corpus with planted signal: each query is a noisy view of one
    # doc's tokens, so retrieval quality is measurable without a model.
    builder = IndexBuilder(CollectionSchema.standard(storage_dtype="float32", dim=dim))
    doc_tokens = []
    for i in range(d):
        t = rng.standard_normal((int(rng.integers(32, 128)), dim)).astype(np.float32)
        doc_tokens.append(t)
        mp = t[: (t.shape[0] // 8) * 8].reshape(-1, 8, dim).mean(axis=1)
        builder.add(f"doc{i}", {
            "initial": t, "mean_pooling": mp,
            "experimental_pooling": mp, "global_pooling": t.mean(axis=0)})
    engine = RetrievalEngine(builder.seal(), compute_dtype="float32")

    queries, qrels = [], []
    for qi in range(args.queries):
        target = int(rng.integers(0, d))
        t = doc_tokens[target]
        idx = rng.choice(t.shape[0], size=8, replace=False)
        q = t[idx] + 0.3 * rng.standard_normal((8, dim)).astype(np.float32)
        queries.append(q.astype(np.float32))
        qrels.append({f"doc{target}": 1})

    t0 = time.time()
    full = engine.search_embedded_batch(queries, mode="single_full", top_k=10)
    t_full = time.time() - t0
    t0 = time.time()
    two = engine.search_embedded_batch(
        queries, mode="two_stage", top_k=10, prefetch_k=args.prefetch_k)
    t_two = time.time() - t0

    print(f"{'k':>4} {'ndcg_full':>10} {'ndcg_two':>10} {'recall_full':>12} {'recall_two':>11}")
    for k in (1, 3, 5, 10):
        nf = np.mean([ndcg_at_k([r["id"] for r in res], rel, k)
                      for res, rel in zip(full, qrels)])
        nt = np.mean([ndcg_at_k([r["id"] for r in res], rel, k)
                      for res, rel in zip(two, qrels)])
        rf = np.mean([recall_at_k([r["id"] for r in res], rel, k)
                      for res, rel in zip(full, qrels)])
        rt = np.mean([recall_at_k([r["id"] for r in res], rel, k)
                      for res, rel in zip(two, qrels)])
        print(f"{k:>4} {nf:>10.4f} {nt:>10.4f} {rf:>12.4f} {rt:>11.4f}")
    speedup = t_full / max(t_two, 1e-9)
    print(f"\nexhaustive: {t_full*1000:.1f} ms   two-stage: {t_two*1000:.1f} ms   "
          f"speedup: {speedup:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
