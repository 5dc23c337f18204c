"""prefetch_k sweep: two_stage vs the single_full exhaustive baseline.

Reference: benchmarks/vidore_tatdqa_test/sweep_eval.py:78-399 — precomputes
query embeddings once, then sweeps prefetch_k for a stage-1 mode and writes
one JSON per configuration, measuring the accuracy/latency tradeoff the
two-stage docstring claims ("5-10x faster, 95%+ accuracy").
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks.dataset_loader import load_vidore_dataset_auto
from benchmarks.run_tpu_beir import remap_and_prune_qrels
from visual_rag_tpu.index import IndexBuilder
from visual_rag_tpu.retrieval import RetrievalEngine
from visual_rag_tpu.utils.io import write_json_atomic
from visual_rag_tpu.utils.metrics import ndcg_at_k, recall_at_k


def sweep(engine, embedder, dataset, collection, *, stage1_mode, prefetch_ks,
          top_k=10, query_batch_size=32, sample_queries=None, out_dir=None):
    qrels = remap_and_prune_qrels(dataset, collection, engine.index.manifest)
    queries = [q for q in dataset.queries if q.query_id in qrels]
    if sample_queries:
        queries = queries[:sample_queries]
    q_embs = embedder.embed_queries([q.text for q in queries])

    def run(mode, pk=None):
        lat = []
        rankings = []
        for s in range(0, len(queries), query_batch_size):
            chunk = q_embs[s : s + query_batch_size]
            t0 = time.time()
            res = engine.search_embedded_batch(
                chunk, mode=mode, top_k=top_k, prefetch_k=pk,
                stage1_mode=stage1_mode, with_payload=False)
            lat.append((time.time() - t0) / len(chunk))
            rankings.extend([[r["id"] for r in row] for row in res])
        metrics = {
            f"ndcg@{k}": float(np.mean([
                ndcg_at_k(r, qrels[q.query_id], k)
                for r, q in zip(rankings, queries)]))
            for k in (5, 10)
        }
        metrics["recall@10"] = float(np.mean([
            recall_at_k(r, qrels[q.query_id], 10)
            for r, q in zip(rankings, queries)]))
        metrics["avg_latency_ms"] = float(np.mean(lat) * 1000)
        return metrics

    baseline = run("single_full")
    rows = [{"config": "single_full", **baseline}]
    for pk in prefetch_ks:
        m = run("two_stage", pk)
        m["speedup_vs_full"] = baseline["avg_latency_ms"] / max(m["avg_latency_ms"], 1e-9)
        m["ndcg@5_retention"] = (m["ndcg@5"] / baseline["ndcg@5"]) if baseline["ndcg@5"] else 1.0
        row = {"config": f"two_stage_pf{pk}", **m}
        rows.append(row)
        if out_dir:
            write_json_atomic(
                Path(out_dir) / f"sweep__{dataset.name}__{stage1_mode}__pf{pk}.json", row)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--datasets", nargs="+", required=True)
    ap.add_argument("--collection", required=True)
    ap.add_argument("--index-dir", default="index_data")
    ap.add_argument("--model", default="vidore/colSmol-500M")
    ap.add_argument("--stage1-mode", default="tokens_vs_experimental_pooling")
    ap.add_argument("--prefetch-ks", default="20,50,100,200,500")
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--sample-queries", type=int, default=None)
    ap.add_argument("--output-dir", default="results/sweeps")
    args = ap.parse_args(argv)

    from visual_rag_tpu.models.embedder import VisualEmbedder

    builder = IndexBuilder.load(Path(args.index_dir) / args.collection)
    engine = RetrievalEngine(builder.seal())
    embedder = VisualEmbedder(args.model)
    pks = [int(x) for x in args.prefetch_ks.split(",")]
    for name in args.datasets:
        ds = load_vidore_dataset_auto(name)
        rows = sweep(engine, embedder, ds, args.collection,
                     stage1_mode=args.stage1_mode, prefetch_ks=pks,
                     top_k=args.top_k, sample_queries=args.sample_queries,
                     out_dir=args.output_dir)
        print(f"\n{name} ({args.stage1_mode}):")
        for r in rows:
            extras = "".join(
                f"  {k}={r[k]:.3f}" for k in ("speedup_vs_full", "ndcg@5_retention")
                if k in r)
            print(f"  {r['config']:>20s}  ndcg@5={r['ndcg@5']:.4f}  "
                  f"lat={r['avg_latency_ms']:.2f}ms{extras}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
