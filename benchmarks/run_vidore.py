"""Self-contained in-memory ViDoRe evaluation (no persisted collection).

Reference: benchmarks/run_vidore.py:34-155 — loads a paired ViDoRe v1 dataset,
embeds pages + queries, and compares exhaustive MaxSim vs two-stage entirely
in memory. The artificial 1:1 qrels caveat from the reference's protocol doc
(benchmarks/benchmark_datasets.txt:44-56) applies here too.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks.dataset_loader import load_vidore_dataset_auto
from benchmarks.run_tpu_beir import index_beir_corpus, make_schema_for_embedder
from visual_rag_tpu.index import IndexBuilder
from visual_rag_tpu.retrieval import RetrievalEngine
from visual_rag_tpu.utils.metrics import mrr_at_k, ndcg_at_k, recall_at_k

V1_DATASETS = [
    "vidore/docvqa_test_subsampled",
    "vidore/infovqa_test_subsampled",
    "vidore/tabfquad_test_subsampled",
    "vidore/arxivqa_test_subsampled",
    "vidore/shiftproject_test",
    "vidore/tatdqa_test",
]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default=V1_DATASETS[0])
    ap.add_argument("--model", default="vidore/colSmol-500M")
    ap.add_argument("--max-docs", type=int, default=None)
    ap.add_argument("--sample-queries", type=int, default=None)
    ap.add_argument("--prefetch-k", type=int, default=100)
    args = ap.parse_args(argv)

    from visual_rag_tpu.models.embedder import VisualEmbedder

    embedder = VisualEmbedder(args.model)
    ds = load_vidore_dataset_auto(args.dataset)
    builder = IndexBuilder(make_schema_for_embedder(embedder))
    stats = index_beir_corpus(ds, embedder, builder, "inmem",
                              max_corpus_docs=args.max_docs)
    print(f"indexed {stats['indexed']} pages ({stats['failed']} failed)")
    engine = RetrievalEngine(builder.seal())

    from benchmarks.run_tpu_beir import remap_and_prune_qrels

    qrels = remap_and_prune_qrels(ds, "inmem", engine.index.manifest)
    queries = [q for q in ds.queries if q.query_id in qrels]
    if args.sample_queries:
        queries = queries[: args.sample_queries]
    q_embs = embedder.embed_queries([q.text for q in queries])

    for mode, kw in (("single_full", {}), ("two_stage", {"prefetch_k": args.prefetch_k})):
        t0 = time.time()
        res = engine.search_embedded_batch(q_embs, mode=mode, top_k=10,
                                           with_payload=False, **kw)
        dt = time.time() - t0
        rankings = [[r["id"] for r in row] for row in res]
        print(f"{mode:12s} "
              f"ndcg@5={np.mean([ndcg_at_k(r, qrels[q.query_id], 5) for r, q in zip(rankings, queries)]):.4f} "
              f"mrr@10={np.mean([mrr_at_k(r, qrels[q.query_id], 10) for r, q in zip(rankings, queries)]):.4f} "
              f"recall@10={np.mean([recall_at_k(r, qrels[q.query_id], 10) for r, q in zip(rankings, queries)]):.4f} "
              f"({dt/max(len(queries),1)*1000:.2f} ms/q)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
