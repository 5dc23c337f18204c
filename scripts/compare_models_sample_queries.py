"""Read-only A/B of two (model, collection) pairs on sample queries.

Reference: scripts/compare_models_sample_queries.py:1-16 — hit-rate and
per-query best-rank comparison.
"""

import argparse
import json

from _common import load_builder


def _run(index_dir, collection, model, queries, mode, top_k):
    from visual_rag_tpu.models.embedder import VisualEmbedder
    from visual_rag_tpu.retrieval import RetrievalEngine

    builder, _ = load_builder(index_dir, collection)
    engine = RetrievalEngine(builder.seal())
    embedder = VisualEmbedder(model)
    out = []
    for q in queries:
        res = engine.search_embedded(embedder.embed_query(q), mode=mode, top_k=top_k)
        out.append([r["id"] for r in res])
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index-dir", default="index_data")
    ap.add_argument("--collection-a", required=True)
    ap.add_argument("--model-a", required=True)
    ap.add_argument("--collection-b", required=True)
    ap.add_argument("--model-b", required=True)
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument("--mode", default="two_stage")
    ap.add_argument("--top-k", type=int, default=10)
    args = ap.parse_args()

    ra = _run(args.index_dir, args.collection_a, args.model_a, args.queries,
              args.mode, args.top_k)
    rb = _run(args.index_dir, args.collection_b, args.model_b, args.queries,
              args.mode, args.top_k)
    rows = []
    for q, a, b in zip(args.queries, ra, rb):
        overlap = len(set(a) & set(b))
        rows.append({"query": q, "top1_a": a[:1], "top1_b": b[:1],
                     "overlap@k": overlap, "agree_top1": a[:1] == b[:1]})
    print(json.dumps({
        "model_a": args.model_a, "model_b": args.model_b,
        "top1_agreement": sum(r["agree_top1"] for r in rows) / max(len(rows), 1),
        "rows": rows,
    }, indent=2))


if __name__ == "__main__":
    main()
