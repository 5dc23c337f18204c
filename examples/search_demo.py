#!/usr/bin/env python3
"""Example: search a device collection with optional filters + saliency.

Two-stage retrieval (pooled prefetch -> exact MaxSim rerank) over the
in-process engine (reference examples/search_demo.py, Qdrant replaced by
RetrievalEngine).

Usage:
    python examples/search_demo.py --collection mydocs --query "budget 2021"
    python examples/search_demo.py --collection mydocs --query "budget" \
        --year 2023 --saliency
"""

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from visual_rag_tpu.index import IndexBuilder  # noqa: E402
from visual_rag_tpu.models.embedder import VisualEmbedder  # noqa: E402
from visual_rag_tpu.retrieval import RetrievalEngine, build_filter  # noqa: E402

logging.basicConfig(level=logging.INFO)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--collection", default="example_docs")
    ap.add_argument("--index-dir", default="indexes")
    ap.add_argument("--model", default="vidore/colSmol-500M")
    ap.add_argument("--query", required=True)
    ap.add_argument("--mode", default="two_stage")
    ap.add_argument("--top-k", type=int, default=5)
    ap.add_argument("--prefetch-k", type=int, default=100)
    ap.add_argument("--year", type=int, default=None)
    ap.add_argument("--source", default=None)
    ap.add_argument("--saliency", action="store_true")
    args = ap.parse_args()

    builder = IndexBuilder.load(Path(args.index_dir) / args.collection)
    engine = RetrievalEngine(builder.seal())
    embedder = VisualEmbedder(args.model)
    q = embedder.embed_query(args.query)
    f = build_filter(year=args.year, source=args.source)
    results = engine.search_embedded(
        q, mode=args.mode, top_k=args.top_k, prefetch_k=args.prefetch_k,
        filter_obj=f)
    for r in results:
        print(f"#{r['rank'] + 1}  {r['id']}  score={r['score_final']:.4f}  "
              f"{ {k: v for k, v in (r.get('payload') or {}).items() if k != 'saliency'} }")
    if args.saliency and results:
        from visual_rag_tpu.visualization import generate_saliency_map

        payload = results[0].get("payload") or {}
        print("saliency metadata keys on top hit:",
              [k for k in payload if "tile" in k or "token" in k] or "(none)")
        print(f"{generate_saliency_map.__name__}(query_emb, doc_emb, "
              "token_info) renders per-patch relevance; see "
              "visualization/saliency.py")


if __name__ == "__main__":
    main()
