"""Query token-count statistics (reference: scripts/query_token_stats.py)."""

import argparse
import json

import numpy as np

import _common  # noqa: F401


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="vidore/colSmol-500M")
    ap.add_argument("--queries", nargs="+", help="inline queries")
    ap.add_argument("--dataset", help="or a ViDoRe dataset to pull queries from")
    ap.add_argument("--sample", type=int, default=100)
    args = ap.parse_args()

    from visual_rag_tpu.models.embedder import VisualEmbedder

    texts = list(args.queries or [])
    if args.dataset:
        from benchmarks.dataset_loader import load_vidore_dataset_auto

        ds = load_vidore_dataset_auto(args.dataset)
        texts += [q.text for q in ds.queries[: args.sample]]
    if not texts:
        raise SystemExit("provide --queries or --dataset")
    embedder = VisualEmbedder(args.model)
    counts = np.array([e.shape[0] for e in embedder.embed_queries(texts)])
    print(json.dumps({
        "model": args.model,
        "n_queries": len(texts),
        "tokens": {
            "min": int(counts.min()), "max": int(counts.max()),
            "mean": float(counts.mean()), "p50": float(np.median(counts)),
            "p95": float(np.percentile(counts, 95)),
        },
    }, indent=2))


if __name__ == "__main__":
    main()
