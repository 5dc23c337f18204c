"""Union vs per_dataset evaluation: how much do cross-dataset distractors hurt.

Reference: scripts/compare_eval_scopes.py:1-20. Runs both scopes with the same
config and prints per-metric deltas.
"""

import argparse
import json

from _common import load_builder


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index-dir", default="index_data")
    ap.add_argument("--collection", required=True)
    ap.add_argument("--datasets", nargs="+", required=True)
    ap.add_argument("--model", default="vidore/colSmol-500M")
    ap.add_argument("--mode", default="two_stage")
    ap.add_argument("--prefetch-k", type=int, default=200)
    ap.add_argument("--sample-queries", type=int, default=None)
    args = ap.parse_args()

    from benchmarks.dataset_loader import load_vidore_dataset_auto
    from benchmarks.run_tpu_beir import evaluate
    from visual_rag_tpu.models.embedder import VisualEmbedder
    from visual_rag_tpu.retrieval import RetrievalEngine

    builder, _ = load_builder(args.index_dir, args.collection)
    engine = RetrievalEngine(builder.seal())
    embedder = VisualEmbedder(args.model)
    for name in args.datasets:
        ds = load_vidore_dataset_auto(name)
        reports = {}
        for scope in ("union", "per_dataset"):
            reports[scope] = evaluate(
                ds, embedder, engine, args.collection, mode=args.mode,
                prefetch_k=args.prefetch_k, scope=scope,
                sample_queries=args.sample_queries)
        deltas = {
            k: reports["per_dataset"]["metrics"][k] - reports["union"]["metrics"][k]
            for k in reports["union"]["metrics"]
        }
        print(json.dumps({
            "dataset": name,
            "union": reports["union"]["metrics"],
            "per_dataset": reports["per_dataset"]["metrics"],
            "delta_per_dataset_minus_union": deltas,
        }, indent=2))


if __name__ == "__main__":
    main()
