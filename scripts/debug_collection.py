"""Read-only collection debugging: counts, token stats, failure-id presence.

Reference: scripts/qdrant_debug_collection.py (exact vs approximate counts are
moot here — counts are exact by construction).
"""

import argparse
import json

import numpy as np

from _common import load_builder


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index-dir", default="index_data")
    ap.add_argument("--collection", required=True)
    ap.add_argument("--failure-log", help="JSONL of failures to check presence for")
    args = ap.parse_args()
    builder, _ = load_builder(args.index_dir, args.collection)
    index = builder.seal()
    init = index.store("initial")
    lengths = np.asarray(init.lengths)
    report = {
        "points_count": index.num_docs,
        "total_tokens": int(lengths.sum()),
        "tokens_per_doc": {
            "min": int(lengths.min()) if lengths.size else 0,
            "max": int(lengths.max()) if lengths.size else 0,
            "mean": float(lengths.mean()) if lengths.size else 0.0,
        },
        "index_nbytes": index.nbytes(),
        "vector_names": index.vector_names,
    }
    if args.failure_log:
        from visual_rag_tpu.utils.io import read_jsonl

        recs = read_jsonl(args.failure_log)
        present = sum(1 for r in recs if r.get("point_id") in index.manifest)
        report["failure_log"] = {
            "records": len(recs),
            "now_present": present,
            "still_missing": len(recs) - present,
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
