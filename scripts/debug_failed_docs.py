"""Inspect an index-failure JSONL log (reference: scripts/debug_failed_docs.py)."""

import argparse
import collections
import json

import _common  # noqa: F401  (sys.path setup)

from visual_rag_tpu.utils.io import read_jsonl


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("log", help="index_failures JSONL path")
    ap.add_argument("--show", type=int, default=10)
    args = ap.parse_args()
    recs = read_jsonl(args.log)
    by_error = collections.Counter(
        (r.get("error") or "?").split("\n")[0][:80] for r in recs)
    print(json.dumps({
        "records": len(recs),
        "unique_docs": len({r.get("source_doc_id") for r in recs}),
        "top_errors": by_error.most_common(args.show),
        "latest": recs[-args.show:],
    }, indent=2, default=str))


if __name__ == "__main__":
    main()
