"""Dedupe failure JSONL logs keeping the last record per doc.

Reference: scripts/dedupe_failure_logs.py.
"""

import argparse
import json

import _common  # noqa: F401

from visual_rag_tpu.utils.io import dedupe_jsonl, read_jsonl


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--key", nargs="+", default=["dataset", "source_doc_id"])
    args = ap.parse_args()
    for log in args.logs:
        before = len(read_jsonl(log))
        kept = dedupe_jsonl(log, args.key)
        print(json.dumps({"log": log, "before": before, "after": kept}))


if __name__ == "__main__":
    main()
