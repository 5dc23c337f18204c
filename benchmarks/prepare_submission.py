"""Build a ViDoRe-leaderboard-shaped submission JSON from result files.

Reference: benchmarks/prepare_submission.py:53-132 (the HF-upload step is
kept optional/gated; the JSON shape matches the leaderboard format).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from visual_rag_tpu.utils.io import write_json_atomic


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--results-dir", required=True)
    ap.add_argument("--model", required=True)
    ap.add_argument("--output", default="submission.json")
    ap.add_argument("--metric-prefix", default="ndcg")
    args = ap.parse_args(argv)

    root = Path(args.results_dir)
    per_dataset = {}
    for path in sorted(root.rglob("*.json")):
        try:
            rec = json.loads(path.read_text())
        except json.JSONDecodeError:
            continue
        if "metrics" in rec and "dataset" in rec:
            per_dataset[rec["dataset"]] = {
                k.replace("@", "_at_"): v for k, v in rec["metrics"].items()
                if k.startswith(args.metric_prefix)
            }
    if not per_dataset:
        print(f"No result JSONs under {root}")
        return 1
    submission = {
        "model": args.model,
        "engine": "visual-rag-tpu",
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "datasets": per_dataset,
        "mean": {
            k: sum(d[k] for d in per_dataset.values()) / len(per_dataset)
            for k in next(iter(per_dataset.values()))
        },
    }
    write_json_atomic(args.output, submission)
    print(f"Wrote {args.output} covering {len(per_dataset)} datasets")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
