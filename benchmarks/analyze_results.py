"""Aggregate result JSONs: exhaustive-vs-two-stage deltas + speedup table.

Reference: benchmarks/analyze_results.py:42-94.
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--results-dir", default="results")
    ap.add_argument("--metric", default="ndcg@5")
    args = ap.parse_args(argv)

    root = Path(args.results_dir)
    rows = []
    for path in sorted(root.rglob("*.json")):
        try:
            rec = json.loads(path.read_text())
        except json.JSONDecodeError:
            continue
        if "metrics" in rec and "dataset" in rec:
            rows.append({
                "file": str(path.relative_to(root)),
                "dataset": rec["dataset"],
                "mode": rec.get("mode", "?"),
                "stage1_mode": rec.get("stage1_mode", ""),
                "prefetch_k": rec.get("prefetch_k"),
                args.metric: rec["metrics"].get(args.metric),
                "avg_latency_ms": rec.get("avg_latency_ms"),
                "qps": rec.get("qps"),
            })
    if not rows:
        print(f"No result JSONs with metrics under {root}")
        return 1

    by_ds = defaultdict(list)
    for r in rows:
        by_ds[r["dataset"]].append(r)
    for ds, rs in sorted(by_ds.items()):
        print(f"\n=== {ds} ===")
        full = next((r for r in rs if r["mode"] == "single_full"), None)
        for r in sorted(rs, key=lambda x: -(x[args.metric] or 0)):
            line = (f"  {r['mode']:>12s} {str(r['stage1_mode'])[:32]:32s} "
                    f"{args.metric}={r[args.metric]:.4f}" if r[args.metric] is not None
                    else f"  {r['mode']:>12s} (no {args.metric})")
            if r.get("avg_latency_ms"):
                line += f"  lat={r['avg_latency_ms']:.2f}ms"
            if full and full is not r and full.get("avg_latency_ms") and r.get("avg_latency_ms"):
                line += f"  speedup={full['avg_latency_ms']/r['avg_latency_ms']:.2f}x"
                if full[args.metric]:
                    line += f"  retention={r[args.metric]/full[args.metric]:.3f}"
            print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
