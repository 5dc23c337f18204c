"""Results file discovery + rendering for the demo (reference demo/results.py).

Pure functions over the results directory so tests run headless; the
benchmark tab's Results section renders their output.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional


def load_results_file(path: Path) -> Optional[Dict[str, Any]]:
    try:
        with open(path, "r") as f:
            return json.load(f)
    except Exception:
        return None


def get_available_results(results_dir="results") -> List[Path]:
    """Newest-first report JSONs, skipping failure logs (reference :16-26)."""
    root = Path(results_dir)
    if not root.exists():
        return []
    out: List[Path] = []
    for f in root.rglob("*.json"):
        if "index_failures" not in f.name:
            out.append(f)
    return sorted(out, key=lambda x: x.stat().st_mtime, reverse=True)


def find_main_result_file(collection: str, mode: str,
                          results_dir="results") -> Optional[Path]:
    results = get_available_results(results_dir)
    for r in results:
        if collection not in str(r):
            continue
        if mode in r.name:  # harness filenames encode the mode
            return r
        rep = load_results_file(r)  # demo filenames don't: match content
        if isinstance(rep, dict) and rep.get("mode") == mode:
            return r
    return results[0] if results else None


def summarize_results(paths: List[Path]) -> List[Dict[str, Any]]:
    """Flatten report files into table rows (dataset, headline metrics)."""
    rows: List[Dict[str, Any]] = []
    for p in paths:
        rep = load_results_file(p)
        if not isinstance(rep, dict) or "metrics" not in rep:
            continue
        m = rep["metrics"]
        rows.append({
            "file": p.name,
            "dataset": rep.get("dataset", "?"),
            "collection": rep.get("collection", "?"),
            "mode": rep.get("mode", "?"),
            "ndcg@5": round(m.get("ndcg@5", float("nan")), 4),
            "ndcg@10": round(m.get("ndcg@10", float("nan")), 4),
            "recall@10": round(m.get("recall@10", float("nan")), 4),
            "qps": round(rep.get("qps", 0.0), 1),
            "p95_ms": round(rep.get("p95_latency_ms", 0.0), 1),
        })
    return rows


def render_results_section(st, results_dir="results"):  # pragma: no cover - UI
    paths = get_available_results(results_dir)
    if not paths:
        st.info("No saved results yet — run an evaluation first.")
        return
    rows = summarize_results(paths)
    import pandas as pd

    st.dataframe(pd.DataFrame(rows))
    pick = st.selectbox("Inspect report", [p.name for p in paths])
    chosen = next(p for p in paths if p.name == pick)
    st.json(load_results_file(chosen))
