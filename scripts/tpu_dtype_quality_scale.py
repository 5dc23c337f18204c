"""At-scale dtype quality: int8 / int8_refined vs a bf16 twin at 100k docs
(VERDICT r4 #5).

The 300-doc near-tie protocol (scripts/run_baseline_configs.py::
dtype_quality_column) is the only dtype-quality evidence through r4, but the
dtype whose value proposition is memory halving matters at 100k+. This script
plants relevance clusters at scale ON DEVICE (index/synth.py::
synthetic_planted_index — docs sharing a cluster are near-ties, each query
has exactly one right answer), builds bf16 / int8 / int8_refined twins of the
SAME underlying vectors, and measures:

  * top-10 overlap + top-1 agreement + score MAE vs the bf16 twin
    (benchmarks.run_tpu_beir.dtype_ranking_quality — same columns as the
    toy protocol), and
  * nDCG@5 against the planted qrels for every dtype incl. bf16 itself.

Results are appended as an ``at_scale`` section to
results/baseline_configs/config4.json (the dtype-quality config) and printed
as one JSON line. Reference dtype concern: collection-scale autodetect in
run_qdrant_beir.py:1531-1561.

Usage: python scripts/tpu_dtype_quality_scale.py [--docs 100000]
"""

import argparse
import gc
import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

if os.environ.get("VISUALRAG_PLATFORM"):
    os.environ["JAX_PLATFORMS"] = os.environ["VISUALRAG_PLATFORM"]
    import jax

    jax.config.update("jax_platforms", os.environ["VISUALRAG_PLATFORM"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100000)
    ap.add_argument("--clusters", type=int, default=2000)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--seed", type=int, default=41)
    ap.add_argument("--out", default=str(REPO / "results/baseline_configs/config4.json"))
    args = ap.parse_args()

    from benchmarks.run_tpu_beir import dtype_ranking_quality
    from visual_rag_tpu.index.synth import planted_queries, synthetic_planted_index
    from visual_rag_tpu.retrieval import RetrievalEngine
    from visual_rag_tpu.utils.metrics import ndcg_at_k

    kw = dict(mode="two_stage", top_k=10, prefetch_k=200, with_payload=False)
    shape = dict(num_docs=args.docs, clusters=args.clusters, min_tokens=128,
                 max_tokens=256, pooled_rows=12, seed=args.seed)

    def ndcg5(engine, queries, qrels):
        res = engine.search_embedded_batch(queries, **kw)
        return float(np.mean([
            ndcg_at_k([h["id"] for h in r], qrels[f"q{j}"], 5)
            for j, r in enumerate(res)]))

    t0 = time.time()
    idx_ref, lat = synthetic_planted_index(storage_dtype="bfloat16", **shape)
    eng_ref = RetrievalEngine(idx_ref)
    queries, qrels = planted_queries(lat, args.queries, seed=args.seed + 1)
    print(f"# bf16 twin built @{args.docs} ({time.time()-t0:.0f}s)",
          file=sys.stderr, flush=True)

    out = {
        "protocol": (
            f"planted near-tie corpus at scale ({args.docs} docs, "
            f"{args.clusters} clusters, {args.queries} queries, 128-256 "
            f"tokens/doc), two_stage prefetch=200 top_k=10, reference = "
            "bfloat16 twin of the same vectors; nDCG@5 vs planted qrels"),
        "bfloat16": {"ndcg_at_5": round(ndcg5(eng_ref, queries, qrels), 4)},
    }
    print(f"# bf16 ndcg@5 = {out['bfloat16']['ndcg_at_5']}",
          file=sys.stderr, flush=True)

    for dtype in ("int8", "int8_refined"):
        t0 = time.time()
        idx_t, _ = synthetic_planted_index(storage_dtype=dtype, latents=lat,
                                           **shape)
        eng_t = RetrievalEngine(idx_t)
        col = dtype_ranking_quality(eng_t, eng_ref, queries,
                                    **{k: v for k, v in kw.items()
                                       if k not in ("top_k", "with_payload")})
        col["ndcg_at_5"] = round(ndcg5(eng_t, queries, qrels), 4)
        col["build_s"] = round(time.time() - t0, 1)
        out[dtype] = col
        print(f"# {dtype}: {json.dumps(col)}", file=sys.stderr, flush=True)
        del idx_t, eng_t
        gc.collect()

    # fold into config4.json (atomic, preserving existing content)
    path = Path(args.out)
    try:
        rec = json.loads(path.read_text())
    except Exception:
        rec = {}
    rec["at_scale"] = out
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=str(path.parent), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(rec, f, indent=1)
    os.replace(tmp, path)
    print(json.dumps({"at_scale": out}))


if __name__ == "__main__":
    main()
