"""Benchmark tab: indexing + evaluation runners (reference demo/ui/benchmark.py).

Builds the equivalent shell command for reproducibility (reference
demo/commands.py) and can run the evaluation inline with live metrics.
"""

from __future__ import annotations

import shlex

import streamlit as st

from demo.config import BENCHMARK_DATASETS, DATASET_STATS, RETRIEVAL_MODES


def _build_command(args: dict) -> str:
    """Equivalent CLI command (reference demo/commands.py)."""
    parts = ["python", "-m", "benchmarks.run_tpu_beir",
             "--datasets", *args["datasets"],
             "--collection", args["collection"],
             "--model", args["model"],
             "--mode", args["mode"],
             "--prefetch-k", str(args["prefetch_k"]),
             "--evaluation-scope", args["scope"]]
    if args.get("index"):
        parts.append("--index")
    if args.get("evaluate"):
        parts.append("--evaluate")
    return " ".join(shlex.quote(p) for p in parts)


def render_benchmark_tab(state):
    st.subheader("ViDoRe v2 benchmarking")
    datasets = st.multiselect("Datasets", BENCHMARK_DATASETS,
                              default=BENCHMARK_DATASETS[:1])
    for d in datasets:
        stats = DATASET_STATS.get(d)
        if stats:
            st.caption(f"{d}: {stats['docs']} docs / {stats['queries']} queries")
    col1, col2, col3 = st.columns(3)
    mode = col1.selectbox("Mode", RETRIEVAL_MODES, key="bench_mode")
    prefetch_k = col2.number_input("prefetch_k", 10, 2000, 200, key="bench_pk")
    scope = col3.selectbox("Scope", ["union", "per_dataset"])
    do_index = st.checkbox("Index corpora first", value=False)

    args = {"datasets": datasets, "collection": state["collection"],
            "model": state["model"], "mode": mode, "prefetch_k": int(prefetch_k),
            "scope": scope, "index": do_index, "evaluate": True}
    st.code(_build_command(args), language="bash")

    if not datasets or not st.button("Run benchmark"):
        return
    from benchmarks.dataset_loader import load_vidore_dataset_auto
    from benchmarks.run_tpu_beir import evaluate, index_beir_corpus, make_schema_for_embedder
    from demo.engine_utils import get_embedder
    from visual_rag_tpu.index import IndexBuilder
    from visual_rag_tpu.retrieval import RetrievalEngine
    from pathlib import Path

    embedder = get_embedder(state["model"])
    coll_path = Path(state["index_dir"]) / state["collection"]
    if (coll_path / "schema.json").exists():
        builder = IndexBuilder.load(coll_path)
    else:
        builder = IndexBuilder(make_schema_for_embedder(embedder))
    progress = st.progress(0.0)
    rows = []
    for i, name in enumerate(datasets):
        ds = load_vidore_dataset_auto(name)
        if do_index:
            st.write(f"Indexing {name} …")
            stats = index_beir_corpus(ds, embedder, builder, state["collection"])
            st.write(stats)
            builder.save(coll_path)
        engine = RetrievalEngine(builder.seal())
        report = evaluate(ds, embedder, engine, state["collection"],
                          mode=mode, prefetch_k=int(prefetch_k), scope=scope)
        rows.append({"dataset": name, **report["metrics"],
                     "qps": report["qps"], "p95_ms": report["p95_latency_ms"]})
        progress.progress((i + 1) / len(datasets))
    import pandas as pd

    st.dataframe(pd.DataFrame(rows))
