"""Benchmark tab: indexing + evaluation runners (reference demo/ui/benchmark.py).

Thin widget layer: the command strings / Python snippets come from
demo/commands.py and the phased runners live in demo/indexing.py and
demo/evaluation.py (live per-query metric streaming) — all headless-testable.
"""

from __future__ import annotations

import streamlit as st

from demo.commands import (
    build_eval_command,
    build_index_command,
    generate_python_eval_code,
    generate_python_index_code,
)
from demo.config import BENCHMARK_DATASETS, DATASET_STATS, RETRIEVAL_MODES


def render_benchmark_tab(state):
    st.subheader("ViDoRe v2 benchmarking")
    run_tab, results_tab = st.tabs(["Run", "Results"])
    with results_tab:
        from demo.results import render_results_section

        render_results_section(st, state.get("output_dir", "results"))
    with run_tab:
        _render_run_section(state)


def _render_run_section(state):
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

    config = {
        "datasets": datasets, "collection": state["collection"],
        "model": state["model"], "mode": mode, "prefetch_k": int(prefetch_k),
        "evaluation_scope": scope, "index_dir": state["index_dir"],
    }
    cmd_tab, py_tab = st.tabs(["Shell command", "Python code"])
    with cmd_tab:
        if do_index:
            st.code(build_index_command(config), language="bash")
        st.code(build_eval_command(config), language="bash")
    with py_tab:
        if do_index:
            st.code(generate_python_index_code(config), language="python")
        st.code(generate_python_eval_code(config), language="python")

    if not datasets or not st.button("Run benchmark"):
        return
    from demo.engine_utils import get_embedder
    from demo.evaluation import run_evaluation_with_ui
    from demo.indexing import run_indexing_with_ui

    embedder = get_embedder(state["model"])
    if do_index:
        run_indexing_with_ui(config, ui=st, embedder=embedder)
    reports = run_evaluation_with_ui(config, ui=st, embedder=embedder)
    if reports:
        import pandas as pd

        st.dataframe(pd.DataFrame([
            {"dataset": r["dataset"], **{k: v for k, v in r["metrics"].items()
                                         if k in ("ndcg@5", "ndcg@10", "recall@10")},
             "qps": r["qps"], "p95_ms": r["p95_latency_ms"]}
            for r in reports]))
