"""Evaluation runner with LIVE per-query metric streaming.

Reference demo/evaluation.py:96-302 runs the BEIR evaluation inline with the
UI, streaming running NDCG/latency per query and finishing with p95/QPS; this
is the TPU-stack equivalent. The UI surface is injected (``ui=``) so tests
drive it headlessly and the streamlit tab passes ``st`` straight through.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np


class HeadlessUI:
    """Minimal stand-in for the streamlit module (headless runs + tests)."""

    def __init__(self) -> None:
        self.events: List[tuple] = []

    def _log(self, kind, *a):
        self.events.append((kind, *a))

    def markdown(self, text):
        self._log("markdown", text)

    def info(self, text):
        self._log("info", text)

    def success(self, text):
        self._log("success", text)

    def warning(self, text):
        self._log("warning", text)

    def write(self, obj):
        self._log("write", obj)

    def caption(self, text):
        self._log("caption", text)

    def progress(self, value):
        self._log("progress", value)
        return self

    def empty(self):
        return self

    def container(self):
        return self

    def dataframe(self, df):
        self._log("dataframe", df)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _load_engine(config: Dict[str, Any], builder):
    index = builder.seal()
    n_shards = int(config.get("num_shards", 1))
    if n_shards > 1:
        from visual_rag_tpu.parallel import ShardedEngine, ShardedIndex, make_mesh

        mesh = make_mesh((n_shards,), ("data",))
        return ShardedEngine(ShardedIndex.from_index(index, mesh))
    from visual_rag_tpu.retrieval import RetrievalEngine

    return RetrievalEngine(index)


def run_evaluation_with_ui(config: Dict[str, Any], ui=None,
                           embedder=None, builder=None) -> List[Dict[str, Any]]:
    """Phased evaluation with live per-batch NDCG/latency (reference :96-302).

    Phases: 1) model, 2) engine over the saved collection, 3) per-dataset
    query loop streaming running metrics, 4) final table + JSON reports.
    Returns the list of per-dataset report dicts.
    """
    if ui is None:  # pragma: no cover - UI path
        import streamlit as ui  # type: ignore

    from benchmarks.dataset_loader import load_vidore_dataset_auto
    from benchmarks.run_tpu_beir import remap_and_prune_qrels, write_json_atomic
    from visual_rag_tpu.retrieval import build_filter
    from visual_rag_tpu.utils.metrics import mrr_at_k, ndcg_at_k, recall_at_k

    collection = config["collection"]
    mode = config.get("mode", "two_stage")
    scope = config.get("evaluation_scope", "union")
    top_k = int(config.get("top_k", 100))
    batch_size = int(config.get("query_batch_size", 32))
    k_values = tuple(config.get("k_values", (1, 5, 10, 100)))
    search_kw = dict(
        mode=mode, top_k=top_k,
        prefetch_k=config.get("prefetch_k", 200),
        stage1_mode=config.get("stage1_mode", "tokens_vs_standard_pooling"),
        stage1_k=config.get("stage1_k", 1000),
        stage2_k=config.get("stage2_k", 300),
        with_payload=False)

    ui.markdown("##### Phase 1: Loading model")
    if embedder is None:  # pragma: no cover - heavy path, tests inject
        from visual_rag_tpu.models.embedder import VisualEmbedder

        embedder = VisualEmbedder(config.get("model", "vidore/colSmol-500M"))
    ui.success(f"Model ready: {getattr(embedder, 'model_name', 'embedder')}")

    ui.markdown("##### Phase 2: Loading collection")
    if builder is None:  # pragma: no cover - tests inject a live builder
        from visual_rag_tpu.index import IndexBuilder

        builder = IndexBuilder.load(
            Path(config.get("index_dir", "indexes")) / collection)
    engine = _load_engine(config, builder)
    ui.success(f"Engine ready: {engine.index.num_docs} docs")

    reports: List[Dict[str, Any]] = []
    datasets = config.get("datasets", [])
    out_dir = Path(config.get("output_dir", "results")) / collection
    for name in datasets:
        ui.markdown(f"##### Phase 3: Evaluating {name}")
        ds = name if not isinstance(name, str) else load_vidore_dataset_auto(name)
        name = ds.name
        qrels = remap_and_prune_qrels(ds, collection, engine.index.manifest)
        queries = [q for q in ds.queries if q.query_id in qrels]
        if config.get("sample_queries"):
            queries = queries[: int(config["sample_queries"])]
        if not queries:
            ui.warning(f"{name}: no queries with in-collection qrels")
            continue
        filter_obj = (build_filter(extra={"dataset": ds.name})
                      if scope == "per_dataset" else None)
        q_embs = embedder.embed_queries([q.text for q in queries])

        per_query: Dict[str, List[float]] = {
            f"{m}@{k}": [] for m in ("ndcg", "mrr", "recall") for k in k_values}
        latencies: List[float] = []
        status = ui.empty()
        prog = ui.progress(0.0)
        t_search = time.time()
        for s in range(0, len(queries), batch_size):
            chunk_q = queries[s : s + batch_size]
            t0 = time.time()
            batch_res = engine.search_embedded_batch(
                q_embs[s : s + batch_size], filter_obj=filter_obj, **search_kw)
            dt = time.time() - t0
            latencies.extend([dt / len(chunk_q)] * len(chunk_q))
            for q, res in zip(chunk_q, batch_res):
                ranking = [r["id"] for r in res]
                rels = qrels[q.query_id]
                for k in k_values:
                    per_query[f"ndcg@{k}"].append(ndcg_at_k(ranking, rels, k))
                    per_query[f"mrr@{k}"].append(mrr_at_k(ranking, rels, k))
                    per_query[f"recall@{k}"].append(recall_at_k(ranking, rels, k))
            done = min(s + batch_size, len(queries))
            # LIVE running metrics after every batch (reference :255-302)
            run_ndcg5 = float(np.mean(per_query["ndcg@5"]))
            run_lat = float(np.mean(latencies)) * 1000
            status.info(
                f"{name}: {done}/{len(queries)} queries | running nDCG@5 "
                f"{run_ndcg5:.4f} | avg latency {run_lat:.1f} ms")
            prog.progress(done / len(queries))
        search_time = time.time() - t_search
        lat = np.asarray(latencies)
        report = {
            "dataset": name, "collection": collection, "mode": mode,
            "scope": scope, "num_queries": len(queries),
            "num_docs": engine.index.num_docs,
            "metrics": {k: float(np.mean(v)) for k, v in per_query.items()},
            "avg_latency_ms": float(lat.mean() * 1000),
            "p95_latency_ms": float(np.percentile(lat, 95) * 1000),
            "qps": float(len(queries) / search_time) if search_time else 0.0,
            "config": {k: v for k, v in config.items()
                       if isinstance(v, (str, int, float, bool, list))},
        }
        reports.append(report)
        ui.success(
            f"{name}: nDCG@5 {report['metrics']['ndcg@5']:.4f} | "
            f"p95 {report['p95_latency_ms']:.1f} ms | {report['qps']:.1f} QPS")
        if config.get("save_reports", True):
            write_json_atomic(out_dir / f"demo_eval__{name}.json", report)
    ui.markdown("##### Done")
    return reports
