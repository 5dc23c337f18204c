"""Evaluation runner with LIVE per-query metric streaming.

Reference demo/evaluation.py:96-302 runs the BEIR evaluation inline with the
UI, streaming running NDCG/latency per query and finishing with p95/QPS; this
is the TPU-stack equivalent. The UI surface is injected (``ui=``) so tests
drive it headlessly and the streamlit tab passes ``st`` straight through.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List


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
    evaluation DELEGATED to benchmarks.run_tpu_beir.evaluate (the metric loop
    lives only there, so demo numbers can never drift from harness numbers)
    with a progress callback streaming running metrics, 4) final summary +
    JSON reports.
    """
    if ui is None:  # pragma: no cover - UI path
        import streamlit as ui  # type: ignore

    from benchmarks.dataset_loader import load_vidore_dataset_auto
    from benchmarks.run_tpu_beir import evaluate, write_json_atomic

    collection = config["collection"]

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
    out_dir = Path(config.get("output_dir", "results")) / collection
    for name in config.get("datasets", []):
        ds = name if not isinstance(name, str) else load_vidore_dataset_auto(name)
        ui.markdown(f"##### Phase 3: Evaluating {ds.name}")
        status = ui.empty()
        prog = ui.progress(0.0)

        def on_progress(done, total, running, _name=ds.name,
                        _status=status, _prog=prog):
            # LIVE running metrics after every batch (reference :255-302)
            _status.info(
                f"{_name}: {done}/{total} queries | running nDCG@5 "
                f"{running['ndcg@5']:.4f} | avg latency "
                f"{running['avg_latency_ms']:.1f} ms")
            _prog.progress(done / max(total, 1))

        report = evaluate(
            ds, embedder, engine, collection,
            mode=config.get("mode", "two_stage"),
            stage1_mode=config.get("stage1_mode", "tokens_vs_standard_pooling"),
            prefetch_k=config.get("prefetch_k", 200),
            stage1_k=config.get("stage1_k", 1000),
            stage2_k=config.get("stage2_k", 300),
            top_k=int(config.get("top_k", 100)),
            scope=config.get("evaluation_scope", "union"),
            query_batch_size=int(config.get("query_batch_size", 32)),
            sample_queries=config.get("sample_queries"),
            progress_cb=on_progress)
        if not report.get("num_queries"):
            ui.warning(f"{ds.name}: no queries with in-collection qrels")
            continue
        report["config"] = {k: v for k, v in config.items()
                           if isinstance(v, (str, int, float, bool, list))}
        reports.append(report)
        ui.success(
            f"{ds.name}: nDCG@5 {report['metrics']['ndcg@5']:.4f} | "
            f"p95 {report['p95_latency_ms']:.1f} ms | {report['qps']:.1f} QPS")
        if config.get("save_reports", True):
            write_json_atomic(out_dir / f"demo_eval__{ds.name}.json", report)
    ui.markdown("##### Done")
    return reports
