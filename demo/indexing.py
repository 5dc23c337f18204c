"""Indexing runner with phased UI (reference demo/indexing.py:38).

Phases: 1) model load, 2) collection open/create, 3) per-dataset index loop
with per-dataset progress and failure counts, 4) save. UI surface injected
(``ui=``) for headless runs and tests.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List

from demo.evaluation import HeadlessUI  # noqa: F401  (re-export for callers)


def run_indexing_with_ui(config: Dict[str, Any], ui=None,
                         embedder=None, builder=None) -> List[Dict[str, Any]]:
    """Index the configured datasets into one collection; returns stats rows."""
    if ui is None:  # pragma: no cover - UI path
        import streamlit as ui  # type: ignore

    from benchmarks.dataset_loader import load_vidore_dataset_auto
    from benchmarks.run_tpu_beir import index_beir_corpus, make_schema_for_embedder

    collection = config["collection"]
    index_dir = Path(config.get("index_dir", "indexes")) / collection

    ui.markdown("##### Phase 1: Loading model")
    if embedder is None:  # pragma: no cover - heavy path, tests inject
        from visual_rag_tpu.models.embedder import VisualEmbedder

        embedder = VisualEmbedder(config.get("model", "vidore/colSmol-500M"))
    ui.success("Model ready")

    ui.markdown("##### Phase 2: Opening collection")
    if builder is None:
        from visual_rag_tpu.index import IndexBuilder

        if (index_dir / "schema.json").exists():
            builder = IndexBuilder.load(index_dir)
            ui.info(f"Resuming collection {collection} "
                    f"({len(builder.manifest)} existing points)")
        else:
            builder = IndexBuilder(make_schema_for_embedder(
                embedder, config.get("storage_dtype", "bfloat16")))
            ui.info(f"Created collection {collection}")

    rows: List[Dict[str, Any]] = []
    datasets = config.get("datasets", [])
    prog = ui.progress(0.0)
    for i, name in enumerate(datasets):
        ds = name if not isinstance(name, str) else load_vidore_dataset_auto(name)
        name = ds.name
        ui.markdown(f"##### Phase 3: Indexing {name}")
        stats = index_beir_corpus(
            ds, embedder, builder, collection,
            crop=bool(config.get("crop", False)),
            max_mean_pool_vectors=config.get("max_mean_pool_vectors", 32),
            failure_log=(Path(config.get("output_dir", "results")) / collection
                         / f"index_failures__{name}.jsonl"),
            max_corpus_docs=config.get("max_corpus_docs"))
        if stats["failed"]:
            ui.warning(f"{name}: {stats['failed']} documents failed "
                       f"(see failure log)")
        ui.success(f"{name}: indexed {stats['indexed']}, "
                   f"skipped {stats['skipped']}, failed {stats['failed']}")
        rows.append({"dataset": name, **stats})
        prog.progress((i + 1) / max(len(datasets), 1))
    if config.get("save", True):
        builder.save(index_dir)
        ui.success(f"Collection saved to {index_dir}")
    return rows
