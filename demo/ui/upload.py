"""Upload tab: PDF -> index with live progress (reference demo/ui/upload.py)."""

from __future__ import annotations

import tempfile
from pathlib import Path

import streamlit as st

from demo.engine_utils import get_embedder


def render_upload_tab(state):
    st.subheader("Upload PDFs and index them")
    if not state["has_collection"]:
        st.info("Pick or create a collection in the sidebar; a new one is "
                "created on first upload.")
    files = st.file_uploader("PDF files", type=["pdf"], accept_multiple_files=True)
    crop = st.checkbox("Crop empty borders", value=False)
    strategy = st.selectbox("Strategy", ["pooling", "standard", "all"])
    if not files or not st.button("Index uploaded PDFs"):
        return

    from visual_rag_tpu.index import CollectionSchema, IndexBuilder
    from visual_rag_tpu.index.builder import VectorSpec
    from visual_rag_tpu.pipeline import CropEmptyConfig, ProcessingPipeline
    from visual_rag_tpu.pipeline.pipeline import experimental_vector_plan

    embedder = get_embedder(state["model"])
    coll_path = Path(state["index_dir"]) / state["collection"]
    if (coll_path / "schema.json").exists():
        builder = IndexBuilder.load(coll_path)
    else:
        plan = experimental_vector_plan(embedder.backend)
        dim = embedder.cfg.embed_dim
        vectors = {
            "initial": VectorSpec("initial", "ragged", dim),
            "mean_pooling": VectorSpec("mean_pooling", "padded", dim),
            "global_pooling": VectorSpec("global_pooling", "single", dim),
            **{n: VectorSpec(n, "padded", dim) for n in plan["names"]},
        }
        builder = IndexBuilder(CollectionSchema(vectors=vectors))
    from visual_rag_tpu.pipeline import LocalImageStore

    # page images stored beside the collection -> playground renders pages
    # + saliency overlays from the payload URLs
    pipeline = ProcessingPipeline(
        embedder, builder, strategy=strategy,
        crop_config=CropEmptyConfig() if crop else None,
        image_uploader=LocalImageStore(root=str(coll_path / "image_store")))

    progress = st.progress(0.0)
    status = st.empty()
    for fi, file in enumerate(files):
        with tempfile.NamedTemporaryFile(suffix=".pdf", delete=False) as tmp:
            tmp.write(file.getvalue())
            tmp_path = tmp.name
        status.write(f"Processing {file.name} …")
        stats = pipeline.process_pdf(
            tmp_path,
            metadata={"filename": file.name},
            progress_callback=lambda done, total: progress.progress(
                (fi + done / max(total, 1)) / len(files)))
        status.write(
            f"{file.name}: {stats.pages_processed} pages indexed, "
            f"{stats.pages_skipped} skipped, {stats.pages_failed} failed")
    builder.save(coll_path)
    progress.progress(1.0)
    st.success(f"Saved collection to {coll_path} ({len(builder)} points)")
