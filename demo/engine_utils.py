"""Cached engine/embedder plumbing for the demo (reference demo/qdrant_utils.py).

All functions are streamlit-optional: with streamlit present they are cached
via st.cache_resource; without it they fall back to plain memoization so the
logic is unit-testable.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Any, Dict, List, Optional

try:
    import streamlit as st

    _cache = st.cache_resource
except Exception:  # pragma: no cover - streamlit optional
    _cache = functools.lru_cache(maxsize=8)


@_cache
def get_embedder(model_name: str):
    from visual_rag_tpu.models.embedder import VisualEmbedder

    return VisualEmbedder(model_name)


@_cache
def get_engine(index_dir: str, collection: str):
    from visual_rag_tpu.index import IndexBuilder
    from visual_rag_tpu.retrieval import RetrievalEngine

    builder = IndexBuilder.load(Path(index_dir) / collection)
    return RetrievalEngine(builder.seal())


def list_collections(index_dir: str) -> List[str]:
    root = Path(index_dir)
    if not root.is_dir():
        return []
    return sorted(p.name for p in root.iterdir() if (p / "schema.json").exists())


def collection_stats(index_dir: str, collection: str) -> Dict[str, Any]:
    engine = get_engine(index_dir, collection)
    return engine.index.info()


def sample_points(index_dir: str, collection: str, n: int = 5) -> List[Dict[str, Any]]:
    engine = get_engine(index_dir, collection)
    manifest = engine.index.manifest
    return [
        {"id": manifest.ids[i], "payload": manifest.payload(i)}
        for i in range(min(n, len(manifest)))
    ]


def search_collection(
    index_dir: str,
    collection: str,
    model_name: str,
    query: str,
    mode: str = "two_stage",
    top_k: int = 10,
    prefetch_k: Optional[int] = None,
    stage1_mode: str = "pooled_query_vs_standard_pooling",
    stage1_k: int = 1000,
    stage2_k: int = 300,
    return_query: bool = False,
):
    embedder = get_embedder(model_name)
    engine = get_engine(index_dir, collection)
    q = embedder.embed_query(query)
    results = engine.search_embedded(
        q, mode=mode, top_k=top_k, prefetch_k=prefetch_k,
        stage1_mode=stage1_mode, stage1_k=stage1_k, stage2_k=stage2_k)
    # the playground needs the query embedding back for saliency overlays
    return (results, q) if return_query else results
