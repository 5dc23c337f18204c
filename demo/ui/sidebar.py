"""Sidebar: engine settings + collection stats (reference demo/ui/sidebar.py)."""

from __future__ import annotations

import streamlit as st

from demo.config import AVAILABLE_MODELS, DEFAULT_INDEX_DIR
from demo.engine_utils import collection_stats, list_collections


def render_sidebar():
    st.sidebar.header("Engine")
    index_dir = st.sidebar.text_input("Index directory", DEFAULT_INDEX_DIR)
    collections = list_collections(index_dir)
    collection = st.sidebar.selectbox(
        "Collection", collections or ["(none found)"])
    model = st.sidebar.selectbox("Model", AVAILABLE_MODELS)
    state = {"index_dir": index_dir, "collection": collection, "model": model,
             "has_collection": bool(collections)}
    if state["has_collection"]:
        try:
            stats = collection_stats(index_dir, collection)
            st.sidebar.metric("Points", stats["points_count"])
            st.sidebar.metric("Index size", f"{stats['index_nbytes']/1e6:.0f} MB")
            st.sidebar.caption("Named vectors: " + ", ".join(stats["vectors"]))
        except Exception as exc:
            st.sidebar.warning(f"Could not load collection: {exc}")
    return state
