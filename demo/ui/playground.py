"""Playground tab: collection explorer + interactive querying.

Reference: demo/ui/playground.py:15-359.
"""

from __future__ import annotations

import time

import streamlit as st

from demo.config import RETRIEVAL_MODES, STAGE1_MODES
from demo.engine_utils import sample_points, search_collection


def render_playground_tab(state):
    if not state["has_collection"]:
        st.info("No collection available — index something first.")
        return

    st.subheader("Collection explorer")
    with st.expander("Sample points"):
        for p in sample_points(state["index_dir"], state["collection"]):
            st.json({"id": p["id"], **{k: v for k, v in p["payload"].items()
                                       if k != "visual_token_indices"}})

    st.subheader("Query")
    query = st.text_input("Query text", "What was the budget allocation?")
    col1, col2, col3 = st.columns(3)
    mode = col1.selectbox("Mode", RETRIEVAL_MODES)
    top_k = col2.number_input("top_k", 1, 100, 10)
    prefetch_k = col3.number_input("prefetch_k (two-stage)", 10, 2000, 200)
    stage1_mode = st.selectbox("Stage-1 mode (two-stage)", STAGE1_MODES)
    if not st.button("Search"):
        return
    t0 = time.time()
    results = search_collection(
        state["index_dir"], state["collection"], state["model"], query,
        mode=mode, top_k=int(top_k), prefetch_k=int(prefetch_k),
        stage1_mode=stage1_mode)
    st.caption(f"{len(results)} results in {(time.time()-t0)*1000:.0f} ms")
    for r in results:
        payload = r.get("payload") or {}
        with st.container(border=True):
            st.markdown(
                f"**#{r['rank']+1}** — score {r['score_final']:.4f} — "
                f"{payload.get('filename', r['id'])} "
                f"p{payload.get('page_number', '?')}")
            scores = {k: v for k, v in r.items() if k.startswith("score_")}
            st.caption(", ".join(f"{k}={v:.4f}" for k, v in scores.items()))
