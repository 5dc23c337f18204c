"""Playground tab: collection explorer + interactive querying.

Reference: demo/ui/playground.py:15-359.
"""

from __future__ import annotations

import time

import streamlit as st

from demo.config import RETRIEVAL_MODES, STAGE1_MODES
from demo.engine_utils import get_engine, sample_points, search_collection


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
    results, q_emb = search_collection(
        state["index_dir"], state["collection"], state["model"], query,
        mode=mode, top_k=int(top_k), prefetch_k=int(prefetch_k),
        stage1_mode=stage1_mode, return_query=True)
    st.caption(f"{len(results)} results in {(time.time()-t0)*1000:.0f} ms")
    engine = get_engine(state["index_dir"], state["collection"])
    max_score = max((r.get("score_final") or 0 for r in results), default=0) or 1
    for r in results:
        payload = r.get("payload") or {}
        rel = (r.get("score_final") or 0) / max_score * 100
        with st.container(border=True):
            st.markdown(
                f"**#{r['rank']+1}** — score {r['score_final']:.4f} "
                f"(🎯 {rel:.0f}%) — {payload.get('filename', r['id'])} "
                f"p{payload.get('page_number', '?')}")
            scores = {k: v for k, v in r.items() if k.startswith("score_")}
            st.caption(", ".join(f"{k}={v:.4f}" for k, v in scores.items()))
            _render_result_media(engine, q_emb, r, payload)


def _render_result_media(engine, q_emb, result, payload):
    """Page image tabs + saliency overlay (reference playground.py:237-335)."""
    from demo.media import load_payload_image, overlay_for_result

    meta_cols = st.columns(4)
    for col, (label, key) in zip(meta_cols, [
            ("Tiles", "num_tiles"), ("Visual tokens", "num_visual_tokens"),
            ("Original", "original_width"), ("Resized", "resized_width")]):
        v = payload.get(key)
        if v is not None:
            if key.endswith("_width"):
                v = f"{v}x{payload.get(key.replace('_width', '_height'), '?')}"
            col.caption(f"{label}: {v}")

    tabs = st.tabs(["🔥 Saliency", "📷 Resized", "🖼️ Original", "✂️ Cropped"])
    with tabs[0]:
        out = overlay_for_result(engine, q_emb, result)
        if out is None:
            st.info("No stored page image / token grid for saliency")
        else:
            overlay, info = out
            st.image(overlay, width=600)
            st.caption(f"layout: {info.get('layout')}")
    for tab, kind in zip(tabs[1:], ("resized", "original", "cropped")):
        with tab:
            img = load_payload_image(payload, kind)
            url = payload.get(f"{kind}_url")
            if img is not None:
                st.image(img, width=600)
                st.caption(url)
            elif url:  # remote (e.g. Cloudinary) URL: streamlit fetches it
                st.image(url, width=600)
            else:
                st.info(f"No {kind} image available")
