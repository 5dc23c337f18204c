"""Streamlit app shell: Upload / Playground / Benchmark tabs.

Reference: demo/app.py:23-52. Run with `visual-rag-tpu-demo` or
`streamlit run demo/app.py`.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import streamlit as st  # noqa: E402

from demo.ui.benchmark import render_benchmark_tab  # noqa: E402
from demo.ui.header import render_header  # noqa: E402
from demo.ui.playground import render_playground_tab  # noqa: E402
from demo.ui.sidebar import render_sidebar  # noqa: E402
from demo.ui.upload import render_upload_tab  # noqa: E402


def main():
    st.set_page_config(
        page_title="Visual RAG (TPU)", page_icon="📄", layout="wide")
    render_header()
    state = render_sidebar()
    tab_upload, tab_play, tab_bench = st.tabs(
        ["Upload & Index", "Playground", "Benchmarking"])
    with tab_upload:
        render_upload_tab(state)
    with tab_play:
        render_playground_tab(state)
    with tab_bench:
        render_benchmark_tab(state)


if __name__ == "__main__":
    main()
