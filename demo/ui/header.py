"""Header component (reference demo/ui/header.py)."""

import streamlit as st


def render_header():
    st.markdown(
        """
    <div style="text-align: center; padding: 10px 0 15px 0;">
        <h1 style="font-family: Georgia, serif; font-size: 2.2rem; margin: 0;">
            visual-rag-tpu
        </h1>
        <p style="color: #666; margin-top: 5px;">
            TPU-native multi-vector visual document retrieval
            — in-process HBM index, fused Pallas kernels
        </p>
    </div>
    """,
        unsafe_allow_html=True,
    )
