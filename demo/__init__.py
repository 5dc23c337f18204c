"""Streamlit demo app (upload / playground / benchmark tabs).

Mirrors the reference demo/ package (SURVEY §2.2) against the TPU-native
engine. Streamlit is an optional dependency: `pip install 'visual-rag-tpu[ui]'`
then `visual-rag-tpu-demo` or `python -m demo.runner`.
"""
