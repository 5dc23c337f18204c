"""Headless media data path for the playground: page images + saliency.

Everything streamlit-free so the pipeline (result -> page image -> saliency
overlay) is unit-testable; demo/ui/playground.py is a thin rendering shell
over these functions. Reference behavior: demo/ui/playground.py:237-335
renders payload image URLs, and the demo uses
visual_rag/visualization/saliency.py overlays on top of them.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple
from urllib.parse import unquote, urlparse

import numpy as np

from visual_rag_tpu.visualization.saliency import (
    create_saliency_overlay,
    generate_saliency_map,
)

IMAGE_KINDS = ("resized", "cropped", "original")


def payload_image_path(payload: Dict[str, Any],
                       kind: Optional[str] = None) -> Optional[Path]:
    """Local filesystem path of a stored page image, if any.

    LocalImageStore writes file:// URIs into {original,cropped,resized}_url;
    Cloudinary URLs (https) have no local path and return None. ``kind=None``
    prefers resized -> cropped -> original (the resized canvas is what the
    embedder saw, so saliency grids align with it).
    """
    kinds = (kind,) if kind else IMAGE_KINDS
    for k in kinds:
        url = payload.get(f"{k}_url")
        if not url:
            continue
        parsed = urlparse(str(url))
        if parsed.scheme == "file":
            p = Path(unquote(parsed.path))
        elif parsed.scheme in ("", None):
            p = Path(str(url))
        else:
            continue  # remote URL: the UI can pass it to st.image directly
        if p.is_file():
            return p
    return None


def load_payload_image(payload: Dict[str, Any], kind: Optional[str] = None):
    """PIL image for a result payload, or None when nothing is stored."""
    p = payload_image_path(payload, kind)
    if p is None:
        return None
    from PIL import Image

    return Image.open(p).convert("RGB")


def doc_token_matrix(engine, doc_id: str) -> Optional[np.ndarray]:
    """[n_tokens, dim] stored ``initial`` vectors for one doc (f32).

    Pulled straight from the sealed ragged store — the playground never
    re-embeds pages to draw saliency (the reference reads them back from
    Qdrant with with_vectors=["initial"] the same way).
    """
    idx = engine.index.manifest.index_of(doc_id)
    if idx is None:
        return None
    store = engine.index.store(engine.full_vector_name)
    off = int(np.asarray(store.offsets[idx]))
    ln = int(np.asarray(store.lengths[idx]))
    if ln == 0:
        return None
    rows = np.asarray(store.flat[off: off + ln], dtype=np.float32)
    if store.scales is not None:  # int8 storage: dequantize per-doc scale
        rows = rows * float(np.asarray(store.scales[idx]))
    return rows


def saliency_for_result(
    engine,
    query_embedding: np.ndarray,
    result: Dict[str, Any],
) -> Optional[Tuple[np.ndarray, Dict[str, Any]]]:
    """Saliency grid for one search result, from stored vectors + payload
    grid provenance (n_rows/n_cols for ColSmol tiles, grid_*_eff for ColQwen).
    """
    payload = result.get("payload") or {}
    tokens = doc_token_matrix(engine, result["id"])
    if tokens is None:
        return None
    n_rows = payload.get("n_rows")
    n_cols = payload.get("n_cols")
    if not (n_rows and n_cols):
        gh, gw = payload.get("grid_h_eff"), payload.get("grid_w_eff")
        if gh and gw and int(gh) * int(gw) == tokens.shape[0]:
            q = np.asarray(query_embedding, dtype=np.float32)
            qn = q / (np.linalg.norm(q, axis=-1, keepdims=True) + 1e-8)
            dn = tokens / (np.linalg.norm(tokens, axis=-1, keepdims=True) + 1e-8)
            per = (qn @ dn.T).max(axis=0)
            lo, hi = float(per.min()), float(per.max())
            per = (per - lo) / (hi - lo) if hi > lo else np.zeros_like(per)
            return per.reshape(int(gh), int(gw)), {
                "layout": "grid", "rows": int(gh), "cols": int(gw)}
    return generate_saliency_map(query_embedding, tokens,
                                 n_rows=n_rows, n_cols=n_cols)


def overlay_for_result(
    engine,
    query_embedding: np.ndarray,
    result: Dict[str, Any],
    image=None,
    alpha: float = 0.45,
    threshold_percentile: float = 70.0,
    colormap: str = "jet",
):
    """(PIL overlay image, saliency info) for a result, or None.

    ``image=None`` loads the stored page image from the payload (resized
    preferred — it is the canvas the patch grid maps onto).
    """
    payload = result.get("payload") or {}
    if image is None:
        image = load_payload_image(payload)
    if image is None:
        return None
    sal = saliency_for_result(engine, query_embedding, result)
    if sal is None:
        return None
    grid, info = sal
    overlay = create_saliency_overlay(
        image, grid, alpha=alpha,
        threshold_percentile=threshold_percentile, colormap=colormap)
    return overlay, info
