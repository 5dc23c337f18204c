"""Saliency maps: which page regions matched the query.

Parity with reference visual_rag/visualization/saliency.py:
- generate_saliency_map (:17-127): L2-normalize, Q·Dᵀ, per-patch max over
  query tokens, min-max normalize, reshape onto the tile grid using
  n_rows/n_cols and 64 patches per tile (8x8 within each tile)
- create_saliency_overlay (:129-227): percentile threshold, colormap,
  per-cell alpha composite (matplotlib/PIL gated)
- visualize_search_results (:230-335): result grid figure
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

PATCHES_PER_TILE = 64
TILE_GRID = 8  # 8x8 patches inside each tile


def _l2n(x: np.ndarray) -> np.ndarray:
    return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)


def generate_saliency_map(
    query_embedding: np.ndarray,
    visual_embedding: np.ndarray,
    n_rows: Optional[int] = None,
    n_cols: Optional[int] = None,
) -> Tuple[np.ndarray, Dict[str, Any]]:
    """Per-pixel-region relevance map on the page's tile grid.

    Returns (saliency [H_patches, W_patches] in [0,1], info dict).
    """
    q = _l2n(np.asarray(query_embedding, dtype=np.float32))
    d = _l2n(np.asarray(visual_embedding, dtype=np.float32))
    sims = q @ d.T  # [nq, n_patches]
    per_patch = sims.max(axis=0)  # max over query tokens (reference :70-77)
    lo, hi = float(per_patch.min()), float(per_patch.max())
    if hi > lo:
        per_patch = (per_patch - lo) / (hi - lo)
    else:
        per_patch = np.zeros_like(per_patch)

    n_patches = per_patch.shape[0]
    if n_rows and n_cols:
        # ColSmol layout: row-major tiles of 8x8 patches + trailing global tile
        grid_tiles = int(n_rows) * int(n_cols)
        usable = min(grid_tiles * PATCHES_PER_TILE, n_patches)
        grid = np.zeros((int(n_rows) * TILE_GRID, int(n_cols) * TILE_GRID), dtype=np.float32)
        for t in range(usable // PATCHES_PER_TILE):
            tr, tc = divmod(t, int(n_cols))
            tile = per_patch[t * PATCHES_PER_TILE : (t + 1) * PATCHES_PER_TILE]
            grid[tr * TILE_GRID : (tr + 1) * TILE_GRID,
                 tc * TILE_GRID : (tc + 1) * TILE_GRID] = tile.reshape(TILE_GRID, TILE_GRID)
        info = {"layout": "tiles", "n_rows": int(n_rows), "n_cols": int(n_cols)}
        return grid, info

    side = int(round(n_patches ** 0.5))
    if side * side == n_patches:
        return per_patch.reshape(side, side), {"layout": "square", "side": side}
    # ragged fallback: single row strip
    return per_patch.reshape(1, -1), {"layout": "strip"}


def create_saliency_overlay(
    image,
    saliency: np.ndarray,
    alpha: float = 0.45,
    threshold_percentile: float = 70.0,
    colormap: str = "jet",
):
    """Overlay the saliency grid on the page image (returns PIL image).

    Cells below the percentile threshold stay transparent (reference :129-227).
    """
    try:
        import matplotlib.cm as cm
        from PIL import Image
    except Exception as exc:  # pragma: no cover
        raise ImportError("saliency overlay requires matplotlib and Pillow") from exc

    if not hasattr(image, "convert"):
        arr = np.asarray(image)
        if arr.max() <= 1.5:
            arr = arr * 255
        image = Image.fromarray(arr.astype(np.uint8))
    img = image.convert("RGBA")
    w, h = img.size

    thresh = np.percentile(saliency, threshold_percentile)
    cmap = cm.get_cmap(colormap)
    rgba = cmap(saliency)  # [H, W, 4] floats
    rgba[..., 3] = np.where(saliency >= thresh, alpha, 0.0)
    overlay = Image.fromarray((rgba * 255).astype(np.uint8)).resize((w, h), Image.NEAREST)
    return Image.alpha_composite(img, overlay).convert("RGB")


def visualize_search_results(
    query: str,
    results: List[Dict[str, Any]],
    images: Optional[List[Any]] = None,
    max_results: int = 6,
    figsize: Tuple[int, int] = (15, 10),
):
    """Grid figure of top results with scores (reference :230-335)."""
    try:
        import matplotlib.pyplot as plt
    except Exception as exc:  # pragma: no cover
        raise ImportError("visualize_search_results requires matplotlib") from exc

    results = results[:max_results]
    n = len(results)
    if n == 0:
        raise ValueError("No results to visualize")
    cols = min(3, n)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=figsize, squeeze=False)
    fig.suptitle(f"Query: {query}", fontsize=14)
    for i, res in enumerate(results):
        ax = axes[i // cols][i % cols]
        if images is not None and i < len(images) and images[i] is not None:
            ax.imshow(images[i])
        score = res.get("score_final", res.get("score", 0.0))
        payload = res.get("payload") or {}
        title = f"#{i + 1} score={score:.3f}"
        if payload.get("filename"):
            title += f"\n{payload['filename']} p{payload.get('page_number', '?')}"
        ax.set_title(title, fontsize=9)
        ax.axis("off")
    for j in range(n, rows * cols):
        axes[j // cols][j % cols].axis("off")
    fig.tight_layout()
    return fig
