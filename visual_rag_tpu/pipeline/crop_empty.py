"""Whitespace cropping preprocessor — vectorized re-design of the reference.

Behavioral parity with reference visual_rag/preprocessing/crop_empty.py:23-120
(same config fields, same border rules, same crop metadata), but the per-row/
per-column python scan loops are replaced by whole-array numpy reductions:
one pass computes white-fraction and std for every row/column, then the
borders are found with nonzero() on the combined condition.

Works on PIL images or numpy [H, W, 3] arrays (PIL optional).
"""

from __future__ import annotations

from dataclasses import asdict, dataclass
from typing import Tuple

import numpy as np


@dataclass(frozen=True)
class CropEmptyConfig:
    percentage_to_remove: float = 0.9
    remove_page_number: bool = False
    color_threshold: int = 240
    min_white_fraction: float = 0.99
    content_density_sides: float = 0.001
    content_density_main_text: float = 0.05
    content_density_any: float = 1e-6
    preserve_border_px: int = 1
    uniform_rowcol_std_threshold: float = 0.0


def _to_intensity(image) -> Tuple[np.ndarray, int, int, bool]:
    """-> (intensity [H, W] float, width, height, is_pil)."""
    if hasattr(image, "convert"):
        arr = np.asarray(image.convert("RGB"), dtype=np.float64)
        return arr.mean(axis=2), image.size[0], image.size[1], True
    arr = np.asarray(image, dtype=np.float64)
    if arr.ndim == 3:
        arr = arr.mean(axis=2)
    return arr, arr.shape[1], arr.shape[0], False


def crop_empty(image, *, config: CropEmptyConfig):
    """(cropped_image, crop_meta) — reference crop_empty.py:23-120 semantics."""
    intensity, width, height, is_pil = _to_intensity(image)

    def borders(axis: int, thr: float) -> Tuple[np.ndarray, np.ndarray]:
        white = np.mean(intensity > config.color_threshold, axis=1 - axis)
        non_white = 1.0 - white
        cond = (white < config.min_white_fraction) & (non_white > thr)
        if float(config.uniform_rowcol_std_threshold) > 0.0:
            stds = np.std(intensity, axis=1 - axis)
            cond &= stds > float(config.uniform_rowcol_std_threshold)
        return cond, white

    def first_true(cond: np.ndarray) -> int:
        idx = np.nonzero(cond)[0]
        return int(idx[0]) if idx.size else int(cond.shape[0])

    def last_true_plus1(cond: np.ndarray) -> int:
        idx = np.nonzero(cond)[0]
        return int(idx[-1]) + 1 if idx.size else 0

    rows_sides, _ = borders(0, float(config.content_density_sides))
    cols_sides, _ = borders(1, float(config.content_density_sides))
    rows_main, _ = borders(0, float(config.content_density_main_text))
    rows_any, _ = borders(0, float(config.content_density_any))

    top = first_true(rows_sides)
    left = first_true(cols_sides)
    right = last_true_plus1(cols_sides)
    bottom = (
        last_true_plus1(rows_main)
        if config.remove_page_number
        else last_true_plus1(rows_any)
    )

    pad = max(int(config.preserve_border_px or 0), 0)
    if pad > 0:
        left = max(left - pad, 0)
        top = max(top - pad, 0)
        right = min(right + pad, width)
        bottom = min(bottom + pad, height)
    crop_box = (left, top, right, bottom)
    valid = 0 <= left < right <= width and 0 <= top < bottom <= height

    meta_common = {
        "original_width": int(width),
        "original_height": int(height),
        "config": {k: (bool(v) if isinstance(v, bool) else (int(v) if isinstance(v, int) else float(v)))
                   for k, v in asdict(config).items()},
    }
    if not valid:
        return image, {
            "applied": False,
            "crop_box": None,
            "cropped_width": int(width),
            "cropped_height": int(height),
            **meta_common,
        }

    if is_pil:
        cropped = image.convert("RGB").crop(crop_box)
        cw, ch = cropped.width, cropped.height
    else:
        cropped = np.asarray(image)[top:bottom, left:right]
        ch, cw = cropped.shape[0], cropped.shape[1]
    return cropped, {
        "applied": True,
        "crop_box": [int(c) for c in crop_box],
        "cropped_width": int(cw),
        "cropped_height": int(ch),
        **meta_common,
    }
