"""PDFProcessor: PDF -> text + page images, resize geometry, filename metadata.

Parity with reference visual_rag/indexing/pdf_processor.py:
- process_pdf / stream_pdf with page-batched rendering (:74-188)
- resize_for_colpali: longest-edge max_edge, tile grid, white-canvas centering,
  returns (image, tile_rows, tile_cols) (:198-257)
- extract_metadata_from_filename: mapping first, then year regex + source
  heuristics (:267-324)
- PDF deps (pdf2image/poppler, pypdf) optional at import, required at use
  (:57-72); PIL optional too — numpy fallbacks keep the geometry testable.
"""

from __future__ import annotations

import logging
import re
from pathlib import Path
from typing import Any, Dict, Generator, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

try:
    from PIL import Image

    _HAS_PIL = True
except Exception:  # pragma: no cover
    Image = None
    _HAS_PIL = False

try:
    from pdf2image import convert_from_path

    _HAS_PDF2IMAGE = True
except Exception:  # pragma: no cover
    convert_from_path = None
    _HAS_PDF2IMAGE = False

try:
    from pypdf import PdfReader

    _HAS_PYPDF = True
except Exception:  # pragma: no cover
    PdfReader = None
    _HAS_PYPDF = False


class PDFProcessor:
    """Host-side PDF ingestion with page-batched rendering."""

    def __init__(self, dpi: int = 150, page_batch_size: int = 50):
        self.dpi = int(dpi)
        self.page_batch_size = int(page_batch_size)

    @staticmethod
    def _require_pdf_deps():
        if not (_HAS_PDF2IMAGE and _HAS_PYPDF):
            raise ImportError(
                "PDF support requires pdf2image (with poppler) and pypdf: "
                "pip install 'visual-rag-tpu[pdf]'"
            )

    # -- rendering -----------------------------------------------------------

    def get_page_count(self, pdf_path) -> int:
        self._require_pdf_deps()
        return len(PdfReader(str(pdf_path)).pages)

    def extract_text(self, pdf_path) -> List[str]:
        """Per-page text via pypdf, surrogate-sanitized (reference :99-107,259-265)."""
        self._require_pdf_deps()
        reader = PdfReader(str(pdf_path))
        out = []
        for page in reader.pages:
            try:
                text = page.extract_text() or ""
            except Exception:
                text = ""
            out.append(self._sanitize_text(text))
        return out

    def process_pdf(self, pdf_path) -> List[Dict[str, Any]]:
        """All pages: [{page_number, image, text}] (reference :74-125)."""
        return list(self.stream_pdf(pdf_path))

    def stream_pdf(self, pdf_path) -> Generator[Dict[str, Any], None, None]:
        """Generator over pages, rendered in batches of page_batch_size."""
        self._require_pdf_deps()
        pdf_path = Path(pdf_path)
        n_pages = self.get_page_count(pdf_path)
        texts = self.extract_text(pdf_path)
        for start in range(1, n_pages + 1, self.page_batch_size):
            end = min(start + self.page_batch_size - 1, n_pages)
            images = convert_from_path(
                str(pdf_path), dpi=self.dpi, first_page=start, last_page=end)
            for offset, image in enumerate(images):
                page_no = start + offset
                yield {
                    "page_number": page_no,
                    "image": image,
                    "text": texts[page_no - 1] if page_no - 1 < len(texts) else "",
                }

    # -- geometry ------------------------------------------------------------

    def resize_for_colpali(
        self, image, max_edge: int = 2048, tile_size: int = 512
    ) -> Tuple[Any, int, int]:
        """(resized_image, tile_rows, tile_cols) — reference :198-257 exactly."""
        if hasattr(image, "convert"):
            if image.mode != "RGB":
                image = image.convert("RGB")
            w, h = image.size
        else:
            arr = np.asarray(image)
            h, w = arr.shape[0], arr.shape[1]

        if w > h:
            new_w, new_h = max_edge, int(h * (max_edge / w))
        else:
            new_h, new_w = max_edge, int(w * (max_edge / h))
        tile_cols = (new_w + tile_size - 1) // tile_size
        tile_rows = (new_h + tile_size - 1) // tile_size
        final_w, final_h = tile_cols * tile_size, tile_rows * tile_size
        scale = min(final_w / w, final_h / h)
        scaled_w, scaled_h = int(w * scale), int(h * scale)

        if hasattr(image, "convert") and _HAS_PIL:
            resized = image.resize((scaled_w, scaled_h), Image.LANCZOS)
            if scaled_w != final_w or scaled_h != final_h:
                canvas = Image.new("RGB", (final_w, final_h), (255, 255, 255))
                canvas.paste(resized, ((final_w - scaled_w) // 2, (final_h - scaled_h) // 2))
                resized = canvas
        else:  # numpy fallback (nearest-neighbour)
            arr = np.asarray(image, dtype=np.float32)
            if arr.ndim == 2:
                arr = np.stack([arr] * 3, axis=-1)
            ys = np.clip((np.arange(scaled_h) * h / scaled_h).astype(int), 0, h - 1)
            xs = np.clip((np.arange(scaled_w) * w / scaled_w).astype(int), 0, w - 1)
            small = arr[ys][:, xs]
            white = 255.0 if arr.max() > 1.5 else 1.0
            canvas = np.full((final_h, final_w, 3), white, dtype=arr.dtype)
            oy, ox = (final_h - scaled_h) // 2, (final_w - scaled_w) // 2
            canvas[oy : oy + scaled_h, ox : ox + scaled_w] = small
            resized = canvas
        return resized, tile_rows, tile_cols

    # -- metadata ------------------------------------------------------------

    @staticmethod
    def _sanitize_text(text: str) -> str:
        if not text:
            return ""
        return text.encode("utf-8", errors="surrogatepass").decode("utf-8", errors="ignore")

    def extract_metadata_from_filename(
        self, filename: str, mapping: Optional[Dict[str, Dict[str, Any]]] = None
    ) -> Dict[str, Any]:
        """Mapping lookup, else year regex + source heuristics (reference :267-324)."""
        stem = Path(filename).stem
        stem_lower = stem.lower().strip()
        if mapping:
            if stem_lower in mapping:
                return dict(mapping[stem_lower])
            stem_no_ext = stem_lower.replace(".pdf", "")
            if stem_no_ext in mapping:
                return dict(mapping[stem_no_ext])

        metadata: Dict[str, Any] = {"filename": filename}
        year_match = re.search(r"(20\d{2})", stem)
        if year_match:
            metadata["year"] = int(year_match.group(1))
        if "consolidated" in stem_lower or ("annual" in stem_lower and "oag" in stem_lower):
            metadata["source"] = "Consolidated"
        elif "dlg" in stem_lower or "district local government" in stem_lower:
            metadata["source"] = "Local Government"
            district = re.search(r"([a-z]+)\s+(?:dlg|district local government)", stem_lower)
            if district:
                metadata["district"] = district.group(1).title()
        elif "hospital" in stem_lower or "referral" in stem_lower:
            metadata["source"] = "Hospital"
        elif "ministry" in stem_lower:
            metadata["source"] = "Ministry"
        elif "project" in stem_lower:
            metadata["source"] = "Project"
        else:
            metadata["source"] = "Unknown"
        return metadata
