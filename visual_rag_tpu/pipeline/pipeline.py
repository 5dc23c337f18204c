"""ProcessingPipeline: end-to-end PDF -> device index orchestration.

Parity with reference visual_rag/indexing/pipeline.py:30-739:

- strategies ``pooling`` (visual tokens only) / ``standard`` (all tokens) /
  ``all`` (:80, :517-546)
- skip-existing via deterministic chunk IDs (:185, :694-700)
- per page: crop -> resize_for_colpali -> embed -> visual-token extraction ->
  mean pool (max_mean_pool_vectors cap) -> experimental fan-out -> global pool
  (:353-507)
- experimental vector fan-out by backend (:419-501), with the naming logic the
  reference duplicates across pipeline/CLI/benchmarks centralized here in
  :func:`experimental_vector_plan` (SURVEY §7.4 asks for exactly this)
- saliency-ready metadata payload (:569-618)
- deferred upload queue flushed at upload_batch_size (:317-338)
- fuzzy metadata matching (SequenceMatcher > 0.75, :658-686)
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from difflib import SequenceMatcher
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from visual_rag_tpu.pipeline.crop_empty import CropEmptyConfig, crop_empty
from visual_rag_tpu.pipeline.pdf_processor import PDFProcessor
from visual_rag_tpu.utils.ids import generate_chunk_id

logger = logging.getLogger(__name__)

STRATEGIES = ("pooling", "standard", "all")


def experimental_vector_plan(
    backend: str,
    pooling_windows: Sequence[int] = (3,),
    kernel: str = "auto",
    colsmol_2d: bool = False,
) -> Dict[str, Any]:
    """Centralized experimental-vector naming + production plan.

    Returns {"names": [...], "canonical": str, "producers": {name: spec}}
    mirroring the reference's per-backend fan-out (pipeline.py:419-501):
    - ColQwen2.5: gaussian + triangular k=3 always; canonical = gaussian
      (alias 'experimental_pooling')
    - ColPali: one vector per window k (legacy conv); canonical = first k
    - ColSmol: tile-structured pooling; optional 2d 4-neighborhood variant
    """
    producers: Dict[str, Dict[str, Any]] = {}
    if backend == "colqwen2.5" or backend == "colqwen2":
        for tech in ("gaussian", "triangular"):
            producers[f"experimental_pooling_{tech}"] = {"kind": "smooth", "kernel": tech, "window": 3}
        canonical = "experimental_pooling_gaussian"
    elif backend == "colsmol":
        producers["experimental_pooling"] = {"kind": "colsmol"}
        if colsmol_2d:
            producers["experimental_pooling_2d"] = {"kind": "colsmol_2d"}
        canonical = "experimental_pooling"
    else:  # colpali
        windows = list(pooling_windows) or [3]
        for k in windows:
            name = f"experimental_pooling_{k}"
            if kernel in ("auto", "legacy", "legacy_conv", "conv"):
                producers[name] = {"kind": "legacy", "window": int(k)}
            else:
                producers[name] = {"kind": "smooth", "kernel": kernel, "window": int(k)}
        canonical = f"experimental_pooling_{windows[0]}"
    names = list(producers.keys())
    if "experimental_pooling" not in names:
        names.append("experimental_pooling")  # canonical alias column
    return {"names": names, "canonical": canonical, "producers": producers}


@dataclass
class PipelineStats:
    pages_processed: int = 0
    pages_skipped: int = 0
    pages_failed: int = 0
    uploads: int = 0
    failures: List[Dict[str, Any]] = field(default_factory=list)


class ProcessingPipeline:
    """PDF -> embeddings -> named vectors -> index builder."""

    def __init__(
        self,
        embedder,
        indexer,
        pdf_processor: Optional[PDFProcessor] = None,
        strategy: str = "pooling",
        embedding_batch_size: int = 8,
        upload_batch_size: int = 16,
        max_mean_pool_vectors: Optional[int] = 32,
        pooling_windows: Sequence[int] = (3,),
        experimental_kernel: str = "auto",
        colsmol_experimental_2d: bool = False,
        crop_config: Optional[CropEmptyConfig] = None,
        skip_existing: bool = True,
        metadata_mapping: Optional[Dict[str, Dict[str, Any]]] = None,
        prefetch_workers: int = 4,
        image_uploader=None,
    ):
        if strategy not in STRATEGIES:
            raise ValueError(f"Unknown strategy: {strategy}. Choose one of {STRATEGIES}")
        self.embedder = embedder
        self.indexer = indexer
        self.pdf_processor = pdf_processor or PDFProcessor()
        self.strategy = strategy
        self.embedding_batch_size = int(embedding_batch_size)
        self.upload_batch_size = int(upload_batch_size)
        self.max_mean_pool_vectors = max_mean_pool_vectors
        self.crop_config = crop_config
        self.prefetch_workers = int(prefetch_workers)
        self.skip_existing = bool(skip_existing)
        self.metadata_mapping = metadata_mapping or {}
        # Page-image store (reference pipeline.py:553-564 Cloudinary upload):
        # LocalImageStore / CloudinaryUploader; None = no page images kept.
        # The demo playground renders page images + saliency overlays from
        # the URLs this writes into the payload.
        self.image_uploader = image_uploader
        self.plan = experimental_vector_plan(
            getattr(embedder, "backend", "colpali"),
            pooling_windows=pooling_windows,
            kernel=experimental_kernel,
            colsmol_2d=colsmol_experimental_2d,
        )
        self._queue: List[Dict[str, Any]] = []

    # -- public API ----------------------------------------------------------

    @staticmethod
    def generate_chunk_id(filename: str, page_number: int) -> str:
        return generate_chunk_id(filename, page_number)

    @staticmethod
    def load_metadata_mapping(json_path) -> Dict[str, Dict[str, Any]]:
        import json

        with open(json_path, "r", encoding="utf-8") as f:
            raw = json.load(f)
        return {str(k).lower().strip(): v for k, v in raw.items()}

    def process_pdf(
        self,
        pdf_path,
        metadata: Optional[Dict[str, Any]] = None,
        progress_callback: Optional[Callable[[int, int], None]] = None,
    ) -> PipelineStats:
        """Process one PDF end to end (reference pipeline.py:147-351)."""
        pdf_path = Path(pdf_path)
        filename = pdf_path.name
        stats = PipelineStats()
        base_meta = metadata or self._resolve_metadata(filename)

        existing = set(self.indexer.get_existing_ids(filename)) if self.skip_existing else set()
        pages = self.pdf_processor.process_pdf(pdf_path)
        total = len(pages)

        todo = []
        for page in pages:
            chunk_id = self.generate_chunk_id(filename, page["page_number"])
            if chunk_id in existing:
                stats.pages_skipped += 1
            else:
                todo.append(page)
        self._run_prepared(todo, filename, base_meta, stats,
                           progress_callback=progress_callback, total=total)
        self._flush(force=True, stats=stats)
        if progress_callback:
            progress_callback(total, total)
        return stats

    def process_images(
        self,
        images: Sequence,
        source_id: str,
        metadata: Optional[Dict[str, Any]] = None,
    ) -> PipelineStats:
        """Index raw images (one point per image) without a PDF on disk."""
        stats = PipelineStats()
        base_meta = dict(metadata or {})
        pages = [
            {"page_number": i + 1, "image": img, "text": ""}
            for i, img in enumerate(images)
        ]
        if self.skip_existing:
            pages = [
                p for p in pages
                if not self.indexer.check_exists(
                    self.generate_chunk_id(source_id, p["page_number"]))
            ]
            stats.pages_skipped += len(images) - len(pages)
        self._run_prepared(pages, source_id, base_meta, stats)
        self._flush(force=True, stats=stats)
        return stats

    def _run_prepared(self, pages, filename, base_meta, stats: PipelineStats,
                      progress_callback=None, total: Optional[int] = None):
        """Crop/prepare on host threads AHEAD of the device embed loop."""
        from visual_rag_tpu.pipeline.prefetch import prefetched_batches

        def prepare(page):
            img = page["image"]
            crop_meta = None
            if self.crop_config is not None:
                img, crop_meta = crop_empty(img, config=self.crop_config)
            return page, img, crop_meta

        for batch, errors in prefetched_batches(
                pages, self.embedding_batch_size, prepare,
                workers=self.prefetch_workers):
            for err in errors:
                stats.pages_failed += 1
                stats.failures.append({
                    "filename": filename,
                    "page": err.item.get("page_number"),
                    "error": str(err.error),
                })
            if batch:
                self._embed_prepared(batch, filename, base_meta, stats)
            if progress_callback and total:
                progress_callback(
                    min(stats.pages_processed + stats.pages_skipped, total), total)

    # -- internals -----------------------------------------------------------

    def _process_batch(self, pages, filename, base_meta, stats: PipelineStats):
        """Synchronous prepare+embed (kept for direct callers; process_pdf /
        process_images route through the prefetched path)."""
        prepared = []
        for page in pages:
            img = page["image"]
            if self.crop_config is not None:
                img, crop_meta = crop_empty(img, config=self.crop_config)
            else:
                crop_meta = None
            prepared.append((page, img, crop_meta))
        self._embed_prepared(prepared, filename, base_meta, stats)

    def _embed_prepared(self, prepared, filename, base_meta, stats: PipelineStats):
        images = [img for _, img, _ in prepared]
        try:
            embeddings, token_infos = self.embedder.embed_images(
                images, return_token_info=True)
        except Exception as exc:  # per-batch isolation (reference :858-899)
            logger.warning("Batch embed failed (%s); retrying per page", exc)
            embeddings, token_infos = [], []
            for img in images:
                try:
                    e, ti = self.embedder.embed_images([img], return_token_info=True)
                    embeddings.append(e[0])
                    token_infos.append(ti[0])
                except Exception as exc2:
                    embeddings.append(None)
                    token_infos.append({"error": str(exc2)})
        for (page, cropped_img, crop_meta), emb, info in zip(
                prepared, embeddings, token_infos):
            if emb is None:
                stats.pages_failed += 1
                stats.failures.append({
                    "filename": filename, "page": page["page_number"],
                    "error": info.get("error", "embed failed"),
                })
                continue
            try:
                self._process_single_page(page, emb, info, crop_meta, filename,
                                          base_meta, stats,
                                          cropped_img=cropped_img)
            except Exception as exc:
                stats.pages_failed += 1
                stats.failures.append({
                    "filename": filename, "page": page["page_number"], "error": str(exc),
                })
        self._flush(force=False, stats=stats)

    def _produce_experimental(self, visual, info, mean_pool) -> Dict[str, np.ndarray]:
        """Fan out experimental vectors per the centralized plan."""
        from visual_rag_tpu.ops import pooling as pool_ops

        out: Dict[str, np.ndarray] = {}
        for name, spec in self.plan["producers"].items():
            if spec["kind"] == "smooth":
                out[name] = np.asarray(self.embedder.experimental_pool_visual_embedding(
                    visual, info, mean_pool=mean_pool,
                    kernel=spec["kernel"], window_size=spec["window"]))
            elif spec["kind"] == "legacy":
                out[name] = np.asarray(self.embedder.experimental_pool_visual_embedding(
                    visual, info, mean_pool=mean_pool,
                    kernel="legacy", window_size=spec["window"]))
            elif spec["kind"] == "colsmol":
                out[name] = np.asarray(self.embedder.experimental_pool_visual_embedding(
                    visual, info, mean_pool=mean_pool))
            elif spec["kind"] == "colsmol_2d":
                n_rows = info.get("n_rows") or 1
                n_cols = info.get("n_cols") or 1
                out[name] = np.asarray(pool_ops.colsmol_tile_4n_pooling_from_tiles(
                    mean_pool, n_rows=int(n_rows), n_cols=int(n_cols),
                    has_global=True))
        canonical = self.plan["canonical"]
        out["experimental_pooling"] = out.get("experimental_pooling", out[canonical])
        return out

    def _process_single_page(self, page, emb, info, crop_meta, filename,
                             base_meta, stats: PipelineStats, cropped_img=None):
        chunk_id = self.generate_chunk_id(filename, page["page_number"])
        visual = self.embedder.extract_visual_embedding(emb, info)
        initial = visual if self.strategy in ("pooling", "all") else np.asarray(emb)
        mean_pool = np.asarray(self.embedder.mean_pool_visual_embedding(
            visual, info, target_vectors=self.max_mean_pool_vectors))
        if self.strategy == "standard":
            mean_pool_vec = np.asarray(visual, dtype=np.float32).mean(
                axis=0, keepdims=True)
            mean_pool_for_store = mean_pool_vec
        else:
            mean_pool_for_store = mean_pool
        experimental = self._produce_experimental(visual, info, mean_pool)
        global_pool = np.asarray(self.embedder.global_pool_from_mean_pool(mean_pool))

        payload = {
            "filename": filename,
            "page_number": page["page_number"],
            "text": page.get("text", ""),
            "has_text": bool(page.get("text", "").strip()),
            **{k: v for k, v in base_meta.items() if v is not None},
            # saliency-ready provenance (reference pipeline.py:569-618)
            "num_visual_tokens": int(info.get("num_visual_tokens") or visual.shape[0]),
            "n_rows": info.get("n_rows"),
            "n_cols": info.get("n_cols"),
            "num_tiles": info.get("num_tiles"),
            "grid_h_eff": info.get("grid_h_eff"),
            "grid_w_eff": info.get("grid_w_eff"),
            "visual_token_indices": list(info.get("visual_token_indices") or []),
            "crop": crop_meta,
            **self._upload_page_images(page, cropped_img, crop_meta, chunk_id),
            "pooling": {
                "strategy": self.strategy,
                "mean_pool_rows": int(mean_pool_for_store.shape[0]),
                "experimental": sorted(self.plan["producers"].keys()),
                "canonical_experimental": self.plan["canonical"],
                "max_mean_pool_vectors": self.max_mean_pool_vectors,
            },
        }
        vectors = {
            "initial": np.asarray(initial, dtype=np.float32),
            "mean_pooling": np.asarray(mean_pool_for_store, dtype=np.float32),
            "global_pooling": np.asarray(global_pool, dtype=np.float32),
            **{k: np.asarray(v, dtype=np.float32) for k, v in experimental.items()},
        }
        self._queue.append({"id": chunk_id, "vectors": vectors, "payload": payload})
        stats.pages_processed += 1

    def _upload_page_images(self, page, cropped_img, crop_meta,
                            chunk_id: str) -> Dict[str, Any]:
        """Store original/cropped/resized page images; URL + dimension payload
        fields (reference pipeline.py:553-618: Cloudinary upload + saliency-
        ready dims). No-op ({}) without an image_uploader."""
        if self.image_uploader is None:
            return {}
        import numpy as np  # local: keep module import surface unchanged

        def _dims(img):
            if img is None:
                return None
            if hasattr(img, "width") and hasattr(img, "height"):  # PIL
                return int(img.width), int(img.height)
            a = np.asarray(img)
            return int(a.shape[1]), int(a.shape[0])

        original = page.get("image")
        cropped = cropped_img if crop_meta else None
        try:
            resized, tile_rows, tile_cols = self.pdf_processor.resize_for_colpali(
                cropped_img if cropped_img is not None else original)
        except Exception:
            resized, tile_rows, tile_cols = None, None, None
        out: Dict[str, Any] = {}
        try:
            if cropped is not None and resized is not None:
                up = self.image_uploader.upload_original_cropped_and_resized(
                    original, cropped, resized, chunk_id)
            elif resized is not None:
                up = self.image_uploader.upload_original_and_resized(
                    original, resized, chunk_id)
            else:
                up = {"original": self.image_uploader.upload_image(
                    original, chunk_id)}
        except Exception as exc:  # image store failures never fail the page
            logger.warning("page image upload failed for %s: %s", chunk_id, exc)
            return {}
        for kind in ("original", "cropped", "resized"):
            rec = up.get(kind)
            if rec and rec.get("url"):
                out[f"{kind}_url"] = rec["url"]
        for kind, img in (("original", original), ("cropped", cropped),
                          ("resized", resized)):
            d = _dims(img)
            if d:
                out[f"{kind}_width"], out[f"{kind}_height"] = d
        if crop_meta:
            out["crop_empty_enabled"] = True
            pct = (crop_meta.get("config") or {}).get("percentage_to_remove")
            if pct is not None:
                out["crop_empty_percentage_to_remove"] = pct
        return out

    def _flush(self, force: bool, stats: PipelineStats):
        if not self._queue:
            return
        if force or len(self._queue) >= self.upload_batch_size:
            added = self.indexer.upload_batch(self._queue, skip_existing=True)
            stats.uploads += added
            self._queue = []

    def _resolve_metadata(self, filename: str) -> Dict[str, Any]:
        """Exact mapping, then fuzzy match > 0.75 (reference :658-686)."""
        pdfp = self.pdf_processor
        meta = pdfp.extract_metadata_from_filename(filename, self.metadata_mapping)
        if self.metadata_mapping and meta.get("source", "Unknown") == "Unknown":
            stem = Path(filename).stem.lower().strip()
            best_key, best_score = None, 0.75
            for key in self.metadata_mapping:
                score = SequenceMatcher(None, stem, key).ratio()
                if score > best_score:
                    best_key, best_score = key, score
            if best_key is not None:
                meta = dict(self.metadata_mapping[best_key])
                meta.setdefault("filename", filename)
        return meta

    @property
    def required_vector_names(self) -> List[str]:
        """Schema names this pipeline produces (for CollectionSchema setup)."""
        return ["initial", "mean_pooling", "global_pooling", *self.plan["names"]]
