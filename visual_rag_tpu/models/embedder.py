"""VisualEmbedder: the reference's embedding facade on the JAX ColVLM.

API parity with reference visual_embedder.py:

- backend auto-detect from the model name (MODEL_BACKENDS, :63-68)
- embed_query / embed_queries with length-sort bucketing and a NaN/Inf guard
  that logs a reproducible JSONL sample and recomputes the query solo
  (:410-574)
- embed_images(return_token_info) emitting per-image token info
  (visual_token_indices, tile grid, ColQwen effective grid) (:576-704)
- extract_visual_embedding, mean_pool_visual_embedding (model-aware dispatch,
  :735-835), experimental_pool_visual_embedding (kernel select, :842-923),
  global_pool_from_mean_pool (:837-840)

Model weights: randomly initialized by default (checkpoint loading is a
converter concern); every downstream component (pooling, index, retrieval,
benchmarks) is embedder-agnostic and exact regardless of weights.
"""

from __future__ import annotations

import json
import logging
import os
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from visual_rag_tpu.models.colvlm import ColVLM, ColVLMConfig
from visual_rag_tpu.models.processors import ImageProcessor
from visual_rag_tpu.models.tokenizer import load_tokenizer
from visual_rag_tpu.ops import pooling as pool_ops

logger = logging.getLogger(__name__)

# reference visual_embedder.py:63-68
MODEL_BACKENDS = {
    "colsmol": "colsmol",
    "colqwen2.5": "colqwen2.5",
    "colqwen2_5": "colqwen2.5",
    "colqwen2": "colqwen2",
    "colpali": "colpali",
}

_CONFIG_BY_BACKEND = {
    "colsmol": ColVLMConfig.colsmol_500m,
    "colpali": ColVLMConfig.colpali_v13,
    "colqwen2.5": ColVLMConfig.colqwen25_v02,
    "colqwen2": ColVLMConfig.colqwen25_v02,
}


def detect_backend(model_name: str) -> str:
    name = (model_name or "").lower()
    for key, backend in MODEL_BACKENDS.items():
        if key in name:
            return backend
    return "colpali"


class VisualEmbedder:
    """Late-interaction embedder over a flax ColVLM."""

    def __init__(
        self,
        model_name: str = "vidore/colSmol-500M",
        batch_size: int = 8,
        output_dtype=np.float32,
        config: Optional[ColVLMConfig] = None,
        params: Optional[Any] = None,
        checkpoint: Optional[str] = None,  # safetensors dir or HF repo id
        seed: int = 0,
        sort_queries_by_length: Optional[bool] = None,
        nan_log_dir: Optional[str] = None,
        tokenizer_path: Optional[str] = None,  # local tokenizer.json / ckpt dir
    ):
        self.model_name = model_name
        self.backend = detect_backend(model_name)
        self.batch_size = int(batch_size)
        self.output_dtype = np.dtype(output_dtype)
        self.cfg = config or _CONFIG_BY_BACKEND[self.backend]()
        self.model = ColVLM(self.cfg)
        if params is None and checkpoint is not None:
            from visual_rag_tpu.models.convert import load_checkpoint, validate_against_model

            params, report = load_checkpoint(checkpoint, self.cfg)
            issues = validate_against_model(params, self.cfg)
            if issues:
                raise ValueError(
                    f"checkpoint {checkpoint!r} does not fit {model_name}: "
                    f"{issues[:3]} (+{max(0, len(issues) - 3)} more)")
            logger.info("loaded checkpoint %s (%d tensors)", checkpoint,
                        len(report["matched"]))
        self._params = params
        self._seed = seed
        # patches per post-processing visual token: spatial merge (colqwen)
        # or pixel shuffle (colsmol)
        ratio = max(self.cfg.spatial_merge ** 2, self.cfg.vision.pixel_shuffle ** 2, 1)
        tokenizer_path = tokenizer_path or os.environ.get("VISUALRAG_TOKENIZER")
        tokenizer = load_tokenizer(tokenizer_path, vocab=self.cfg.text.vocab)
        # a real tokenizer knows the checkpoint's actual <image> placeholder id
        image_token_id = tokenizer.token_to_id("<image>") or self.cfg.image_token_id
        self.tokenizer = tokenizer
        self.processor = ImageProcessor(
            backend=self.backend,
            image_token_id=image_token_id,
            patch_pixels=self.cfg.vision.patch_pixels,
            vocab=self.cfg.text.vocab,
            max_visual_tokens=self.cfg.vision.max_patches // ratio,
            pixel_shuffle=self.cfg.vision.pixel_shuffle,
            tokenizer=tokenizer,
        )
        if sort_queries_by_length is None:
            sort_queries_by_length = os.environ.get(
                "VISUALRAG_SORT_QUERIES_BY_LENGTH", "0") in ("1", "true")
        self.sort_queries_by_length = bool(sort_queries_by_length)
        self.nan_log_dir = nan_log_dir or os.environ.get(
            "VISUALRAG_NAN_LOG_DIR", "results/nan_samples")
        self._jit_queries = jax.jit(
            lambda p, ids, mask: self.model.apply(p, ids, mask))
        self._jit_pages = jax.jit(
            lambda p, ids, mask, patches, pmask, wids, ppos: self.model.apply(
                p, ids, mask, patches, pmask, wids, ppos))

    # -- parameters (lazy init like the reference's lazy model load) --------

    @property
    def params(self):
        if self._params is None:
            logger.info("Initializing %s (%s) parameters", self.model_name, self.backend)
            proc = self.processor.process_images([np.zeros((64, 64, 3), np.float32)])
            self._params = jax.jit(self.model.init)(
                jax.random.PRNGKey(self._seed),
                jnp.asarray(proc.input_ids), jnp.asarray(proc.attn_mask),
                jnp.asarray(proc.patches), jnp.asarray(proc.patch_mask))
        return self._params

    # -- queries -------------------------------------------------------------

    def embed_query(self, query: str,
                    include_special_tokens: Optional[bool] = None) -> np.ndarray:
        return self.embed_queries([query], include_special_tokens=include_special_tokens)[0]

    def embed_queries(
        self,
        queries: Sequence[str],
        batch_size: Optional[int] = None,
        include_special_tokens: Optional[bool] = None,
    ) -> List[np.ndarray]:
        """Batched query embedding with NaN guard + solo-recompute fallback."""
        if include_special_tokens is None:  # env knob parity (reference config.py)
            include_special_tokens = os.environ.get(
                "VISUALRAG_INCLUDE_SPECIAL_TOKENS", "0") in ("1", "true")
        batch_size = batch_size or self.batch_size
        order = list(range(len(queries)))
        if self.sort_queries_by_length:
            order.sort(key=lambda i: len(queries[i].split()))
        results: List[Optional[np.ndarray]] = [None] * len(queries)
        for s in range(0, len(order), batch_size):
            chunk = order[s : s + batch_size]
            texts = [queries[i] for i in chunk]
            embs = self._embed_query_batch(texts, include_special_tokens)
            for i, e in zip(chunk, embs):
                if not np.isfinite(e).all():
                    self._log_nan_sample(queries[i])
                    e = self._embed_query_batch([queries[i]], include_special_tokens)[0]
                    if not np.isfinite(e).all():
                        e = np.nan_to_num(e)
                results[i] = e
        return results  # type: ignore[return-value]

    def _embed_query_batch(self, texts, include_special_tokens):
        ids, mask = self.processor.process_queries(texts)
        emb = np.asarray(self._jit_queries(
            self.params, jnp.asarray(ids), jnp.asarray(mask)), dtype=np.float32)
        out = []
        for i in range(len(texts)):
            keep = mask[i]
            if not include_special_tokens:
                # reference heuristic (visual_embedder.py:623): real tokens are
                # attention-masked AND non-special; the tokenizer decides which
                # ids are special (>=4 hash heuristic / HF added-token table)
                keep = keep & ~self.tokenizer.special_mask(ids[i])
            out.append(emb[i][keep].astype(self.output_dtype))
        return out

    def _log_nan_sample(self, query: str) -> None:
        try:
            path = Path(self.nan_log_dir)
            path.mkdir(parents=True, exist_ok=True)
            with open(path / "nan_queries.jsonl", "a", encoding="utf-8") as f:
                f.write(json.dumps({
                    "ts": time.time(), "model": self.model_name, "query": query,
                }) + "\n")
        except OSError:  # logging must never break embedding
            pass
        logger.warning("NaN/Inf in query embedding; recomputing solo: %r", query[:80])

    # -- images --------------------------------------------------------------

    def embed_images(
        self,
        images: Sequence,
        batch_size: Optional[int] = None,
        return_token_info: bool = False,
        show_progress: bool = False,
    ) -> Union[List[np.ndarray], Tuple[List[np.ndarray], List[Dict[str, Any]]]]:
        batch_size = batch_size or self.batch_size
        embeddings: List[np.ndarray] = []
        infos: List[Dict[str, Any]] = []

        def drain(device_out, proc):
            emb = np.asarray(device_out, dtype=np.float32)
            for i, info in enumerate(proc.token_infos):
                n_valid = int(proc.attn_mask[i].sum())
                embeddings.append(emb[i, :n_valid].astype(self.output_dtype))
                infos.append(info)

        # 1-deep pipeline: dispatch batch i+1 (async under jax) BEFORE
        # fetching batch i, so host preprocessing + transfer of the next
        # batch overlap the previous batch's device compute.
        from visual_rag_tpu.utils.hostbuf import HOST_POOL

        pending = None
        for s in range(0, len(images), batch_size):
            # pooled=True: warm rotating host buffers (utils/hostbuf.py) —
            # safe here because the 1-deep pipeline holds at most two
            # ProcessedImages and the pool rotates eight deep (with async
            # device_put transfers guarded at recycle time)
            proc = self.processor.process_images(
                list(images[s : s + batch_size]), pooled=True)
            # fp16 wire format for patches: pixel data in [0,1] loses nothing
            # at 2^-11 precision and the host->device transfer (the ingest
            # bottleneck over a tunneled TPU: 36 MB/batch fp32 at 3k patches)
            # halves; the model upcasts to its compute dtype on device. The
            # staging buffer is pooled (a fresh 44 MB alloc page-faults).
            pf16 = HOST_POOL.get(proc.patches.shape, np.float16)
            np.copyto(pf16, proc.patches, casting="unsafe")
            host_in = [proc.input_ids, proc.attn_mask, pf16, proc.patch_mask]
            if proc.window_ids is not None:
                host_in.append(proc.window_ids)
            if proc.patch_positions is not None:
                host_in.append(proc.patch_positions)
            dev = jax.device_put(tuple(host_in))
            for hb, da in zip(host_in, dev):
                HOST_POOL.guard(hb, da)  # the h->d copy is async
            dev = list(dev)
            ids_d, attn_d, patches_d, pmask_d = dev[:4]
            k = 4
            wids = ppos = None
            if proc.window_ids is not None:
                wids = dev[k]
                k += 1
            if proc.patch_positions is not None:
                ppos = dev[k]
            out = self._jit_pages(self.params, ids_d, attn_d, patches_d,
                                  pmask_d, wids, ppos)
            if pending is not None:
                drain(*pending)
            pending = (out, proc)
        if pending is not None:
            drain(*pending)
        if return_token_info:
            return embeddings, infos
        return embeddings

    def extract_visual_embedding(self, full_embedding, token_info) -> np.ndarray:
        """Gather visual-token rows (reference visual_embedder.py:706-733)."""
        idx = np.asarray(token_info["visual_token_indices"], dtype=np.int64)
        return np.asarray(full_embedding)[idx].astype(self.output_dtype)

    # -- pooling dispatch (reference :735-923) -------------------------------

    def mean_pool_visual_embedding(
        self, visual_embedding, token_info: Optional[Dict[str, Any]] = None,
        *, target_vectors: Optional[int] = 32,
    ) -> np.ndarray:
        is_colsmol = self.backend == "colsmol"
        is_colqwen25 = self.backend == "colqwen2.5"
        cap = None if target_vectors is None or int(target_vectors) <= 0 else int(target_vectors)
        if not is_colqwen25 and cap is None:
            cap = 32
        visual_np = np.asarray(visual_embedding, dtype=np.float32)
        num_tokens = int(visual_np.shape[0])

        if is_colsmol:
            info = token_info or {}
            n_rows, n_cols = info.get("n_rows"), info.get("n_cols")
            num_tiles = int(n_rows) * int(n_cols) + 1 if n_rows and n_cols else 13
            return np.asarray(pool_ops.tile_level_mean_pooling(
                visual_np, num_tiles=num_tiles, patches_per_tile=64,
                output_dtype=self.output_dtype))

        if is_colqwen25:
            info = token_info or {}
            gh, gw = info.get("grid_h_eff"), info.get("grid_w_eff")
            if gh and gw and int(gh) * int(gw) == num_tokens:
                target_rows = int(gh) if cap is None else min(cap, int(gh))
                return np.asarray(pool_ops.adaptive_row_mean_pooling_from_grid(
                    visual_np, grid_h=int(gh), grid_w=int(gw),
                    target_rows=target_rows, output_dtype=self.output_dtype))

        grid = int(round(num_tokens ** 0.5))
        if grid * grid == num_tokens:
            target = grid if (is_colqwen25 and cap is None) else int(cap)
            if grid == target:
                return np.asarray(pool_ops.colpali_row_mean_pooling(
                    visual_np, grid_size=target, output_dtype=self.output_dtype))
            return np.asarray(pool_ops.adaptive_row_mean_pooling_from_grid(
                visual_np, grid_h=grid, grid_w=grid, target_rows=target,
                output_dtype=self.output_dtype))

        return np.asarray(pool_ops.sequence_chunk_mean_pooling(
            visual_np, target_rows=int(cap or 32), output_dtype=self.output_dtype))

    def global_pool_from_mean_pool(self, mean_pool: np.ndarray) -> np.ndarray:
        if mean_pool.size == 0:
            return np.zeros((self.cfg.embed_dim,), dtype=self.output_dtype)
        return np.asarray(mean_pool, dtype=np.float32).mean(axis=0).astype(self.output_dtype)

    def experimental_pool_visual_embedding(
        self, visual_embedding, token_info: Optional[Dict[str, Any]] = None,
        *, target_vectors: Optional[int] = 32, mean_pool: Optional[np.ndarray] = None,
        window_size: Optional[int] = None, kernel: Optional[str] = None,
    ) -> np.ndarray:
        is_colsmol = self.backend == "colsmol"
        is_colqwen25 = self.backend == "colqwen2.5"
        visual_np = np.asarray(visual_embedding, dtype=np.float32)

        if is_colsmol:
            if mean_pool is not None and getattr(mean_pool, "shape", None) and mean_pool.shape[0] > 0:
                num_tiles = int(mean_pool.shape[0])
            else:
                info = token_info or {}
                num_tiles = info.get("num_tiles")
                if num_tiles is None:
                    nv = info.get("num_visual_tokens") or int(visual_np.shape[0])
                    num_tiles = -(-int(nv) // 64)
            return np.asarray(pool_ops.colsmol_experimental_pooling(
                visual_np, num_tiles=int(num_tiles), patches_per_tile=64,
                output_dtype=self.output_dtype))

        rows = mean_pool if mean_pool is not None else self.mean_pool_visual_embedding(
            visual_np, token_info, target_vectors=target_vectors)
        k = (kernel or ("gaussian" if is_colqwen25 else "legacy")).lower().strip()
        if k in ("legacy", "legacy_conv", "conv"):
            window = int(window_size) if window_size is not None else (5 if is_colqwen25 else 3)
            return np.asarray(pool_ops.colpali_experimental_pooling_from_rows(
                rows, window_size=window, output_dtype=self.output_dtype))
        window = int(window_size) if window_size is not None else 3
        return np.asarray(pool_ops.weighted_row_smoothing_same_length(
            rows, window_size=window,
            kernel=("gaussian" if k == "gaussian"
                    else ("triangular" if k == "triangular" else "uniform")),
            output_dtype=self.output_dtype))


# Backward-compatibility alias (reference visual_embedder.py:927)
ColPaliEmbedder = VisualEmbedder
