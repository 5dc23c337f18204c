"""RetrievalEngine: the in-process query planner over a SealedIndex.

This is the TPU-native equivalent of the reference's retriever stack
(SingleStageRetriever / TwoStageRetriever / ThreeStageRetriever behind the
MultiVectorRetriever facade — SURVEY §2 #14-17). One class covers every mode
because all plans compose the same four device primitives:

    score_padded_tokens / score_padded_pooled_query / score_single
        -> stage-1 prefetch scores over a pooled store (replaces HNSW; exact)
    rerank_ragged
        -> exact MaxSim on candidates' full token matrices (replaces Qdrant
           server-side ``exact=True`` rerank)

Mode surface (facade parity, reference multi_vector.py:192-247):
    single_full | single_tiles | single_pooled | single_global |
    single_experimental_tokens | single_experimental_pooled |
    two_stage (5 stage-1 modes) | three_stage

The reference facade's known three_stage TypeError (multi_vector.py:238-245)
is intentionally NOT replicated; three_stage accepts stage1_k/stage2_k here.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from visual_rag_tpu.index.store import (
    PaddedMultiVectors,
    RaggedMultiVectors,
    SealedIndex,
    SingleVectors,
)
from visual_rag_tpu.retrieval.filters import PayloadFilter
from visual_rag_tpu.retrieval.scoring import (
    NEG_INF,
    rerank_ragged,
    score_padded_pooled_query,
    score_padded_tokens,
    score_ragged_all,
    score_single,
    topk_masked,
)

logger = logging.getLogger(__name__)


class BatchResultArrays:
    """Dense batched results: the zero-copy serving fast path.

    ``ids`` is an object array [B, K] of manifest point ids (None where a row
    has fewer than K valid hits), ``scores`` [B, K] f32, ``valid`` [B, K]
    bool, ``indices`` [B, K] int32 internal doc indices (-1 invalid). Mapping
    internal indices to manifest ids is one vectorized numpy fancy-index —
    per-hit python dict assembly (the reference returns Qdrant ScoredPoint
    objects per hit, run_qdrant_beir.py:392-401) was the single largest
    host cost per batch at B>=1024 on this 1-core host. ``to_dicts()``
    materializes the classic List[List[dict]] lazily when a consumer needs
    it."""

    __slots__ = ("ids", "scores", "valid", "indices")

    def __init__(self, ids, scores, valid, indices):
        self.ids = ids
        self.scores = scores
        self.valid = valid
        self.indices = indices

    def __len__(self):
        return len(self.ids)

    def to_dicts(self) -> List[List[Dict[str, Any]]]:
        ids_l = self.ids.tolist()
        sc_l = self.scores.tolist()
        va_l = self.valid.tolist()
        return [
            [{"id": i, "rank": r, "score": s, "score_final": s}
             for r, (i, s, v) in enumerate(zip(row_i, row_s, row_v)) if v]
            for row_i, row_s, row_v in zip(ids_l, sc_l, va_l)
        ]

STAGE1_MODES = (
    "pooled_query_vs_standard_pooling",
    "tokens_vs_standard_pooling",
    "pooled_query_vs_experimental_pooling",
    "tokens_vs_experimental_pooling",
    "pooled_query_vs_global",
)

# Deprecated stage-1 aliases (reference two_stage.py:131-139)
_STAGE1_ALIASES = {
    "pooled_query_vs_tiles": "pooled_query_vs_standard_pooling",
    "tokens_vs_tiles": "tokens_vs_standard_pooling",
    "pooled_query_vs_experimental": "pooled_query_vs_experimental_pooling",
    "tokens_vs_experimental": "tokens_vs_experimental_pooling",
}

SEARCH_MODES = (
    "single_full",
    "single_tiles",
    "single_pooled",
    "single_global",
    "single_experimental_tokens",
    "single_experimental_pooled",
    "two_stage",
    "three_stage",
)


def _l2n(x: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    return x / (np.linalg.norm(x, axis=-1, keepdims=True) + eps)


class EngineCommon:
    """Behavior shared by RetrievalEngine and ShardedEngine: the approx-cut
    policy and plan warmup. One home so the measured threshold can never
    drift between the single-device and sharded engines."""

    APPROX_CUT_MIN_DOCS = 65536  # measured: approx loses at 30k, wins 6x at 100k
    stage1_cut: str = "auto"
    rerank_impl: str = "auto"  # auto | plain | dedup | sweep | scan
    DEDUP_MIN_BATCH = 64
    SWEEP_MIN_COV = 6.0  # measured: sweep wins at cov 6.3+, ties dedup at 4.8
    # scan: one streaming pass over the WHOLE store beats per-candidate
    # gathers when candidate windows outnumber docs severalfold (per-window
    # DMA descriptor cost ~0.8us is the rerank floor; the scan pays it once
    # per doc instead of once per (query, candidate))
    SCAN_MIN_CAND_RATIO = 4.0
    BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256)

    @classmethod
    def _bucket_batch(cls, queries):
        """Pad ``queries`` up to the enclosing batch bucket (above the ladder,
        the next multiple of 256) so varying batch sizes reuse compiled plans
        AND the packed wire stays legal (pack_queries_grouped needs B % 32
        for B >= 32). Padding rows duplicate query 0 — callers slice results
        back to ``n_real``. Returns (queries, n_real, b_bucket)."""
        n_real = len(queries)
        b = next((c for c in cls.BATCH_BUCKETS if n_real <= c),
                 ((n_real + 255) // 256) * 256)
        if b != n_real:
            queries = list(queries) + [queries[0]] * (b - n_real)
        return queries, n_real, b

    def _rerank_impl(self, b: int, k: int, n_docs: int = 0,
                     m_packed: int = 0, rg: int = 0) -> str:
        """Stage-2 rerank kernel selection (static per plan compile).

        - ``plain``: one DMA + matmul per candidate (tiny batches: no
          sort/scatter overhead).
        - ``dedup``: cross-query candidate dedup (VERDICT r2 #4), one DMA per
          unique doc — measured uniformly ~5% faster than plain at serving
          batch sizes, bit-exact.
        - ``sweep``: range-sweep kernel (maxsim_sweep.py) — streams coalesced
          row-ranges and M-packs queries; wins when the candidate token mass
          covers the store densely (small/mid corpora at serving batch
          sizes: 43.6->38.6 ms at the 3k headline shape). Coverage =
          b*k*ceil32(max_len)/rows, gated at SWEEP_MIN_COV.
        """
        if self.rerank_impl == "scan" and not m_packed:
            # the scan rerank IS the packed exhaustive pass — without the
            # packed wire it would silently fall through to the plain kernel
            # (and the engine would ship dead bucket arrays into the plan)
            logger.warning(
                "rerank_impl='scan' requires the packed query wire "
                "(query_wire='packed' or auto-on-TPU with B >= 32); "
                "falling back to 'dedup' for this plan")
            return "dedup" if b >= self.DEDUP_MIN_BATCH else "plain"
        if self.rerank_impl in ("plain", "dedup", "sweep", "scan"):
            return self.rerank_impl
        if b < self.DEDUP_MIN_BATCH:
            return "plain"
        rows, max_len, nq, dim, itemsize = self._ragged_geom()
        if m_packed and n_docs and b * k >= self.SCAN_MIN_CAND_RATIO * n_docs:
            from visual_rag_tpu.ops.kernels.maxsim_scan import scan_kernel_fits

            store_dtype = (jnp.int8 if itemsize == 1 else
                           jnp.bfloat16 if itemsize == 2 else jnp.float32)
            if scan_kernel_fits(m_packed, dim, max_len, store_dtype,
                                rg_hint=rg or 1024):
                return "scan"
        from visual_rag_tpu.ops.kernels.maxsim_sweep import (
            _ceil32, sweep_supported)
        cov = b * k * _ceil32(max_len) / max(1, rows)
        if cov >= self.SWEEP_MIN_COV and sweep_supported(
                rows, max_len, min(b, 256), k, nq, dim, itemsize,
                r_step=512, n_bufs=2):
            return "sweep"
        return "dedup"

    def _ragged_geom(self):
        """(rows, max_len, nq_hint, dim, itemsize) of the full token store."""
        raise NotImplementedError

    _ids_cache: Optional[tuple] = None

    def _ids_object_array(self, manifest) -> np.ndarray:
        """Manifest ids as a cached object ndarray (enables one fancy-index
        id mapping per batch instead of a per-hit python loop)."""
        ver = getattr(manifest, "version", 0)
        if self._ids_cache is None or self._ids_cache[0] != ver:
            arr = np.empty(len(manifest.ids), dtype=object)
            arr[:] = manifest.ids
            self._ids_cache = (ver, arr)
        return self._ids_cache[1]

    def _finish_arrays(self, manifest, n_real: int, arrays,
                       idx_key: str = "idx") -> "BatchResultArrays":
        idx = np.asarray(arrays[idx_key])[:n_real]
        primary = arrays.get("score_final")
        if primary is None:
            primary = arrays["score"]
        scores = np.asarray(primary)[:n_real]
        num_docs = len(manifest.ids)
        valid = (idx >= 0) & (idx < num_docs) & (scores > NEG_INF / 2)
        safe = np.where(valid, idx, 0)
        ids = self._ids_object_array(manifest)[safe]
        ids[~valid] = None
        return BatchResultArrays(ids=ids, scores=scores, valid=valid,
                                 indices=np.where(valid, idx, -1))

    def _cut_corpus_size(self) -> int:
        raise NotImplementedError

    def _store_dim(self) -> int:
        raise NotImplementedError

    def _approx_cut(self, k: int) -> bool:
        """Use lax.approx_max_k for an intermediate candidate cut?

        The reference's stage-1 (Qdrant HNSW) is approximate; ours is exact
        below the threshold and ~0.99-recall approximate above it, where
        exact top_k dominates the query budget (BENCH_SUMMARY scale profile).
        Only intermediate cuts are affected — final rankings stay exact. The
        sharded engine applies the same rule per shard, so below the
        threshold sharded and single-device stay bit-identical.
        """
        if self.stage1_cut == "exact":
            return False
        if self.stage1_cut == "approx":
            return True
        d = self._cut_corpus_size()
        return d >= self.APPROX_CUT_MIN_DOCS and k * 8 <= d

    def warmup(
        self,
        modes: Sequence[str] = ("two_stage",),
        batch_sizes: Sequence[int] = (1, 64),
        n_query_tokens: int = 24,
        **search_kwargs,
    ) -> float:
        """Pre-compile the fused plans for the given modes/batch shapes.

        Serving processes call this at startup so the first real query never
        pays a plan compile (minutes on remote-compile TPU backends). Returns
        seconds spent.
        """
        import time

        dim = self._store_dim()
        rng = np.random.default_rng(0)
        t0 = time.time()
        for mode in modes:
            for bs in batch_sizes:
                qs = [rng.standard_normal((n_query_tokens, dim)).astype(np.float32)
                      for _ in range(bs)]
                self.search_embedded_batch(qs, mode=mode, top_k=10,
                                           with_payload=False, **search_kwargs)
        return time.time() - t0


class RetrievalEngine(EngineCommon):
    """Query planner over one sealed collection."""

    def __init__(
        self,
        index: SealedIndex,
        full_vector_name: str = "initial",
        pooled_vector_name: str = "mean_pooling",
        global_vector_name: str = "global_pooling",
        experimental_vector_name: str = "experimental_pooling",
        compute_dtype: Optional[str] = None,
        rerank_chunk: int = 256,
        stage1_cut: str = "auto",
        rerank_impl: str = "auto",
        query_wire: str = "auto",
        wire_dtype: str = "auto",
    ):
        self.index = index
        self.full_vector_name = full_vector_name
        self.pooled_vector_name = pooled_vector_name
        self.global_vector_name = global_vector_name
        self.experimental_vector_name = experimental_vector_name
        if compute_dtype is None:
            compute_dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
        self.compute_dtype = compute_dtype
        self.rerank_chunk = int(rerank_chunk)
        if stage1_cut not in ("auto", "exact", "approx"):
            raise ValueError(f"stage1_cut must be auto|exact|approx, got {stage1_cut}")
        self.stage1_cut = stage1_cut
        if rerank_impl not in ("auto", "plain", "dedup", "sweep", "scan"):
            raise ValueError(
                f"rerank_impl must be auto|plain|dedup|sweep|scan, got {rerank_impl}")
        self.rerank_impl = rerank_impl
        import os as _os

        # env var refines the DEFAULT only — an explicit constructor arg wins
        # (otherwise a stray exported VISUALRAG_QUERY_WIRE silently overrides
        # code that asked for a specific wire)
        if query_wire == "auto":
            query_wire = _os.environ.get("VISUALRAG_QUERY_WIRE", query_wire)
        if query_wire not in ("auto", "padded", "packed"):
            raise ValueError(
                f"query_wire must be auto|padded|packed, got {query_wire}")
        # auto = packed on TPU at serving batch sizes. Group-packing reorders
        # the stage-1 token-sum accumulation for tokens_vs_* modes and the
        # exhaustive scan, so CPU f32 (where tests pin bit-exact rank
        # equality between two_stage(prefetch>=corpus) and single_full)
        # defaults to the padded wire; on TPU bf16 the documented rounding
        # tolerance already covers it.
        self.query_wire = query_wire
        if wire_dtype == "auto":
            wire_dtype = _os.environ.get("VISUALRAG_WIRE_DTYPE", wire_dtype)
        if wire_dtype not in ("auto", "f32", "f16"):
            raise ValueError(
                f"wire_dtype must be auto|f32|f16, got {wire_dtype}")
        # auto = f16 on TPU at serving batch sizes (the query wire is the
        # biggest per-batch payload: 25 MB f32 at bs=2048; this tunnel ships
        # content-compressed at ~20-60 MB/s, so halving it saves 100-300 ms
        # per batch against a ~25 ms one-pass clip+cast on the host — the r4
        # f32 decision assumed a much faster wire than the r5 drift
        # instrumentation measured). CPU keeps f32: tests pin bit-exact
        # cross-path rank equality there and host->host transfer is memcpy.
        self.wire_dtype = wire_dtype
        self._bucket_cache: Dict[str, Any] = {}
        self._batch_scorer = None
        self._mask_cache: Dict[Any, jnp.ndarray] = {}
        from visual_rag_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()

    @property
    def batch_scorer(self):
        from visual_rag_tpu.retrieval.batch import BatchScorer

        if self._batch_scorer is None:
            self._batch_scorer = BatchScorer(self.index, compute_dtype=self.compute_dtype)
        return self._batch_scorer

    # -- query preparation ---------------------------------------------------

    def _prep_query(self, query_embedding) -> Dict[str, jnp.ndarray]:
        q = np.asarray(query_embedding, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        q_tokens = _l2n(q)  # cosine: normalize each token
        q_pooled = _l2n(q.mean(axis=0))  # pooled query = mean of RAW tokens, then cosine-normalized
        return {
            "tokens": jnp.asarray(q_tokens),
            "pooled": jnp.asarray(q_pooled),
        }

    def _doc_mask(
        self, filter_obj: Optional[PayloadFilter], as_float: bool = False
    ) -> Optional[jnp.ndarray]:
        """Device mask for a filter, memoized on (signature, manifest
        version): the harness's per_dataset scope applies ONE filter for
        hundreds of consecutive queries, and re-evaluating + re-transferring
        the identical mask per search was pure host overhead."""
        if filter_obj is None or filter_obj.is_empty():
            return None
        key = (filter_obj.signature(), self.index.manifest.version, as_float)
        cached = self._mask_cache.get(key)
        if cached is not None:
            return cached
        if as_float:
            dev = jnp.asarray(self._doc_mask(filter_obj), jnp.float32)
        else:
            dev = jnp.asarray(filter_obj.evaluate(self.index.manifest))
        if len(self._mask_cache) >= 64:  # bound device memory held by masks
            self._mask_cache.pop(next(iter(self._mask_cache)))
        self._mask_cache[key] = dev
        return dev

    # -- store-level scoring -------------------------------------------------

    def _score_store_tokens(self, name: str, q_tokens: jnp.ndarray) -> jnp.ndarray:
        store = self.index.store(name)
        if isinstance(store, PaddedMultiVectors):
            return score_padded_tokens(
                store.values, store.mask, q_tokens, store.scales,
                compute_dtype=self.compute_dtype,
            )
        if isinstance(store, RaggedMultiVectors):
            return score_ragged_all(
                store.flat, store.offsets, store.lengths, q_tokens, store.max_len,
                scales=store.scales, chunk=self.rerank_chunk,
                compute_dtype=self.compute_dtype,
            )
        # Single-vector store scored with tokens: sum_q max over the single
        # row = sum_q dot (Qdrant treats the single vector as a 1-row doc).
        # dot is linear in the query, so the token sum folds into ONE
        # dispatch: sum_q (values . q) == values . (sum_q q) — the previous
        # per-token loop paid a 10-30 ms tunnel RTT per query token.
        return score_single(store.values, jnp.sum(q_tokens, axis=0),
                            store.scales, compute_dtype=self.compute_dtype)

    def _score_store_pooled(self, name: str, q_pooled: jnp.ndarray) -> jnp.ndarray:
        store = self.index.store(name)
        if isinstance(store, PaddedMultiVectors):
            return score_padded_pooled_query(
                store.values, store.mask, q_pooled, store.scales,
                compute_dtype=self.compute_dtype,
            )
        if isinstance(store, SingleVectors):
            return score_single(store.values, q_pooled, store.scales,
                                compute_dtype=self.compute_dtype)
        raise ValueError(f"pooled-query scoring unsupported for store {name!r} ({store.kind})")

    def _stage1_scores(self, stage1_mode: str, q) -> jnp.ndarray:
        mode = _STAGE1_ALIASES.get(stage1_mode, stage1_mode)
        if mode == "pooled_query_vs_standard_pooling":
            return self._score_store_pooled(self.pooled_vector_name, q["pooled"])
        if mode == "tokens_vs_standard_pooling":
            return self._score_store_tokens(self.pooled_vector_name, q["tokens"])
        if mode == "pooled_query_vs_experimental_pooling":
            return self._score_store_pooled(self.experimental_vector_name, q["pooled"])
        if mode == "tokens_vs_experimental_pooling":
            return self._score_store_tokens(self.experimental_vector_name, q["tokens"])
        if mode == "pooled_query_vs_global":
            return self._score_store_pooled(self.global_vector_name, q["pooled"])
        raise ValueError(f"Unknown stage1_mode: {stage1_mode}")

    # -- candidate selection -------------------------------------------------

    def _cut_corpus_size(self) -> int:
        return self.index.num_docs

    def _store_dim(self) -> int:
        return next(iter(self.index.stores.values())).dim

    def _ragged_geom(self):
        st = self.index.store(self.full_vector_name)
        itemsize = 1 if st.flat.dtype == jnp.int8 else st.flat.dtype.itemsize
        return (int(st.flat.shape[0]), int(st.max_len), 32, int(st.dim),
                int(itemsize))

    def _topk_candidates(self, scores, k: int, doc_mask, approx: bool = False):
        k = max(1, min(int(k), self.index.num_docs))
        vals, idx = topk_masked(scores, k, doc_mask, approx=approx)
        valid = vals > (NEG_INF / 2)
        cand = jnp.where(valid, idx, -1).astype(jnp.int32)
        return vals, cand

    def _rerank(self, q_tokens: jnp.ndarray, candidates: jnp.ndarray) -> jnp.ndarray:
        store = self.index.store(self.full_vector_name)
        if not isinstance(store, RaggedMultiVectors):
            raise ValueError(f"{self.full_vector_name!r} must be a ragged token store")
        return rerank_ragged(
            store.flat, store.offsets, store.lengths, q_tokens, candidates,
            store.max_len, scales=store.scales, compute_dtype=self.compute_dtype,
        )

    def _maybe_refine(self, q_tokens: jnp.ndarray, candidates: jnp.ndarray,
                      rr: jnp.ndarray, k: int):
        """int8 two-pass refinement for the per-query path: re-score the int8
        top window with the int4 residual sidecar (bf16-parity final ranking).
        No-op (returns inputs) for stores without a residual."""
        store = self.index.store(self.full_vector_name)
        if getattr(store, "res4", None) is None:
            return rr, candidates
        from visual_rag_tpu.parallel.sharded import _refine_window
        from visual_rag_tpu.retrieval.batch import xla_refine_rerank

        rk = _refine_window(k, int(candidates.shape[0]))
        v8, pos8 = jax.lax.top_k(rr, rk)
        c8 = jnp.where(v8 > NEG_INF / 2, candidates[pos8], -1).astype(jnp.int32)
        qt = q_tokens[None]  # [1, nq, dim]
        qm = jnp.ones(qt.shape[:2], jnp.float32)
        fine = xla_refine_rerank(
            store.flat, store.res4, store.res_scales, store.offsets,
            store.lengths, qt, qm, c8[None], store.max_len,
            doc_scales=store.scales)[0]
        return fine, c8

    # -- result assembly -----------------------------------------------------

    def _results(self, idx, with_payload: bool, **score_cols) -> List[Dict[str, Any]]:
        # one .tolist() pass per column: per-element numpy scalar conversions
        # were ~20 ms per 256-query batch of assembly on the 1-core host
        idx_l = idx if isinstance(idx, list) else np.asarray(idx).tolist()
        cols = {k: (v if isinstance(v, list) else np.asarray(v).tolist())
                for k, v in score_cols.items()}
        out: List[Dict[str, Any]] = []
        manifest = self.index.manifest
        first = next(iter(cols.values()))
        neg = float(NEG_INF) / 2
        col_items = list(cols.items())
        for rank, i in enumerate(idx_l):
            if i < 0 or first[rank] <= neg:
                continue
            rec: Dict[str, Any] = {"id": manifest.ids[i], "rank": rank}
            for col, arr in col_items:
                rec[col] = arr[rank]
            rec.setdefault("score_final", rec.get("score", rec.get("score_stage2")))
            if with_payload:
                rec["payload"] = manifest.payload(i)
            out.append(rec)
        return out

    # -- public search API ---------------------------------------------------

    def search_embedded(
        self,
        query_embedding,
        mode: str = "two_stage",
        top_k: int = 10,
        prefetch_k: Optional[int] = None,
        stage1_mode: str = "pooled_query_vs_standard_pooling",
        stage1_k: Optional[int] = None,
        stage2_k: Optional[int] = None,
        filter_obj: Optional[PayloadFilter] = None,
        with_payload: bool = True,
    ) -> List[Dict[str, Any]]:
        """Search with a precomputed query embedding [nq, dim].

        Facade parity: reference MultiVectorRetriever.search_embedded
        (multi_vector.py:179-247).
        """
        if mode not in SEARCH_MODES:
            raise ValueError(f"Unknown mode: {mode}. Choose one of {SEARCH_MODES}")
        if self.index.num_docs == 0:
            return []
        q = self._prep_query(query_embedding)
        doc_mask = self._doc_mask(filter_obj)

        if mode.startswith("single_"):
            return self._search_single(mode, q, top_k, doc_mask, with_payload)
        if mode == "two_stage":
            return self._search_two_stage(
                q, top_k, prefetch_k, stage1_mode, doc_mask, with_payload
            )
        return self._search_three_stage(
            q, top_k, stage1_k or 1000, stage2_k or 300, doc_mask, with_payload
        )

    def search_embedded_batch(
        self,
        query_embeddings,
        mode: str = "two_stage",
        top_k: int = 10,
        prefetch_k: Optional[int] = None,
        stage1_mode: str = "pooled_query_vs_standard_pooling",
        stage1_k: Optional[int] = None,
        stage2_k: Optional[int] = None,
        filter_obj: Optional[PayloadFilter] = None,
        with_payload: bool = True,
        return_arrays: bool = False,
    ) -> List[List[Dict[str, Any]]]:
        """Batched search: list of [nq_i, dim] queries -> list of result lists.

        TPU-native high-QPS path: queries are padded to one [B, NQ, dim]
        batch (fp16 wire on TPU; normalization runs inside the plan), stage-1
        runs as a single fused Pallas pass over the store, stage-2 reranks
        all candidates with the fused MaxSim kernel. Results are identical to
        per-query :meth:`search_embedded`.

        ``return_arrays=True`` returns a :class:`BatchResultArrays` (dense
        [B, K] manifest-id/score arrays, one vectorized id mapping, no
        per-hit dict assembly) — the serving fast path; incompatible with
        ``with_payload``.
        """
        pending = self._dispatch_batch(
            query_embeddings, mode=mode, top_k=top_k, prefetch_k=prefetch_k,
            stage1_mode=stage1_mode, stage1_k=stage1_k, stage2_k=stage2_k,
            filter_obj=filter_obj, with_payload=with_payload,
            return_arrays=return_arrays)
        return self._finish_batch(pending)

    def search_embedded_batches(self, query_batches, depth: int = 2,
                                **search_kwargs):
        """Pipelined fused batches: dispatch up to ``depth`` batches ahead
        BEFORE fetching batch i's results, hiding the dispatch/transfer
        round-trip behind device compute (depth=1 is the round-2 design;
        depth=2 also hides the result-fetch RTT of batch i behind batch
        i+1's device time). Yields one result list per input batch, in order.
        """
        from collections import deque

        depth = max(1, int(depth))
        pend = deque()
        for qb in query_batches:
            pend.append(self._dispatch_batch(qb, **search_kwargs))
            if len(pend) > depth:
                yield self._finish_batch(pend.popleft())
        while pend:
            yield self._finish_batch(pend.popleft())

    def _dispatch_batch(
        self,
        query_embeddings,
        mode: str = "two_stage",
        top_k: int = 10,
        prefetch_k: Optional[int] = None,
        stage1_mode: str = "pooled_query_vs_standard_pooling",
        stage1_k: Optional[int] = None,
        stage2_k: Optional[int] = None,
        filter_obj: Optional[PayloadFilter] = None,
        with_payload: bool = True,
        return_arrays: bool = False,
    ):
        """Enqueue one fused plan; returns a pending record (device arrays
        not yet fetched) for :meth:`_finish_batch`."""
        from visual_rag_tpu.retrieval import batch as B
        from visual_rag_tpu.retrieval import plans

        if mode not in SEARCH_MODES:
            raise ValueError(f"Unknown mode: {mode}. Choose one of {SEARCH_MODES}")
        if return_arrays and with_payload:
            raise ValueError("return_arrays=True requires with_payload=False")
        if self.index.num_docs == 0 or not len(query_embeddings):
            return ("empty", len(query_embeddings), with_payload,
                    return_arrays, {})
        query_embeddings, n_real, b_bucket = self._bucket_batch(
            query_embeddings)
        dim = next(iter(self.index.stores.values())).dim
        use_pallas = self.batch_scorer.use_pallas
        wire = np.float32
        if (self.wire_dtype == "f16"
                or (self.wire_dtype == "auto" and use_pallas
                    and b_bucket >= 1024)):
            wire = np.float16
        use_packed = (self.query_wire == "packed"
                      or (self.query_wire == "auto" and use_pallas
                          and b_bucket >= 32))
        if use_packed:
            (q1, q2, q3), nq, _rg = B.pack_queries_grouped(
                query_embeddings, dim, wire_dtype=wire)
            wire_kind = "packed"
        else:
            q1, q2 = B.pad_queries_raw(query_embeddings, dim, wire_dtype=wire)
            q3, nq, wire_kind = None, int(q1.shape[1]), "padded"
        d = self.index.num_docs
        # None skips the mask branch entirely (and its host->device transfer)
        doc_mask_f = self._doc_mask(filter_obj, as_float=True)
        ragged = self._fused_arrays(self.full_vector_name)
        max_len = self.index.store(self.full_vector_name).max_len
        common = dict(ds=d, max_len=max_len, use_pallas=use_pallas,
                      wire=wire_kind, b=b_bucket, nq=nq)

        if mode.startswith("single_"):
            kind, name = {
                "single_full": ("tokens_ragged", self.full_vector_name),
                "single_tiles": ("tokens_padded", self.pooled_vector_name),
                "single_pooled": ("pooled_padded", self.pooled_vector_name),
                "single_global": ("pooled_single", self.global_vector_name),
                "single_experimental_tokens": ("tokens_padded", self.experimental_vector_name),
                "single_experimental_pooled": ("pooled_padded", self.experimental_vector_name),
            }[mode]
            s1_ragged, bucket_lens = ragged, ()
            if kind == "tokens_ragged":
                s1_ragged, bucket_lens = self._with_buckets(ragged)
            vals, idx = plans.single_plan(
                self._fused_arrays(name), s1_ragged, doc_mask_f, q1, q2, q3,
                kind=kind, k=max(1, min(int(top_k), d)),
                bucket_lens=bucket_lens, **common)
            return ("done", n_real, with_payload, return_arrays,
                    {"idx": idx, "score": vals})

        if mode == "two_stage":
            if prefetch_k is None:
                prefetch_k = max(100, top_k * 10)
            kind, name = self._fused_stage1(stage1_mode)
            pk = max(1, min(int(prefetch_k), d))
            scan_geom = ({"n_docs": d, "m_packed": int(q1.shape[0]),
                      "rg": int(q3.shape[1])}
                         if wire_kind == "packed" else {})
            # dedup/sweep are Pallas-only (they degrade to the plain XLA
            # gather off-TPU inside _local_rerank), but an EXPLICIT 'scan'
            # has a full XLA fallback (the packed exhaustive path) — honor it
            impl = (self._rerank_impl(b_bucket, pk, **scan_geom)
                    if use_pallas or self.rerank_impl == "scan" else "plain")
            # scan rerank = the exhaustive pass -> give it the same static
            # doc-length buckets single_full uses (each bucket scanned at
            # its own max_len; bit-exact, ~30% less padded window work)
            ragged2, bl = (self._with_buckets(ragged) if impl == "scan"
                           else (ragged, ()))
            vals, idx = plans.two_stage_plan(
                self._fused_arrays(name), ragged2, doc_mask_f, q1, q2, q3,
                kind=kind, pk=pk, k=max(1, min(int(top_k), pk)),
                approx=self._approx_cut(pk), impl=impl, bucket_lens=bl,
                **common)
            return ("done", n_real, with_payload, return_arrays,
                    {"idx": idx, "score_stage2": vals, "score_final": vals})

        s1k = max(1, min(int(stage1_k or 1000), d))
        s2k = max(1, min(int(stage2_k or 300), d))
        scan_geom = ({"n_docs": d, "m_packed": int(q1.shape[0]),
                      "rg": int(q3.shape[1])}
                     if wire_kind == "packed" else {})
        impl = (self._rerank_impl(b_bucket, s2k, **scan_geom)
                if use_pallas or self.rerank_impl == "scan" else "plain")
        ragged3, bl3 = (self._with_buckets(ragged) if impl == "scan"
                        else (ragged, ()))
        vals, idx, s1_at, s2_at = plans.three_stage_plan(
            self._fused_arrays(self.global_vector_name),
            self._fused_arrays(self.experimental_vector_name),
            ragged3, doc_mask_f, q1, q2, q3,
            s1k=s1k, s2k=s2k, k=max(1, min(int(top_k), s2k)),
            approx=self._approx_cut(min(s1k, s2k)), impl=impl,
            bucket_lens=bl3, **common)
        return ("done", n_real, with_payload, return_arrays,
                {"idx": idx, "score_stage3": vals, "score_final": vals,
                 "score_stage1": s1_at, "score_stage2": s2_at})

    def _finish_batch(self, pending):
        tag, n_real, with_payload, return_arrays, arrays = pending
        if tag == "empty":
            if return_arrays:
                z = np.zeros((n_real, 0))
                return BatchResultArrays(
                    ids=z.astype(object), scores=z.astype(np.float32),
                    valid=z.astype(bool), indices=z.astype(np.int32))
            return [[] for _ in range(n_real)]
        if return_arrays:
            return self._finish_arrays(self.index.manifest, n_real, arrays)
        idx = arrays.pop("idx")
        return self._batch_results(idx, with_payload, **arrays)[:n_real]


    def _fused_arrays(self, name: str):
        """Store arrays in the layout the fused plans / shard bodies expect."""
        store = self.index.store(name)
        arr, _ = self.batch_scorer._kernel_arrays(name)
        if isinstance(store, PaddedMultiVectors):
            vals_t, mask_t, scales_t = arr
            out = {"vals_t": vals_t, "mask_t": mask_t}
            if scales_t is not None:
                out["scales_t"] = scales_t
            return out
        if isinstance(store, SingleVectors):
            return {"vals": arr}
        flat, scales = arr if isinstance(arr, tuple) else (arr, None)
        out = {"flat": flat, "offsets": store.offsets, "lengths": store.lengths}
        if scales is not None:
            out["scales"] = scales
        if store.res4 is not None:  # int8+int4 two-pass refinement sidecar
            out["res4"] = store.res4
            out["res_scales"] = store.res_scales
        return out

    def _with_buckets(self, ragged):
        """Attach static doc-length bucket arrays for the exhaustive scan
        (batch.make_exhaustive_buckets; bit-exact, VERDICT r3 #3). Cached per
        full-vector store; returns (ragged', bucket_lens)."""
        from visual_rag_tpu.retrieval import batch as B

        bt = self._bucket_cache.get(self.full_vector_name)
        if bt is None:
            store = self.index.store(self.full_vector_name)
            spec = B.make_exhaustive_buckets(np.asarray(store.lengths))
            if spec is None:
                bt = (None, ())
            else:
                offs = np.asarray(store.offsets)[spec["perm"]]
                lens = np.asarray(store.lengths)[spec["perm"]]
                sc = store.scales
                scp = None if sc is None else np.asarray(sc)[spec["perm"]]
                buckets, lo = [], 0
                for sz in spec["sizes"]:
                    sl = slice(lo, lo + sz)
                    buckets.append((
                        jax.device_put(offs[sl]), jax.device_put(lens[sl]),
                        None if scp is None else jax.device_put(scp[sl])))
                    lo += sz
                bt = ((tuple(buckets), jax.device_put(spec["inv_perm"])),
                      spec["max_lens"])
            self._bucket_cache[self.full_vector_name] = bt
        extra, lens = bt
        if extra is None:
            return ragged, ()
        out = dict(ragged)
        out["buckets"], out["inv_perm"] = extra
        return out, lens

    def _fused_stage1(self, stage1_mode: str):
        m = _STAGE1_ALIASES.get(stage1_mode, stage1_mode)
        table = {
            "pooled_query_vs_standard_pooling": ("pooled_padded", self.pooled_vector_name),
            "tokens_vs_standard_pooling": ("tokens_padded", self.pooled_vector_name),
            "pooled_query_vs_experimental_pooling": ("pooled_padded", self.experimental_vector_name),
            "tokens_vs_experimental_pooling": ("tokens_padded", self.experimental_vector_name),
            "pooled_query_vs_global": ("pooled_single", self.global_vector_name),
        }
        if m not in table:
            raise ValueError(f"Unknown stage1_mode: {stage1_mode}")
        return table[m]

    def _batch_results(self, idx, with_payload, **score_cols):
        # np.asarray per array (jax.device_get pays a pathological first-call
        # setup cost on tunneled TPU backends), then ONE .tolist() pass each
        idx_l = np.asarray(idx).tolist()
        cols = {k: np.asarray(v).tolist() for k, v in score_cols.items()}
        return [
            self._results(idx_l[b], with_payload,
                          **{k: v[b] for k, v in cols.items()})
            for b in range(len(idx_l))
        ]

    def _search_single(self, mode, q, top_k, doc_mask, with_payload):
        """Single query_points call equivalents (reference single_stage.py:81-121)."""
        if mode == "single_full":
            scores = self._score_store_tokens(self.full_vector_name, q["tokens"])
        elif mode == "single_tiles":
            scores = self._score_store_tokens(self.pooled_vector_name, q["tokens"])
        elif mode == "single_pooled":
            scores = self._score_store_pooled(self.pooled_vector_name, q["pooled"])
        elif mode == "single_global":
            scores = self._score_store_pooled(self.global_vector_name, q["pooled"])
        elif mode == "single_experimental_tokens":
            scores = self._score_store_tokens(self.experimental_vector_name, q["tokens"])
        elif mode == "single_experimental_pooled":
            scores = self._score_store_pooled(self.experimental_vector_name, q["pooled"])
        else:  # pragma: no cover
            raise ValueError(mode)
        store = self.index.store(self.full_vector_name)
        if mode == "single_full" and getattr(store, "res4", None) is not None:
            from visual_rag_tpu.parallel.sharded import _refine_window

            rk = _refine_window(top_k, self.index.num_docs)
            vals8, cand = self._topk_candidates(scores, rk, doc_mask)
            rr, cand = self._maybe_refine(q["tokens"], cand, vals8, top_k)
            k = max(1, min(int(top_k), int(cand.shape[0])))
            vals, pos = jax.lax.top_k(rr, k)
            idx = jnp.where(vals > NEG_INF / 2, cand[pos], -1)
            return self._results(np.asarray(idx), with_payload,
                                 score=np.asarray(vals))
        vals, idx = self._topk_candidates(scores, top_k, doc_mask)
        return self._results(np.asarray(idx), with_payload, score=np.asarray(vals))

    def _search_two_stage(self, q, top_k, prefetch_k, stage1_mode, doc_mask, with_payload):
        """Pooled prefetch -> exact MaxSim rerank (reference two_stage.py:102-191)."""
        if prefetch_k is None:
            prefetch_k = max(100, top_k * 10)  # reference default (two_stage.py:128-129)
        s1_scores = self._stage1_scores(stage1_mode, q)
        _, candidates = self._topk_candidates(
            s1_scores, prefetch_k, doc_mask, approx=self._approx_cut(prefetch_k))
        rr = self._rerank(q["tokens"], candidates)
        rr, candidates = self._maybe_refine(q["tokens"], candidates, rr, top_k)
        k = max(1, min(int(top_k), int(candidates.shape[0])))
        vals, pos = jax.lax.top_k(rr, k)
        final_idx = jnp.where(vals > NEG_INF / 2, candidates[pos], -1)
        return self._results(
            np.asarray(final_idx), with_payload,
            score_stage2=np.asarray(vals), score_final=np.asarray(vals),
        )

    def _search_three_stage(self, q, top_k, stage1_k, stage2_k, doc_mask, with_payload):
        """global -> experimental tokens -> exact cascade (reference three_stage.py:83-173)."""
        # Stage 1: pooled query vs global vectors
        s1 = self._score_store_pooled(self.global_vector_name, q["pooled"])
        _, c1 = self._topk_candidates(s1, stage1_k, doc_mask,
                                      approx=self._approx_cut(stage1_k))
        # Stage 2: query tokens vs experimental pooling, restricted to stage-1 ids
        d = self.index.num_docs
        # .max (not .set): -1 padding collides onto index 0; last-write-wins
        # .set would erase a genuine doc-0 candidacy (ADVICE r1).
        m1 = jnp.zeros((d,), dtype=bool).at[jnp.maximum(c1, 0)].max(c1 >= 0)
        s2 = self._score_store_tokens(self.experimental_vector_name, q["tokens"])
        _, c2 = self._topk_candidates(s2, stage2_k, m1,
                                      approx=self._approx_cut(stage2_k))
        # Stage 3: exact MaxSim on initial, restricted to stage-2 ids
        rr = self._rerank(q["tokens"], c2)
        rr, c2 = self._maybe_refine(q["tokens"], c2, rr, top_k)
        k = max(1, min(int(top_k), int(c2.shape[0])))
        vals, pos = jax.lax.top_k(rr, k)
        final_idx = jnp.where(vals > NEG_INF / 2, c2[pos], -1)
        fi = jnp.maximum(final_idx, 0)
        return self._results(
            np.asarray(final_idx), with_payload,
            score_stage3=np.asarray(vals),
            score_final=np.asarray(vals),
            score_stage1=np.asarray(s1[fi]),
            score_stage2=np.asarray(s2[fi]),
        )
