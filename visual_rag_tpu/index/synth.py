"""Device-side synthetic corpus: build a SealedIndex WITHOUT host transfer.

Sealing a real 200k-doc corpus streams ~10+ GB through the host tunnel
(~80 min); for scale benchmarking the vectors can be generated directly in
HBM with jax.random — the index layout (aligned ragged flat + offsets,
padded pooled stores, single globals) is bit-compatible with
IndexBuilder.seal()'s output, so every engine path (fused plans, Pallas
kernels, sharded engine) runs unchanged.

Replaces: the reference harness's synthetic/sampled corpora for scale
stress (benchmarks/benchmark_datasets.txt Option B) at sizes where host
upload would dominate.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from visual_rag_tpu.index.manifest import Manifest
from visual_rag_tpu.index.store import (
    PaddedMultiVectors,
    RaggedMultiVectors,
    SealedIndex,
    SingleVectors,
)

ALIGN = 32  # must match store.py's pack_aligned (Pallas DMA tile alignment)


def _normalized_normal(key, shape, dtype):
    """Row-normalized gaussian directly on device (f32 math, stored dtype)."""
    x = jax.random.normal(key, shape, jnp.float32)
    n = jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)
    return (x * n).astype(dtype)


def synthetic_index(
    num_docs: int,
    dim: int = 128,
    min_tokens: int = 128,
    max_tokens: int = 256,
    pooled_rows: int = 12,
    storage_dtype: str = "bfloat16",
    seed: int = 0,
    payload_years: Optional[int] = None,
    chunk_rows: int = 8_000_000,
) -> SealedIndex:
    """SealedIndex of ``num_docs`` synthetic pages generated in HBM.

    Stores: ``initial`` (ragged, variable tokens/doc), ``mean_pooling`` and
    ``experimental_pooling`` (padded, ``pooled_rows`` rows each), and
    ``global_pooling``. int8 stores carry real scales (global-constant — a
    valid quantization; tightness is irrelevant for perf benching);
    ``int8_refined`` additionally generates the per-row int4 residual
    sidecar on device (seal()-bit-compatible), so the two-pass refine and
    qdot scan paths can be benched at corpus sizes the host seal can't reach.
    """
    rng = np.random.default_rng(seed)
    lengths = rng.integers(min_tokens, max_tokens + 1, num_docs).astype(np.int32)
    aligned = ((lengths + ALIGN - 1) // ALIGN) * ALIGN
    offsets = np.zeros(num_docs, np.int64)
    np.cumsum(aligned[:-1], out=offsets[1:])
    max_len = int(lengths.max())
    # tail pad of ceil32(max_len) keeps the rerank kernel's widened
    # (32-row-rounded) DMA windows in bounds even for a 0-length last doc
    total = int(aligned.sum()) + ((max_len + 31) // 32) * 32
    sdt = jnp.dtype(
        {"bfloat16": jnp.bfloat16, "float16": jnp.float16,
         "float32": jnp.float32, "int8": jnp.int8,
         "int8_refined": jnp.int8}[storage_dtype])
    keys = jax.random.split(jax.random.PRNGKey(seed), 8)

    refined = storage_dtype == "int8_refined"
    int8 = storage_dtype == "int8" or refined
    gen_dtype = jnp.bfloat16 if int8 else sdt

    from functools import partial

    # Chunked generation into a DONATED buffer: the f32 random intermediate
    # only ever exists at chunk size, and the fill is in-place — peak HBM is
    # buffer + one chunk (a chunked-concat would double the buffer; a single
    # full-size normal would materialize a 4-byte/elem f32 intermediate).
    @partial(jax.jit, donate_argnums=(0, 1, 2), static_argnums=(5,))
    def fill_chunk(buf, r4buf, rsbuf, key, pos, n_rows):
        if refined:
            # f32 math so the residual is meaningful; per-row int4 sidecar
            # follows store._residual_int4 exactly (r = x - c8/127,
            # rs = max|r|/7, nibbles packed column 2j low / 2j+1 high) —
            # bit-compatible with IndexBuilder.seal()'s layout
            x = _normalized_normal(key, (n_rows, dim), jnp.float32)
            c8 = jnp.clip(jnp.round(x * 127.0), -127, 127)
            buf = jax.lax.dynamic_update_slice(
                buf, c8.astype(jnp.int8), (pos, jnp.int32(0)))
            r = x - c8 * (1.0 / 127.0)
            rs = jnp.maximum(jnp.max(jnp.abs(r), axis=1) / 7.0, 1e-12)
            c4 = jnp.clip(jnp.round(r / rs[:, None]), -7, 7
                          ).astype(jnp.int32) + 8
            packed = (c4[:, 0::2] | (c4[:, 1::2] << 4)).astype(jnp.uint8)
            r4buf = jax.lax.dynamic_update_slice(
                r4buf, packed, (pos, jnp.int32(0)))
            rsbuf = jax.lax.dynamic_update_slice(
                rsbuf, rs.astype(jnp.float32), (pos,))
            return buf, r4buf, rsbuf
        x = _normalized_normal(key, (n_rows, dim), gen_dtype)
        if int8:  # rows unit-normalized -> |x| <= 1; global scale 1/127
            x = jnp.clip(jnp.round(x.astype(jnp.float32) * 127.0),
                         -127, 127).astype(jnp.int8)
        return (jax.lax.dynamic_update_slice(buf, x, (pos, jnp.int32(0))),
                r4buf, rsbuf)

    # refined chunks carry ~4 f32-sized intermediates -> smaller chunk
    chunk_rows = min(chunk_rows, 1_000_000 if refined else 4_000_000)
    flat = jnp.zeros((total, dim), jnp.int8 if int8 else sdt)
    res4 = jnp.zeros((total, dim // 2) if refined else (1, 1), jnp.uint8)
    res_scales = jnp.zeros((total,) if refined else (1,), jnp.float32)
    pos = 0
    ci = 0
    while pos < total:
        n = min(chunk_rows, total - pos)
        flat, res4, res_scales = fill_chunk(
            flat, res4, res_scales, jax.random.fold_in(keys[0], ci),
            jnp.int32(pos), n)
        pos += n
        ci += 1
    flat_scales = (jnp.full((num_docs,), 1.0 / 127.0, jnp.float32)
                   if int8 else None)

    @jax.jit
    def padded_vals(key):
        vals = _normalized_normal(key, (num_docs, pooled_rows, dim), gen_dtype)
        if int8:
            vals = jnp.clip(jnp.round(vals.astype(jnp.float32) * 127.0),
                            -127, 127).astype(jnp.int8)
        return vals

    def padded(key):
        return PaddedMultiVectors(
            values=padded_vals(key),
            mask=jnp.ones((num_docs, pooled_rows), bool),
            scales=(jnp.full((num_docs, pooled_rows), 1.0 / 127.0, jnp.float32)
                    if int8 else None))

    stores = {
        "initial": RaggedMultiVectors(
            flat=flat, offsets=jnp.asarray(offsets.astype(np.int32)),
            lengths=jnp.asarray(lengths), max_len=max_len, scales=flat_scales,
            res4=res4 if refined else None,
            res_scales=res_scales if refined else None),
        "mean_pooling": padded(keys[1]),
        "experimental_pooling": padded(keys[2]),
        "global_pooling": SingleVectors(
            values=jax.jit(
                lambda k: _normalized_normal(k, (num_docs, dim), jnp.float32)
            )(keys[3])),
    }

    manifest = Manifest()
    manifest.ids = [f"d{i}" for i in range(num_docs)]
    manifest._id_to_idx = {pid: i for i, pid in enumerate(manifest.ids)}
    if payload_years:
        years = rng.integers(2018, 2018 + payload_years, num_docs)
        manifest.payloads = [{"year": int(y)} for y in years]
        manifest.create_payload_index("year")
    else:
        manifest.payloads = [{} for _ in range(num_docs)]
    return SealedIndex(stores=stores, manifest=manifest,
                       storage_dtype=storage_dtype)


def synthetic_planted_index(
    num_docs: int,
    dim: int = 128,
    clusters: int = 1000,
    min_tokens: int = 128,
    max_tokens: int = 256,
    pooled_rows: int = 12,
    storage_dtype: str = "bfloat16",
    seed: int = 0,
    doc_spread: float = 0.35,
    token_noise: float = 0.25,
    chunk_rows: int = 2_000_000,
    latents=None,
):
    """Planted-relevance SealedIndex at corpus scale, generated in HBM.

    Extends :func:`synthetic_index` with relevance STRUCTURE (VERDICT r4 #5):
    ``clusters`` unit centers; each doc ``i`` owns a latent direction
    ``l_i = normalize(center[i % clusters] + doc_spread * g_i)`` and every
    token row is ``normalize(l_i + token_noise * n)``. Docs in the same
    cluster are near-ties (the regime where int8's ~3e-3 score noise can
    actually reorder results — pure-random corpora are too separable), while
    the per-doc latent makes exactly one doc the right answer for a query
    drawn from it (:func:`planted_queries`). This is the at-scale analogue of
    the 300-doc ``dtype_quality_column`` protocol
    (scripts/run_baseline_configs.py) and of the reference's collection-scale
    dtype concern (reference run_qdrant_beir.py:1531-1561).

    dtype-twin contract: ALL generation math is f32 from the seed stream, and
    the storage dtype only affects the final cast/quantize — so two calls
    with the same (seed, shape) args and different ``storage_dtype`` store
    the SAME underlying real vectors, making bf16-vs-int8 ranking deltas
    attributable purely to quantization.

    Returns ``(index, latents)``; pass ``latents`` back in to build a twin
    without recomputing (and to :func:`planted_queries`).
    """
    rng = np.random.default_rng(seed)
    lengths = rng.integers(min_tokens, max_tokens + 1, num_docs).astype(np.int32)
    aligned = ((lengths + ALIGN - 1) // ALIGN) * ALIGN
    offsets = np.zeros(num_docs, np.int64)
    np.cumsum(aligned[:-1], out=offsets[1:])
    max_len = int(lengths.max())
    total = int(aligned.sum()) + ((max_len + 31) // 32) * 32
    sdt = jnp.dtype(
        {"bfloat16": jnp.bfloat16, "float16": jnp.float16,
         "float32": jnp.float32, "int8": jnp.int8,
         "int8_refined": jnp.int8}[storage_dtype])
    keys = jax.random.split(jax.random.PRNGKey(seed), 8)
    refined = storage_dtype == "int8_refined"
    int8 = storage_dtype == "int8" or refined

    dev_starts = jnp.asarray(offsets.astype(np.int64))
    # noise scales are RELATIVE to the unit centers/latents: a raw gaussian
    # has norm ~sqrt(dim), so divide by sqrt(dim) to make ``doc_spread`` /
    # ``token_noise`` the perturbation magnitude (cos(l_i, l_j) within a
    # cluster ~ 1/(1+doc_spread^2) — near-ties, not noise-swamped)
    nsc = 1.0 / float(np.sqrt(dim))

    if latents is None:
        @jax.jit
        def make_latents(kc, kl):
            centers = _normalized_normal(kc, (clusters, dim), jnp.float32)
            g = jax.random.normal(kl, (num_docs, dim), jnp.float32)
            docs = jnp.arange(num_docs) % clusters
            x = centers[docs] + (doc_spread * nsc) * g
            return x * jax.lax.rsqrt(
                jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)

        latents = make_latents(keys[4], keys[5])

    def _quantize(x, buf, r4buf, rsbuf, pos):
        """Store f32 rows ``x`` at ``pos`` under the requested dtype; the
        int8/int4 packing follows fill_chunk/store._residual_int4 exactly."""
        if refined:
            c8 = jnp.clip(jnp.round(x * 127.0), -127, 127)
            buf = jax.lax.dynamic_update_slice(
                buf, c8.astype(jnp.int8), (pos, jnp.int32(0)))
            r = x - c8 * (1.0 / 127.0)
            rs = jnp.maximum(jnp.max(jnp.abs(r), axis=1) / 7.0, 1e-12)
            c4 = jnp.clip(jnp.round(r / rs[:, None]), -7, 7
                          ).astype(jnp.int32) + 8
            packed = (c4[:, 0::2] | (c4[:, 1::2] << 4)).astype(jnp.uint8)
            r4buf = jax.lax.dynamic_update_slice(
                r4buf, packed, (pos, jnp.int32(0)))
            rsbuf = jax.lax.dynamic_update_slice(
                rsbuf, rs.astype(jnp.float32), (pos,))
            return buf, r4buf, rsbuf
        if int8:
            x = jnp.clip(jnp.round(x * 127.0), -127, 127).astype(jnp.int8)
        else:
            x = x.astype(sdt)
        return (jax.lax.dynamic_update_slice(buf, x, (pos, jnp.int32(0))),
                r4buf, rsbuf)

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1, 2), static_argnums=(5,))
    def fill_chunk(buf, r4buf, rsbuf, key, pos, n_rows):
        rows = pos + jnp.arange(n_rows)
        doc = jnp.clip(
            jnp.searchsorted(dev_starts, rows, side="right") - 1,
            0, num_docs - 1)
        x = latents[doc] + (token_noise * nsc) * jax.random.normal(
            key, (n_rows, dim), jnp.float32)
        x = x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)
        return _quantize(x, buf, r4buf, rsbuf, pos)

    chunk_rows = min(chunk_rows, 1_000_000 if refined else 2_000_000)
    flat = jnp.zeros((total, dim), jnp.int8 if int8 else sdt)
    res4 = jnp.zeros((total, dim // 2) if refined else (1, 1), jnp.uint8)
    res_scales = jnp.zeros((total,) if refined else (1,), jnp.float32)
    pos = 0
    ci = 0
    while pos < total:
        n = min(chunk_rows, total - pos)
        flat, res4, res_scales = fill_chunk(
            flat, res4, res_scales, jax.random.fold_in(keys[0], ci),
            jnp.int32(pos), n)
        pos += n
        ci += 1
    flat_scales = (jnp.full((num_docs,), 1.0 / 127.0, jnp.float32)
                   if int8 else None)

    def padded(key):
        @jax.jit
        def mk(k):
            x = latents[:, None, :] + (token_noise * nsc) * jax.random.normal(
                k, (num_docs, pooled_rows, dim), jnp.float32)
            x = x * jax.lax.rsqrt(
                jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)
            if int8:
                return jnp.clip(jnp.round(x * 127.0), -127, 127
                                ).astype(jnp.int8)
            return x.astype(sdt if sdt != jnp.int8 else jnp.bfloat16)

        return PaddedMultiVectors(
            values=mk(key),
            mask=jnp.ones((num_docs, pooled_rows), bool),
            scales=(jnp.full((num_docs, pooled_rows), 1.0 / 127.0, jnp.float32)
                    if int8 else None))

    stores = {
        "initial": RaggedMultiVectors(
            flat=flat, offsets=jnp.asarray(offsets.astype(np.int32)),
            lengths=jnp.asarray(lengths), max_len=max_len, scales=flat_scales,
            res4=res4 if refined else None,
            res_scales=res_scales if refined else None),
        "mean_pooling": padded(keys[1]),
        "experimental_pooling": padded(keys[2]),
        "global_pooling": SingleVectors(values=latents),
    }
    manifest = Manifest()
    manifest.ids = [f"d{i}" for i in range(num_docs)]
    manifest._id_to_idx = {pid: i for i, pid in enumerate(manifest.ids)}
    manifest.payloads = [{} for _ in range(num_docs)]
    return SealedIndex(stores=stores, manifest=manifest,
                       storage_dtype=storage_dtype), latents


def planted_queries(latents, n_queries: int, min_tokens: int = 8,
                    max_tokens: int = 24, noise: float = 0.35, seed: int = 100):
    """Queries with known answers for a planted index: query ``j`` targets a
    uniformly sampled doc and its tokens are ``normalize(l_target + noise*n)``.

    Returns ``(queries, qrels)`` where qrels is BEIR-shaped
    ``{qid: {doc_id: 1}}`` (ViDoRe v1 pairing — reference
    dataset_loader.py:318-359) against :func:`synthetic_planted_index` ids.
    """
    rng = np.random.default_rng(seed)
    num_docs, dim = int(latents.shape[0]), int(latents.shape[1])
    targets = rng.integers(0, num_docs, n_queries)
    lt = np.asarray(latents[jnp.asarray(targets)])  # one device gather
    queries = []
    qrels = {}
    nsc = noise / float(np.sqrt(dim))  # relative scale, as in the index
    for j, t in enumerate(targets):
        n = int(rng.integers(min_tokens, max_tokens + 1))
        q = lt[j][None] + nsc * rng.standard_normal((n, dim)).astype(
            np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True) + 1e-8
        queries.append(q.astype(np.float32))
        qrels[f"q{j}"] = {f"d{int(t)}": 1}
    return queries, qrels
