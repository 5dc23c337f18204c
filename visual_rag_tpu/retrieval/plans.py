"""Fused single-dispatch query plans for the batched engine.

Each retrieval mode compiles to ONE jit-compiled function taking the store
arrays + query batch: stage scoring, top-k selection, candidate mapping and
rerank all run in a single device dispatch. This matters doubly on
tunneled/remote TPUs where every eager dispatch costs milliseconds — the
unfused batch path pays ~6 dispatches per batch, the fused plan pays 1.

The per-shard scoring bodies are shared with the sharded engine
(parallel/sharded.py) — the single-device plan is the n_shards=1 special case
without the collectives.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from visual_rag_tpu.parallel.sharded import (
    _local_rerank,
    _local_stage1,
)

NEG_INF = -1e30


def _topk_masked(scores, k: int, doc_mask, approx: bool = False):
    if doc_mask is not None:  # None = unfiltered: saves a host->device transfer
        scores = jnp.where(doc_mask > 0, scores, NEG_INF)
    if approx and k < scores.shape[-1]:
        # lax.approx_max_k: the TPU-native approximate cut (recall ~0.99 at
        # default settings). The reference's stage-1 is HNSW — also
        # approximate — so this is parity semantics, and at >=64k docs it is
        # ~6x faster than exact top_k (BENCH_SUMMARY scale profile). The
        # exact rerank still re-scores every surviving candidate.
        vals, idx = jax.lax.approx_max_k(scores, k)
    else:
        vals, idx = jax.lax.top_k(scores, k)
    return vals, jnp.where(vals > NEG_INF / 2, idx, -1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("kind", "k", "ds", "max_len", "use_pallas"))
def single_plan(s1: Dict, ragged: Dict, doc_mask, tokens, qmask, pooled,
                *, kind: str, k: int, ds: int, max_len: int, use_pallas: bool):
    scores = _local_stage1(kind, s1, ragged, tokens, qmask, pooled, ds, max_len,
                           use_pallas)
    return _topk_masked(scores, k, doc_mask)  # final result: always exact


@partial(jax.jit, static_argnames=("kind", "pk", "k", "ds", "max_len",
                                   "use_pallas", "approx"))
def two_stage_plan(s1: Dict, ragged: Dict, doc_mask, tokens, qmask, pooled,
                   *, kind: str, pk: int, k: int, ds: int, max_len: int,
                   use_pallas: bool, approx: bool = False):
    scores = _local_stage1(kind, s1, ragged, tokens, qmask, pooled, ds, max_len,
                           use_pallas)
    _, cand = _topk_masked(scores, pk, doc_mask, approx=approx)
    rr = _local_rerank(ragged, tokens, qmask, cand, max_len, use_pallas)
    vals, pos = jax.lax.top_k(rr, k)
    idx = jnp.where(vals > NEG_INF / 2, jnp.take_along_axis(cand, pos, axis=1), -1)
    return vals, idx.astype(jnp.int32)


def _gathered_tokens_padded(estore: Dict, tokens, qmask, cand):
    """Stage-2 MaxSim of query tokens vs the padded rows of CANDIDATE docs
    only: [B, s1k] scores via a per-query gather. At corpus scale this beats
    scoring all D docs and masking by ~D/s1k in FLOPs (the full tokens scan
    was the three_stage bottleneck in the 100k profile: 387 of 625 ms)."""
    vals_t, mask_t = estore["vals_t"], estore["mask_t"]  # [P, D, dim], [P, D]
    scales_t = estore.get("scales_t")
    safe = jnp.maximum(cand, 0)  # [B, K]
    sub = jnp.take(vals_t, safe, axis=1)  # [P, B, K, dim]
    msk = jnp.take(mask_t, safe, axis=1)  # [P, B, K]
    cd = jnp.bfloat16 if vals_t.dtype == jnp.int8 else vals_t.dtype
    sims = jnp.einsum("bqd,pbkd->bqpk", tokens.astype(cd), sub.astype(cd),
                      preferred_element_type=jnp.float32)
    if scales_t is not None:
        sims = sims * jnp.take(scales_t, safe, axis=1).transpose(1, 0, 2)[:, None]
    sims = jnp.where(msk.transpose(1, 0, 2)[:, None] > 0, sims, NEG_INF)
    per_q = jnp.max(sims, axis=2)  # [B, NQ, K]
    has = jnp.max(msk, axis=0).transpose(0, 1) > 0  # [B, K]
    per_q = jnp.where(has[:, None, :], per_q, 0.0)
    per_q = per_q * jnp.asarray(qmask, jnp.float32)[:, :, None]
    scores = jnp.sum(per_q, axis=1)  # [B, K]
    return jnp.where(cand >= 0, scores, NEG_INF)


@partial(jax.jit, static_argnames=("s1k", "s2k", "k", "ds", "max_len",
                                   "use_pallas", "approx"))
def three_stage_plan(gstore: Dict, estore: Dict, ragged: Dict, doc_mask,
                     tokens, qmask, pooled,
                     *, s1k: int, s2k: int, k: int, ds: int, max_len: int,
                     use_pallas: bool, approx: bool = False):
    s1 = _local_stage1("pooled_single", gstore, ragged, tokens, qmask, pooled,
                       ds, max_len, use_pallas)
    _, c1 = _topk_masked(s1, s1k, doc_mask, approx=approx)
    # stage 2: score ONLY the stage-1 candidates (gather, not scan+mask)
    s2c = _gathered_tokens_padded(estore, tokens, qmask, c1)  # [B, s1k]
    s2k = min(s2k, s1k)
    v2, pos2 = jax.lax.top_k(s2c, s2k)  # s1k is small: exact cut
    c2 = jnp.where(v2 > NEG_INF / 2,
                   jnp.take_along_axis(c1, pos2, axis=1), -1).astype(jnp.int32)
    rr = _local_rerank(ragged, tokens, qmask, c2, max_len, use_pallas)
    vals, pos = jax.lax.top_k(rr, k)
    idx = jnp.where(vals > NEG_INF / 2, jnp.take_along_axis(c2, pos, axis=1), -1)
    fi = jnp.maximum(idx, 0)
    s2_at = jnp.take_along_axis(v2, pos, axis=1)  # stage-2 scores at winners
    return (vals, idx.astype(jnp.int32),
            jnp.take_along_axis(s1, fi, axis=1), s2_at)
