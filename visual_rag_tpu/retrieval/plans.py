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


def _topk_masked(scores, k: int, doc_mask):
    if doc_mask is not None:  # None = unfiltered: saves a host->device transfer
        scores = jnp.where(doc_mask > 0, scores, NEG_INF)
    vals, idx = jax.lax.top_k(scores, k)
    return vals, jnp.where(vals > NEG_INF / 2, idx, -1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("kind", "k", "ds", "max_len", "use_pallas"))
def single_plan(s1: Dict, ragged: Dict, doc_mask, tokens, qmask, pooled,
                *, kind: str, k: int, ds: int, max_len: int, use_pallas: bool):
    scores = _local_stage1(kind, s1, ragged, tokens, qmask, pooled, ds, max_len,
                           use_pallas)
    return _topk_masked(scores, k, doc_mask)


@partial(jax.jit, static_argnames=("kind", "pk", "k", "ds", "max_len", "use_pallas"))
def two_stage_plan(s1: Dict, ragged: Dict, doc_mask, tokens, qmask, pooled,
                   *, kind: str, pk: int, k: int, ds: int, max_len: int,
                   use_pallas: bool):
    scores = _local_stage1(kind, s1, ragged, tokens, qmask, pooled, ds, max_len,
                           use_pallas)
    _, cand = _topk_masked(scores, pk, doc_mask)
    rr = _local_rerank(ragged, tokens, qmask, cand, max_len, use_pallas)
    vals, pos = jax.lax.top_k(rr, k)
    idx = jnp.where(vals > NEG_INF / 2, jnp.take_along_axis(cand, pos, axis=1), -1)
    return vals, idx.astype(jnp.int32)


@partial(jax.jit, static_argnames=("s1k", "s2k", "k", "ds", "max_len", "use_pallas"))
def three_stage_plan(gstore: Dict, estore: Dict, ragged: Dict, doc_mask,
                     tokens, qmask, pooled,
                     *, s1k: int, s2k: int, k: int, ds: int, max_len: int,
                     use_pallas: bool):
    s1 = _local_stage1("pooled_single", gstore, ragged, tokens, qmask, pooled,
                       ds, max_len, use_pallas)
    _, c1 = _topk_masked(s1, s1k, doc_mask)
    b = tokens.shape[0]
    m1 = jnp.zeros((b, ds), dtype=bool)
    # .max (not .set): -1 padding entries all collide onto index 0, and a
    # last-write-wins .set would erase a genuine doc-0 candidacy (ADVICE r1).
    m1 = jax.vmap(lambda m, c: m.at[jnp.maximum(c, 0)].max(c >= 0))(m1, c1)
    s2 = _local_stage1("tokens_padded", estore, ragged, tokens, qmask, pooled,
                       ds, max_len, use_pallas)
    if doc_mask is not None:
        m1 = m1 & (doc_mask > 0)[None, :]
    s2 = jnp.where(m1, s2, NEG_INF)
    v2, c2 = jax.lax.top_k(s2, s2k)
    c2 = jnp.where(v2 > NEG_INF / 2, c2, -1).astype(jnp.int32)
    rr = _local_rerank(ragged, tokens, qmask, c2, max_len, use_pallas)
    vals, pos = jax.lax.top_k(rr, k)
    idx = jnp.where(vals > NEG_INF / 2, jnp.take_along_axis(c2, pos, axis=1), -1)
    fi = jnp.maximum(idx, 0)
    return (vals, idx.astype(jnp.int32),
            jnp.take_along_axis(s1, fi, axis=1),
            jnp.take_along_axis(s2, fi, axis=1))
