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
    _gathered_tokens_padded,
    _local_rerank,
    _local_stage1,
    _refine_topk,
    _refine_window,
)

NEG_INF = -1e30


def _prep_wire(q1, q2, q3, wire: str, b: int, nq: int):
    """Dispatch device-side query prep for either wire format.

    padded: q1=[B,NQ,dim] raw tokens, q2=[B,NQ] qmask, q3=None.
    packed: q1=[G*Rg,dim] raw packed tokens, q2=[G*Rg] pos, q3=[G,Rg] qid
    (batch.pack_queries_grouped). Returns (tokens [B,NQ,dim] l2-normed,
    qmask [B,NQ] f32, pooled [B,dim], packed dict or None).
    """
    if wire == "packed":
        return _prep_queries_packed(q1, q2, q3, b, nq)
    tokens, pooled = _prep_queries(q1, q2)
    return tokens, jnp.asarray(q2, jnp.float32), pooled, None


def _prep_queries_packed(packed, pos, qid, b: int, nq: int):
    """Device-side prep for the group-packed wire (VERDICT r3 #6): the wire
    ships only real tokens (+<=10% group padding), halving the host->device
    transfer vs the padded layout at ColPali query lengths. The classic
    padded [B, NQ, dim] view is reconstructed with one row scatter (pad rows
    carry pos = B*NQ -> dropped) for the rerank kernels and pooled-query
    math, so every downstream result is bit-identical to the padded wire;
    the densely packed normalized tokens + ownership matrix additionally
    feed the packed stage-1 kernels (M dim = real tokens, not B*NQ)."""
    t = packed.astype(jnp.float32)  # [G*Rg, dim]
    g, rg = qid.shape
    gq = b // g
    flat_t = jnp.zeros((b * nq, t.shape[1]), jnp.float32).at[pos].set(
        t, mode="drop")
    flat_m = jnp.zeros((b * nq,), jnp.float32).at[pos].set(1.0, mode="drop")
    tokens_raw = flat_t.reshape(b, nq, t.shape[1])
    qmask = flat_m.reshape(b, nq)
    tokens, pooled = _prep_queries(tokens_raw, qmask)
    valid = (qid.reshape(-1) >= 0).astype(jnp.float32)
    tn = t * valid[:, None]
    tn = tn / (jnp.linalg.norm(tn, axis=-1, keepdims=True) + 1e-8)
    seg = (qid[:, None, :] == jnp.arange(gq, dtype=qid.dtype)[None, :, None]
           ).astype(jnp.float32)  # [G, gq, Rg]
    return tokens, qmask, pooled, {"q": tn, "seg": seg,
                                   "qid": jnp.asarray(qid, jnp.int32)}


def _prep_queries(raw, qmask):
    """Device-side query prep: raw (possibly fp16-wire) padded tokens ->
    (l2-normalized f32 tokens, normalized mean-of-raw pooled query).

    Moving normalization into the plan keeps the host loop to plain copies
    (was ~25 ms/batch of numpy norms at B=256) and lets the wire format be
    fp16 (halves the host->device transfer) without an extra dispatch.
    """
    qm = jnp.asarray(qmask, jnp.float32)
    t = raw.astype(jnp.float32) * qm[..., None]
    tokens = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-8)
    mean = jnp.sum(t, axis=1) / jnp.maximum(jnp.sum(qm, axis=1, keepdims=True), 1.0)
    pooled = mean / (jnp.linalg.norm(mean, axis=-1, keepdims=True) + 1e-8)
    return tokens, pooled


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


@partial(jax.jit, static_argnames=("kind", "k", "ds", "max_len", "use_pallas",
                                   "wire", "b", "nq", "bucket_lens"))
def single_plan(s1: Dict, ragged: Dict, doc_mask, q1, q2, q3=None,
                *, kind: str, k: int, ds: int, max_len: int, use_pallas: bool,
                wire: str = "padded", b: int = 0, nq: int = 0,
                bucket_lens: tuple = ()):
    tokens, qmask, pooled, packed = _prep_wire(q1, q2, q3, wire, b, nq)
    scores = _local_stage1(kind, s1, ragged, tokens, qmask, pooled, ds, max_len,
                           use_pallas, packed=packed, bucket_lens=bucket_lens)
    if kind == "tokens_ragged" and ragged.get("res4") is not None:
        # int8 two-pass: exhaustive int8 scan ranks a window, the int4
        # residual re-scores it at 12-bit precision for the final cut
        vals8, cand = _topk_masked(scores, _refine_window(k, ds), doc_mask)
        return _refine_topk(ragged, tokens, qmask, cand, vals8, k, max_len)
    return _topk_masked(scores, k, doc_mask)  # final result: always exact


@partial(jax.jit, static_argnames=("kind", "pk", "k", "ds", "max_len",
                                   "use_pallas", "approx", "impl",
                                   "wire", "b", "nq", "bucket_lens"))
def two_stage_plan(s1: Dict, ragged: Dict, doc_mask, q1, q2, q3=None,
                   *, kind: str, pk: int, k: int, ds: int, max_len: int,
                   use_pallas: bool, approx: bool = False,
                   impl: str = "plain", wire: str = "padded",
                   b: int = 0, nq: int = 0, bucket_lens: tuple = ()):
    tokens, qmask, pooled, packed = _prep_wire(q1, q2, q3, wire, b, nq)
    scores = _local_stage1(kind, s1, ragged, tokens, qmask, pooled, ds, max_len,
                           use_pallas, packed=packed, s1_prefetch=True)
    _, cand = _topk_masked(scores, pk, doc_mask, approx=approx)
    rr = _local_rerank(ragged, tokens, qmask, cand, max_len, use_pallas,
                       impl=impl, packed=packed, bucket_lens=bucket_lens)
    return _refine_topk(ragged, tokens, qmask, cand, rr, k, max_len)




@partial(jax.jit, static_argnames=("s1k", "s2k", "k", "ds", "max_len",
                                   "use_pallas", "approx", "impl",
                                   "wire", "b", "nq", "bucket_lens"))
def three_stage_plan(gstore: Dict, estore: Dict, ragged: Dict, doc_mask,
                     q1, q2, q3=None,
                     *, s1k: int, s2k: int, k: int, ds: int, max_len: int,
                     use_pallas: bool, approx: bool = False,
                     impl: str = "plain", wire: str = "padded",
                     b: int = 0, nq: int = 0, bucket_lens: tuple = ()):
    tokens, qmask, pooled, packed = _prep_wire(q1, q2, q3, wire, b, nq)
    s1 = _local_stage1("pooled_single", gstore, ragged, tokens, qmask, pooled,
                       ds, max_len, use_pallas)
    _, c1 = _topk_masked(s1, s1k, doc_mask, approx=approx)
    # stage 2: score ONLY the stage-1 candidates (gather, not scan+mask)
    s2c = _gathered_tokens_padded(estore, tokens, qmask, c1)  # [B, s1k]
    s2k = min(s2k, s1k)
    k = min(k, s2k)  # stage-2 pool bounds the final cut (stage1_k < stage2_k)
    v2, pos2 = jax.lax.top_k(s2c, s2k)  # s1k is small: exact cut
    c2 = jnp.where(v2 > NEG_INF / 2,
                   jnp.take_along_axis(c1, pos2, axis=1), -1).astype(jnp.int32)
    rr = _local_rerank(ragged, tokens, qmask, c2, max_len, use_pallas,
                       impl=impl, packed=packed, bucket_lens=bucket_lens)
    if ragged.get("res4") is None:
        vals, pos = jax.lax.top_k(rr, k)
        idx = jnp.where(vals > NEG_INF / 2,
                        jnp.take_along_axis(c2, pos, axis=1), -1)
        s2_at = jnp.take_along_axis(v2, pos, axis=1)  # stage-2 scores at winners
    else:
        vals, idx = _refine_topk(ragged, tokens, qmask, c2, rr, k, max_len)
        # winners come from the refine window, not c2 order: recover each
        # winner's stage-2 score by position match in the candidate row
        match = (c2[:, None, :] == idx[:, :, None]) & (idx[:, :, None] >= 0)
        pos2 = jnp.argmax(match, axis=2)
        s2_at = jnp.where(idx >= 0,
                          jnp.take_along_axis(v2, pos2, axis=1), NEG_INF)
    fi = jnp.maximum(idx, 0)
    return (vals, idx.astype(jnp.int32),
            jnp.take_along_axis(s1, fi, axis=1), s2_at)
