"""Corpus sharding over a device mesh + distributed query plans.

Layout: documents are partitioned contiguously over the ``data`` mesh axis
(n shards, Ds = ceil(D/n) docs each, tail padded with empty docs). Every named
vector store is stacked with a leading shard axis and placed with
``NamedSharding(mesh, P('data', ...))`` so each device holds exactly its
shard's rows in HBM.

Query plans run as ONE ``shard_map`` call per search:

    per-shard scoring (Pallas kernels on TPU / XLA fallback on CPU)
      -> local top-k
      -> all_gather + replicated merge (the distributed top-k)
      -> per-shard exact rerank of the merged candidate set
      -> pmax over shards (each candidate is valid on exactly one shard)
      -> final replicated top-k

The merged candidate set is identical to what the single-device engine would
prefetch, so sharded results match the single-device engine exactly (up to
cross-shard ordering of exact score ties, which are broken by shard order
rather than global doc order).

Replaces: the reference's Qdrant-server-as-cluster distribution model
(SURVEY §2.5) with ICI collectives.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from visual_rag_tpu.index.store import (
    PaddedMultiVectors,
    RaggedMultiVectors,
    SingleVectors,
)
from visual_rag_tpu.ops.kernels.maxsim_rerank import (
    rerank_candidates,
    rerank_candidates_dedup,
)
from visual_rag_tpu.ops.kernels.maxsim_scan import (
    exhaustive_scores_packed,
    quantize_queries_int8,
    scan_kernel_fits as _scan_kernel_fits,
)
from visual_rag_tpu.ops.kernels.maxsim_sweep import (
    rerank_candidates_sweep,
    sweep_supported,
)
from visual_rag_tpu.ops.kernels.prefetch_topk import (
    auto_block_d,
    pooled_maxsim_scores_packed,
    pooled_maxsim_scores_qbatch,
)
from visual_rag_tpu.retrieval import batch as BATCH
from visual_rag_tpu.retrieval.engine import (
    SEARCH_MODES,
    EngineCommon,
    _STAGE1_ALIASES,
)
from visual_rag_tpu.retrieval.filters import PayloadFilter

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

NEG_INF = -1e30

# qdot stage-1 opt-out (read once at import — the jit plan caches key on
# static args only, so a mid-process env flip must not change trace behavior)
_TOKENS_QDOT = os.environ.get("VISUALRAG_TOKENS_QDOT", "1") != "0"


# ---------------------------------------------------------------------------
# Sharded index construction
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ShardedIndex:
    """Device-sharded collection: every array has a leading shard axis."""

    mesh: Mesh
    axis: str
    num_docs: int  # real docs (unpadded)
    docs_per_shard: int
    stores: Dict[str, Dict[str, jnp.ndarray]]  # name -> arrays (see builders)
    kinds: Dict[str, str]  # name -> padded|ragged|single
    manifest: Any
    max_len: int  # ragged full store max doc tokens

    @property
    def num_shards(self) -> int:
        return int(self.mesh.shape[self.axis])

    @classmethod
    def from_index(cls, index, mesh: Mesh, axis: str = "data",
                   compute_dtype: str = "float32") -> "ShardedIndex":
        """Shard a SealedIndex's stores over the mesh axis.

        Storage dtype is PRESERVED on device (VERDICT r1 item 4): bf16/f16
        shards ship as-is and int8 shards ship raw codes + scales (per-row for
        padded, per-doc for ragged) — the shard bodies already rescale. Only
        the tiny single-vector stores ([D, dim]) are dequantized to
        ``compute_dtype`` for maximal stage-1 precision, matching the
        single-device engine's handling exactly.
        """
        n = int(mesh.shape[axis])
        d = index.num_docs
        ds = -(-d // n) if d else 1
        cd = jnp.dtype(compute_dtype)

        def put(arr, spec):
            return jax.device_put(arr, NamedSharding(mesh, spec))

        stores: Dict[str, Dict[str, jnp.ndarray]] = {}
        kinds: Dict[str, str] = {}
        max_len = 1
        for name, store in index.stores.items():
            if isinstance(store, PaddedMultiVectors):
                # DEVICE-side reshape/transpose: no host pull of the store
                vals = jnp.asarray(store.values)  # storage dtype, codes if int8
                p = int(vals.shape[1])
                pad_docs = n * ds - d
                vpad = jnp.pad(vals, ((0, pad_docs), (0, 0), (0, 0)))
                mpad = jnp.pad(jnp.asarray(store.mask, jnp.float32),
                               ((0, pad_docs), (0, 0)))
                # P-leading per shard for the Pallas prefetch kernel
                vals_t = jnp.transpose(vpad.reshape(n, ds, p, -1), (0, 2, 1, 3))
                mask_t = jnp.transpose(mpad.reshape(n, ds, p), (0, 2, 1))
                stores[name] = {
                    "vals_t": put(vals_t, P(axis)),
                    "mask_t": put(mask_t, P(axis)),
                }
                if store.scales is not None:  # [D, P] -> [n, P, Ds]
                    spad = jnp.pad(jnp.asarray(store.scales, jnp.float32),
                                   ((0, pad_docs), (0, 0)))
                    stores[name]["scales_t"] = put(
                        jnp.transpose(spad.reshape(n, ds, p), (0, 2, 1)),
                        P(axis))
                kinds[name] = "padded"
            elif isinstance(store, SingleVectors):
                vals = store.dequantized(jnp.float32)  # tiny: [D, dim]
                vpad = jnp.pad(vals, ((0, n * ds - d), (0, 0)))
                stores[name] = {
                    "vals": put(vpad.reshape(n, ds, -1).astype(cd), P(axis)),
                }
                kinds[name] = "single"
            elif isinstance(store, RaggedMultiVectors):
                offsets = np.asarray(store.offsets).astype(np.int64)
                lengths = np.asarray(store.lengths).astype(np.int64)
                max_len = max(max_len, store.max_len)
                dim = store.dim
                aligned = ((lengths + 31) // 32) * 32
                # pack_aligned / synth lay docs out contiguously with
                # 32-aligned starts, so each shard's rows are ONE contiguous
                # slice of the global flat — shard device-side by slicing,
                # no host pull of the (possibly many-GB) token store.
                contiguous = (d == 0 or bool(
                    np.array_equal(offsets[1:], offsets[:-1] + aligned[:-1])))
                flat_dev = jnp.asarray(store.flat)
                shard_offs = np.zeros((n, ds), np.int32)
                shard_lens = np.zeros((n, ds), np.int32)
                spans = []
                for si in range(n):
                    lo, hi = si * ds, min((si + 1) * ds, d)
                    if hi > lo:
                        start = int(offsets[lo])
                        span = int(offsets[hi - 1] + aligned[hi - 1]) - start
                        shard_offs[si, : hi - lo] = offsets[lo:hi] - start
                        shard_lens[si, : hi - lo] = lengths[lo:hi]
                    else:
                        start, span = 0, 0
                    spans.append((start, span))
                # tail pad by ceil32(max_len): the rerank kernel widens its
                # DMA window to ceil32(max_len), and a trailing zero-length
                # doc contributes 0 aligned rows to the span
                pad_rows = ((store.max_len + 31) // 32) * 32
                if contiguous:
                    t_max = max((sp for _, sp in spans), default=0) + pad_rows
                    pieces = [
                        jnp.pad(flat_dev[start : start + span],
                                ((0, t_max - span), (0, 0)))
                        for start, span in spans
                    ]
                    flats = jnp.stack(pieces)
                else:  # custom layouts: per-doc host repack (slow path)
                    flat_np = np.asarray(store.flat)
                    bufs = []
                    for si in range(n):
                        lo, hi = si * ds, min((si + 1) * ds, d)
                        pos = 0
                        rows = []
                        for j in range(lo, hi):
                            shard_offs[si, j - lo] = pos
                            pos += int(aligned[j])
                        buf = np.zeros((max(pos, 1) + pad_rows, dim),
                                       dtype=flat_np.dtype)
                        for j in range(lo, hi):
                            buf[shard_offs[si, j - lo] :
                                shard_offs[si, j - lo] + int(lengths[j])] =                                 flat_np[offsets[j] : offsets[j] + int(lengths[j])]
                        bufs.append(buf)
                    t_max = max(b.shape[0] for b in bufs)
                    flats = jnp.stack([
                        jnp.asarray(np.pad(b, ((0, t_max - b.shape[0]), (0, 0))))
                        for b in bufs])
                stores[name] = {
                    "flat": put(flats, P(axis)),
                    "offsets": put(jnp.asarray(shard_offs), P(axis)),
                    "lengths": put(jnp.asarray(shard_lens), P(axis)),
                }
                if store.scales is not None:  # per-doc scales -> [n, Ds]
                    spad = jnp.pad(jnp.asarray(store.scales, jnp.float32),
                                   (0, n * ds - d))
                    stores[name]["scales"] = put(spad.reshape(n, ds), P(axis))
                if store.res4 is not None:
                    # int4 residual sidecar rows are 1:1 with flat rows —
                    # shard with the identical spans/repack
                    if contiguous:
                        r_dev = jnp.asarray(store.res4)
                        rs_dev = jnp.asarray(store.res_scales)
                        stores[name]["res4"] = put(jnp.stack([
                            jnp.pad(r_dev[s : s + sp], ((0, t_max - sp), (0, 0)))
                            for s, sp in spans]), P(axis))
                        stores[name]["res_scales"] = put(jnp.stack([
                            jnp.pad(rs_dev[s : s + sp], (0, t_max - sp))
                            for s, sp in spans]), P(axis))
                    else:
                        r_np = np.asarray(store.res4)
                        rs_np = np.asarray(store.res_scales)
                        rbufs, rsbufs = [], []
                        for si in range(n):
                            lo, hi = si * ds, min((si + 1) * ds, d)
                            rb = np.zeros((t_max, r_np.shape[1]), np.uint8)
                            rsb = np.zeros((t_max,), np.float32)
                            for j in range(lo, hi):
                                o = shard_offs[si, j - lo]
                                rb[o : o + int(lengths[j])] = r_np[
                                    offsets[j] : offsets[j] + int(lengths[j])]
                                rsb[o : o + int(lengths[j])] = rs_np[
                                    offsets[j] : offsets[j] + int(lengths[j])]
                            rbufs.append(rb)
                            rsbufs.append(rsb)
                        stores[name]["res4"] = put(
                            jnp.asarray(np.stack(rbufs)), P(axis))
                        stores[name]["res_scales"] = put(
                            jnp.asarray(np.stack(rsbufs)), P(axis))
                kinds[name] = "ragged"
            else:  # pragma: no cover
                raise TypeError(f"Unknown store type for {name!r}")
        return cls(
            mesh=mesh, axis=axis, num_docs=d, docs_per_shard=ds,
            stores=stores, kinds=kinds, manifest=index.manifest, max_len=max_len,
        )

    def nbytes(self) -> int:
        """Total device bytes across all shards (storage-dtype preserved)."""
        return sum(int(a.size) * a.dtype.itemsize
                   for s in self.stores.values() for a in s.values())

    def doc_mask_shards(self, filter_obj: Optional[PayloadFilter]) -> jnp.ndarray:
        """[n, Ds] f32 validity mask: filter AND not-a-padding-slot.

        Memoized on (filter signature, manifest version) — including the
        no-filter validity mask, which is identical for every unfiltered
        search and was previously rebuilt + re-transferred per batch.
        """
        empty = filter_obj is None or filter_obj.is_empty()
        key = (None if empty else filter_obj.signature(),
               getattr(self.manifest, "version", 0))
        cache = getattr(self, "_mask_cache", None)
        if cache is None:
            cache = self._mask_cache = {}
        cached = cache.get(key)
        if cached is not None:
            return cached
        n, ds = self.num_shards, self.docs_per_shard
        mask = np.zeros((n * ds,), dtype=np.float32)
        mask[: self.num_docs] = 1.0
        if not empty:
            fm = filter_obj.evaluate(self.manifest).astype(np.float32)
            mask[: self.num_docs] *= fm
        dev = jax.device_put(
            jnp.asarray(mask.reshape(n, ds)), NamedSharding(self.mesh, P(self.axis))
        )
        if len(cache) >= 64:
            cache.pop(next(iter(cache)))
        cache[key] = dev
        return dev


# ---------------------------------------------------------------------------
# Shard-local scoring primitives (operate on local, leading-dim-stripped arrays)
# ---------------------------------------------------------------------------


def _compute_dtype_for(arr):
    return jnp.bfloat16 if arr.dtype == jnp.int8 else arr.dtype


def _local_tokens_padded(s1, tokens, qmask, use_pallas, qdot=False):
    vals_t, mask_t = s1["vals_t"], s1["mask_t"]
    scales_t = s1.get("scales_t")  # per-row int8 scales (None for float stores)
    if use_pallas:
        return pooled_maxsim_scores_qbatch(
            vals_t, mask_t, tokens, qmask, scales_t, q_chunk=8,
            block_d=auto_block_d(int(vals_t.shape[0]), vals_t.dtype.itemsize,
                                 int(vals_t.shape[-1])),
            qdot_int8=qdot)
    # XLA fallback straight off the P-leading layout
    qw = jnp.asarray(qmask, jnp.float32)
    if qdot:
        b, nq, dim = tokens.shape
        qc, qs = quantize_queries_int8(tokens.reshape(b * nq, dim))
        sims = jnp.einsum("bqd,pnd->bqpn", qc.reshape(b, nq, dim), vals_t,
                          preferred_element_type=jnp.int32
                          ).astype(jnp.float32)
        qw = qw * qs.reshape(b, nq)  # scales commute with the max over P
    else:
        cd = _compute_dtype_for(vals_t)
        sims = jnp.einsum("bqd,pnd->bqpn", tokens.astype(cd),
                          vals_t.astype(cd),
                          preferred_element_type=jnp.float32)
    if scales_t is not None:
        sims = sims * scales_t[None, None, :, :]
    sims = jnp.where(mask_t[None, None, :, :] > 0, sims, NEG_INF)
    per_q = jnp.max(sims, axis=2)  # [B, NQ, Ds]
    has = jnp.max(mask_t, axis=0) > 0
    per_q = jnp.where(has[None, None, :], per_q, 0.0)
    per_q = per_q * qw[:, :, None]
    return jnp.sum(per_q, axis=1)


def _local_pooled_padded(s1, pooled):
    vals_t, mask_t = s1["vals_t"], s1["mask_t"]
    scales_t = s1.get("scales_t")
    cd = _compute_dtype_for(vals_t)
    sims = jnp.einsum("bd,pnd->bpn", pooled.astype(cd), vals_t.astype(cd),
                      preferred_element_type=jnp.float32)
    if scales_t is not None:
        sims = sims * scales_t[None, :, :]
    sims = jnp.where(mask_t[None, :, :] > 0, sims, NEG_INF)
    out = jnp.max(sims, axis=1)
    return jnp.where(jnp.max(mask_t, axis=0)[None, :] > 0, out, 0.0)


def _local_pooled_single(s1, pooled):
    vals = s1["vals"]
    cd = _compute_dtype_for(vals)
    out = jnp.einsum("bd,nd->bn", pooled.astype(cd), vals.astype(cd),
                     preferred_element_type=jnp.float32)
    scales = s1.get("scales")
    if scales is not None:
        out = out * scales[None, :]
    return out


def _gathered_tokens_padded(estore: Dict, tokens, qmask, cand):
    """Stage-2 MaxSim of query tokens vs the padded rows of CANDIDATE docs
    only: [B, s1k] scores via a per-query gather. At corpus scale this beats
    scoring all D docs and masking by ~D/s1k in FLOPs (the full tokens scan
    was the three_stage bottleneck in the 100k profile: 387 of 625 ms).

    Query-chunked (r5): the gather materializes [P, B, K, dim] + a
    [B, NQ, P, K] sims transient — ~5 MB per query at the 100k serving shape
    (P=12, K=1000), i.e. ~3 GB at bs=1024 next to a ~5 GB corpus. B is
    chunked via lax.map to bound the transient; per-doc scores are
    independent across queries, so this is bit-exact."""
    b, k = cand.shape
    p = int(estore["vals_t"].shape[0])
    dim = int(estore["vals_t"].shape[2])
    nq = int(tokens.shape[1])
    per_q = p * k * (dim * max(2, estore["vals_t"].dtype.itemsize) + nq * 4)
    bc = b
    while bc > 1 and bc * per_q > GATHER_BUDGET_BYTES:
        bc //= 2
    if bc < b:
        while b % bc:
            bc -= 1
        out = jax.lax.map(
            lambda args: _gathered_tokens_padded_chunk(
                estore, args[0], args[1], args[2]),
            (tokens.reshape(b // bc, bc, nq, dim),
             jnp.asarray(qmask).reshape(b // bc, bc, nq),
             cand.reshape(b // bc, bc, k)))
        return out.reshape(b, k)
    return _gathered_tokens_padded_chunk(estore, tokens, qmask, cand)


def _gathered_tokens_padded_chunk(estore: Dict, tokens, qmask, cand):
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


# HBM-transient cap for the stage-2 candidate gather (tests shrink it to
# exercise the chunked path at toy shapes)
GATHER_BUDGET_BYTES = 320 * 1024 * 1024

SWEEP_R_STEP = 512  # best measured range step (r512/mg2/n_bufs=2, r3 bench)
SWEEP_MAX_B = 256  # kernel qid pack width (maxsim_sweep.MAX_B)


def _local_rerank(ragged, tokens, qmask, cand, max_len, use_pallas,
                  impl="plain", packed=None, bucket_lens=()):
    """Stage-2 exact rerank dispatcher: impl = plain | dedup | sweep | scan.

    plain/dedup gather one candidate window per (unique) doc; sweep streams
    coalesced row-ranges (maxsim_sweep.py) and wins when the candidate set
    covers a decent fraction of the store; scan (r4, VERDICT #6) runs the
    streaming exhaustive kernel over the WHOLE store and gathers candidate
    scores — when B*K candidate windows exceed the corpus severalfold (the
    3k-doc headline at bs>=256), one pass over every doc is far less DMA
    work than per-candidate gathers, and two_stage(prefetch>=corpus) becomes
    bit-equal to single_full. Policy: EngineCommon._rerank_impl.
    """
    scales = ragged.get("scales")  # per-doc int8 scales (None for float stores)
    if impl == "scan" and packed is not None:
        # the exhaustive stage-1 path IS the scan (buckets, kernel-vs-XLA
        # choice, VMEM guard all included) — gather its scores at candidates
        scores = _local_tokens_ragged(ragged, tokens, qmask, packed, max_len,
                                      bucket_lens=bucket_lens,
                                      use_pallas=use_pallas)
        out = jnp.take_along_axis(scores, jnp.maximum(cand, 0).astype(jnp.int32),
                                  axis=1)
        return jnp.where(cand >= 0, out, NEG_INF)
    if use_pallas:
        b, k = cand.shape
        nq = tokens.shape[1]
        dim = tokens.shape[2]
        if impl == "sweep":
            itemsize = (1 if ragged["flat"].dtype == jnp.int8
                        else ragged["flat"].dtype.itemsize)
            rows = int(ragged["flat"].shape[0])
            if sweep_supported(rows, max_len, min(b, SWEEP_MAX_B), k, nq, dim,
                               itemsize, r_step=SWEEP_R_STEP, n_bufs=2):
                if b > SWEEP_MAX_B:
                    bc = SWEEP_MAX_B
                    while b % bc:
                        bc -= 1
                    out = jax.lax.map(
                        lambda args: rerank_candidates_sweep(
                            ragged["flat"], ragged["offsets"],
                            ragged["lengths"], args[0], args[1], args[2],
                            max_len, doc_scales=scales, r_step=SWEEP_R_STEP,
                            mgroups=2, n_bufs=2),
                        (tokens.reshape(b // bc, bc, nq, dim),
                         qmask.reshape(b // bc, bc, nq),
                         cand.reshape(b // bc, bc, k)))
                    return out.reshape(b, k)
                return rerank_candidates_sweep(
                    ragged["flat"], ragged["offsets"], ragged["lengths"],
                    tokens, qmask, cand, max_len, doc_scales=scales,
                    r_step=SWEEP_R_STEP, mgroups=2, n_bufs=2)
            impl = "dedup"  # shape outside the sweep envelope
        if impl == "dedup" and b > 1:
            # Cross-query candidate dedup (VERDICT r2 #4): one DMA per
            # unique doc across the whole batch. Two block-size guards: the
            # full query chunk must fit VMEM (<= 4 MB) and the 4 packed
            # scalar-prefetch arrays must fit SMEM (<= ~56k candidate
            # entries; 16 B/entry of the 1 MB scalar space). Oversized
            # batches dedup in query-chunks — intra-chunk sharing is still
            # captured.
            itemsize = (1 if ragged["flat"].dtype == jnp.int8
                        else ragged["flat"].dtype.itemsize)
            per_q_bytes = nq * dim * itemsize
            limit_b = b
            while limit_b > 1 and (limit_b * per_q_bytes > 4 * 1024 * 1024
                                   or limit_b * k > 56 * 1024):
                limit_b //= 2
            if limit_b >= 2:
                if limit_b < b:
                    while b % limit_b:
                        limit_b -= 1
                    out = jax.lax.map(
                        lambda args: rerank_candidates_dedup(
                            ragged["flat"], ragged["offsets"],
                            ragged["lengths"], args[0], args[1], args[2],
                            max_len, doc_scales=scales),
                        (tokens.reshape(b // limit_b, limit_b, nq, dim),
                         qmask.reshape(b // limit_b, limit_b, nq),
                         cand.reshape(b // limit_b, limit_b, k)))
                    return out.reshape(b, k)
                return rerank_candidates_dedup(
                    ragged["flat"], ragged["offsets"], ragged["lengths"],
                    tokens, qmask, cand, max_len, doc_scales=scales)
        # The kernel's candidate offsets/lengths/scales ride in SMEM (~1 MB):
        # B*K beyond ~64k entries OOMs the scalar space (bs=512 x pk=200
        # measured 1.17 of 1.00 MB), so large query batches rerank in
        # query-chunks via lax.map inside the same dispatch.
        limit = 64 * 1024
        if b * k > limit:
            bc = max(1, limit // k)
            while b % bc:
                bc -= 1
            out = jax.lax.map(
                lambda args: rerank_candidates(
                    ragged["flat"], ragged["offsets"], ragged["lengths"],
                    args[0], args[1], args[2], max_len, doc_scales=scales),
                (tokens.reshape(b // bc, bc, nq, -1),
                 qmask.reshape(b // bc, bc, nq),
                 cand.reshape(b // bc, bc, k)))
            return out.reshape(b, k)
        return rerank_candidates(
            ragged["flat"], ragged["offsets"], ragged["lengths"],
            tokens, qmask, cand, max_len, doc_scales=scales)
    return BATCH.xla_rerank_batch(
        ragged["flat"], ragged["offsets"], ragged["lengths"],
        tokens, qmask, cand, max_len, scales=scales)


def _local_tokens_padded_packed(s1, qpacked, seg, use_pallas, qdot=False):
    """Group-packed tokens-vs-padded stage-1 (VERDICT r3 #4): the packed
    [G*Rg, dim] token layout carries ~10% pad rows instead of the padded
    layout's ~50% masked rows, cutting both matmul M-dim and VPU work."""
    vals_t, mask_t = s1["vals_t"], s1["mask_t"]
    scales_t = s1.get("scales_t")
    if use_pallas:
        from visual_rag_tpu.ops.kernels.prefetch_topk import (
            auto_block_d_packed,
        )

        return pooled_maxsim_scores_packed(
            vals_t, mask_t, qpacked, seg, scales_t,
            block_d=auto_block_d_packed(
                int(vals_t.shape[0]), vals_t.dtype.itemsize,
                int(seg.shape[2]), int(vals_t.shape[-1])),
            qdot_int8=qdot)
    g, gq, rg = seg.shape
    segw = jnp.asarray(seg, jnp.float32)
    if qdot:
        qc, qs = quantize_queries_int8(qpacked)
        sims = jnp.einsum("md,pnd->mpn", qc, vals_t,
                          preferred_element_type=jnp.int32
                          ).astype(jnp.float32)
        # positive per-row query scales commute with the max over P -> fold
        # into the ownership weights (same trick as the Pallas kernel)
        segw = segw * qs.reshape(g, 1, rg)
    else:
        cd = _compute_dtype_for(vals_t)
        sims = jnp.einsum("md,pnd->mpn", qpacked.astype(cd), vals_t.astype(cd),
                          preferred_element_type=jnp.float32)
    if scales_t is not None:
        sims = sims * scales_t[None, :, :]
    sims = jnp.where(mask_t[None, :, :] > 0, sims, NEG_INF)
    per_tok = jnp.max(sims, axis=1)  # [G*Rg, D]
    has = jnp.max(mask_t, axis=0) > 0
    per_tok = jnp.where(has[None, :], per_tok, 0.0)
    out = jnp.einsum("gqr,grn->gqn", segw,
                     per_tok.reshape(g, rg, -1),
                     preferred_element_type=jnp.float32)
    return out.reshape(g * gq, -1)


def _exhaustive_chunk(b_rows, max_len):
    return max(2, min(32, int(128e6 // max(1, b_rows * max_len * 4))))


def _local_tokens_ragged(ragged, tokens, qmask, packed, max_len,
                         bucket_lens=(), use_pallas=False):
    """Full exact scan, DOC-MAJOR: each doc chunk is gathered once and
    scored against the whole query batch as one MXU-sized matmul (the
    per-(query,doc) rerank path re-gathers every doc B times and runs at
    ~12% MXU; this formulation measured ~4x faster). Three r4 refinements
    (VERDICT #3): group-packed queries (M dim = real tokens, not B*NQ),
    static doc-length buckets (each scanned at its own max_len; bit-exact),
    and — on TPU — the streaming Pallas scan kernel (ops/kernels/
    maxsim_scan.py: each doc window DMA'd HBM->VMEM once, similarity tiles
    never touch HBM; measured 1182 vs 570 QPS at 100k docs, bit-identical
    scores).
    """
    # int8_refined stores scan with int8-quantized queries (int8 MXU dot,
    # 2x the bf16 rate): the int4-residual refine pass re-scores the final
    # window at 12-bit precision, so stage-1 query-rounding noise never
    # reaches the returned scores. Plain int8 keeps bf16 queries (its scan
    # IS the final score in single_full). Static at trace time — dtypes.
    qdot = (ragged["flat"].dtype == jnp.int8
            and ragged.get("res4") is not None)
    scales = ragged.get("scales")
    if packed is not None:
        b_rows = packed["q"].shape[0]
        if use_pallas and _scan_kernel_fits(
                packed["q"].shape[0], packed["q"].shape[1],
                max_len, ragged["flat"].dtype,
                rg_hint=int(packed["qid"].shape[1])):
            b_q = tokens.shape[0]

            def scan(offs, lens, sc, ml):
                return exhaustive_scores_packed(
                    ragged["flat"], offs, lens, packed["q"], packed["qid"],
                    ml, b=b_q, doc_scales=sc, qdot_int8=qdot)
        else:
            def scan(offs, lens, sc, ml):
                return BATCH.xla_exhaustive_packed(
                    ragged["flat"], offs, lens, packed["q"], packed["seg"],
                    ml, scales=sc, chunk=_exhaustive_chunk(b_rows, ml),
                    qdot_int8=qdot)
    else:
        b_rows = tokens.shape[0] * tokens.shape[1]

        def scan(offs, lens, sc, ml):
            return BATCH.xla_exhaustive_batch(
                ragged["flat"], offs, lens, tokens, qmask, ml,
                scales=sc, chunk=_exhaustive_chunk(b_rows, ml),
                qdot_int8=qdot)

    buckets = ragged.get("buckets")
    if buckets is not None and bucket_lens:
        outs = [scan(offs_i, lens_i, sc_i, ml_i)
                for (offs_i, lens_i, sc_i), ml_i in zip(buckets, bucket_lens)]
        scores_perm = jnp.concatenate(outs, axis=1)  # [B, D] in perm order
        return jnp.take(scores_perm, ragged["inv_perm"], axis=1)
    return scan(ragged["offsets"], ragged["lengths"], scales, max_len)


def _local_stage1(kind, s1, ragged, tokens, qmask, pooled, ds, max_len,
                  use_pallas, packed=None, bucket_lens=(), s1_prefetch=False):
    if kind == "tokens_padded":
        # qdot stage-1 (late r5): on int8 pooled stores a PREFETCH tokens
        # scan quantizes the query rows too and rides the int8 MXU rate —
        # the exact rerank that always follows a prefetch re-scores the
        # final window, so query-rounding noise only perturbs candidate
        # selection (same argument as the refined-store qdot scan). Modes
        # whose tokens_padded scores are FINAL (single_tiles /
        # single_experimental_tokens) keep bf16 queries. Static at trace
        # time — dtypes + the caller's prefetch flag.
        qdot = (_TOKENS_QDOT and s1_prefetch
                and s1["vals_t"].dtype == jnp.int8)
        if packed is not None:
            return _local_tokens_padded_packed(s1, packed["q"], packed["seg"],
                                               use_pallas, qdot=qdot)
        return _local_tokens_padded(s1, tokens, qmask, use_pallas, qdot=qdot)
    if kind == "pooled_padded":
        return _local_pooled_padded(s1, pooled)
    if kind == "pooled_single":
        return _local_pooled_single(s1, pooled)
    if kind == "tokens_ragged":
        return _local_tokens_ragged(ragged, tokens, qmask, packed, max_len,
                                    bucket_lens=bucket_lens,
                                    use_pallas=use_pallas)
    raise ValueError(kind)


def _refine_window(k: int, limit: int) -> int:
    """Candidates re-scored by the int8+int4 refine pass: wide enough that
    the int8 ordering's ~3e-3 noise cannot push a true top-k member outside
    it (measured: top-32 of 200 equals full-precision ranking)."""
    return max(1, min(limit, max(32, 2 * k)))


def _refined_merge(ragged, tokens, qmask, full, gids, base, ds, k, max_len,
                   axis):
    """Cross-shard two-pass refine (int8_refined stores): the top-rk of the
    merged int8 scores ``full`` (global ids ``gids``) are re-scored
    shard-locally at int8+int4 precision — each winner is owned by exactly
    one shard, so pmax merges the refined scores — then the final top-k is
    taken over the refined values. Shared by the two- and three-stage plan
    bodies. Returns (vals, ids) with -1 ids on sub-floor rows."""
    rk = _refine_window(k, full.shape[1])
    _, pos8 = jax.lax.top_k(full, rk)
    rids = jnp.take_along_axis(gids, pos8, axis=1)
    rloc = rids - base
    rok = (rloc >= 0) & (rloc < ds) & (rids >= 0)
    rcand = jnp.where(rok, rloc, -1).astype(jnp.int32)
    fine = jax.lax.pmax(
        _local_refine(ragged, tokens, qmask, rcand, max_len), axis)
    vals, fpos = jax.lax.top_k(fine, min(k, rk))
    ids = jnp.take_along_axis(rids, fpos, axis=1)
    return vals, jnp.where(vals > NEG_INF / 2, ids, -1)


def _local_refine(ragged, tokens, qmask, cand, max_len):
    """Exact MaxSim of ``cand`` at int8+int4 precision (batch.xla_refine_rerank).

    Query-chunked: the refine gathers [Bc, chunk, max_len, dim] f32 windows
    plus same-shaped int4-unpack intermediates per step — unbounded B at
    serving batch sizes (2048 x 832-token windows ~ 1.7 GB per transient)
    risks HBM OOM next to a large store, so B is capped per lax.map step.
    """
    b, k = cand.shape
    ml = ((int(max_len) + 31) // 32) * 32
    dim = tokens.shape[2]
    bc = b
    # per-step transient = candidate-chunk gathered f32 windows; the chunk
    # factor is xla_refine_rerank's default (shared constant, ADVICE r4)
    while bc > 1 and (bc * BATCH.REFINE_CAND_CHUNK * ml * dim * 4
                      > 128 * 1024 * 1024):
        bc //= 2
    if bc < b:
        while b % bc:
            bc -= 1
    if bc < b:
        nq = tokens.shape[1]
        out = jax.lax.map(
            lambda args: BATCH.xla_refine_rerank(
                ragged["flat"], ragged["res4"], ragged["res_scales"],
                ragged["offsets"], ragged["lengths"], args[0], args[1],
                args[2], max_len, doc_scales=ragged.get("scales")),
            (tokens.reshape(b // bc, bc, nq, dim),
             qmask.reshape(b // bc, bc, nq),
             cand.reshape(b // bc, bc, k)))
        return out.reshape(b, k)
    return BATCH.xla_refine_rerank(
        ragged["flat"], ragged["res4"], ragged["res_scales"],
        ragged["offsets"], ragged["lengths"], tokens, qmask, cand, max_len,
        doc_scales=ragged.get("scales"))


def _refine_topk(ragged, tokens, qmask, cand, rr, k: int, max_len: int):
    """Final top-k with optional int8 two-pass refinement.

    Plain stores: top-k of the rerank scores directly. Refined int8 stores
    (``res4`` sidecar present): re-score the int8 top window at 12-bit
    precision, then cut — the fast kernels keep reading 1-byte codes and
    only ~32 candidates/query pay the dequant traffic.
    """
    if ragged.get("res4") is None:
        vals, pos = jax.lax.top_k(rr, k)
        idx = jnp.where(vals > NEG_INF / 2,
                        jnp.take_along_axis(cand, pos, axis=1), -1)
        return vals, idx.astype(jnp.int32)
    rk = _refine_window(k, cand.shape[1])
    v8, pos8 = jax.lax.top_k(rr, rk)
    c8 = jnp.where(v8 > NEG_INF / 2,
                   jnp.take_along_axis(cand, pos8, axis=1), -1).astype(jnp.int32)
    fine = _local_refine(ragged, tokens, qmask, c8, max_len)
    vals, pos = jax.lax.top_k(fine, min(k, rk))
    idx = jnp.where(vals > NEG_INF / 2,
                    jnp.take_along_axis(c8, pos, axis=1), -1)
    return vals, idx.astype(jnp.int32)


def _merge_topk(vals, gids, k, axis):
    """all_gather local top-k from every shard, merge to a replicated top-k."""
    vg = jax.lax.all_gather(vals, axis)  # [n, B, kl]
    ig = jax.lax.all_gather(gids, axis)
    b = vals.shape[0]
    vg = jnp.moveaxis(vg, 0, 1).reshape(b, -1)
    ig = jnp.moveaxis(ig, 0, 1).reshape(b, -1)
    v, pos = jax.lax.top_k(vg, k)
    ids = jnp.take_along_axis(ig, pos, axis=1)
    return v, jnp.where(v > NEG_INF / 2, ids, -1)


def _strip(tree):
    """Remove the leading shard axis shard_map leaves on block arguments."""
    return jax.tree.map(lambda x: x[0], tree)


# ---------------------------------------------------------------------------
# ShardedEngine
# ---------------------------------------------------------------------------


class ShardedEngine(EngineCommon):
    """Batched query API over a ShardedIndex (mirrors RetrievalEngine)."""

    def __init__(
        self,
        sindex: ShardedIndex,
        full_vector_name: str = "initial",
        pooled_vector_name: str = "mean_pooling",
        global_vector_name: str = "global_pooling",
        experimental_vector_name: str = "experimental_pooling",
        use_pallas: Optional[bool] = None,
        stage1_cut: str = "auto",
        rerank_impl: str = "auto",
        query_wire: str = "auto",
    ):
        self.sindex = sindex
        self.full_vector_name = full_vector_name
        self.pooled_vector_name = pooled_vector_name
        self.global_vector_name = global_vector_name
        self.experimental_vector_name = experimental_vector_name
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        if stage1_cut not in ("auto", "exact", "approx"):
            raise ValueError(f"stage1_cut must be auto|exact|approx, got {stage1_cut}")
        self.stage1_cut = stage1_cut
        if rerank_impl not in ("auto", "plain", "dedup", "sweep", "scan"):
            raise ValueError(
                f"rerank_impl must be auto|plain|dedup|sweep|scan, got {rerank_impl}")
        self.rerank_impl = rerank_impl
        import os as _os

        if query_wire == "auto":  # env refines the default only (engine.py)
            query_wire = _os.environ.get("VISUALRAG_QUERY_WIRE", query_wire)
        if query_wire not in ("auto", "padded", "packed"):
            raise ValueError(
                f"query_wire must be auto|padded|packed, got {query_wire}")
        self.query_wire = query_wire
        wire_dtype = _os.environ.get("VISUALRAG_WIRE_DTYPE", "auto")
        if wire_dtype not in ("auto", "f32", "f16"):
            raise ValueError(
                f"VISUALRAG_WIRE_DTYPE must be auto|f32|f16, got {wire_dtype}")
        self.wire_dtype = wire_dtype
        self._plans: Dict[Any, Any] = {}

    def _cut_corpus_size(self) -> int:
        # the approx policy keys on the LOCAL shard size: below the threshold
        # every shard cuts exactly and sharded==single stays bit-identical
        return self.sindex.docs_per_shard

    def _store_dim(self) -> int:
        return int(list(next(iter(self.sindex.stores.values())).values())[0].shape[-1])

    # auto never picks sweep on the sharded path: per-shard candidate grids
    # are mostly-dead after the merge and the win is unmeasured there.
    # Forcing rerank_impl="sweep" is honored (the kernel drops dead pairs).
    SWEEP_MIN_COV = float("inf")

    def _ragged_geom(self):
        flat = self.sindex.stores[self.full_vector_name]["flat"]
        itemsize = 1 if flat.dtype == jnp.int8 else flat.dtype.itemsize
        # local (per-shard) leading dim: flat is [n_shards, rows_local, dim]
        return (int(flat.shape[-2]), int(self.sindex.max_len), 32,
                int(flat.shape[-1]), int(itemsize))

    # -- RetrievalEngine-parity surface --------------------------------------

    @property
    def index(self):
        """Manifest/num_docs access like RetrievalEngine.index (the harness
        reads both; VERDICT r1 item 8 killed the monkey-patch)."""
        return self.sindex

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
        """Single-query search (B=1 batch), mirroring RetrievalEngine."""
        q = np.asarray(query_embedding)
        if q.ndim == 1:
            q = q[None, :]
        return self.search_embedded_batch(
            [q], mode=mode, top_k=top_k,
            prefetch_k=prefetch_k, stage1_mode=stage1_mode, stage1_k=stage1_k,
            stage2_k=stage2_k, filter_obj=filter_obj,
            with_payload=with_payload)[0]


    # -- mode -> (stage1 kind, store name) ----------------------------------

    def _mode_store(self, mode: str):
        return {
            "single_full": ("tokens_ragged", self.full_vector_name),
            "single_tiles": ("tokens_padded", self.pooled_vector_name),
            "single_pooled": ("pooled_padded", self.pooled_vector_name),
            "single_global": ("pooled_single", self.global_vector_name),
            "single_experimental_tokens": ("tokens_padded", self.experimental_vector_name),
            "single_experimental_pooled": ("pooled_padded", self.experimental_vector_name),
        }[mode]

    def _stage1_kind(self, stage1_mode: str):
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

    # -- plan factories (jitted shard_map callables, cached) ----------------

    def _specs(self):
        si = self.sindex
        return si.mesh, si.axis, si.docs_per_shard, si.max_len, self.use_pallas

    def _plan_single(self, kind: str, k: int, wire: str = "padded",
                     b: int = 0, nq: int = 0):
        mesh, axis, ds, max_len, use_pallas = self._specs()
        kl = min(k, ds)

        def body(s1, ragged, mask, *qwire):
            from visual_rag_tpu.retrieval.plans import _prep_wire

            s1, ragged, mask = _strip(s1), _strip(ragged), _strip(mask)
            q3 = qwire[2] if len(qwire) > 2 else None
            tokens, qmask, pooled, packed = _prep_wire(
                qwire[0], qwire[1], q3, wire, b, nq)
            scores = _local_stage1(
                kind, s1, ragged, tokens, qmask, pooled, ds, max_len,
                use_pallas, packed=packed)
            scores = jnp.where(mask > 0, scores, NEG_INF)
            base = jax.lax.axis_index(axis) * ds
            if kind == "tokens_ragged" and ragged.get("res4") is not None:
                # int8 two-pass per shard: refine the local int8 window, then
                # merge shards by REFINED scores (each doc owned by one shard)
                rkl = _refine_window(k, ds)
                v8, i8 = jax.lax.top_k(scores, rkl)
                cand = jnp.where(v8 > NEG_INF / 2, i8, -1).astype(jnp.int32)
                v, i = _refine_topk(ragged, tokens, qmask, cand, v8, kl, max_len)
                gids = jnp.where((v > NEG_INF / 2) & (i >= 0), base + i, -1)
                return _merge_topk(v, gids, k, axis)
            v, i = jax.lax.top_k(scores, kl)
            gids = jnp.where(v > NEG_INF / 2, base + i, -1)
            return _merge_topk(v, gids, k, axis)

        n_q = 3 if wire == "packed" else 2
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)) + (P(),) * n_q,
            out_specs=(P(), P()),
            check_vma=False,  # merged outputs are replicated by construction
        )
        return jax.jit(fn)

    def _plan_two_stage(self, kind: str, pk: int, k: int, impl: str = "plain",
                        wire: str = "padded", b: int = 0, nq: int = 0):
        mesh, axis, ds, max_len, use_pallas = self._specs()
        pk_local = min(pk, ds)
        approx = self._approx_cut(pk_local)

        def body(s1, ragged, mask, *qwire):
            from visual_rag_tpu.retrieval.plans import _prep_wire

            s1, ragged, mask = _strip(s1), _strip(ragged), _strip(mask)
            q3 = qwire[2] if len(qwire) > 2 else None
            tokens, qmask, pooled, packed = _prep_wire(
                qwire[0], qwire[1], q3, wire, b, nq)
            scores = _local_stage1(
                kind, s1, ragged, tokens, qmask, pooled, ds, max_len,
                use_pallas, packed=packed, s1_prefetch=True)
            scores = jnp.where(mask > 0, scores, NEG_INF)
            if approx and pk_local < ds:
                v1, i1 = jax.lax.approx_max_k(scores, pk_local)
            else:
                v1, i1 = jax.lax.top_k(scores, pk_local)
            base = jax.lax.axis_index(axis) * ds
            g1 = jnp.where(v1 > NEG_INF / 2, base + i1, -1)
            _, merged = _merge_topk(v1, g1, pk, axis)  # replicated [B, pk]
            local = merged - base
            in_range = (local >= 0) & (local < ds) & (merged >= 0)
            cand = jnp.where(in_range, local, -1).astype(jnp.int32)
            rr = _local_rerank(ragged, tokens, qmask, cand, max_len, use_pallas,
                               impl=impl, packed=packed)
            full = jax.lax.pmax(rr, axis)  # each candidate valid on one shard
            if ragged.get("res4") is not None:
                return _refined_merge(ragged, tokens, qmask, full, merged,
                                      base, ds, k, max_len, axis)
            vals, pos = jax.lax.top_k(full, k)
            ids = jnp.take_along_axis(merged, pos, axis=1)
            return vals, jnp.where(vals > NEG_INF / 2, ids, -1)

        n_q = 3 if wire == "packed" else 2
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)) + (P(),) * n_q,
            out_specs=(P(), P()),
            check_vma=False,  # merged outputs are replicated by construction
        )
        return jax.jit(fn)

    def _plan_three_stage(self, s1k: int, s2k: int, k: int,
                          impl: str = "plain",
                          wire: str = "padded", b: int = 0, nq: int = 0):
        mesh, axis, ds, max_len, use_pallas = self._specs()
        s1k_local = min(s1k, ds)
        approx = self._approx_cut(s1k_local)

        def cut(scores, kl):  # local stage-1 cut (approx at scale)
            if approx and kl < ds:
                return jax.lax.approx_max_k(scores, kl)
            return jax.lax.top_k(scores, kl)

        def body(gstore, estore, ragged, mask, *qwire):
            from visual_rag_tpu.retrieval.plans import _prep_wire

            gstore, estore, ragged, mask = (
                _strip(gstore), _strip(estore), _strip(ragged), _strip(mask))
            q3 = qwire[2] if len(qwire) > 2 else None
            tokens, qmask, pooled, packed = _prep_wire(
                qwire[0], qwire[1], q3, wire, b, nq)
            base = jax.lax.axis_index(axis) * ds
            # stage 1: pooled query vs global vectors
            sc1 = _local_pooled_single(gstore, pooled)
            sc1 = jnp.where(mask > 0, sc1, NEG_INF)
            v1, i1 = cut(sc1, s1k_local)
            g1 = jnp.where(v1 > NEG_INF / 2, base + i1, -1)
            _, m1_ids = _merge_topk(v1, g1, s1k, axis)  # replicated [B, s1k]
            # stage 2: each shard scores ITS merged candidates by GATHER (not
            # a full local scan+mask — the scan was the three_stage
            # bottleneck at scale); pmax combines (one owner per candidate)
            loc1 = m1_ids - base
            ok1 = (loc1 >= 0) & (loc1 < ds) & (m1_ids >= 0)
            cand1 = jnp.where(ok1, loc1, -1).astype(jnp.int32)
            s2_local = _gathered_tokens_padded(estore, tokens, qmask, cand1)
            s2c = jax.lax.pmax(s2_local, axis)  # [B, s1k] replicated
            v2, pos2 = jax.lax.top_k(s2c, min(s2k, s1k))
            kk = min(k, s2k, s1k)  # stage-2 pool bounds the final cut
            m2_ids = jnp.where(v2 > NEG_INF / 2,
                               jnp.take_along_axis(m1_ids, pos2, axis=1), -1)
            # stage 3: exact rerank of merged stage-2 ids
            loc2 = m2_ids - base
            ok2 = (loc2 >= 0) & (loc2 < ds) & (m2_ids >= 0)
            cand = jnp.where(ok2, loc2, -1).astype(jnp.int32)
            rr = _local_rerank(ragged, tokens, qmask, cand, max_len, use_pallas,
                               impl=impl, packed=packed)
            full = jax.lax.pmax(rr, axis)
            if ragged.get("res4") is not None:
                vals, ids = _refined_merge(ragged, tokens, qmask, full,
                                           m2_ids, base, ds, kk, max_len,
                                           axis)
                # winners leave m2_ids order: recover stage-2 positions by match
                match = (m2_ids[:, None, :] == ids[:, :, None]) & (ids[:, :, None] >= 0)
                pos = jnp.argmax(match, axis=2)
            else:
                vals, pos = jax.lax.top_k(full, kk)
                ids = jnp.take_along_axis(m2_ids, pos, axis=1)
                ids = jnp.where(vals > NEG_INF / 2, ids, -1)
            # per-stage provenance at the winners
            lidw = ids - base
            okw = (lidw >= 0) & (lidw < ds) & (ids >= 0)
            safe = jnp.clip(lidw, 0, ds - 1)
            s1_at = jax.lax.pmax(
                jnp.where(okw, jnp.take_along_axis(sc1, safe, axis=1), NEG_INF), axis)
            s2_at = jnp.take_along_axis(v2, pos, axis=1)  # already replicated
            return vals, ids, s1_at, s2_at

        n_q = 3 if wire == "packed" else 2
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)) + (P(),) * n_q,
            out_specs=(P(), P(), P(), P()),
            check_vma=False,  # merged outputs are replicated by construction
        )
        return jax.jit(fn)

    def _get_plan(self, key, factory):
        if key not in self._plans:
            self._plans[key] = factory()
        return self._plans[key]

    # -- public API ----------------------------------------------------------

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
        return self._finish_batch(self._dispatch_batch(
            query_embeddings, mode=mode, top_k=top_k, prefetch_k=prefetch_k,
            stage1_mode=stage1_mode, stage1_k=stage1_k, stage2_k=stage2_k,
            filter_obj=filter_obj, with_payload=with_payload,
            return_arrays=return_arrays))

    def search_embedded_batches(self, query_batches, depth: int = 2,
                                **search_kwargs):
        """Pipelined batches (mirrors RetrievalEngine): dispatch up to
        ``depth`` batches ahead before fetching batch i's replicated
        outputs."""
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
        if mode not in SEARCH_MODES:
            raise ValueError(f"Unknown mode: {mode}. Choose one of {SEARCH_MODES}")
        if return_arrays and with_payload:
            raise ValueError("return_arrays=True requires with_payload=False")
        si = self.sindex
        if si.num_docs == 0 or not len(query_embeddings):
            return ("empty", len(query_embeddings), with_payload,
                    return_arrays, {})
        dim = next(iter(si.stores.values()))
        dim = list(dim.values())[0].shape[-1]
        # Bucket B exactly like RetrievalEngine (shared EngineCommon ladder —
        # an unbucketed 33-query batch crashed the packed serving wire);
        # _finish_batch slices results back to n_real.
        query_embeddings, n_real, b_real = self._bucket_batch(
            query_embeddings)
        # r5 wire dtype policy mirrors engine.py: f16 at serving batch sizes
        # on TPU (the query wire dominates per-batch tunnel payload), f32 on
        # CPU (bit-exact test contract, memcpy transfer)
        wire = np.float32
        if (self.wire_dtype == "f16"
                or (self.wire_dtype == "auto" and self.use_pallas
                    and b_real >= 1024)):
            wire = np.float16
        use_packed = (self.query_wire == "packed"
                      or (self.query_wire == "auto" and self.use_pallas
                          and b_real >= 32))
        if use_packed:
            (q1, q2, q3), nq, _rg = BATCH.pack_queries_grouped(
                query_embeddings, dim, wire_dtype=wire)
            qwire, wire_kind = (q1, q2, q3), "packed"
            wire_key = ("packed", b_real, int(q1.shape[0]), int(q3.shape[1]))
        else:
            q1, q2 = BATCH.pad_queries_raw(query_embeddings, dim,
                                           wire_dtype=wire)
            nq = int(q1.shape[1])
            qwire, wire_kind = (q1, q2), "padded"
            wire_key = ("padded", q1.shape)
        mask = si.doc_mask_shards(filter_obj)
        ragged = si.stores[self.full_vector_name]
        d = si.num_docs
        # scan policy on GLOBAL counts: per shard both sides divide by n
        # (candidates/shard ~ B*K/n, scan cost/shard ~ D/n), so the global
        # ratio is the per-shard ratio
        scan_geom = ({"n_docs": d, "m_packed": int(q1.shape[0]),
                      "rg": int(q3.shape[1])}
                     if wire_kind == "packed" else {})

        if mode.startswith("single_"):
            kind, name = self._mode_store(mode)
            k = max(1, min(int(top_k), d))
            plan = self._get_plan(
                ("single", kind, name, k, wire_key, self.stage1_cut),
                lambda: self._plan_single(kind, k, wire=wire_kind,
                                          b=b_real, nq=nq))
            vals, ids = plan(si.stores[name], ragged, mask, *qwire)
            return ("done", n_real, with_payload,
                    return_arrays, {"ids": ids, "score": vals})

        if mode == "two_stage":
            if prefetch_k is None:
                prefetch_k = max(100, top_k * 10)
            kind, name = self._stage1_kind(stage1_mode)
            pk = max(1, min(int(prefetch_k), d))
            k = max(1, min(int(top_k), pk))
            # an EXPLICIT 'scan' runs via the packed XLA exhaustive fallback
            # even off-TPU (engine.py has the same policy)
            ri = (self._rerank_impl(b_real, pk, **scan_geom)
                  if self.use_pallas or self.rerank_impl == "scan"
                  else "plain")
            plan = self._get_plan(
                ("two_stage", kind, name, pk, k, wire_key,
                 self.stage1_cut, ri),
                lambda: self._plan_two_stage(kind, pk, k, impl=ri,
                                             wire=wire_kind, b=b_real, nq=nq))
            vals, ids = plan(si.stores[name], ragged, mask, *qwire)
            return ("done", n_real, with_payload,
                    return_arrays,
                    {"ids": ids, "score_stage2": vals, "score_final": vals})

        s1k = max(1, min(int(stage1_k or 1000), d))
        s2k = max(1, min(int(stage2_k or 300), d))
        k = max(1, min(int(top_k), s2k))
        ri3 = (self._rerank_impl(b_real, s2k, **scan_geom)
               if self.use_pallas or self.rerank_impl == "scan" else "plain")
        plan = self._get_plan(
            ("three_stage", s1k, s2k, k, wire_key, self.stage1_cut, ri3),
            lambda: self._plan_three_stage(s1k, s2k, k, impl=ri3,
                                           wire=wire_kind, b=b_real, nq=nq))
        vals, ids, s1_at, s2_at = plan(
            si.stores[self.global_vector_name],
            si.stores[self.experimental_vector_name],
            ragged, mask, *qwire)
        return ("done", n_real, with_payload, return_arrays,
                {"ids": ids, "score_stage3": vals, "score_final": vals,
                 "score_stage1": s1_at, "score_stage2": s2_at})

    def _finish_batch(self, pending):
        tag, n, with_payload, return_arrays, arrays = pending
        if tag == "empty":
            if return_arrays:
                import numpy as _np
                from visual_rag_tpu.retrieval.engine import BatchResultArrays
                z = _np.zeros((n, 0))
                return BatchResultArrays(
                    ids=z.astype(object), scores=z.astype(_np.float32),
                    valid=z.astype(bool), indices=z.astype(_np.int32))
            return [[] for _ in range(n)]
        if return_arrays:
            return self._finish_arrays(self.sindex.manifest, n, arrays,
                                       idx_key="ids")
        ids = np.asarray(arrays.pop("ids"))[:n]  # drop bucket-padding rows
        return self._assemble(
            ids, with_payload,
            **{kk: np.asarray(vv)[:n] for kk, vv in arrays.items()})

    def _assemble(self, ids, with_payload, **score_cols):
        # one .tolist() pass per column (see RetrievalEngine._results)
        ids_l = np.asarray(ids).tolist()
        cols = {kk: np.asarray(vv).tolist() for kk, vv in score_cols.items()}
        manifest = self.sindex.manifest
        num_docs = self.sindex.num_docs
        neg = NEG_INF / 2
        out: List[List[Dict[str, Any]]] = []
        for b, row_ids in enumerate(ids_l):
            rows: List[Dict[str, Any]] = []
            first = next(iter(cols.values()))[b]
            for rank, gid in enumerate(row_ids):
                if gid < 0 or gid >= num_docs or first[rank] <= neg:
                    continue
                rec: Dict[str, Any] = {"id": manifest.ids[gid], "rank": rank}
                for ck, cv in cols.items():
                    rec[ck] = cv[b][rank]
                rec.setdefault("score_final", rec.get("score", rec.get("score_stage2")))
                if with_payload:
                    rec["payload"] = manifest.payload(gid)
                rows.append(rec)
            out.append(rows)
        return out
