"""Stage-1 prefetch: blocked batched MaxSim over a padded pooled store.

Computes ``scores[b, d] = sum_q qmask[b,q] * max_p (Q[b,q] . V[d,p])`` for a
whole query batch against every document's pooled rows, without ever
materializing the [B, D, NQ, P] similarity tensor in HBM (the XLA einsum path
materializes [D, NQ, P] per query; at corpus scale that dominates HBM traffic).

Grid layout ``(num_doc_blocks, B)``: the document block index is the OUTER
dimension and the query index the INNER one, so each streamed store block is
reused across the whole query batch before the next block is fetched — HBM
traffic is one pass over the store per *batch*, not per query.

Store layout is **P-leading** ``[P, D, dim]`` (BatchScorer caches this
transposed copy): the max-over-pooled-rows then runs as a fori_loop of
``[NQ,dim]x[dim,BD]`` MXU matmuls over contiguous ``vals[row]`` slices with a
running elementwise max. (A D-leading layout needs either a lane-dim reshape —
unsupported in Mosaic — or an unrolled P-loop of strided sublane slices, which
blows the 16MB scoped-VMEM budget at P~76.)

Replaces: Qdrant HNSW prefetch + MAX_SIM comparator (reference
two_stage.py:161-180 prefetch clause) — but exact, not approximate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # python float: jnp scalars would be captured consts in pallas kernels


def _kernel(vals_ref, mask_ref, scales_ref, q_ref, qmask_ref, out_ref):
    # vals:  [P, BD, dim]   one doc block, pooled-row-leading (f32/bf16/int8)
    # mask:  [P, BD]        row validity as f32 (bool VMEM blocks are fragile)
    # scales:[P, BD]        per-row dequant scales (ones for float stores)
    # q:     [1, NQ, dim]   one query's padded tokens
    # qmask: [1, 1, NQ]     f32 (leading block dims keep Mosaic tiling legal)
    # out:   [1, 1, BD]     scores for this (query, doc block)
    p, bd, dim = vals_ref.shape
    nq = q_ref.shape[1]
    q = q_ref[0]  # [NQ, dim]

    def body(row, running):
        # int8 codes upcast in VMEM only — HBM traffic stays 1 byte/elem
        sims = jax.lax.dot_general(
            q, vals_ref[row].astype(q.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [NQ, BD]
        sims = sims * scales_ref[row][None, :]
        valid = mask_ref[row] > 0  # [BD]
        sims = jnp.where(valid[None, :], sims, NEG_INF)
        return jnp.maximum(running, sims)

    running = jax.lax.fori_loop(
        0, p, body, jnp.full((nq, bd), NEG_INF, dtype=jnp.float32)
    )
    has_rows = jnp.max(mask_ref[:], axis=0, keepdims=True) > 0  # [1, BD]
    per_q = jnp.where(has_rows, running, 0.0)
    qm = qmask_ref[0]  # [1, NQ] f32
    # Query-token sum as a [1,NQ]x[NQ,BD] matmul: Mosaic rejects sublane
    # reductions with implicit output dims, and this keeps it on the MXU.
    out_ref[0] = jax.lax.dot_general(
        qm, per_q,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, BD]


def _kernel_qbatch(vals_ref, mask_ref, scales_ref, q_ref, qmask_ref, out_ref):
    # Query-batched variant: the WHOLE padded query batch rides in VMEM and
    # each pooled row is one [B*NQ, dim] x [dim, BD] matmul — MXU-sized work
    # (the per-query kernel's [NQ, dim] x [dim, BD] ops are ~32x smaller and
    # leave the systolic array mostly idle; measured ~0.8 GB/s eff-BW).
    # vals:  [P, BD, dim]  one doc block (f32/bf16/int8 codes)
    # mask:  [P, BD]       f32 row validity
    # scales:[P, BD]       f32 per-row dequant scales
    # q:     [B*NQ, dim]   all queries' tokens, flattened
    # qmask: [B, NQ]       f32
    # out:   [B, BD]
    p, bd, dim = vals_ref.shape
    b, nq = qmask_ref.shape
    q = q_ref[:]  # [B*NQ, dim] (int8 codes on the qdot path)
    # r5: P rows fold into ONE MXU dot like _kernel_packed (the fori_loop
    # issued P small K=128 matmuls with VPU max/mask between them)
    flat = vals_ref[...].reshape(p * bd, dim)
    if q.dtype == jnp.int8:
        # qdot: int8 x int8 -> int32 at the MXU's doubled int8 rate; the
        # per-row query scales ride pre-folded into qmask_ref (positive, so
        # they commute with the max over P below)
        sims = jax.lax.dot_general(
            q, flat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # [B*NQ, P*BD]
    else:
        sims = jax.lax.dot_general(
            q, flat.astype(q.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B*NQ, P*BD]
    sims = sims * scales_ref[...].reshape(1, p * bd)
    sims3 = sims.reshape(b * nq, p, bd)  # lane dim stays BD (128-multiple)
    sims3 = jnp.where(mask_ref[...].reshape(1, p, bd) > 0, sims3, NEG_INF)
    running = jnp.max(sims3, axis=1)  # [B*NQ, BD]
    has_rows = jnp.max(mask_ref[:], axis=0, keepdims=True) > 0  # [1, BD]
    per_q = jnp.where(has_rows, running, 0.0)  # [B*NQ, BD]
    # per-query token sum: split the sublane dim (lane dim untouched ->
    # legal reshape), apply qmask broadcast along lanes, reduce middle dim.
    # (Flattening qmask [b, nq] -> [b*nq] would reshape ACROSS the lane dim
    # — Mosaic rejects that shape cast.)
    per_q3 = per_q.reshape(b, nq, bd) * qmask_ref[:][:, :, None]
    out_ref[:] = jnp.sum(per_q3, axis=1)


def _kernel_packed(vals_ref, mask_ref, scales_ref, q_ref, seg_ref, out_ref):
    # Group-packed variant (VERDICT r3 #4): one query GROUP's tokens ride
    # densely in [Rg, dim] (~10% pad rows vs ~50% masked rows in the padded
    # [gq*NQ, dim] layout). r5 rewrite: the P pooled rows fold into ONE
    # [Rg, dim] x [P*BD, dim]^T MXU dot (the store block's leading dims
    # flatten legally — lane dim untouched), the max over P runs on the
    # lane-aligned [Rg, P, BD] reshape, and the per-query token sum is one
    # [gq, Rg] x [Rg, BD] ownership matmul. Measured 90 -> 56 ms per
    # 256-query batch at 100k docs, bit-identical scores (the fori_loop
    # version issued P separate K=128 matmuls with VPU max/mask between
    # them and pipelined poorly).
    # vals:  [P, BD, dim]   one doc block (f32/bf16/int8 codes)
    # mask:  [P, BD]        f32 row validity
    # scales:[P, BD]        f32 per-row dequant scales
    # q:     [1, Rg, dim]   one group's packed l2-normalized tokens (0 pads)
    # seg:   [1, gq, Rg]    f32 query-ownership weights
    # out:   [1, gq, BD]
    p, bd, dim = vals_ref.shape
    rg = q_ref.shape[1]
    q = q_ref[0]  # [Rg, dim] (int8 codes on the qdot path)
    flat = vals_ref[...].reshape(p * bd, dim)  # leading-dim flatten (legal)
    if q.dtype == jnp.int8:
        # qdot: int8 x int8 -> int32 (exact integer MXU dot, 2x bf16 rate);
        # per-row query scales are pre-folded into seg_ref — positive, so
        # they commute with the max over P
        sims = jax.lax.dot_general(
            q, flat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # [Rg, P*BD]
    else:
        sims = jax.lax.dot_general(
            q, flat.astype(q.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Rg, P*BD]
    sims = sims * scales_ref[...].reshape(1, p * bd)
    sims3 = sims.reshape(rg, p, bd)  # lane dim stays BD (128-multiple)
    sims3 = jnp.where(mask_ref[...].reshape(1, p, bd) > 0, sims3, NEG_INF)
    per_tok = jnp.max(sims3, axis=1)  # [Rg, BD]
    has_rows = jnp.max(mask_ref[:], axis=0, keepdims=True) > 0  # [1, BD]
    per_tok = jnp.where(has_rows, per_tok, 0.0)
    # pad token rows carry q=0 -> sims=0 (or NEG_INF->0) but seg weight 0
    out_ref[0] = jax.lax.dot_general(
        seg_ref[0], per_tok,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [gq, BD]


@functools.partial(jax.jit, static_argnames=("block_d", "interpret",
                                              "qdot_int8"))
def pooled_maxsim_scores_packed(
    values_t: jnp.ndarray,  # [P, D, dim] P-leading
    mask_t: jnp.ndarray,  # [P, D]
    qpacked: jnp.ndarray,  # [G*Rg, dim] l2-normalized packed tokens
    seg: jnp.ndarray,  # [G, gq, Rg] 0/1 ownership
    scales_t: jnp.ndarray | None = None,
    block_d: int = 256,
    interpret: bool = False,
    qdot_int8: bool = False,  # int8 store: quantize queries, int8 MXU dot
) -> jnp.ndarray:
    """Group-packed stage-1 scores [B, D] (B = G*gq); grid (G, doc blocks)."""
    p, d, dim = values_t.shape
    g, gq, rg = seg.shape
    mask_t = jnp.asarray(mask_t, jnp.float32)
    if scales_t is None:
        scales_t = jnp.ones((p, d), jnp.float32)
    scales_t = jnp.asarray(scales_t, jnp.float32)
    n_blocks = int(pl.cdiv(d, block_d))
    d_pad = n_blocks * block_d
    if d_pad != d:
        values_t = jnp.pad(values_t, ((0, 0), (0, d_pad - d), (0, 0)))
        mask_t = jnp.pad(mask_t, ((0, 0), (0, d_pad - d)))
        scales_t = jnp.pad(scales_t, ((0, 0), (0, d_pad - d)))
    if qdot_int8:
        if values_t.dtype != jnp.int8:
            raise ValueError("qdot_int8 requires an int8 store")
        from visual_rag_tpu.ops.kernels.maxsim_scan import (
            quantize_queries_int8,
        )

        qc, qs = quantize_queries_int8(qpacked)
        qp = qc.reshape(g, rg, dim)
        # positive per-row query scales commute with the max over P, so they
        # fold into the ownership weights (one multiply per [gq, Rg] tile
        # instead of per [Rg, P*BD] sims tile)
        seg = jnp.asarray(seg, jnp.float32) * qs.reshape(g, 1, rg)
    else:
        q_dtype = jnp.bfloat16 if values_t.dtype == jnp.int8 else values_t.dtype
        qp = qpacked.reshape(g, rg, dim).astype(q_dtype)
        seg = jnp.asarray(seg, jnp.float32)
    out = pl.pallas_call(
        _kernel_packed,
        grid=(g, n_blocks),
        in_specs=[
            pl.BlockSpec((p, block_d, dim), lambda gi, i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, block_d), lambda gi, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, block_d), lambda gi, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rg, dim), lambda gi, i: (gi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gq, rg), lambda gi, i: (gi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, gq, block_d), lambda gi, i: (gi, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, gq, d_pad), jnp.float32),
        interpret=interpret,
    )(values_t, mask_t, scales_t, qp, seg)
    return out.reshape(g * gq, d_pad)[:, :d]


def auto_block_d_packed(p: int, itemsize: int, rg: int, dim: int = 128) -> int:
    """Doc-block width for the FUSED packed kernel: its resident footprint is
    the [Rg, P*BD] f32 sims tile (plus the store block), so the budget keys
    on rg*p*bd*4. 3 MB keeps the in-plan scoped-VMEM share comparable to the
    old fori kernel's running buffers; bd=128 at the serving geometry
    (rg~512-768, P=12)."""
    budget = 3 * 1024 * 1024
    for bd in (512, 256, 128):
        if rg * p * bd * 4 <= budget and p * bd * dim * itemsize <= 2**20:
            return bd
    return 128


def auto_block_d(p: int, itemsize: int, dim: int = 128) -> int:
    """Largest doc-block lane width keeping the streamed store block under
    ~6 MB VMEM (the q-chunked running buffers take another ~4-8 MB).
    Measured at 100k docs, P=12, B=256: bd 128 -> 174 ms, 256 -> 98 ms,
    512 -> 65 ms, 1024 -> 47 ms per batch (old per-query kernel: 405 ms)."""
    # 3 MB cap on the streamed store block: Mosaic double-buffers the grid
    # blocks and the q-chunk running/sims buffers ride alongside, so the real
    # scoped-VMEM footprint is ~2.5-3x this (16 MB hard limit; bd=1024 at
    # P=12 OOMed inside the fused two_stage plan at 20.06 MB).
    # Inside the fused query plans the co-scheduled ops add ~13 MB of scoped
    # VMEM on top of this kernel's own blocks (measured: bd=512/qc=16 OOMs at
    # 16.68 of 16 MB in-plan while running clean standalone), so the in-plan
    # config must stay small: 1 MB store-block budget -> bd=256 at P=12.
    budget = 1 * 1024 * 1024
    for bd in (1024, 512, 256, 128):
        if p * bd * dim * itemsize <= budget:
            return bd
    return 128


@functools.partial(jax.jit, static_argnames=("block_d", "q_chunk", "interpret",
                                              "qdot_int8"))
def pooled_maxsim_scores_qbatch(
    values_t: jnp.ndarray,  # [P, D, dim] P-leading
    mask_t: jnp.ndarray,  # [P, D]
    queries: jnp.ndarray,  # [B, NQ, dim]
    qmask: jnp.ndarray,  # [B, NQ]
    scales_t: jnp.ndarray | None = None,
    block_d: int = 256,
    q_chunk: int = 8,
    interpret: bool = False,
    qdot_int8: bool = False,  # int8 store: quantize queries, int8 MXU dot
) -> jnp.ndarray:
    """Query-batched stage-1 scores [B, D]: grid over (query chunks, doc
    blocks) with ``q_chunk`` queries resident per kernel instance. The
    running max buffer is q_chunk*NQ*BD f32, so q_chunk bounds VMEM."""
    p, d, dim = values_t.shape
    b, nq, _ = queries.shape
    mask_t = jnp.asarray(mask_t, jnp.float32)
    qmask = jnp.asarray(qmask, jnp.float32)
    if scales_t is None:
        scales_t = jnp.ones((p, d), jnp.float32)
    scales_t = jnp.asarray(scales_t, jnp.float32)
    n_blocks = int(pl.cdiv(d, block_d))
    d_pad = n_blocks * block_d
    if d_pad != d:
        values_t = jnp.pad(values_t, ((0, 0), (0, d_pad - d), (0, 0)))
        mask_t = jnp.pad(mask_t, ((0, 0), (0, d_pad - d)))
        scales_t = jnp.pad(scales_t, ((0, 0), (0, d_pad - d)))
    q_chunk = min(q_chunk, b)
    n_q = int(pl.cdiv(b, q_chunk))
    b_pad = n_q * q_chunk
    if b_pad != b:
        queries = jnp.pad(queries, ((0, b_pad - b), (0, 0), (0, 0)))
        qmask = jnp.pad(qmask, ((0, b_pad - b), (0, 0)))
    if qdot_int8:
        if values_t.dtype != jnp.int8:
            raise ValueError("qdot_int8 requires an int8 store")
        from visual_rag_tpu.ops.kernels.maxsim_scan import (
            quantize_queries_int8,
        )

        q_flat, qs = quantize_queries_int8(queries.reshape(b_pad * nq, dim))
        # per-row query scales fold into the per-query token weights (they
        # commute with the max over P); pad rows keep weight 0
        qmask = qmask * qs.reshape(b_pad, nq)
    else:
        q_dtype = jnp.bfloat16 if values_t.dtype == jnp.int8 else values_t.dtype
        q_flat = queries.reshape(b_pad * nq, dim).astype(q_dtype)
    # doc block inner: the streamed store block is reused across the whole
    # grid row before the next query chunk loads
    out = pl.pallas_call(
        _kernel_qbatch,
        grid=(n_q, n_blocks),
        in_specs=[
            pl.BlockSpec((p, block_d, dim), lambda qi, i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, block_d), lambda qi, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, block_d), lambda qi, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_chunk * nq, dim), lambda qi, i: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_chunk, nq), lambda qi, i: (qi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (q_chunk, block_d), lambda qi, i: (qi, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, d_pad), jnp.float32),
        interpret=interpret,
    )(values_t, mask_t, scales_t, q_flat, qmask)
    return out[:b, :d]


@functools.partial(jax.jit, static_argnames=("block_d", "interpret"))
def pooled_maxsim_scores(
    values_t: jnp.ndarray,  # [P, D, dim] P-leading (f32/bf16, or int8 codes)
    mask_t: jnp.ndarray,  # [P, D] bool/f32
    queries: jnp.ndarray,  # [B, NQ, dim]
    qmask: jnp.ndarray,  # [B, NQ] bool
    scales_t: jnp.ndarray | None = None,  # [P, D] per-row int8 scales
    block_d: int = 128,  # out-block lane width; must be a multiple of 128
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched stage-1 scores [B, D] via the fused Pallas kernel."""
    p, d, dim = values_t.shape
    b, nq, _ = queries.shape
    mask_t = jnp.asarray(mask_t, jnp.float32)
    qmask = jnp.asarray(qmask, jnp.float32)
    if scales_t is None:
        scales_t = jnp.ones((p, d), jnp.float32)
    scales_t = jnp.asarray(scales_t, jnp.float32)
    n_blocks = int(pl.cdiv(d, block_d))
    d_pad = n_blocks * block_d
    if d_pad != d:
        values_t = jnp.pad(values_t, ((0, 0), (0, d_pad - d), (0, 0)))
        mask_t = jnp.pad(mask_t, ((0, 0), (0, d_pad - d)))
        scales_t = jnp.pad(scales_t, ((0, 0), (0, d_pad - d)))
    q_dtype = jnp.bfloat16 if values_t.dtype == jnp.int8 else values_t.dtype
    grid = (n_blocks, b)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((p, block_d, dim), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, block_d), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, block_d), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, dim), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nq), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_d), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, d_pad), jnp.float32),
        interpret=interpret,
    )(values_t, mask_t, scales_t, queries.astype(q_dtype), qmask[:, None, :])
    return out[:, 0, :d]
