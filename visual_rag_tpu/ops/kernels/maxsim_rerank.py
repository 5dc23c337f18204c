"""Stage-2 rerank: fused exact MaxSim over candidates' ragged token blocks.

For each (query b, candidate k) the kernel DMAs the candidate's token rows
``flat[offset : offset+MAX_LEN]`` straight from the HBM-resident ragged store
into VMEM (double-buffered), computes Q·Dᵀ on the MXU with fp32 accumulation,
masks padding columns, row-maxes and mask-sums — all without materializing the
[B·K, MAX_LEN, dim] gather that the XLA path builds in HBM.

This is the device replacement for Qdrant's server-side ``exact=True``
multivector rerank (reference two_stage.py:161-180) and for the client-side
numpy rerank (reference two_stage.py:371-426).

Layout notes:
- grid is ``(B * K / G,)``; each program handles G candidates of one query
  (K is padded to a multiple of G so a program never spans two queries); the
  G-loop is unrolled so output lane indices stay static.
- candidate offsets/lengths arrive via PrefetchScalarGridSpec; the DMA for
  candidate g+1 is issued before candidate g's compute (double buffering).
- the ragged store is built with >= MAX_LEN tail-padding rows, so the fixed
  window never reads out of bounds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # python float: jnp scalars would be captured consts in pallas kernels


def _make_kernel(max_len: int, group: int, n_slots: int):
    def kernel(off_ref, len_ref, q_ref, qmask_ref, scale_ref, flat_hbm,
               out_ref, scratch, sems):
        blk = pl.program_id(0)
        base = blk * group

        def get_dma(slot, g):
            # Doc blocks are 32-row aligned in the ragged store (store.py);
            # the hint lets Mosaic prove the DMA start is tile-aligned.
            off = pl.multiple_of(off_ref[base + g], 32)
            return pltpu.make_async_copy(
                flat_hbm.at[pl.ds(off, max_len), :],
                scratch.at[slot],
                sems.at[slot],
            )

        # keep n_slots-1 DMAs in flight: per-candidate copies are latency-
        # bound, so deeper pipelining matters more than bandwidth here
        for g in range(min(n_slots - 1, group)):
            get_dma(g % n_slots, g).start()
        q = q_ref[0]  # [NQ, dim]
        qm = qmask_ref[0]  # [1, NQ] f32
        nq = q.shape[0]

        cols = []
        for g in range(group):  # static unroll
            slot = g % n_slots
            nxt = g + n_slots - 1
            if nxt < group:
                get_dma(nxt % n_slots, nxt).start()
            get_dma(slot, g).wait()
            ln = len_ref[base + g]
            docs = scratch[slot]  # [MAX_LEN, dim]
            sims = jax.lax.dot_general(
                q, docs.astype(q.dtype),  # int8 codes upcast in VMEM only
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [NQ, MAX_LEN]
            col = jax.lax.broadcasted_iota(jnp.int32, (nq, max_len), 1)
            sims = jnp.where(col < ln, sims, NEG_INF)
            per_q = jnp.max(sims, axis=1, keepdims=True)  # [NQ, 1]
            # accumulate the candidate's per-query maxima as a COLUMN (held
            # in vregs); the r2/r3 kernel extracted a scalar score per
            # candidate into SMEM, and that vector->scalar move drained the
            # pipeline every candidate (~1 us/candidate floor, FLAT in NQ
            # and MAX_LEN — measured r3). All-vector accumulation keeps the
            # loop pipelineable; ONE [1,NQ]x[NQ,G] matmul ends the block.
            cols.append(jnp.where(ln > 0, per_q, 0.0))
        scores = jax.lax.dot_general(
            qm, jnp.concatenate(cols, axis=1),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, G]
        # per-doc int8 dequant scales ride as a VMEM vector (1.0 for floats)
        out_ref[0, :, :] = scores * scale_ref[0, :, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("max_len", "group", "n_slots", "interpret"))
def rerank_candidates(
    flat: jnp.ndarray,  # [N + pad, dim] ragged store (bf16/f32, or int8 codes)
    offsets: jnp.ndarray,  # [D] int32
    lengths: jnp.ndarray,  # [D] int32
    queries: jnp.ndarray,  # [B, NQ, dim]
    qmask: jnp.ndarray,  # [B, NQ] bool/float
    candidates: jnp.ndarray,  # [B, K] int32 doc ids, -1 = padding
    max_len: int,
    doc_scales: jnp.ndarray | None = None,  # [D] per-doc int8 scales
    group: int = 16,  # r3 sweep: g16 44.7 ms vs g8 47.9 at 256x200 @ 50k
    n_slots: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact MaxSim scores [B, K] f32 for each query's candidate docs."""
    # DMA windows must be sublane-tile aligned (8 rows f32/bf16, 32 rows
    # int8); ColQwen effective grids give arbitrary max_len (e.g. 14x9=126),
    # so round the window up to 32 — the ragged store's tail padding of
    # ceil32(max_len) rows (store.pack_aligned / sharded.from_index /
    # synth.synthetic_index) keeps the widened reads in bounds even when the
    # last doc has 0 tokens, and the length mask below ignores the extra
    # rows.
    max_len = ((int(max_len) + 31) // 32) * 32
    b, k = candidates.shape
    nq = queries.shape[1]
    dim = queries.shape[2]
    k_pad = int(pl.cdiv(k, group)) * group
    if k_pad != k:
        candidates = jnp.pad(candidates, ((0, 0), (0, k_pad - k)), constant_values=-1)
    cand = candidates.reshape(-1)  # [B * k_pad]
    valid = cand >= 0
    safe = jnp.maximum(cand, 0)
    cand_off = jnp.where(valid, offsets[safe], 0).astype(jnp.int32)
    cand_len = jnp.where(valid, lengths[safe], 0).astype(jnp.int32)
    if doc_scales is None:
        cand_scale = jnp.ones_like(cand, dtype=jnp.float32)
    else:
        cand_scale = jnp.where(valid, doc_scales[safe], 1.0).astype(jnp.float32)

    n_blocks = (b * k_pad) // group
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # offsets, lengths
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (1, nq, dim),
                lambda blk, *_: (blk * group // k_pad, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, nq),
                lambda blk, *_: (blk * group // k_pad, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # per-candidate dequant scales, vector lane layout
                (1, 1, group), lambda blk, *_: (blk, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # flat stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 1, group), lambda blk, *_: (blk, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((n_slots, max_len, dim), flat.dtype),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(max_len, group, n_slots),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, 1, group), jnp.float32),
        interpret=interpret,
    )(
        cand_off,
        cand_len,
        queries.astype(jnp.bfloat16 if flat.dtype == jnp.int8 else flat.dtype),
        jnp.asarray(qmask, jnp.float32)[:, None, :],
        cand_scale.reshape(n_blocks, 1, group),
        flat,
    )
    scores = out.reshape(b, k_pad)[:, :k]
    # padding slots AND empty (0-token) candidates score NEG_INF: an empty
    # doc's in-kernel score is 0.0, which must never outrank real docs with
    # negative MaxSim sums (matches rerank_ragged / xla_exhaustive_batch)
    has = (cand_len > 0).reshape(b, k_pad)[:, :k]
    return jnp.where((candidates[:, :k] >= 0) & has, scores, NEG_INF)


# ---------------------------------------------------------------------------
# Cross-query candidate dedup (VERDICT r2 #4)
# ---------------------------------------------------------------------------


_QL_PACK = 32768  # meta2 = qid * _QL_PACK + len (len < 32768 always)


def _make_dedup_kernel(max_len: int, group: int, n_slots: int, total: int):
    # SMEM budget forces packed scalar-prefetch arrays: at B*K = 51200 the
    # six unpacked arrays (off/len/scale/slot/first/qid) cost 1.17 MB of the
    # 1.00 MB scalar space (measured OOM). Packed: off, meta1 = slot*2+first,
    # meta2 = qid*32768+len -> 3 arrays, ~0.6 MB (scales ride in VMEM).
    def kernel(off_ref, meta1_ref, meta2_ref,
               q_ref, qmask_t_ref, scale_ref, flat_hbm, out_ref,
               scratch, sems):
        blk = pl.program_id(0)
        base = blk * group

        def issue(j):
            # one DMA per UNIQUE doc: duplicates (first==0) reuse the slot
            # their predecessor in sorted order loaded
            @pl.when(meta1_ref[j] % 2 > 0)
            def _():
                off = pl.multiple_of(off_ref[j], 32)
                pltpu.make_async_copy(
                    flat_hbm.at[pl.ds(off, max_len), :],
                    scratch.at[meta1_ref[j] // 2],
                    sems.at[meta1_ref[j] // 2],
                ).start()

        @pl.when(blk == 0)  # TPU grid is sequential: warm the pipeline once
        def _():
            for j in range(min(n_slots - 1, total)):
                issue(j)

        cols = []
        for g in range(group):  # static unroll
            glob = base + g
            nxt = glob + n_slots - 1

            @pl.when(nxt < total)
            def _():
                issue(nxt)

            slot = meta1_ref[glob] // 2

            @pl.when(meta1_ref[glob] % 2 > 0)
            def _():
                off = pl.multiple_of(off_ref[glob], 32)
                pltpu.make_async_copy(
                    flat_hbm.at[pl.ds(off, max_len), :],
                    scratch.at[slot],
                    sems.at[slot],
                ).wait()

            qid = meta2_ref[glob] // _QL_PACK
            q = q_ref[qid]  # [NQ, dim] dynamic load from the full query block
            qm_t = qmask_t_ref[qid]  # [NQ, 1] (transposed layout: no
            # lane->sublane transpose exists in-kernel, and each candidate
            # carries its OWN query's mask, so it must fold in per column)
            docs = scratch[slot]  # [MAX_LEN, dim]
            nq = q.shape[0]
            ln = meta2_ref[glob] % _QL_PACK
            sims = jax.lax.dot_general(
                q, docs.astype(q.dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [NQ, MAX_LEN]
            col = jax.lax.broadcasted_iota(jnp.int32, (nq, max_len), 1)
            sims = jnp.where(col < ln, sims, NEG_INF)
            per_q = jnp.max(sims, axis=1, keepdims=True)  # [NQ, 1]
            per_q = jnp.where(ln > 0, per_q, 0.0) * qm_t
            # all-vector accumulation (see _make_kernel): columns in vregs,
            # one [1,NQ]x[NQ,G] matmul per block, no scalar stores
            cols.append(per_q)
        ones = jnp.ones((1, q_ref.shape[1]), jnp.float32)
        scores = jax.lax.dot_general(
            ones, jnp.concatenate(cols, axis=1),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, G]
        out_ref[0, :, :] = scores * scale_ref[0, :, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("max_len", "group", "n_slots",
                                             "interpret"))
def rerank_candidates_dedup(
    flat: jnp.ndarray,  # [N + pad, dim] ragged store
    offsets: jnp.ndarray,  # [D] int32
    lengths: jnp.ndarray,  # [D] int32
    queries: jnp.ndarray,  # [B, NQ, dim]
    qmask: jnp.ndarray,  # [B, NQ] bool/float
    candidates: jnp.ndarray,  # [B, K] int32 doc ids, -1 = padding
    max_len: int,
    doc_scales: jnp.ndarray | None = None,
    group: int = 16,
    n_slots: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact MaxSim [B, K] with CROSS-QUERY candidate dedup.

    The plain kernel's floor is per-candidate DMA issue cost (BENCH_SUMMARY:
    27-28 ms for 256x200 candidates @ 100k docs, flat across group/slot
    sweeps and unaffected by sorting alone). Realistic query batches share
    candidates heavily; here the flattened (query, candidate) pairs are
    sorted by doc id so duplicates are adjacent, each UNIQUE doc is DMA'd
    once, and duplicate pairs compute from the already-resident VMEM slot.
    Compute stays per-pair (each pair scores against its own query), so
    results are bit-identical to rerank_candidates up to f32 reduction
    order. Scores scatter back to [B, K] through the sort permutation.

    Replaces the reference's per-candidate client-side rerank semantics
    (two_stage.py:371-426) at lower HBM cost on shared-candidate batches.
    """
    max_len = ((int(max_len) + 31) // 32) * 32
    b, k = candidates.shape
    nq = queries.shape[1]
    dim = queries.shape[2]
    k_pad = int(pl.cdiv(k, group)) * group
    cand_bk = candidates
    if k_pad != k:
        cand_bk = jnp.pad(candidates, ((0, 0), (0, k_pad - k)),
                          constant_values=-1)
    total = b * k_pad
    flatc = cand_bk.reshape(-1)
    order = jnp.argsort(flatc, stable=True)  # -1 padding sorts first
    sortedc = flatc[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sortedc[1:] != sortedc[:-1]]) & (sortedc >= 0)
    uniq_rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    slot_id = (jnp.maximum(uniq_rank, 0) % n_slots).astype(jnp.int32)
    safe = jnp.maximum(sortedc, 0)
    valid = sortedc >= 0
    s_off = jnp.where(valid, offsets[safe], 0).astype(jnp.int32)
    s_len = jnp.where(valid, lengths[safe], 0).astype(jnp.int32)
    if doc_scales is None:
        s_scale = jnp.ones_like(sortedc, dtype=jnp.float32)
    else:
        s_scale = jnp.where(valid, doc_scales[safe], 1.0).astype(jnp.float32)
    qid = (order // k_pad).astype(jnp.int32)

    assert max_len < _QL_PACK, max_len  # len packs into meta2's low bits
    meta1 = slot_id * 2 + first.astype(jnp.int32)
    meta2 = qid * _QL_PACK + s_len
    n_blocks = total // group
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # off, meta1(slot,first), meta2(qid,len)
        grid=(n_blocks,),
        in_specs=[
            # FULL query batch + mask resident in VMEM (constant index map:
            # fetched once); sorted pairs mix queries within a block
            pl.BlockSpec((b, nq, dim), lambda blk, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, nq, 1), lambda blk, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(  # per-candidate dequant scales (sorted order)
                (1, 1, group), lambda blk, *_: (blk, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # flat stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 1, group), lambda blk, *_: (blk, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_slots, max_len, dim), flat.dtype),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
    )
    out = pl.pallas_call(
        _make_dedup_kernel(max_len, group, n_slots, total),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, 1, group), jnp.float32),
        interpret=interpret,
    )(
        s_off, meta1, meta2,
        queries.astype(jnp.bfloat16 if flat.dtype == jnp.int8 else flat.dtype),
        jnp.asarray(qmask, jnp.float32)[:, :, None],
        s_scale.reshape(n_blocks, 1, group),
        flat,
    )
    # scatter sorted scores back to [B, k_pad] through the permutation
    out_flat = jnp.zeros((total,), jnp.float32).at[order].set(out.reshape(-1))
    scores = out_flat.reshape(b, k_pad)[:, :k]
    has = (jnp.where(candidates >= 0, lengths[jnp.maximum(candidates, 0)], 0)
           > 0)
    return jnp.where((candidates >= 0) & has, scores, NEG_INF)
