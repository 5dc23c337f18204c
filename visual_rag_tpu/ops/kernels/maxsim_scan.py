"""Exhaustive MaxSim scan: every doc scored against the whole query batch.

The device replacement for `single_full` at corpus scale (reference
single_stage.py:81-121 full-MaxSim comparator; exact, not HNSW). The XLA
doc-major formulation (batch.xla_exhaustive_batch) gathers doc windows into
HBM scratch and materializes [M, chunk*T] similarity tiles between fused
ops; at 100k docs it sustains only ~650 QPS for a 256-query batch (VERDICT
r3 #3: 27% effective MXU). This kernel streams each doc's token window
HBM->VMEM once (double-buffered banks), computes [T, Rg] similarities on the
MXU against the GROUP-PACKED query tokens (M = real tokens, no B*NQ mask
padding), folds the per-token maxima into per-query scores with one
[gq, Rg] x [Rg, G] matmul per step, and never writes a similarity tile to
HBM. Also serves as the high-coverage ``rerank_impl='scan'`` stage-2 (engine
policy): when B*K candidate windows outnumber docs severalfold, one pass
over every doc plus a score gather replaces per-candidate window DMAs.

Layout notes:
- grid = (doc blocks, query groups): the query side streams one group tile
  [Rg, dim] per step through the normal BlockSpec pipeline, so resident
  VMEM is ~2 doc banks + 2 query tiles (~7 MB at the worst serving
  geometry) regardless of batch size — the r4a resident-q design needed
  m*dim*2 + group*m*4 bytes and stopped fitting the fused plans' scoped
  VMEM (~13 MB) at bs >= 1024.
- queries arrive packed ([G*Rg, dim], batch.pack_queries_grouped) with the
  in-group owner rows ``qid`` [G, Rg] (int32, -1 on pad rows): each group's
  0/1 ownership one-hot is built in-kernel so per-query token sums become
  MXU work instead of masked VPU reductions.
- sims are computed [T, Rg] so the per-token max is a SUBLANE reduction
  with explicit keepdims (lane-dim reductions to scalars are not
  vectorized; sublane max with keepdims is).
- doc windows double-buffer across BLOCKS (bank = blk % 2, the pallas-guide
  dynamic-slot pattern): bank blk+1's DMAs start on blk's first step and
  have the whole block's g_q steps to land.
- doc windows are 32-row aligned (store.pack_aligned) -> pl.multiple_of
  keeps the DMA start provably tile-aligned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # python float: jnp scalars would be captured consts


def quantize_queries_int8(qpacked: jnp.ndarray):
    """Per-row symmetric int8 quantization of packed query tokens.

    Returns (codes int8 [M, dim], scales f32 [M]) with
    ``codes[r] * scales[r] ~= qpacked[r]``. Scales are positive, so they
    commute with the per-token max over doc rows and can be folded into the
    per-query ownership matmul — the int8 x int8 -> int32 dot then runs at
    the MXU's doubled int8 rate (v5e: 394 TOPS vs 197 bf16 TFLOPS) and is
    EXACT integer arithmetic (max |dot| ~ 127*127*128 << 2^31); the only
    approximation vs the bf16-query path is the query rounding itself,
    which is the same order as the bf16 cast it replaces (~2^-8 relative).
    """
    q = qpacked.astype(jnp.float32)
    s = jnp.max(jnp.abs(q), axis=1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    codes = jnp.clip(jnp.round(q / s), -127.0, 127.0).astype(jnp.int8)
    return codes, s[:, 0]


def scan_kernel_fits(m, dim, max_len, flat_dtype, group=16, rg_hint=1024,
                     limit=12 * 2**20):
    """VMEM estimate for the streaming scan kernel: 2 doc-window banks +
    2 streamed query tiles + the per-step [group, Rg] max stack. Nearly
    batch-size independent (the query side streams one group tile per grid
    step), so this effectively gates only pathological max_len/group
    combinations."""
    del m  # resident cost no longer scales with the packed token count
    itemsize = 2 if flat_dtype == jnp.int8 else jnp.dtype(flat_dtype).itemsize
    ml = -(-int(max_len) // 32) * 32
    vmem = (2 * group * ml * dim * max(1, itemsize)  # doc window banks
            + 2 * rg_hint * dim * itemsize           # streamed query tiles
            + group * rg_hint * 4                    # per-step max stack
            + 2 * rg_hint * 4                        # qid tiles
            + 2 * rg_hint * 4)                       # qdot per-row scale tiles
    return vmem <= limit


def _make_kernel(max_len: int, group: int, gq: int, rg: int,
                 qdot: bool = False):

    def kernel(off_ref, len_ref, scale_ref, q_ref, qid_ref, qs_ref, flat_hbm,
               out_ref, stack, docs, sems):
        blk = pl.program_id(0)
        gi = pl.program_id(1)
        n_blocks = pl.num_programs(0)
        bank = jax.lax.rem(blk, 2)

        def dma(bank_idx, blk_idx, g):
            off = pl.multiple_of(off_ref[blk_idx * group + g], 32)
            return pltpu.make_async_copy(
                flat_hbm.at[pl.ds(off, max_len), :],
                docs.at[bank_idx * group + g],
                sems.at[bank_idx * group + g],
            )

        @pl.when(jnp.logical_and(blk == 0, gi == 0))
        def _():
            for g in range(group):
                dma(0, 0, g).start()

        @pl.when(gi == 0)
        def _():
            # this block's bank was started one block ago (or just above):
            # wait it, then prefetch the NEXT block's windows into the other
            # bank — they have this block's remaining g_q steps to land
            for g in range(group):
                dma(bank, blk, g).wait()

            @pl.when(blk + 1 < n_blocks)
            def _():
                for g in range(group):
                    dma(1 - bank, blk + 1, g).start()

        q_t = q_ref[...]  # [Rg, dim] — this query group's packed tokens
        row = jax.lax.broadcasted_iota(jnp.int32, (max_len, rg), 0)
        for g in range(group):  # static unroll
            ln = len_ref[blk * group + g]
            # per-doc scale (int8 stores): positive, so it commutes with the
            # row max — applied to the max row, once, in SMEM-scalar form
            sc = scale_ref[blk * group + g]
            d = docs[bank * group + g]  # [MAX_LEN, dim] dynamic-slot read
            if qdot:
                # int8 x int8 -> int32: exact integer MXU dot at 2x the
                # bf16 rate; the per-row query scale is folded into the
                # ownership matmul below (positive -> commutes with max)
                sims = jax.lax.dot_general(
                    d, q_t,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)  # [MAX_LEN, Rg]
            else:
                sims = jax.lax.dot_general(
                    d.astype(q_t.dtype), q_t,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [MAX_LEN, Rg]
            sims = jnp.where(row < ln, sims, NEG_INF)
            best = jnp.max(sims, axis=0, keepdims=True)  # [1, Rg]
            stack[pl.ds(g, 1), :] = jnp.where(ln > 0, best * sc, 0.0)
        # per-query fold, one MXU matmul per step: ownership is
        # block-diagonal over groups, so the dense [B, M] matrix is never
        # built — the [gq, Rg] one-hot comes from this group's int32 qid row
        owner = qid_ref[0]  # [1, Rg] int32 (-1 = pad row)
        seg = (jax.lax.broadcasted_iota(jnp.int32, (gq, rg), 0)
               == owner).astype(jnp.float32)
        if qdot:  # fold per-row query scales into the ownership weights
            seg = seg * qs_ref[0]  # [gq, Rg] * [1, Rg]
        scores = jax.lax.dot_general(
            seg, stack[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [gq, G]
        out_ref[0, :, :] = scores

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "max_len", "b", "group", "n_slots", "m_tile", "interpret", "qdot_int8"))
def exhaustive_scores_packed(
    flat: jnp.ndarray,  # [N + pad, dim] ragged store (bf16/f32/int8 codes)
    offsets: jnp.ndarray,  # [D] int32
    lengths: jnp.ndarray,  # [D] int32
    qpacked: jnp.ndarray,  # [M, dim] l2-normalized packed query tokens
    qid: jnp.ndarray,  # [G_q, Rg] int32 in-group owner (-1 = pad row)
    max_len: int,
    b: int,  # batch size (G_q * gq)
    doc_scales: jnp.ndarray | None = None,  # [D] per-doc int8 scales
    group: int = 16,
    n_slots: int = 4,  # unused (kept for call compatibility)
    m_tile: int = 1024,  # unused (kept for call compatibility)
    interpret: bool = False,
    qdot_int8: bool = False,  # int8 store: quantize queries, int8 MXU dot
) -> jnp.ndarray:
    """Exact MaxSim scores [B, D] f32 of every query against every doc."""
    del n_slots, m_tile
    if qdot_int8 and flat.dtype != jnp.int8:
        raise ValueError("qdot_int8 requires an int8 store")
    max_len = ((int(max_len) + 31) // 32) * 32
    g_q, rg = qid.shape
    gq = b // g_q
    m, dim = qpacked.shape
    d = offsets.shape[0]
    # SMEM budget: offsets+lengths+scales live in scalar memory (~1 MB);
    # 3 x 96k x 4B fits, 3 x 100k does not (same wall as the rerank kernel's
    # B*K limit) -> the doc axis is chunked into separate pallas_calls that
    # share the streamed query tiles and the whole HBM flat ref.
    doc_chunk = (81920 // group) * group
    d_pad = int(pl.cdiv(d, group)) * group
    offs = jnp.pad(offsets, (0, d_pad - d)) if d_pad != d else offsets
    lens = jnp.pad(lengths, (0, d_pad - d)) if d_pad != d else lengths
    if doc_scales is None:
        scales = jnp.ones((d_pad,), jnp.float32)
    else:
        scales = jnp.pad(doc_scales.astype(jnp.float32), (0, d_pad - d),
                         constant_values=1.0) if d_pad != d else \
            doc_scales.astype(jnp.float32)
    cd = jnp.bfloat16 if flat.dtype == jnp.int8 else flat.dtype
    kern = _make_kernel(max_len, group, gq, rg, qdot=qdot_int8)
    if qdot_int8:
        qc, qs = quantize_queries_int8(qpacked)
        qsc = qs.reshape(g_q, 1, rg)
    else:
        qc = qpacked.astype(cd)
        qsc = jnp.ones((g_q, 1, rg), jnp.float32)  # ignored by the kernel
    qidc = jnp.asarray(qid, jnp.int32).reshape(g_q, 1, rg)

    def run_chunk(offs_c, lens_c, scales_c):
        n_blocks = offs_c.shape[0] // group
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # offsets, lengths, per-doc scales (SMEM)
            grid=(n_blocks, g_q),
            in_specs=[
                pl.BlockSpec((rg, dim), lambda blk, gi, *_: (gi, 0),
                             memory_space=pltpu.VMEM),  # streamed query tile
                pl.BlockSpec((1, 1, rg), lambda blk, gi, *_: (gi, 0, 0),
                             memory_space=pltpu.VMEM),  # this group's qid row
                pl.BlockSpec((1, 1, rg), lambda blk, gi, *_: (gi, 0, 0),
                             memory_space=pltpu.VMEM),  # per-row qdot scales
                pl.BlockSpec(memory_space=pl.ANY),  # flat stays in HBM
            ],
            out_specs=pl.BlockSpec(
                (1, gq, group), lambda blk, gi, *_: (blk, gi, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((group, rg), jnp.float32),  # per-step max stack
                pltpu.VMEM((2 * group, max_len, dim), flat.dtype),
                pltpu.SemaphoreType.DMA((2 * group,)),
            ],
        )
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_blocks, b, group), jnp.float32),
            interpret=interpret,
        )(
            offs_c.astype(jnp.int32), lens_c.astype(jnp.int32),
            scales_c.astype(jnp.float32), qc, qidc, qsc, flat,
        )
        return jnp.moveaxis(out, 0, 1).reshape(b, n_blocks * group)

    parts = [run_chunk(offs[s:s + doc_chunk], lens[s:s + doc_chunk],
                       scales[s:s + doc_chunk])
             for s in range(0, d_pad, doc_chunk)]
    scores = (parts[0] if len(parts) == 1 else
              jnp.concatenate(parts, axis=1))[:, :d]
    # empty docs must never outrank real docs with negative MaxSim sums
    return jnp.where((lengths > 0)[None, :], scores, NEG_INF)
