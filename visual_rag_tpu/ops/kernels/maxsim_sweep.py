"""Stage-2 rerank, range-sweep variant: stream coalesced row-ranges.

The per-candidate kernels (maxsim_rerank.py) hit two measured floors at
production shapes (BENCH_SUMMARY round 3, 256x200 candidates): a fixed
~0.8 us DMA descriptor cost per candidate window (flat in window bytes —
single DMA queue, not bandwidth) and ~0.6 us of MXU issue/M-padding per
per-candidate [NQ, T] matmul. This kernel attacks both structurally:

- **One DMA per row-RANGE, not per candidate.** The flat ragged store is
  tiled into fixed ``r_step``-row ranges; (query, candidate) pairs are
  sorted by their doc's flat offset so all pairs whose docs start inside a
  range are adjacent, and the kernel streams each candidate-bearing range
  window ``flat[start : start + r_rows]`` exactly once (``r_rows = r_step +
  ceil32(max_len)`` so any doc starting in the step fits fully). When
  candidates cover a decent fraction of the corpus — always true for the
  serving shapes B>=64, prefetch>=100 on small/mid corpora — this divides
  the descriptor count by the mean pairs-per-range and converts the DMA
  side from latency-bound random gathers into a sequential sweep paying
  only streaming bandwidth.
- **P queries M-packed per matmul.** Pairs within a block share the
  resident window, so P = min(128 // NQ, 8) pairs' query-token blocks are
  concatenated into the M dimension (the space the per-candidate kernel
  wasted on padding NQ<=128 up to the 128-row MXU tile) and scored with
  ONE [P*NQ, r_rows] matmul. Each pair then takes a masked row-band /
  column-window max — the same MaxSim, bit-exact vs rerank_candidates.

Scores are identical to ``rerank_candidates`` /
``rerank_candidates_dedup`` (same max + [1,NQ]xmatmul sum ordering);
this is the third interchangeable implementation of Qdrant's server-side
``exact=True`` multivector rerank (reference two_stage.py:161-180,
371-426), selected by a static coverage policy in the engine.

Mosaic notes: qmask is folded host-side (query rows zeroed) so the kernel
does no per-pair mask loads; window starts are ``r_step``-aligned multiples
of 32 so DMA starts stay provably tile-aligned; the per-pair column window
is selected by iota masking (no unaligned lane slicing); scalar metadata
packs one int32 per pair (qid | local_off/32 | len) to respect SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # python float: jnp scalars would be captured consts in kernels

_LEN_BITS = 15  # len < 32768
_LOFF_BITS = 8  # local_off / 32 < 256  ->  r_rows <= 8192
_LEN_MOD = 1 << _LEN_BITS
_LOFF_MOD = 1 << _LOFF_BITS
MAX_R_ROWS = 32 * _LOFF_MOD  # 8192
MAX_B = (1 << 31) // (_LEN_MOD * _LOFF_MOD)  # qid must fit the high bits: 256


def _ceil32(n: int) -> int:
    return ((int(n) + 31) // 32) * 32


def _make_kernel(r_rows: int, nq: int, p: int, mgroups: int, n_bufs: int):
    g_total = p * mgroups

    def kernel(slotpack_ref, blkpack_ref, blkstart_ref, blkissue_ref,
               warm_ref, q_ref, scale_ref, flat_hbm, out_ref, scratch, sems):
        blk = pl.program_id(0)
        base = blk * g_total

        def issue(start, slot):
            start = pl.multiple_of(start, 32)
            pltpu.make_async_copy(
                flat_hbm.at[pl.ds(start, r_rows), :],
                scratch.at[slot],
                sems.at[slot],
            ).start()

        @pl.when(blk == 0)  # warm ranks 0..n_bufs-2 (grid is sequential)
        def _():
            for j in range(n_bufs - 1):
                @pl.when(warm_ref[j] >= 0)
                def _():
                    issue(warm_ref[j], j)

        meta = blkpack_ref[blk]
        first = meta % 2
        active = (meta // 2) % 2
        slot = meta // 4

        @pl.when((first > 0) & (blkissue_ref[blk] >= 0))
        def _():  # keep n_bufs-1 range DMAs in flight past this one
            issue(blkissue_ref[blk], (slot + n_bufs - 1) % n_bufs)

        @pl.when(first > 0)
        def _():
            start = pl.multiple_of(blkstart_ref[blk], 32)
            pltpu.make_async_copy(
                flat_hbm.at[pl.ds(start, r_rows), :],
                scratch.at[slot],
                sems.at[slot],
            ).wait()

        @pl.when(active > 0)
        def _():
            win = scratch[slot]  # [r_rows, dim]
            col = jax.lax.broadcasted_iota(jnp.int32, (nq, r_rows), 1)
            # ONE dot for the whole block: all g_total pairs' query blocks
            # stack into M = mgroups*P*NQ rows. Issuing mgroups separate
            # matmuls serialized MXU->VPU->MXU on the reused sims buffer
            # (measured 12% MXU at the 3k-doc shape); a single deep dot
            # keeps the systolic array streaming.
            qs = []
            metas = []
            for j in range(g_total):
                sp = slotpack_ref[base + j]
                metas.append(sp)
                qs.append(q_ref[sp // (_LEN_MOD * _LOFF_MOD)])
            qcat = qs[0] if g_total == 1 else jnp.concatenate(qs, axis=0)
            sims = jax.lax.dot_general(
                qcat, win.astype(qcat.dtype),  # int8 upcast in VMEM only
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G*NQ, r_rows]
            cols = []
            for j in range(g_total):
                sp = metas[j]
                ln = sp % _LEN_MOD
                lo = ((sp // _LEN_MOD) % _LOFF_MOD) * 32
                s = sims[j * nq:(j + 1) * nq]  # static row band
                inside = (col >= lo) & (col < lo + ln)
                per_q = jnp.max(jnp.where(inside, s, NEG_INF),
                                axis=1, keepdims=True)  # [NQ, 1]
                # all-vector accumulation (maxsim_rerank v3): columns
                # stay in vregs, one matmul sums per block
                cols.append(jnp.where(ln > 0, per_q, 0.0))
            ones = jnp.ones((1, nq), jnp.float32)
            scores = jax.lax.dot_general(
                ones, jnp.concatenate(cols, axis=1),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, G]
            out_ref[0, :, :] = scores * scale_ref[0, :, :]

    return kernel


def sweep_params(rows: int, max_len: int, r_step: int = 2048):
    """(r_step, r_rows, n_ranges) for a store of ``rows`` flat rows.

    Small stores collapse to a single whole-store window; otherwise ranges
    step by ``r_step`` (raised to the doc span if docs are longer) with a
    one-span overlap so every doc starting inside a step fits its window.
    """
    span = _ceil32(max_len)
    r_step = max(int(r_step), span)
    if rows <= r_step + span:
        return rows, rows, 1  # single range covers the whole store
    r_rows = r_step + span
    return r_step, r_rows, -(-rows // r_step)


def sweep_supported(rows: int, max_len: int, b: int, k: int, nq: int,
                    dim: int, dtype_itemsize: int, r_step: int = 2048,
                    mgroups: int = 2, n_bufs: int = 3) -> bool:
    """Static feasibility: alignment, pack widths, VMEM and SMEM budgets."""
    _, r_rows, n_ranges = sweep_params(rows, max_len, r_step)
    if rows % 32 or r_rows % 32:
        return False
    if r_rows > MAX_R_ROWS or b > MAX_B or max_len >= _LEN_MOD:
        return False
    # window buffers + f32 sims + query block must fit comfortably in VMEM
    win = n_bufs * r_rows * dim * dtype_itemsize
    sims = 128 * r_rows * 4
    qblk = b * nq * dim * 2
    if win + sims + qblk > 12 * 1024 * 1024:
        return False
    # scalar-prefetch arrays ride in SMEM (1 MB total): slotpack has one
    # int32 per slot and each block carries 3 metadata ints. At low coverage
    # the per-range padding term (n_ranges * (g_total - 1)) dominates and
    # blows the budget (measured OOM: 1.06 MB at 30k docs x 320-832 tokens)
    p = max(1, min(128 // max(1, nq), 8)) if nq % 8 == 0 else 1
    g_total = p * mgroups
    n_slots = -(-(b * k + n_ranges * (g_total - 1)) // g_total) * g_total
    n_blocks = n_slots // g_total
    smem = (n_slots + 3 * n_blocks + max(1, n_bufs - 1)) * 4
    return smem <= 900 * 1024


@functools.partial(jax.jit, static_argnames=(
    "max_len", "r_step", "mgroups", "n_bufs", "interpret"))
def rerank_candidates_sweep(
    flat: jnp.ndarray,  # [rows, dim] ragged store (bf16/f32, or int8 codes)
    offsets: jnp.ndarray,  # [D] int32 (32-row aligned doc starts)
    lengths: jnp.ndarray,  # [D] int32
    queries: jnp.ndarray,  # [B, NQ, dim]
    qmask: jnp.ndarray,  # [B, NQ] bool/float
    candidates: jnp.ndarray,  # [B, K] int32 doc ids, -1 = padding
    max_len: int,
    doc_scales: jnp.ndarray | None = None,  # [D] per-doc int8 scales
    r_step: int = 2048,
    mgroups: int = 2,
    n_bufs: int = 3,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact MaxSim scores [B, K] f32 via the range-sweep layout."""
    rows = int(flat.shape[0])
    dim = int(flat.shape[1])
    b, k = candidates.shape
    nq = int(queries.shape[1])
    if b > MAX_B:
        raise ValueError(f"sweep kernel: B={b} > {MAX_B}; chunk the batch")
    if max_len >= _LEN_MOD:
        raise ValueError(f"sweep kernel: max_len={max_len} >= {_LEN_MOD}")
    span = _ceil32(max_len)
    r_step, r_rows, n_ranges = sweep_params(rows, max_len, r_step)
    if rows % 32 or r_rows % 32 or r_rows > MAX_R_ROWS:
        raise ValueError(
            f"sweep kernel: rows={rows} r_rows={r_rows} unsupported "
            f"(need 32-aligned, r_rows <= {MAX_R_ROWS})")
    # M-pack factor: P query blocks fill the 128-row MXU tile. Unaligned NQ
    # would need sublane-band slices at non-multiple-of-8 offsets -> p=1.
    p = max(1, min(128 // max(1, nq), 8)) if nq % 8 == 0 else 1
    g_total = p * mgroups

    total = b * k
    flatc = candidates.reshape(-1)
    valid = flatc >= 0
    safe = jnp.maximum(flatc, 0)
    off = jnp.where(valid, offsets[safe], 0).astype(jnp.int32)
    ln = jnp.where(valid, lengths[safe], 0).astype(jnp.int32)
    if doc_scales is None:
        pscale = jnp.ones_like(flatc, dtype=jnp.float32)
    else:
        pscale = jnp.where(valid, doc_scales[safe], 1.0).astype(jnp.float32)
    qid = (jnp.arange(total, dtype=jnp.int32) // k)
    # invalid (-1 / padded) and empty-doc pairs sort past every real range and
    # never get a slot: sharded merges and filtered searches hand this kernel
    # mostly-dead candidate grids, and dead pairs must not burn blocks (their
    # scores are overwritten by the validity mask below)
    rid = jnp.where(valid & (ln > 0), off // r_step, n_ranges).astype(jnp.int32)

    # sort pairs by (range, query): ranges become contiguous runs (one DMA
    # each); same-query pairs cluster inside a range so M-packed blocks
    # reload fewer distinct query blocks
    order = jnp.argsort(rid * jnp.int32(MAX_B) + qid, stable=True)
    srid = rid[order]
    svalid = srid < n_ranges
    sridc = jnp.minimum(srid, n_ranges - 1)  # safe lookup index
    sqid = qid[order]
    soff = off[order]
    sln = ln[order]
    sscale = pscale[order]

    # dense per-range bookkeeping (n_ranges is static: rows // r_step);
    # out-of-range segment ids (invalid pairs) drop out of the counts
    onesv = jnp.ones((total,), jnp.int32)
    counts = jax.ops.segment_sum(onesv, srid, num_segments=n_ranges)
    padded = -(-counts // g_total) * g_total
    cpad = jnp.cumsum(padded)
    base_of = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               cpad[:-1]]).astype(jnp.int32)
    ccnt = jnp.cumsum(counts)
    start_idx = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 ccnt[:-1]]).astype(jnp.int32)
    n_slots_static = -(-(total + n_ranges * (g_total - 1)) // g_total) * g_total
    dest = base_of[sridc] + (jnp.arange(total, dtype=jnp.int32)
                             - start_idx[sridc])
    # invalid pairs scatter to the drop slot and gather back garbage that the
    # final validity mask overwrites
    dest = jnp.where(svalid, dest, n_slots_static)
    used = cpad[-1]  # dynamic count of occupied slots

    range_start = jnp.minimum(
        jnp.arange(n_ranges, dtype=jnp.int32) * r_step,
        rows - r_rows).astype(jnp.int32)
    sloff = soff - range_start[sridc]  # in [0, r_rows - span]

    n_blocks = n_slots_static // g_total
    slotpack = jnp.zeros((n_slots_static,), jnp.int32).at[dest].set(
        sqid * (_LEN_MOD * _LOFF_MOD) + (sloff // 32) * _LEN_MOD + sln,
        mode="drop")
    slotscale = jnp.ones((n_slots_static,), jnp.float32).at[dest].set(
        sscale, mode="drop")

    # block metadata: the first block of each candidate-bearing range waits
    # on that range's window DMA and issues the DMA n_bufs-1 ranges ahead
    nonempty = counts > 0
    rank = jnp.cumsum(nonempty.astype(jnp.int32)) - 1  # rank among nonempty
    n_live = jnp.maximum(rank[-1] + 1, 0)
    buf = jnp.where(nonempty, rank % n_bufs, 0).astype(jnp.int32)
    blk_first = base_of // jnp.int32(g_total)
    start_of_rank = jnp.full((n_ranges,), -1, jnp.int32).at[
        jnp.where(nonempty, rank, n_ranges)].set(range_start, mode="drop")
    look = rank + (n_bufs - 1)
    issue_val = jnp.where(
        nonempty & (look < n_live),
        start_of_rank[jnp.minimum(look, n_ranges - 1)], -1).astype(jnp.int32)

    blk_idx = jnp.arange(n_blocks, dtype=jnp.int32)
    activev = (blk_idx * g_total < used).astype(jnp.int32)
    scatter_to = jnp.where(nonempty, blk_first, n_blocks)
    # EVERY block of a multi-block range must decode its range's buffer:
    # mark first blocks with rid+1, forward-fill (rids are monotone in
    # block order), then look the buffer up per block
    rid_mark = jnp.zeros((n_blocks,), jnp.int32).at[scatter_to].set(
        jnp.arange(n_ranges, dtype=jnp.int32) + 1, mode="drop")
    blk_rid = jax.lax.cummax(rid_mark) - 1
    slot_blk = jnp.where(blk_rid >= 0, buf[jnp.maximum(blk_rid, 0)], 0)
    firstv = jnp.zeros((n_blocks,), jnp.int32).at[scatter_to].set(
        1, mode="drop")
    blkpack = slot_blk * 4 + activev * 2 + firstv
    blkstart = jnp.zeros((n_blocks,), jnp.int32).at[scatter_to].set(
        range_start, mode="drop")
    blkissue = jnp.full((n_blocks,), -1, jnp.int32).at[scatter_to].set(
        issue_val, mode="drop")
    jw = jnp.arange(max(1, n_bufs - 1), dtype=jnp.int32)
    warm = jnp.where(
        (jw < n_live) & (jw < n_bufs - 1),
        start_of_rank[jnp.minimum(jw, n_ranges - 1)], -1).astype(jnp.int32)

    qz = (queries * jnp.asarray(qmask, queries.dtype)[:, :, None]).astype(
        jnp.bfloat16 if flat.dtype == jnp.int8 else flat.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # slotpack, blkpack, blkstart, blkissue, warm
        grid=(n_blocks,),
        in_specs=[
            # FULL query batch resident in VMEM (constant index map)
            pl.BlockSpec((b, nq, dim), lambda blk, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g_total), lambda blk, *_: (blk, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # flat stays in HBM
        ],
        out_specs=pl.BlockSpec((1, 1, g_total), lambda blk, *_: (blk, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_bufs, r_rows, dim), flat.dtype),
            pltpu.SemaphoreType.DMA((n_bufs,)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(r_rows, nq, p, mgroups, n_bufs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, 1, g_total), jnp.float32),
        interpret=interpret,
    )(
        slotpack, blkpack, blkstart, blkissue, warm,
        qz, slotscale.reshape(n_blocks, 1, g_total), flat,
    )
    # gather each pair's score back through its slot, undo the sort
    scores_sorted = out.reshape(-1)[dest]
    scores = jnp.zeros((total,), jnp.float32).at[order].set(
        scores_sorted).reshape(b, k)
    has = jnp.where(valid, ln, 0).reshape(b, k) > 0
    return jnp.where((candidates >= 0) & has, scores, NEG_INF)
