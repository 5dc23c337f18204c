"""Exhaustive MaxSim scan: every doc scored against the whole query batch.

The device replacement for `single_full` at corpus scale (reference
single_stage.py:81-121 full-MaxSim comparator; exact, not HNSW). The XLA
doc-major formulation (batch.xla_exhaustive_batch) gathers doc windows into
HBM scratch and materializes [M, chunk*T] similarity tiles between fused
ops; at 100k docs it sustains only ~650 QPS for a 256-query batch (VERDICT
r3 #3: 27% effective MXU). This kernel streams each doc's token window
HBM->VMEM once (double-buffered DMAs, same machinery as maxsim_rerank),
computes [T, M] similarities on the MXU against the GROUP-PACKED query
tokens (M = real tokens, no B*NQ mask padding), folds the per-token maxima
into per-query scores with one [gq, Rg] x [Rg, G] matmul per query group
per doc block, and never writes a similarity tile to HBM. Also serves as
the high-coverage ``rerank_impl='scan'`` stage-2 (engine policy): when B*K
candidate windows outnumber docs severalfold, one pass over every doc plus
a score gather replaces per-candidate window DMAs.

Layout notes:
- queries arrive packed ([M, dim], batch.pack_queries_grouped) with the
  in-group owner rows ``qid`` [G, Rg] (int32, -1 on pad rows): each group's
  0/1 ownership one-hot is built in-kernel so per-query token sums become
  MXU work instead of masked VPU reductions, without a resident [B, M]
  (or even [G, gq, Rg]) f32 matrix in VMEM.
- sims are computed [T, M-tile] so the per-token max is a SUBLANE reduction
  with explicit keepdims (lane-dim reductions to scalars are not vectorized;
  sublane max with keepdims is — same trick as the prefetch kernel's
  has_rows).
- per-doc max rows accumulate into a [G, M] VMEM stack at a static sublane
  offset (the g-loop is unrolled), so there are no scalar stores and the
  DMA/compute pipeline never drains (the r3 rerank lesson).
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


def scan_kernel_fits(m, dim, max_len, flat_dtype, group=16,
                     n_slots=4, m_tile=1024, limit=12 * 2**20):
    """VMEM estimate for the streaming scan kernel: resident packed queries
    + qid rows + per-token max stack + DMA scratch must stay well under the
    16 MB scoped limit (holds to bs~2048 at ColPali query lengths now that
    ownership is built in-kernel from the [G, Rg] qid rows)."""
    m_pad = -(-m // min(m_tile, m)) * min(m_tile, m)
    itemsize = 2 if flat_dtype == jnp.int8 else jnp.dtype(flat_dtype).itemsize
    ml = -(-int(max_len) // 32) * 32
    vmem = (m_pad * dim * itemsize          # resident queries (compute dtype)
            + m * 4                         # qid ownership rows (int32)
            + group * m_pad * 4             # per-token max stack
            + n_slots * ml * dim * max(1, itemsize))  # DMA scratch
    return vmem <= limit


def _make_kernel(max_len: int, group: int, n_slots: int, m: int, m_tile: int,
                 g_q: int, gq: int, rg: int):
    n_mt = m // m_tile

    def kernel(off_ref, len_ref, scale_ref, q_ref, qid_ref, flat_hbm,
               out_ref, stack, scratch, sems):
        blk = pl.program_id(0)
        base = blk * group

        def get_dma(slot, g):
            off = pl.multiple_of(off_ref[base + g], 32)
            return pltpu.make_async_copy(
                flat_hbm.at[pl.ds(off, max_len), :],
                scratch.at[slot],
                sems.at[slot],
            )

        for g in range(min(n_slots - 1, group)):
            get_dma(g % n_slots, g).start()

        for g in range(group):  # static unroll
            slot = g % n_slots
            nxt = g + n_slots - 1
            if nxt < group:
                get_dma(nxt % n_slots, nxt).start()
            get_dma(slot, g).wait()
            ln = len_ref[base + g]
            # per-doc scale (int8 stores): positive, so it commutes with the
            # row max — applied to the max row, once, in SMEM-scalar form
            sc = scale_ref[base + g]
            docs = scratch[slot]  # [MAX_LEN, dim]
            row = jax.lax.broadcasted_iota(jnp.int32, (max_len, m_tile), 0)
            for mt in range(n_mt):  # static unroll: stack offsets stay static
                q_t = q_ref[pl.ds(mt * m_tile, m_tile), :]  # [m_tile, dim]
                sims = jax.lax.dot_general(
                    docs.astype(q_t.dtype), q_t,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [MAX_LEN, m_tile]
                sims = jnp.where(row < ln, sims, NEG_INF)
                best = jnp.max(sims, axis=0, keepdims=True)  # [1, m_tile]
                best = jnp.where(ln > 0, best * sc, 0.0)
                stack[pl.ds(g, 1), pl.ds(mt * m_tile, m_tile)] = best
        # per-query fold, one MXU matmul per query group: ownership is
        # block-diagonal over groups, so the dense [B, M] matrix is never
        # built — and the per-group [gq, Rg] one-hot is materialized from
        # the tiny [G_q, Rg] int32 qid row right here (a resident f32
        # ownership tensor would cost b*Rg*4 bytes of VMEM — 4 MB at
        # bs=2048 — and was the binding term in scan_kernel_fits).
        for gi in range(g_q):  # static unroll: row offsets stay static
            owner = qid_ref[pl.ds(gi, 1), :]  # [1, Rg] int32 (-1 = pad row)
            seg = (jax.lax.broadcasted_iota(jnp.int32, (gq, rg), 0)
                   == owner).astype(jnp.float32)
            scores = jax.lax.dot_general(
                seg, stack[:, pl.ds(gi * rg, rg)],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [gq, G]
            out_ref[0, pl.ds(gi * gq, gq), :] = scores

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "max_len", "b", "group", "n_slots", "m_tile", "interpret"))
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
    n_slots: int = 4,
    m_tile: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact MaxSim scores [B, D] f32 of every query against every doc."""
    max_len = ((int(max_len) + 31) // 32) * 32
    g_q, rg = qid.shape
    gq = b // g_q
    m, dim = qpacked.shape
    m_tile = min(m_tile, m)
    m_pad = int(pl.cdiv(m, m_tile)) * m_tile
    if m_pad != m:
        qpacked = jnp.pad(qpacked, ((0, m_pad - m), (0, 0)))
    d = offsets.shape[0]
    # SMEM budget: offsets+lengths+scales live in scalar memory (~1 MB);
    # 3 x 96k x 4B fits, 3 x 100k does not (same wall as the rerank kernel's
    # B*K limit) -> the doc axis is chunked into separate pallas_calls that
    # share the resident query block and the whole HBM flat ref.
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
    kern = _make_kernel(max_len, group, n_slots, m_pad, m_tile, g_q, gq, rg)
    qc = qpacked.astype(cd)
    qidc = jnp.asarray(qid, jnp.int32)

    def run_chunk(offs_c, lens_c, scales_c):
        n_blocks = offs_c.shape[0] // group
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # offsets, lengths, per-doc scales (SMEM)
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((m_pad, dim), lambda blk, *_: (0, 0),
                             memory_space=pltpu.VMEM),  # resident queries
                pl.BlockSpec((g_q, rg), lambda blk, *_: (0, 0),
                             memory_space=pltpu.VMEM),  # resident qid rows
                pl.BlockSpec(memory_space=pl.ANY),  # flat stays in HBM
            ],
            out_specs=pl.BlockSpec((1, b, group), lambda blk, *_: (blk, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((group, m_pad), jnp.float32),  # per-token maxima
                pltpu.VMEM((n_slots, max_len, dim), flat.dtype),
                pltpu.SemaphoreType.DMA((n_slots,)),
            ],
        )
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_blocks, b, group), jnp.float32),
            interpret=interpret,
        )(
            offs_c.astype(jnp.int32), lens_c.astype(jnp.int32),
            scales_c.astype(jnp.float32), qc, qidc, flat,
        )
        return jnp.moveaxis(out, 0, 1).reshape(b, n_blocks * group)

    parts = [run_chunk(offs[s:s + doc_chunk], lens[s:s + doc_chunk],
                       scales[s:s + doc_chunk])
             for s in range(0, d_pad, doc_chunk)]
    scores = (parts[0] if len(parts) == 1 else
              jnp.concatenate(parts, axis=1))[:, :d]
    # empty docs must never outrank real docs with negative MaxSim sums
    return jnp.where((lengths > 0)[None, :], scores, NEG_INF)
