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
    def kernel(off_ref, len_ref, scale_ref, q_ref, qmask_ref, flat_hbm, out_ref,
               scratch, sems):
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

        for g in range(group):  # static unroll: out lane index stays static
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
            per_q = jnp.where(ln > 0, per_q, 0.0)
            # [1,NQ]x[NQ,1] matmul -> scalar score; stored to SMEM output
            # (scalar stores to VMEM are illegal on the compiled path).
            score = jax.lax.dot_general(
                qm, per_q,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # per-doc int8 dequant scale (1.0 for float stores)
            out_ref[0, 0, g] = score[0, 0] * scale_ref[base + g]

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
    group: int = 8,
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
        num_scalar_prefetch=3,  # offsets, lengths, scales
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
            pl.BlockSpec(memory_space=pl.ANY),  # flat stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 1, group), lambda blk, *_: (blk, 0, 0), memory_space=pltpu.SMEM
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
        cand_scale,
        queries.astype(jnp.bfloat16 if flat.dtype == jnp.int8 else flat.dtype),
        jnp.asarray(qmask, jnp.float32)[:, None, :],
        flat,
    )
    scores = out.reshape(b, k_pad)[:, :k]
    # padding slots AND empty (0-token) candidates score NEG_INF: an empty
    # doc's in-kernel score is 0.0, which must never outrank real docs with
    # negative MaxSim sums (matches rerank_ragged / xla_exhaustive_batch)
    has = (cand_len > 0).reshape(b, k_pad)[:, :k]
    return jnp.where((candidates[:, :k] >= 0) & has, scores, NEG_INF)
