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
