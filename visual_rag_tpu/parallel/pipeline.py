"""Pipeline parallelism: GPipe microbatch schedule over a 'pp' mesh axis.

Two complementary pp modes for the ColVLM decoder stack (requires
``TextConfig.scan_layers=True`` so block params are stacked ``[L, ...]``):

1. **GSPMD weight-stage sharding** — ``models/sharding.py`` puts the stacked
   stage dim on 'pp'; XLA keeps each layer group resident on its stage's
   devices and moves activations between groups inside ``lax.scan``. Zero
   scheduling code; used by the Trainer.
2. **Explicit GPipe schedule** (this module) — ``shard_map`` over 'pp' with
   ``ppermute`` handoffs and M microbatches in flight, the classic
   fill/steady/drain pipeline. M >= n_stages keeps the bubble fraction at
   (P-1)/(M+P-1). Differentiable end to end (scan + ppermute transpose).

The reference has no pipeline story (single-process torch, Qdrant server for
scale-out); this exists because a TPU-native trainer must scale past one
chip's HBM. Math contract: identical outputs to the sequential decoder
(tests/test_pipeline_pp.py asserts forward and gradient parity).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def gpipe_apply(
    stage_fn: Callable[[Any, Any, Any], Any],
    stage_params: Any,
    mb_inputs: Any,
    mb_aux: Any,
    n_stages: int,
    axis_name: str = "pp",
):
    """GPipe forward inside ``shard_map``: M microbatches through P stages.

    Args:
      stage_fn: ``(stage_params, x, aux) -> y`` applying this stage's layer
        chunk to one microbatch. ``y`` must have ``x``'s structure/shapes.
      stage_params: this stage's param slice (leaves ``[L/P, ...]``) — pass
        the stacked params into ``shard_map`` with spec ``P('pp', ...)``.
      mb_inputs: pytree with leading ``[M, mb, ...]`` microbatch dim,
        replicated across 'pp' (only stage 0 reads it).
      mb_aux: per-microbatch side inputs (masks, positions), ``[M, ...]``.
      n_stages: static pp axis size.

    Returns outputs ``[M, mb, ...]`` replicated across 'pp'.

    Schedule: tick t, stage s processes microbatch ``m = t - s`` when valid
    (bubble ticks compute garbage that never reaches an output slot). Total
    ticks ``M + P - 1``.
    """
    s = lax.axis_index(axis_name)
    first = s == 0
    last = s == n_stages - 1
    m_total = jax.tree.leaves(mb_inputs)[0].shape[0]

    def pick(tree, idx):
        return jax.tree.map(
            lambda a: lax.dynamic_index_in_dim(a, idx, 0, keepdims=False), tree)

    recv0 = jax.tree.map(lambda a: jnp.zeros_like(a[0]), mb_inputs)
    outs0 = jax.tree.map(jnp.zeros_like, mb_inputs)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def tick(carry, t):
        recv, outs = carry
        m = jnp.clip(t - s, 0, m_total - 1)
        fresh = pick(mb_inputs, m)
        x_in = jax.tree.map(
            lambda a, r: jnp.where(first, a, r), fresh, recv)
        y = stage_fn(stage_params, x_in, pick(mb_aux, m))
        recv_next = jax.tree.map(
            lambda a: lax.ppermute(a, axis_name, perm), y)
        w = jnp.clip(t - (n_stages - 1), 0, m_total - 1)
        valid = last & (t >= n_stages - 1)
        outs = jax.tree.map(
            lambda o, v: jnp.where(
                valid, lax.dynamic_update_index_in_dim(o, v, w, 0), o),
            outs, y)
        return (recv_next, outs), None

    (_, outs), _ = lax.scan(
        tick, (recv0, outs0), jnp.arange(m_total + n_stages - 1))
    # only the last stage holds real outputs; replicate them across 'pp'
    return jax.tree.map(
        lambda o: lax.psum(jnp.where(last, o, jnp.zeros_like(o)), axis_name),
        outs)


def decoder_stage_fn(text_cfg, dtype=jnp.bfloat16):
    """Stage fn scanning this stage's decoder-layer chunk on one microbatch."""
    from visual_rag_tpu.models.colvlm import _DecoderScanBody

    body = _DecoderScanBody(text_cfg, dtype=dtype)

    def stage(stage_params, h, aux):
        mask, positions = aux

        def one_layer(c, layer_params):
            c, _ = body.apply({"params": layer_params}, c, mask, positions)
            return c, None

        h, _ = lax.scan(one_layer, h, stage_params)
        return h

    return stage


def pipelined_decoder(mesh: Mesh, text_cfg, stacked_params, embeds, mask,
                      positions, n_microbatches: int,
                      dtype=jnp.bfloat16) -> jnp.ndarray:
    """Run the scanned ColVLM decoder stack as a GPipe pipeline over 'pp'.

    ``stacked_params``: the ``scan_blocks/layers_scan`` subtree (leaves
    ``[L, ...]``). Batch is split into ``n_microbatches`` along dim 0; L must
    divide by the 'pp' axis size and batch by ``n_microbatches``.
    """
    n_stages = int(mesh.shape["pp"])
    if text_cfg.layers % n_stages:
        raise ValueError(
            f"layers={text_cfg.layers} not divisible by pp={n_stages}")
    b = embeds.shape[0]
    if b % n_microbatches:
        raise ValueError(
            f"batch={b} not divisible by microbatches={n_microbatches}")
    mb = b // n_microbatches
    x = embeds.reshape(n_microbatches, mb, *embeds.shape[1:])
    aux = (mask.reshape(n_microbatches, mb, *mask.shape[1:]),
           positions.reshape(n_microbatches, mb, *positions.shape[1:]))
    stage = decoder_stage_fn(text_cfg, dtype=dtype)
    fn = jax.shard_map(
        functools.partial(gpipe_apply, stage, n_stages=n_stages),
        mesh=mesh,
        in_specs=(P("pp"), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    out = fn(stacked_params, x, aux)
    return out.reshape(b, *embeds.shape[1:])
