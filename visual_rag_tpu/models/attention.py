"""Attention dispatch: fused flash-attention kernel on TPU, dense elsewhere.

The dense path materializes [B, H, T, T] logits in HBM — fine for queries but
1.4 GB/layer for ColQwen2.5 page grids (T ≈ 3300). On TPU the fused Pallas
flash-attention kernel (jax.experimental.pallas.ops.tpu.flash_attention,
online-softmax tiling per the TPU attention guide) keeps the working set in
VMEM blocks.

Padding is expressed as segment ids: valid tokens are segment 1, pad tokens
segment 0, so pad keys never contribute and pad queries attend only to pads
(their outputs are zeroed by the projection mask later anyway).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _flash_available(t: int, dh: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    # Below ~1k tokens the dense path wins on v5e (measured: T=896 dense
    # 4.7 ms vs flash 6.4 ms; T=3328 flash 7.6 ms vs dense 12.2 ms) — the
    # [T, T] logits still fit comfortably and avoid the kernel's overheads.
    # Block constraints: 128-aligned sequence, lane-tileable head dim.
    return t >= 1024 and t % 128 == 0 and dh % 64 == 0


def mha(q, k, v, mask, *, causal: bool, dtype, use_flash: bool = True,
        segments=None, ring_axis=None):
    """Multi-head attention with padding mask and optional segment restriction.

    q/k/v: [B, T, H, Dh]; mask: [B, T] bool (key/query validity);
    segments: optional [B, T] int32 — tokens attend only within equal segment
    ids (window attention for the Qwen2.5-VL vision tower: windows = segments).
    ring_axis: when set (e.g. 'sp') and the ambient mesh
    (``jax.sharding.set_mesh``) carries that axis with T divisible by it,
    attention runs as ring attention — K/V streamed around the axis instead
    of all-gathered, for sequences too long for one chip.
    Returns [B, T, H, Dh] in ``dtype``.
    """
    b, t, h, dh = q.shape
    if segments is None:
        seg = mask.astype(jnp.int32)  # pads = segment 0, valid = segment 1
    else:
        # shift window ids to >= 1 so pad tokens (segment 0) never mix in
        seg = jnp.where(mask, segments.astype(jnp.int32) + 1, 0)
    if ring_axis is not None:
        ambient = jax.sharding.get_abstract_mesh()
        if (ambient is not None and ring_axis in getattr(ambient, "shape", {})
                and t % int(ambient.shape[ring_axis]) == 0):
            from visual_rag_tpu.parallel.ring_attention import ring_attention

            out = ring_attention(
                jnp.moveaxis(q, 2, 1), jnp.moveaxis(k, 2, 1),
                jnp.moveaxis(v, 2, 1), mask, segments=seg, causal=causal,
                axis_name=ring_axis)
            return jnp.moveaxis(out, 1, 2).astype(dtype)
    if use_flash and _flash_available(t, dh):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds,
            flash_attention,
        )

        out = flash_attention(
            jnp.moveaxis(q, 2, 1).astype(dtype),  # [B, H, T, Dh]
            jnp.moveaxis(k, 2, 1).astype(dtype),
            jnp.moveaxis(v, 2, 1).astype(dtype),
            segment_ids=SegmentIds(q=seg, kv=seg),
            causal=causal,
            sm_scale=1.0 / float(dh) ** 0.5,
        )
        return jnp.moveaxis(out, 1, 2).astype(dtype)

    # dense fallback (CPU, small sequences, interpret mode)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(dh).astype(jnp.float32)
    big_neg = jnp.finfo(jnp.float32).min
    attn_mask = mask[:, None, None, :] & (seg[:, None, :, None] == seg[:, None, None, :])
    if causal:
        causal_m = jnp.tril(jnp.ones((t, t), dtype=bool))
        attn_mask = attn_mask & causal_m[None, None, :, :]
    logits = jnp.where(attn_mask, logits, big_neg)
    weights = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)
