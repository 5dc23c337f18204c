"""Ring attention: exact attention over sequence-sharded K/V (axis 'sp').

For contexts too long for one chip's HBM, Q/K/V shard along the sequence
dim across the 'sp' mesh axis. Each device computes attention of its local
Q block against every K/V block by rotating the K/V shards around the ring
with ``ppermute`` (ICI neighbor hops, no all-gather materialization) while
accumulating the softmax online (running row-max, numerator, denominator —
the same algebra as flash attention, applied across ring steps).

Memory per device: O(S/P) activations instead of O(S); compute identical to
dense attention; communication P-1 neighbor hops of the local K/V block,
overlappable with the block matmuls by XLA.

The reference (torch, single GPU) has no counterpart; this is the TPU-native
long-context path complementing flash attention (models/attention.py), which
handles the within-chip tiling. ``models/attention.py::mha`` dispatches here
when ``ring_axis`` is set and an ambient mesh (``jax.sharding.set_mesh``)
carries that axis. Parity contract: bit-close to dense attention for
bidirectional, causal, padded, and segmented inputs
(tests/test_ring_attention.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -1e30


def _ring_body(q, k, v, kv_mask, kv_seg, q_seg, q_pos, kv_pos,
               n_devices, axis_name, causal):
    """Online-softmax accumulation across ring steps (inside shard_map).

    q: [b, h, sq, d]   local query block
    k, v: [b, h, skv, d]  local key/value block (rotated around the ring)
    kv_mask: [b, skv] True = real token (rotates with k/v)
    kv_seg / q_seg: [b, skv] / [b, sq] int32 segment ids — attention is
    restricted to equal segments (window/tile attention); rotate kv_seg.
    q_pos / kv_pos: [sq] / [skv] GLOBAL positions (kv_pos rotates) — causal
    masking needs them because each device sees remote blocks.
    """
    scale = q.shape[-1] ** -0.5
    b, h, sq, d = q.shape
    acc = jnp.zeros((b, h, sq, d), jnp.float32)
    den = jnp.zeros((b, h, sq), jnp.float32)
    mx = jnp.full((b, h, sq), _NEG, jnp.float32)
    perm = [(i, (i + 1) % n_devices) for i in range(n_devices)]

    def step(carry, _):
        k_c, v_c, kvm_c, kvs_c, kvp_c, acc, den, mx = carry
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_c,
                       preferred_element_type=jnp.float32) * scale
        neg = jnp.float32(_NEG)
        allowed = (kvm_c[:, None, None, :]
                   & (q_seg[:, None, :, None] == kvs_c[:, None, None, :]))
        s = jnp.where(allowed, s, neg)
        if causal:
            s = jnp.where(q_pos[None, None, :, None]
                          >= kvp_c[None, None, None, :], s, neg)
        m_new = jnp.maximum(mx, jnp.max(s, axis=-1))
        corr = jnp.exp(mx - m_new)
        p = jnp.exp(s - m_new[..., None])
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_c.astype(jnp.float32))
        den = den * corr + jnp.sum(p, axis=-1)
        k_n = lax.ppermute(k_c, axis_name, perm)
        v_n = lax.ppermute(v_c, axis_name, perm)
        kvm_n = lax.ppermute(kvm_c, axis_name, perm)
        kvs_n = lax.ppermute(kvs_c, axis_name, perm)
        kvp_n = lax.ppermute(kvp_c, axis_name, perm)
        return (k_n, v_n, kvm_n, kvs_n, kvp_n, acc, den, m_new), None

    (_, _, _, _, _, acc, den, _), _ = lax.scan(
        step, (k, v, kv_mask, kv_seg, kv_pos, acc, den, mx), None,
        length=n_devices)
    return acc / jnp.maximum(den, 1e-30)[..., None]


def _axis_size(mesh: Optional[Mesh], axis_name: str) -> int:
    """Resolve the ring size from an explicit or the ambient mesh."""
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or axis_name not in getattr(mesh, "shape", {}):
            raise ValueError(
                f"no explicit mesh and ambient mesh has no '{axis_name}' "
                "axis (enter one with jax.sharding.set_mesh)")
        return int(mesh.shape[axis_name])
    if axis_name not in mesh.shape:
        raise ValueError(
            f"mesh {tuple(mesh.axis_names)} has no '{axis_name}' axis")
    return int(mesh.shape[axis_name])


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    mesh: Optional[Mesh] = None,
    *,
    segments: Optional[jnp.ndarray] = None,
    causal: bool = False,
    axis_name: str = "sp",
) -> jnp.ndarray:
    """Exact attention with K/V streamed around the 'sp' ring.

    Args:
      q, k, v: GLOBAL arrays [b, heads, s, d] (self-attention: same s).
        The wrapper shards s over ``axis_name`` internally; pass fully
        addressable arrays (or arrays already sharded that way).
      mask: [b, s] True = real token, or None.
      mesh: mesh containing ``axis_name``; s must divide by its size. When
        None, the ambient mesh (``jax.sharding.set_mesh``) is used — this is
        how ``models/attention.py`` calls it from inside jit.
      segments: optional [b, s] int32 — attention restricted to equal ids
        (window/tile attention), composed with the padding mask.
      causal: apply causal masking using global positions.

    Returns [b, heads, s, d] in q's dtype, replicated like the inputs.
    """
    n = _axis_size(mesh, axis_name)
    b, h, s, d = q.shape
    if s % n:
        raise ValueError(f"seq len {s} not divisible by {axis_name}={n}")
    if mask is None:
        mask = jnp.ones((b, s), bool)
    if segments is None:
        segments = jnp.zeros((b, s), jnp.int32)
    positions = jnp.arange(s, dtype=jnp.int32)

    def local(qb, kb, vb, mb, sb, pos):
        out = _ring_body(qb, kb, vb, mb, sb, sb, pos, pos, n, axis_name,
                         causal)
        return out.astype(q.dtype)

    spec_bhsd = P(None, None, axis_name, None)
    fn = jax.shard_map(
        local,
        mesh=mesh,  # None -> ambient mesh
        in_specs=(spec_bhsd, spec_bhsd, spec_bhsd, P(None, axis_name),
                  P(None, axis_name), P(axis_name)),
        out_specs=spec_bhsd,
        check_vma=False,
    )
    return fn(q, k, v, mask, segments.astype(jnp.int32), positions)


def dense_reference(q, k, v, mask, causal=False, segments=None):
    """O(S^2)-memory dense attention oracle (tests only)."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], s, jnp.float32(_NEG))
    if segments is not None:
        eq = segments[:, None, :, None] == segments[:, None, None, :]
        s = jnp.where(eq, s, jnp.float32(_NEG))
    if causal:
        n = q.shape[2]
        tri = jnp.tril(jnp.ones((n, n), bool))
        s = jnp.where(tri[None, None], s, jnp.float32(_NEG))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)
