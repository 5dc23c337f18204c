"""Streaming chunked seal: host pack -> rotating warm buffers -> device.

Why (round-5 seal profile, 60k docs bf16, v5e-1 tunneled host):

- the legacy one-shot ``build()`` cost 303 s: ~116 s of host time that is
  almost entirely FRESH-PAGE faults (this VM demand-faults anonymous memory
  at ~26 us/4 KB page = 143 MB/s; warm copies run at 4 GB/s) plus 187 s of
  wire at 19 MB/s (one huge ``jnp.asarray`` serializes through fresh
  staging pages and never pipelines);
- chunked transfers of the SAME bytes run at ~124 MB/s (measured, 8x64 MB
  vs one 512 MB at 57 MB/s) and device-side assembly is free;
- ``MADV_HUGEPAGE`` scratches fault 9x cheaper and are REUSED across
  chunks/stores, so the fault tax is paid once per process.

So the streaming build cuts a 60k-doc bf16 seal from ~300 s to tens of
seconds, and is BIT-IDENTICAL to the legacy path: the same native
normalize/scatter/convert/quantize routines run per chunk (per-doc math
never crosses chunk boundaries), chunks land in a device buffer via donated
``lax.dynamic_update_slice`` (no 2x HBM transient), and the resulting store
fields match the legacy build exactly (tests/test_seal_stream.py pins this
for every storage dtype).

Reference behavior being accelerated: upload_batch + collection build
(reference visual_rag/indexing/qdrant_indexer.py:341-507).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from visual_rag_tpu.utils.hostmem import huge_empty, scratch_view

__all__ = ["should_stream", "build_ragged_streaming", "build_padded_streaming"]


def _chunk_rows(dim: int) -> int:
    """Rows per chunk so the f32 staging scratch is ~VISUALRAG_SEAL_CHUNK_MB."""
    chunk_bytes = int(os.environ.get("VISUALRAG_SEAL_CHUNK_MB", "128")) << 20
    rows = max(32, chunk_bytes // (4 * dim))
    return (rows // 32) * 32


def _stream_mode() -> str:
    return os.environ.get("VISUALRAG_SEAL_STREAM", "auto")


def should_stream(est_f32_bytes: int, max_aligned_len: int, dim: int) -> bool:
    mode = _stream_mode()
    if mode == "never":
        return False
    if max_aligned_len > _chunk_rows(dim):  # one doc larger than a chunk
        return False
    if mode == "always":
        return True
    min_bytes = int(os.environ.get("VISUALRAG_SEAL_STREAM_MIN_MB", "256")) << 20
    return est_f32_bytes >= min_bytes


class _WirePool:
    """Tiny rotation of hugepage-backed transfer buffers (depth 3).

    Rotation + guard() mirror utils/hostbuf.HostBufferPool: the recycle of a
    buffer blocks on the device array it was last shipped as. (On the axon
    tunnel device_put serializes the host bytes eagerly — hostbuf.py probe —
    so the block is a no-op there; on CPU backends it prevents zero-copy
    aliasing corruption.)
    """

    def __init__(self, depth: int = 3):
        self.depth = depth
        self._slots = {}
        self._pending = {}
        self._n = 0

    def get(self, shape, dtype) -> np.ndarray:
        key = (tuple(shape), np.dtype(dtype).str)
        slot = self._slots.get(key)
        if slot is None:
            slot = [[huge_empty(shape, dtype) for _ in range(self.depth)], 0]
            self._slots[key] = slot
        bufs, i = slot
        slot[1] = (i + 1) % self.depth
        buf = bufs[i]
        pending = self._pending.pop(id(buf), None)
        if pending is not None:
            import jax

            jax.block_until_ready(pending)
        return buf

    def guard(self, buf: np.ndarray, device_array) -> None:
        self._pending[id(buf)] = device_array


_POOL = _WirePool()
_UPDATERS = {}


def _updater(ndim: int):
    """Donated dynamic_update_slice jit, one cached fn per rank (shapes and
    dtypes get their own compile entries inside the one jit cache)."""
    fn = _UPDATERS.get(ndim)
    if fn is None:
        import jax
        import jax.numpy as jnp

        def body(d, c, i):
            idx = (i,) + (jnp.int32(0),) * (ndim - 1)
            return jax.lax.dynamic_update_slice(d, c, idx)

        fn = jax.jit(body, donate_argnums=(0,))
        _UPDATERS[ndim] = fn
    return fn


def _np_wire_dtype(storage_dtype: str):
    import ml_dtypes

    return {
        "float32": np.float32,
        "float16": np.float16,
        "bfloat16": ml_dtypes.bfloat16,
        "int8": np.int8,
        "int8_refined": np.int8,
    }[storage_dtype]


def _convert_chunk(flat_view: np.ndarray, storage_dtype: str, buf: np.ndarray,
                   rows: int) -> None:
    """flat_view [rows, dim] f32 -> buf[:rows] in the storage dtype (in place,
    same routines as store._pack_storage for bit-identity)."""
    from visual_rag_tpu import native

    if storage_dtype == "bfloat16":
        native.f32_to_bf16(flat_view, out=buf[:rows])
    elif storage_dtype == "float16":
        # direct cast into the wire buffer (same C conversion as astype,
        # no fresh temp)
        np.copyto(buf[:rows], flat_view, casting="unsafe")
    else:  # float32
        np.copyto(buf[:rows], flat_view)


def _residual_chunk(flat: np.ndarray, codes: np.ndarray, dsr: np.ndarray,
                    res_buf: np.ndarray, rs_buf: np.ndarray, dim: int,
                    rows: int) -> None:
    """Chunked, scratch-backed twin of store._residual_int4 (bit-identical).

    flat [rows, dim] f32 normalized; codes [rows, dim] int8; dsr [rows] f32
    per-row doc scales (0 on alignment-gap rows). Writes packed nibbles into
    res_buf[:rows] (uint8 [*, dim//2]) and row scales into rs_buf[:rows].
    """
    r = scratch_view("seal_res_r", (flat.shape[0], dim), np.float32)[:rows]
    np.multiply(codes, dsr[:, None], out=r, casting="unsafe")
    np.subtract(flat, r, out=r)
    # gap rows: flat==0 and codes==0 -> r==0 already; mask matches legacy
    row_scale = (dsr > 0).astype(np.float32)
    r *= row_scale[:, None]
    rs = np.abs(r).max(axis=1) / 7.0
    rs = np.maximum(rs, 1e-12).astype(np.float32)
    np.divide(r, rs[:, None], out=r)
    np.rint(r, out=r)
    np.clip(r, -7, 7, out=r)
    # mirror legacy byte-for-byte: int8 arithmetic (incl. << wrap), then a
    # mod-256 cast to uint8 (astype semantics)
    c4 = scratch_view("seal_res_c4", (flat.shape[0], dim), np.int8)[:rows]
    np.copyto(c4, r, casting="unsafe")  # f32 in [-7,7] -> int8 exact
    c4 += 8  # [1, 15]
    hi = scratch_view("seal_res_hi", (flat.shape[0], dim // 2), np.int8)[:rows]
    np.left_shift(c4[:, 1::2], 4, out=hi)
    np.bitwise_or(c4[:, 0::2], hi, out=hi)
    np.copyto(res_buf[:rows], hi, casting="unsafe")  # int8 -> uint8 mod 256
    res_buf[:rows] *= row_scale[:, None] > 0  # gap-row bytes zero (legacy)
    np.multiply(rs, row_scale, out=rs_buf[:rows])


def build_ragged_streaming(mats: List[np.ndarray], storage_dtype: str,
                           dim: int, align: int = 32):
    """Chunked RaggedMultiVectors.build — bit-identical, 5-10x faster seal."""
    import jax.numpy as jnp

    from visual_rag_tpu import native
    from visual_rag_tpu.index.store import RaggedMultiVectors, doc_scale_rows

    n_docs = len(mats)
    lengths = np.array([m.shape[0] for m in mats], dtype=np.int32)
    aligned = ((lengths.astype(np.int64) + align - 1) // align) * align
    offsets = np.zeros((n_docs,), dtype=np.int64)
    if n_docs:
        offsets[1:] = np.cumsum(aligned)[:-1]
    max_len = int(lengths.max()) if n_docs else 1
    tail = ((max_len + align - 1) // align) * align
    padded_total = int(aligned.sum()) + tail
    C = _chunk_rows(dim)

    refined = storage_dtype == "int8_refined"
    int8 = storage_dtype in ("int8", "int8_refined")
    wire_dt = _np_wire_dtype(storage_dtype)

    dev = jnp.zeros((padded_total, dim), dtype=wire_dt)
    upd2 = _updater(2)
    dev_res = dev_rs = None
    if refined:
        dev_res = jnp.zeros((padded_total, dim // 2), dtype=jnp.uint8)
        dev_rs = jnp.zeros((padded_total,), dtype=jnp.float32)

    src_s = scratch_view("seal_src", (C, dim), np.float32)
    flat_s = scratch_view("seal_flat", (C, dim), np.float32)
    all_scales: List[np.ndarray] = []
    debug = os.environ.get("VISUALRAG_SEAL_DEBUG")
    import time as _time

    a = 0
    while a < n_docs:
        b = a
        rows = 0
        while b < n_docs and rows + int(aligned[b]) <= C:
            rows += int(aligned[b])
            b += 1
        row0 = int(offsets[a])
        ship = int(min(C, padded_total - row0))
        t0 = _time.time()

        # host: concat chunk docs (warm scratch, ~4 GB/s)
        pos = 0
        for m in mats[a:b]:
            n = m.shape[0]
            if n:
                np.copyto(src_s[pos: pos + n],
                          np.asarray(m, dtype=np.float32))
            pos += n
        # clear gap/tail rows, then normalize+scatter (native, warm)
        flat_s[:ship] = 0.0
        _, offs_local = native.pack_aligned(
            src_s[:pos], lengths[a:b], align=align, tail_pad_rows=0,
            normalize=True, out=flat_s)
        t_pack = _time.time()

        buf = _POOL.get((ship, dim), wire_dt)
        t_pool = _time.time()
        if int8:
            buf[:ship] = 0
            codes, scales = native.quantize_per_doc(
                flat_s[:rows], offs_local, lengths[a:b], out=buf[:rows])
            all_scales.append(scales)
            if refined:
                dsr = doc_scale_rows(offs_local, lengths[a:b], scales, rows)
                res_buf = _POOL.get((ship, dim // 2), np.uint8)
                rs_buf = _POOL.get((ship,), np.float32)
                res_buf[rows:ship] = 0
                rs_buf[rows:ship] = 0.0
                _residual_chunk(flat_s[:rows], codes, dsr, res_buf, rs_buf,
                                dim, rows)
                cres = jnp.asarray(res_buf)
                crs = jnp.asarray(rs_buf)
                dev_res = upd2(dev_res, cres, np.int32(row0))
                dev_rs = _updater(1)(dev_rs, crs, np.int32(row0))
                _POOL.guard(res_buf, cres)
                _POOL.guard(rs_buf, crs)
        else:
            if ship > rows:
                buf[rows:ship] = 0
            _convert_chunk(flat_s[:rows], storage_dtype, buf, rows)
        t_conv = _time.time()
        cdev = jnp.asarray(buf)
        t_ship = _time.time()
        dev = upd2(dev, cdev, np.int32(row0))
        t_upd = _time.time()
        _POOL.guard(buf, cdev)
        if debug:
            print(f"# chunk @{row0} rows={rows} pack={t_pack-t0:.2f} "
                  f"pool={t_pool-t_pack:.2f} conv={t_conv-t_pool:.2f} "
                  f"ship={t_ship-t_conv:.2f} upd={t_upd-t_ship:.2f}",
                  flush=True)
        a = b

    scales_np = (np.concatenate(all_scales) if all_scales else
                 np.ones((n_docs,), np.float32)) if int8 else None
    return RaggedMultiVectors(
        flat=dev,
        offsets=jnp.asarray(offsets.astype(np.int32)),
        lengths=jnp.asarray(lengths),
        max_len=max_len,
        scales=None if scales_np is None else jnp.asarray(scales_np),
        res4=dev_res,
        res_scales=dev_rs,
    )


def build_padded_streaming(mats: List[np.ndarray], storage_dtype: str,
                           dim: int, max_rows: int):
    """Chunked PaddedMultiVectors.build — bit-identical to the legacy path."""
    import jax.numpy as jnp

    from visual_rag_tpu import native  # noqa: F401  (native convert below)
    from visual_rag_tpu.index.store import PaddedMultiVectors, _normalize_rows

    n_docs = len(mats)
    int8 = storage_dtype in ("int8", "int8_refined")
    wire_dt = _np_wire_dtype(storage_dtype)
    C = max(1, _chunk_rows(dim) // max(1, max_rows))  # docs per chunk

    dev = jnp.zeros((n_docs, max_rows, dim), dtype=wire_dt)
    upd3 = _updater(3)
    mask = np.zeros((n_docs, max_rows), dtype=bool)
    chunk_s = scratch_view("seal_pad", (C, max_rows, dim), np.float32)
    all_scales: List[np.ndarray] = []

    a = 0
    while a < n_docs:
        b = min(n_docs, a + C)
        d = b - a
        ship = d  # exact-doc chunks: shapes = {C, remainder}
        chunk_s[:d] = 0.0
        for i, m in enumerate(mats[a:b]):
            m = np.asarray(m, dtype=np.float32)
            t = min(m.shape[0], max_rows)
            if t:
                chunk_s[i, :t] = _normalize_rows(m[:t])
                mask[a + i, :t] = True
        buf = _POOL.get((ship, max_rows, dim), wire_dt)
        flat_view = chunk_s[:d].reshape(d * max_rows, dim)
        if int8:
            from visual_rag_tpu.index.store import quantize_rows_int8

            codes, scales = quantize_rows_int8(chunk_s[:d])
            np.copyto(buf[:d], codes)
            all_scales.append(np.asarray(scales, np.float32))
        else:
            _convert_chunk(flat_view, storage_dtype,
                           buf.reshape(ship * max_rows, dim), d * max_rows)
        cdev = jnp.asarray(buf)
        dev = upd3(dev, cdev, np.int32(a))
        _POOL.guard(buf, cdev)
        a = b

    scales_np: Optional[np.ndarray] = None
    if int8:
        scales_np = (np.concatenate(all_scales, axis=0) if all_scales else
                     np.ones((n_docs, max_rows), np.float32))
    return PaddedMultiVectors(
        values=dev,
        mask=jnp.asarray(mask),
        scales=None if scales_np is None else jnp.asarray(scales_np),
    )
