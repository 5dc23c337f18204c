"""ctypes bindings to the C++ host runtime (native/vrag_store.cpp).

Every entry point has a pure-numpy fallback so the package works without the
compiled library; when ``libvrag_store.so`` is present (``make -C native``,
auto-attempted once), the hot host paths run native + OpenMP:

- :func:`pack_aligned`   — seal-path normalize+scatter into the aligned flat
                           token layout
- :func:`quantize_int8`  — per-row int8 quantization with scales
- :class:`VragWriter` / :func:`read_store` — VRAG1 single-file collection
                           format (raw sections + crc32, zero-copy mmap reads)
- :func:`filter_eq` / :func:`filter_in` — columnar payload predicate kernels
"""

from __future__ import annotations

import ctypes
import logging
import mmap
import subprocess
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libvrag_store.so"

_DTYPE_CODES = {
    np.dtype(np.float32): 0,
    np.dtype(np.float16): 1,
    np.dtype(np.uint16): 2,  # bf16 stored as raw u16
    np.dtype(np.int8): 3,
    np.dtype(np.int32): 4,
    np.dtype(np.int64): 5,
    np.dtype(np.uint8): 6,
}
_CODE_DTYPES = {v: k for k, v in _DTYPE_CODES.items()}

_lib = None
_tried = False


def _load_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:  # one-shot auto build; failure leaves the numpy fallback active
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception as exc:
            logger.info("native build unavailable (%s); using numpy fallbacks", exc)
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as exc:
        logger.info("could not load %s (%s); using numpy fallbacks", _LIB_PATH, exc)
        return None
    lib.vrs_pack_aligned.restype = ctypes.c_int64
    lib.vrs_pack_aligned.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_int32]
    lib.vrs_quantize_int8.restype = None
    lib.vrs_quantize_int8.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p,
        ctypes.c_void_p]
    lib.vrs_f32_to_bf16.restype = None
    lib.vrs_f32_to_bf16.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_int64]
    lib.vrs_quantize_per_doc.restype = None
    lib.vrs_quantize_per_doc.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p]
    lib.vrs_writer_open.restype = ctypes.c_void_p
    lib.vrs_writer_open.argtypes = [ctypes.c_char_p]
    lib.vrs_writer_add.restype = ctypes.c_int
    lib.vrs_writer_add.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint8, ctypes.c_uint8,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.vrs_writer_close.restype = ctypes.c_int
    lib.vrs_writer_close.argtypes = [ctypes.c_void_p]
    lib.vrs_read_toc.restype = ctypes.c_int
    lib.vrs_read_toc.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32] + \
        [ctypes.c_void_p] * 8
    lib.vrs_filter_eq_i32.restype = None
    lib.vrs_filter_eq_i32.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p]
    lib.vrs_filter_in_i32.restype = None
    lib.vrs_filter_in_i32.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_void_p]
    lib.vrs_crc32.restype = ctypes.c_uint32
    lib.vrs_crc32.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    _lib = lib
    logger.info("native vrag_store loaded (%d OpenMP threads)",
                lib.vrs_openmp_threads())
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


# ---------------------------------------------------------------------------
# Seal-path packing
# ---------------------------------------------------------------------------


def pack_aligned(
    src: np.ndarray,  # [total_rows, dim] f32, docs concatenated
    lengths: np.ndarray,  # [n_docs] int32
    align: int = 32,
    tail_pad_rows: int = 0,
    normalize: bool = True,
    out: np.ndarray = None,  # pre-ZEROED [>= aligned_total + tail_pad, dim]
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (flat [aligned_total + tail_pad, dim] f32, offsets [n_docs] int64).

    ``out``, when given, must be a contiguous pre-zeroed f32 buffer (the
    scatter only writes real rows; alignment-gap rows keep whatever the
    buffer holds) — the streaming seal reuses warm scratches this way.
    """
    src = np.ascontiguousarray(src, dtype=np.float32)
    lengths = np.ascontiguousarray(lengths, dtype=np.int32)
    n_docs, dim = len(lengths), (src.shape[1] if src.ndim == 2 else 1)
    aligned = ((lengths.astype(np.int64) + align - 1) // align) * align
    total = int(aligned.sum())
    if out is not None:
        flat = out
        if (not flat.flags["C_CONTIGUOUS"] or flat.dtype != np.float32
                or flat.shape[0] < total + tail_pad_rows):
            raise ValueError("pack_aligned out= must be contiguous f32 with "
                             "enough rows")
    else:
        flat = np.zeros((max(total, 1) + tail_pad_rows, dim), dtype=np.float32)
    offsets = np.zeros((n_docs,), dtype=np.int64)
    lib = _load_lib()
    if lib is not None and n_docs:
        used = lib.vrs_pack_aligned(
            src.ctypes.data, lengths.ctypes.data, n_docs, dim, align,
            flat.ctypes.data, flat.shape[0], offsets.ctypes.data,
            1 if normalize else 0)
        if used >= 0:
            return flat, offsets
        logger.warning("vrs_pack_aligned failed; falling back to numpy")
    # numpy fallback
    if n_docs:
        offsets[1:] = np.cumsum(aligned)[:-1]
        pos = 0
        for i, ln in enumerate(lengths):
            block = src[pos : pos + ln]
            if normalize and ln:
                norms = np.linalg.norm(block, axis=1, keepdims=True)
                block = block / np.maximum(norms, 1e-12)
            flat[offsets[i] : offsets[i] + ln] = block
            pos += ln
    return flat, offsets


def f32_to_bf16(x: np.ndarray, out: np.ndarray = None) -> np.ndarray:
    """fp32 -> bf16 numpy array (native RNE loop; ml_dtypes astype fallback).

    ``out``, when given, is a contiguous uint16 (or bfloat16-viewable)
    buffer of matching size; the result is a bfloat16 view of it.
    """
    import ml_dtypes

    x = np.ascontiguousarray(x, dtype=np.float32)
    lib = _load_lib()
    if lib is None or x.size == 0:
        res = x.astype(ml_dtypes.bfloat16)
        if out is not None:
            o = out.view(np.uint16).reshape(x.shape)
            o[...] = res.view(np.uint16)
            return o.view(ml_dtypes.bfloat16)
        return res
    if out is not None:
        o = out.view(np.uint16).reshape(x.shape)
        if not o.flags["C_CONTIGUOUS"]:
            raise ValueError("f32_to_bf16 out= must be contiguous")
    else:
        o = np.empty(x.shape, dtype=np.uint16)
    lib.vrs_f32_to_bf16(x.ctypes.data, o.ctypes.data, x.size)
    return o.view(ml_dtypes.bfloat16)


def quantize_int8(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row symmetric int8 quantization -> (codes, scales)."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    rows = int(np.prod(x.shape[:-1]))
    dim = x.shape[-1]
    q = np.empty(x.shape, dtype=np.int8)
    scales = np.empty(x.shape[:-1], dtype=np.float32)
    lib = _load_lib()
    if lib is not None and rows:
        lib.vrs_quantize_int8(x.ctypes.data, rows, dim, q.ctypes.data,
                              np.ascontiguousarray(scales).ctypes.data)
        # scales written into a contiguous view; reshape back
        return q, scales
    absmax = np.abs(x).max(axis=-1)
    scales[...] = np.where(absmax > 0, absmax / 127.0, 1.0)
    q[...] = np.clip(np.rint(x / scales[..., None]), -127, 127).astype(np.int8)
    return q, scales


def quantize_per_doc(flat: np.ndarray, offsets: np.ndarray,
                     lengths: np.ndarray,
                     out: np.ndarray = None) -> Tuple[np.ndarray, np.ndarray]:
    """Per-DOC int8 quantization over the aligned ragged layout.

    -> (codes [N, dim] int8, scales [n_docs] f32); alignment-gap rows quantize
    to 0 under any scale so they stay zeros. ``out``, when given, must be a
    pre-ZEROED contiguous int8 buffer of flat's shape (only real rows are
    written).
    """
    flat = np.ascontiguousarray(flat, dtype=np.float32)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    lengths = np.ascontiguousarray(lengths, dtype=np.int32)
    n_docs, dim = len(lengths), flat.shape[1]
    if out is not None:
        q = out
        if (q.dtype != np.int8 or not q.flags["C_CONTIGUOUS"]
                or q.shape != flat.shape):
            raise ValueError("quantize_per_doc out= must be contiguous int8 "
                             "of flat's shape")
    else:
        q = np.zeros(flat.shape, dtype=np.int8)
    scales = np.ones((n_docs,), dtype=np.float32)
    lib = _load_lib()
    if lib is not None and n_docs:
        lib.vrs_quantize_per_doc(
            flat.ctypes.data, offsets.ctypes.data, lengths.ctypes.data,
            n_docs, dim, q.ctypes.data, scales.ctypes.data)
        return q, scales
    # vectorized numpy fallback: scatter per-doc scales to rows, one-pass rint
    if n_docs:
        row_abs = np.abs(flat).max(axis=1)
        row_scale = np.ones((flat.shape[0],), dtype=np.float32)
        for i in range(n_docs):
            o, ln = int(offsets[i]), int(lengths[i])
            m = float(row_abs[o : o + ln].max()) if ln else 0.0
            scales[i] = m / 127.0 if m > 0 else 1.0
            row_scale[o : o + ln] = scales[i]
        q[...] = np.clip(np.rint(flat / row_scale[:, None]), -127, 127).astype(np.int8)
    return q, scales


# ---------------------------------------------------------------------------
# VRAG1 store format
# ---------------------------------------------------------------------------


class VragWriter:
    """Write a VRAG1 single-file collection (native or pure-python)."""

    def __init__(self, path):
        self.path = str(path)
        self._lib = _load_lib()
        if self._lib is not None:
            self._h = self._lib.vrs_writer_open(self.path.encode())
            if not self._h:
                raise OSError(f"cannot open {path} for writing")
            self._f = None
        else:
            self._h = None
            self._f = open(self.path, "wb")
            self._f.write(b"VRAG1\0\0\0")
            self._count_pos = self._f.tell()
            self._f.write(b"\0" * 8)
            self._n = 0

    def add(self, name: str, array: np.ndarray) -> None:
        arr = np.ascontiguousarray(array)
        if arr.dtype.name == "bfloat16":  # ml_dtypes bf16 -> raw u16 (code 2)
            arr = arr.view(np.uint16)
        if arr.dtype not in _DTYPE_CODES:
            raise TypeError(f"unsupported dtype {arr.dtype} for section {name!r}")
        code = _DTYPE_CODES[arr.dtype]
        shape = np.asarray(arr.shape, dtype=np.int64)
        if self._h is not None:
            rc = self._lib.vrs_writer_add(
                self._h, name.encode(), code, arr.ndim,
                shape.ctypes.data, arr.ctypes.data, arr.nbytes)
            if rc != 0:
                raise OSError(f"vrs_writer_add failed ({rc}) for {name!r}")
            return
        # python fallback mirrors the binary layout exactly
        import struct

        f = self._f
        nb = name.encode()
        f.write(struct.pack("<H", len(nb)))
        f.write(nb)
        f.write(struct.pack("<BB", code, arr.ndim))
        f.write(shape.tobytes())
        f.write(struct.pack("<q", arr.nbytes))
        f.write(struct.pack("<I", _crc32(arr.tobytes())))
        _pad8(f)
        f.write(arr.tobytes())
        _pad8(f)
        self._n += 1

    def close(self) -> None:
        if self._h is not None:
            rc = self._lib.vrs_writer_close(self._h)
            self._h = None
            if rc != 0:
                raise OSError("vrs_writer_close failed")
        elif self._f is not None:
            import struct

            self._f.seek(self._count_pos)
            self._f.write(struct.pack("<I", self._n))
            self._f.close()
            self._f = None


def _crc32(data: bytes) -> int:
    import zlib

    return zlib.crc32(data) & 0xFFFFFFFF


def _pad8(f) -> None:
    rem = f.tell() % 8
    if rem:
        f.write(b"\0" * (8 - rem))


def read_store(path, verify: bool = False) -> Dict[str, np.ndarray]:
    """Read a VRAG1 file -> {section: array} (zero-copy views over mmap)."""
    path = Path(path)
    if path.stat().st_size < 16:
        raise ValueError(f"{path} is empty or truncated (not a VRAG1 store)")
    with open(path, "rb") as f:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    buf = np.frombuffer(mm, dtype=np.uint8)
    if bytes(buf[:5]) != b"VRAG1":
        raise ValueError(f"{path} is not a VRAG1 store")
    n = int(np.frombuffer(buf[8:12].tobytes(), dtype=np.uint32)[0])
    # Minimum section size is ~26 header bytes; a crafted count larger than
    # the file could hold would otherwise drive huge TOC allocations below.
    if n > max(0, (buf.shape[0] - 16)) // 26 + 1:
        raise ValueError(f"{path} is corrupt (impossible section count {n})")
    out: Dict[str, np.ndarray] = {}
    lib = _load_lib()
    if lib is not None:
        # Native TOC parse: hardened per-field bounds checks (rejects
        # ndim>8 / truncated headers / overflowing section lengths).
        name_offs = np.empty(n, np.int64)
        name_lens = np.empty(n, np.int32)
        dtypes = np.empty(n, np.uint8)
        ndims = np.empty(n, np.uint8)
        shapes = np.empty(n * 8, np.int64)
        data_offs = np.empty(n, np.int64)
        data_lens = np.empty(n, np.int64)
        crcs = np.empty(n, np.uint32)
        rc = lib.vrs_read_toc(
            buf.ctypes.data, buf.shape[0], n,
            name_offs.ctypes.data, name_lens.ctypes.data, dtypes.ctypes.data,
            ndims.ctypes.data, shapes.ctypes.data, data_offs.ctypes.data,
            data_lens.ctypes.data, crcs.ctypes.data)
        if rc < 0:
            raise ValueError(f"{path} is corrupt (vrs_read_toc rc={rc})")
        for i in range(rc):
            o, nl = int(name_offs[i]), int(name_lens[i])
            name = bytes(buf[o : o + nl]).decode()
            shape = tuple(int(s) for s in shapes[i * 8 : i * 8 + int(ndims[i])])
            do, dl = int(data_offs[i]), int(data_lens[i])
            data = buf[do : do + dl]
            if verify and lib.vrs_crc32(data.ctypes.data, dl) != int(crcs[i]):
                raise ValueError(f"crc mismatch in section {name!r} of {path}")
            code = int(dtypes[i])
            if code not in _CODE_DTYPES:
                raise ValueError(f"{path}: unknown dtype code {code} in {name!r}")
            out[name] = data.view(_CODE_DTYPES[code]).reshape(shape)
        return out
    p = 16
    total = buf.shape[0]
    for _ in range(n):
        if p + 2 > total:
            raise ValueError(f"{path} is corrupt (truncated header)")
        nl = int(np.frombuffer(buf[p : p + 2].tobytes(), np.uint16)[0]); p += 2
        if p + nl + 2 > total:
            raise ValueError(f"{path} is corrupt (truncated header)")
        name = bytes(buf[p : p + nl]).decode(); p += nl
        code = int(buf[p]); ndim = int(buf[p + 1]); p += 2
        if ndim > 8 or p + 8 * ndim + 12 > total:
            raise ValueError(f"{path} is corrupt (bad section header)")
        shape = tuple(np.frombuffer(buf[p : p + 8 * ndim].tobytes(), np.int64)); p += 8 * ndim
        nbytes = int(np.frombuffer(buf[p : p + 8].tobytes(), np.int64)[0]); p += 8
        crc = int(np.frombuffer(buf[p : p + 4].tobytes(), np.uint32)[0]); p += 4
        p = (p + 7) & ~7
        if nbytes < 0 or nbytes > total - p:
            raise ValueError(f"{path} is corrupt (section overruns file)")
        data = buf[p : p + nbytes]
        if verify and _crc32(data.tobytes()) != crc:
            raise ValueError(f"crc mismatch in section {name!r} of {path}")
        if code not in _CODE_DTYPES:
            raise ValueError(f"{path}: unknown dtype code {code} in {name!r}")
        out[name] = data.view(_CODE_DTYPES[code]).reshape(shape)
        p += nbytes
        p = (p + 7) & ~7
    return out


# ---------------------------------------------------------------------------
# Columnar filters
# ---------------------------------------------------------------------------


def filter_eq(col: np.ndarray, value: int, mask: Optional[np.ndarray] = None) -> np.ndarray:
    col = np.ascontiguousarray(col, dtype=np.int32)
    if mask is None:
        mask = np.ones((col.shape[0],), dtype=np.uint8)
    else:
        mask = np.ascontiguousarray(mask, dtype=np.uint8)
    lib = _load_lib()
    if lib is not None:
        lib.vrs_filter_eq_i32(col.ctypes.data, col.shape[0], int(value),
                              mask.ctypes.data)
        return mask
    mask &= (col == value).astype(np.uint8)
    return mask


def filter_in(col: np.ndarray, values, mask: Optional[np.ndarray] = None) -> np.ndarray:
    col = np.ascontiguousarray(col, dtype=np.int32)
    vals = np.ascontiguousarray(np.asarray(list(values), dtype=np.int32))
    if mask is None:
        mask = np.ones((col.shape[0],), dtype=np.uint8)
    else:
        mask = np.ascontiguousarray(mask, dtype=np.uint8)
    lib = _load_lib()
    if lib is not None:
        lib.vrs_filter_in_i32(col.ctypes.data, col.shape[0], vals.ctypes.data,
                              len(vals), mask.ctypes.data)
        return mask
    mask &= np.isin(col, vals).astype(np.uint8)
    return mask
