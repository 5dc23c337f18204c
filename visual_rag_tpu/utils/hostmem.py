"""Hugepage-backed host allocations for large one-shot buffers.

This VM's anonymous memory is demand-faulted at ~26 us per 4 KB page
(measured round 5: touching a fresh 2 GB numpy buffer runs at ~143 MB/s
while warm->warm copies run at 4 GB/s), so every large fresh allocation on
the seal path costs ~13 s/GB before a single byte of useful work.
``MADV_HUGEPAGE`` faults 2 MB at a time and was measured 9x cheaper
(~1.3 GB/s first touch). THP is configured 'madvise' here, so plain numpy
allocations never get it — this module mmaps anonymous memory, advises it,
and wraps it as a numpy array.

Buffers that are REUSED (the streaming-seal scratches) additionally pay the
fault cost only once per process; see :func:`get_scratch`.
"""

from __future__ import annotations

import ctypes
import mmap
from typing import Dict, Tuple

import numpy as np

MADV_HUGEPAGE = 14

_libc = None


def _madvise(addr: int, size: int) -> None:
    global _libc
    try:
        if _libc is None:
            _libc = ctypes.CDLL("libc.so.6", use_errno=True)
        _libc.madvise(ctypes.c_void_p(addr), ctypes.c_size_t(size),
                      ctypes.c_int(MADV_HUGEPAGE))
    except Exception:
        pass  # advisory only — plain pages still work, just slower


def huge_empty(shape, dtype) -> np.ndarray:
    """np.empty equivalent backed by MADV_HUGEPAGE anonymous mmap.

    Contents are zero on first use (fresh anonymous pages); the array keeps
    the mmap alive via its base object.
    """
    dtype = np.dtype(dtype)
    nbytes = int(np.prod(shape)) * dtype.itemsize
    if nbytes == 0:
        return np.empty(shape, dtype)
    buf = mmap.mmap(-1, nbytes)
    addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
    _madvise(addr, nbytes)
    arr = np.frombuffer(buf, dtype=dtype, count=int(np.prod(shape)))
    return arr.reshape(shape)


_scratches: Dict[Tuple[str, int], np.ndarray] = {}


def get_scratch(tag: str, nbytes: int, dtype=np.uint8) -> np.ndarray:
    """A process-lifetime reusable flat scratch of >= nbytes, keyed by tag.

    Grows monotonically per tag (re-mmap on a larger request). View it with
    ``.view(dtype)[:n].reshape(...)`` at the call site. NOT thread-safe —
    seal runs on one thread (builder contract, same as utils/hostbuf).
    """
    dtype = np.dtype(dtype)
    cur = _scratches.get(tag)
    if cur is None or cur.nbytes < nbytes:
        cur = huge_empty((max(nbytes, 1),), np.uint8)
        _scratches[tag] = cur
    return cur


def scratch_view(tag: str, shape, dtype) -> np.ndarray:
    """get_scratch + shaped view in one call."""
    dtype = np.dtype(dtype)
    n = int(np.prod(shape))
    raw = get_scratch(tag, n * dtype.itemsize)
    return raw[: n * dtype.itemsize].view(dtype).reshape(shape)
