"""Rotating preallocated host buffers for hot per-batch numpy staging.

Fresh numpy allocations page-fault at ~65 us/page on this host (measured in
the r4 wire profile: a 16 MB np.concatenate costs 267 ms cold vs 5 ms
copying into a warm buffer; an 88 MB per-batch patch buffer pays the same
tax on the ingest path), so the hot wire/ingest builders reuse warmed
buffers keyed by (shape, dtype).

jax.device_put's host->device copy is ASYNCHRONOUS — mutating the numpy
source right after it returns corrupts the device array (measured 13/20
times on the CPU backend; caught by
tests/test_packed_wire.py::test_pool_wrap_no_aliasing). Two defenses:
rotation depth 8 exceeds any practical pipeline depth, and ``guard()``
records the device array a buffer was shipped as so ``get()`` blocks on
that transfer before recycling the buffer (a no-op by the time a slot
comes around again in normal pipelining).

Backend reliability of the guard: CLAUDE.md documents that on the tunneled
axon backend ``block_until_ready`` can return before COMPUTE OUTPUTS exist
— but for device_put specifically, the host buffer is serialized into the
RPC eagerly: mutating the source immediately after device_put returns with
NO synchronization at all showed 0/20 corruptions on the real axon chip
(probe r4). So the barrier is load-bearing exactly where it is reliable
(the CPU backend's zero-copy aliasing, deterministically caught by the
test above), and the axon path does not depend on it.

Batch bucketing (engine batch sizes, processor patch-count buckets) keeps
the number of distinct shapes — and thus resident buffers — small.

Not thread-safe by design: all engine dispatches funnel through one thread
(the serving batcher is a single worker; the engine itself is documented
single-dispatcher), and ingest preprocessing runs on the caller's thread.
"""

from __future__ import annotations

import numpy as np


class HostBufferPool:
    """LRU-bounded: bucketing keeps the steady-state key set small, but a
    long-lived server seeing a tail of distinct query shapes (nq is only
    8-quantized on the padded wire) must not retain depth buffers per shape
    forever — total retained bytes are capped (VISUALRAG_HOSTBUF_MB,
    default 1024) and the least-recently-used keys are evicted. Eviction
    only drops the pool's references: a buffer still aliased by an
    in-flight device array stays alive until that array releases it."""

    def __init__(self, depth: int = 8, max_bytes: int | None = None):
        import os

        self.depth = depth
        # r5 drift attribution: with the old 1024 MB cap, a server
        # alternating two large batch buckets (e.g. 1024/2048) evicted one
        # bucket's keys while the other ran, and every sample re-paid the
        # fresh-page fault tax (pack_ms 94 -> 816 ms in the slow quartile,
        # self_cpu_frac 0.07 -> 0.54 — measured in BENCH drift samples).
        # The host has 125 GB; 3 GB of warm wire buffers is the right trade.
        self.max_bytes = (max_bytes if max_bytes is not None else
                          int(os.environ.get("VISUALRAG_HOSTBUF_MB",
                                             "3072")) << 20)
        self._slots: dict = {}  # insertion order == LRU order
        self._bytes = 0
        self._pending: dict = {}  # id(buf) -> device array it was shipped as
        self.evictions = 0  # observability: drift instrumentation reads this

    def get(self, shape, dtype, fill=None) -> np.ndarray:
        """A warm buffer of (shape, dtype); ``fill`` (if given) overwrites
        every element — callers that fill sparsely must zero pad regions
        themselves (stale data from eight batches ago otherwise leaks)."""
        key = (tuple(shape), np.dtype(dtype).str)
        slot = self._slots.pop(key, None)  # pop+reinsert: move to LRU tail
        if slot is None:
            # hugepage-backed (utils/hostmem): anonymous mmap pages start
            # zeroed like np.zeros, and MADV_HUGEPAGE makes the first-touch
            # fault 9x cheaper — an evicted key's refill cost drops with it
            from visual_rag_tpu.utils.hostmem import huge_empty

            slot = [[huge_empty(shape, dtype) for _ in range(self.depth)], 0]
            self._bytes += sum(b.nbytes for b in slot[0])
        self._slots[key] = slot
        while self._bytes > self.max_bytes and len(self._slots) > 1:
            old = next(iter(self._slots))  # LRU head (never the key just used)
            bufs, _ = self._slots.pop(old)
            self.evictions += 1
            for b in bufs:
                self._bytes -= b.nbytes
                self._pending.pop(id(b), None)
        bufs, i = slot
        slot[1] = (i + 1) % self.depth
        buf = bufs[i]
        pending = self._pending.pop(id(buf), None)
        if pending is not None:
            import jax

            jax.block_until_ready(pending)  # transfer must finish first
        if fill is not None:
            buf.fill(fill)
        return buf

    def guard(self, buf: np.ndarray, device_array) -> None:
        """Record that ``buf`` was device_put as ``device_array``: the next
        recycle of ``buf`` blocks until that transfer is complete."""
        self._pending[id(buf)] = device_array

    def clear(self):
        self._slots.clear()
        self._pending.clear()
        self._bytes = 0


HOST_POOL = HostBufferPool()
