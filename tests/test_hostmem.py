"""utils/hostmem (hugepage allocator + scratches) and the hostbuf pool's
eviction/refill behavior (round-5 drift fix)."""

import numpy as np

from visual_rag_tpu.utils import hostmem
from visual_rag_tpu.utils.hostbuf import HostBufferPool


def test_huge_empty_zeroed_and_writable():
    a = hostmem.huge_empty((257, 128), np.float32)
    assert a.shape == (257, 128) and a.dtype == np.float32
    assert not a.any()  # anonymous mmap pages start zeroed
    a[13, :] = 3.5
    assert float(a[13, 0]) == 3.5
    b = hostmem.huge_empty((0, 128), np.float32)
    assert b.shape == (0, 128)


def test_huge_empty_dtypes():
    import ml_dtypes

    for dt in (np.int8, np.uint8, np.float16, ml_dtypes.bfloat16):
        a = hostmem.huge_empty((64, 64), dt)
        assert a.dtype == np.dtype(dt)
        assert not np.asarray(a.view(np.uint8)).any()


def test_scratch_reuse_and_growth():
    a = hostmem.scratch_view("test_tag_x", (100, 8), np.float32)
    a.fill(7.0)
    b = hostmem.scratch_view("test_tag_x", (50, 8), np.float32)
    # same backing memory: smaller view sees the earlier writes
    assert float(b[0, 0]) == 7.0
    c = hostmem.scratch_view("test_tag_x", (1000, 8), np.float32)
    assert c.shape == (1000, 8)  # grew; contents unspecified


def test_pool_eviction_counts_and_refill_zeroed():
    pool = HostBufferPool(depth=2, max_bytes=1 << 20)  # 1 MB cap
    a = pool.get((1024, 64), np.float32)  # 256 KB x2 slots = 512 KB
    a.fill(1.0)
    assert pool.evictions == 0
    pool.get((2048, 64), np.float32)  # +1 MB -> evicts the first key
    assert pool.evictions == 1
    # the evicted key refills with ZEROED buffers (contract: first use of a
    # slot sees zeros, like np.zeros)
    b = pool.get((1024, 64), np.float32)
    assert not b.any()


def test_pool_rotation_unchanged():
    pool = HostBufferPool(depth=3)
    bufs = {id(pool.get((8, 8), np.float32)) for _ in range(3)}
    assert len(bufs) == 3  # three distinct slots
    assert id(pool.get((8, 8), np.float32)) in bufs  # then wraps around
