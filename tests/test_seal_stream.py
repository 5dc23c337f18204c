"""Streaming seal (index/stream.py) must be BIT-IDENTICAL to the legacy
one-shot build for every storage dtype, chunk boundaries included.

The streaming path exists for speed only (round-5 seal profile: fresh-page
faults + one huge unpipelined transfer made a 60k-doc seal cost 303 s); any
numeric divergence from the legacy build would silently change stored
indexes depending on corpus size, so equality is pinned here with forced
streaming and a tiny chunk size (many chunks on a small corpus).
"""

import numpy as np
import pytest

from visual_rag_tpu.index import CollectionSchema, IndexBuilder
from visual_rag_tpu.index.store import (
    PaddedMultiVectors,
    RaggedMultiVectors,
)

DTYPES = ["float32", "bfloat16", "float16", "int8", "int8_refined"]


def _mats(rng, n_docs=70, lo=3, hi=120, dim=128):
    return [
        rng.standard_normal((int(rng.integers(lo, hi)), dim)).astype(np.float32)
        for _ in range(n_docs)
    ]


def _b(x):
    """Raw bytes of a (possibly device) array for exact comparison."""
    a = np.asarray(x)
    return a.view(np.uint8) if a.dtype.kind not in "ui" else a


@pytest.fixture
def force_stream(monkeypatch):
    monkeypatch.setenv("VISUALRAG_SEAL_STREAM", "always")
    monkeypatch.setenv("VISUALRAG_SEAL_CHUNK_MB", "1")  # 2048 rows -> chunks


@pytest.mark.parametrize("dtype", DTYPES)
def test_ragged_stream_bit_identical(force_stream, monkeypatch, dtype):
    rng = np.random.default_rng(11)
    mats = _mats(rng)

    monkeypatch.setenv("VISUALRAG_SEAL_STREAM", "never")
    legacy = RaggedMultiVectors.build(mats, storage_dtype=dtype)
    monkeypatch.setenv("VISUALRAG_SEAL_STREAM", "always")
    streamed = RaggedMultiVectors.build(mats, storage_dtype=dtype)

    assert streamed.max_len == legacy.max_len
    assert np.asarray(streamed.flat).shape == np.asarray(legacy.flat).shape
    np.testing.assert_array_equal(_b(streamed.flat), _b(legacy.flat))
    np.testing.assert_array_equal(np.asarray(streamed.offsets),
                                  np.asarray(legacy.offsets))
    np.testing.assert_array_equal(np.asarray(streamed.lengths),
                                  np.asarray(legacy.lengths))
    for field in ("scales", "res4", "res_scales"):
        a, b = getattr(streamed, field), getattr(legacy, field)
        assert (a is None) == (b is None)
        if a is not None:
            np.testing.assert_array_equal(_b(a), _b(b))


@pytest.mark.parametrize("dtype", ["bfloat16", "int8", "float32"])
def test_padded_stream_bit_identical(force_stream, monkeypatch, dtype):
    rng = np.random.default_rng(12)
    mats = [rng.standard_normal((int(rng.integers(1, 13)), 128)).astype(np.float32)
            for _ in range(150)]

    monkeypatch.setenv("VISUALRAG_SEAL_STREAM", "never")
    legacy = PaddedMultiVectors.build(mats, storage_dtype=dtype)
    monkeypatch.setenv("VISUALRAG_SEAL_STREAM", "always")
    streamed = PaddedMultiVectors.build(mats, storage_dtype=dtype)

    np.testing.assert_array_equal(_b(streamed.values), _b(legacy.values))
    np.testing.assert_array_equal(np.asarray(streamed.mask),
                                  np.asarray(legacy.mask))
    assert (streamed.scales is None) == (legacy.scales is None)
    if streamed.scales is not None:
        np.testing.assert_array_equal(np.asarray(streamed.scales),
                                      np.asarray(legacy.scales))


def test_seal_end_to_end_stream_matches_search(force_stream, monkeypatch):
    """Full IndexBuilder.seal + search parity between the two build paths."""
    from visual_rag_tpu.retrieval import RetrievalEngine

    rng = np.random.default_rng(13)
    docs = _mats(rng, n_docs=40, lo=8, hi=64)

    def build():
        b = IndexBuilder(CollectionSchema.standard(storage_dtype="bfloat16"))
        for i, t in enumerate(docs):
            mp = t[: max(1, len(t) // 4)]
            b.add(f"p{i}", {"initial": t, "mean_pooling": mp,
                            "experimental_pooling": mp,
                            "global_pooling": t.mean(axis=0)})
        return b.seal()

    monkeypatch.setenv("VISUALRAG_SEAL_STREAM", "never")
    idx_legacy = build()
    monkeypatch.setenv("VISUALRAG_SEAL_STREAM", "always")
    idx_stream = build()

    q = [rng.standard_normal((12, 128)).astype(np.float32) for _ in range(8)]
    r_legacy = RetrievalEngine(idx_legacy).search_embedded_batch(
        q, mode="two_stage", top_k=5, prefetch_k=20, with_payload=False)
    r_stream = RetrievalEngine(idx_stream).search_embedded_batch(
        q, mode="two_stage", top_k=5, prefetch_k=20, with_payload=False)
    def _score(h):
        return h.get("score_final", h.get("score"))

    for hl, hs in zip(r_legacy, r_stream):
        assert [h["id"] for h in hl] == [h["id"] for h in hs]
        np.testing.assert_allclose([_score(h) for h in hl],
                                   [_score(h) for h in hs], rtol=0, atol=0)


def test_stream_declines_oversized_doc(monkeypatch):
    """A doc larger than one chunk falls back to the legacy path (auto)."""
    from visual_rag_tpu.index import stream

    monkeypatch.setenv("VISUALRAG_SEAL_STREAM", "always")
    monkeypatch.setenv("VISUALRAG_SEAL_CHUNK_MB", "1")
    assert not stream.should_stream(10 << 30, max_aligned_len=4096, dim=128)
    assert stream.should_stream(10 << 30, max_aligned_len=2048, dim=128)
