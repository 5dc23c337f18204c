"""Pallas kernels (interpret mode on CPU) vs the XLA scoring oracle."""

import numpy as np
import pytest

from visual_rag_tpu.index import CollectionSchema, IndexBuilder
from visual_rag_tpu.ops.kernels import pooled_maxsim_scores, rerank_candidates
from visual_rag_tpu.retrieval.scoring import (
    rerank_ragged,
    score_padded_tokens,
)

DIM = 128


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(3)
    schema = CollectionSchema.standard(storage_dtype="float32", dim=DIM)
    builder = IndexBuilder(schema)
    for i in range(23):
        n = int(rng.integers(3, 40))
        builder.add(
            f"d{i}",
            {
                "initial": rng.standard_normal((n, DIM)).astype(np.float32),
                "mean_pooling": rng.standard_normal(
                    (int(rng.integers(2, 9)), DIM)).astype(np.float32),
                "experimental_pooling": rng.standard_normal((5, DIM)).astype(np.float32),
                "global_pooling": rng.standard_normal((DIM,)).astype(np.float32),
            },
        )
    return builder.seal()


def _norm(x):
    return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)


class TestPrefetchKernel:
    def test_matches_xla_scorer(self, small_index, rng):
        store = small_index.store("mean_pooling")
        queries = _norm(rng.standard_normal((3, 16, DIM)).astype(np.float32))
        qmask = np.ones((3, 16), dtype=bool)
        qmask[1, 10:] = False
        got = np.asarray(
            pooled_maxsim_scores(
                np.transpose(np.asarray(store.values), (1, 0, 2)),
                np.asarray(store.mask).T,
                queries, qmask, block_d=8, interpret=True))
        assert got.shape == (3, store.num_docs)
        for b in range(3):
            expected = np.asarray(
                score_padded_tokens(
                    store.values, store.mask,
                    queries[b][qmask[b]], compute_dtype="float32"))
            np.testing.assert_allclose(got[b], expected, rtol=1e-4, atol=1e-4)


class TestRerankKernel:
    def test_matches_xla_rerank(self, small_index, rng):
        store = small_index.store("initial")
        queries = _norm(rng.standard_normal((2, 8, DIM)).astype(np.float32))
        qmask = np.ones((2, 8), dtype=bool)
        qmask[0, 6:] = False
        candidates = np.array(
            [[0, 5, 7, 21, -1, 3, 2, 9, 11, 13],
             [1, 4, 6, 8, 10, 12, 14, 16, 18, -1]], dtype=np.int32)
        got = np.asarray(
            rerank_candidates(
                store.flat, store.offsets, store.lengths,
                queries, qmask, candidates, store.max_len, group=4, interpret=True))
        assert got.shape == (2, 10)
        for b in range(2):
            expected = np.asarray(
                rerank_ragged(
                    store.flat, store.offsets, store.lengths,
                    queries[b][qmask[b]], candidates[b], store.max_len,
                    compute_dtype="float32"))
            np.testing.assert_allclose(got[b], expected, rtol=1e-4, atol=1e-4)

    def test_all_invalid_row(self, small_index, rng):
        store = small_index.store("initial")
        queries = _norm(rng.standard_normal((1, 8, DIM)).astype(np.float32))
        qmask = np.ones((1, 8), dtype=bool)
        candidates = np.full((1, 4), -1, dtype=np.int32)
        got = np.asarray(
            rerank_candidates(
                store.flat, store.offsets, store.lengths,
                queries, qmask, candidates, store.max_len, group=4, interpret=True))
        assert (got < -1e29).all()
