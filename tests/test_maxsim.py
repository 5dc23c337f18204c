"""MaxSim scoring contracts (reference: tests/test_pooling.py:160-198 plus
masked/padded batch forms used by the device engine)."""

import numpy as np

from visual_rag_tpu.ops import (
    compute_maxsim_batch,
    compute_maxsim_score,
    l2_normalize,
    maxsim_scores_padded,
)
from visual_rag_tpu.ops.maxsim import maxsim_matrix_padded, pad_ragged


def _np_maxsim(q, d, normalize=True):
    if normalize:
        q = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-8)
        d = d / (np.linalg.norm(d, axis=1, keepdims=True) + 1e-8)
    return float(np.dot(q, d.T).max(axis=1).sum())


class TestMaxSimScore:
    def test_identical_high(self, rng):
        emb = rng.standard_normal((10, 128)).astype(np.float32)
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        assert compute_maxsim_score(emb, emb) >= 9.0

    def test_orthogonal_low(self):
        q = np.array([[1, 0, 0, 0], [0, 1, 0, 0]], dtype=np.float32)
        d = np.array([[0, 0, 1, 0], [0, 0, 0, 1]], dtype=np.float32)
        assert compute_maxsim_score(q, d) < 0.1

    def test_shape_independence(self, rng):
        q = rng.standard_normal((5, 128)).astype(np.float32)
        d = rng.standard_normal((100, 128)).astype(np.float32)
        score = compute_maxsim_score(q, d)
        assert isinstance(score, float) and not np.isnan(score)

    def test_matches_numpy(self, rng):
        q = rng.standard_normal((7, 64)).astype(np.float32)
        d = rng.standard_normal((33, 64)).astype(np.float32)
        np.testing.assert_allclose(
            compute_maxsim_score(q, d), _np_maxsim(q, d), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            compute_maxsim_score(q, d, normalize=False),
            _np_maxsim(q, d, normalize=False), rtol=1e-4, atol=1e-4)

    def test_batch_matches_single(self, rng):
        q = rng.standard_normal((5, 32)).astype(np.float32)
        docs = [rng.standard_normal((n, 32)).astype(np.float32) for n in (3, 17, 40)]
        batch = compute_maxsim_batch(q, docs)
        singles = [compute_maxsim_score(q, d) for d in docs]
        np.testing.assert_allclose(batch, singles, rtol=1e-5, atol=1e-5)


class TestPaddedMaxSim:
    def test_padded_matches_ragged(self, rng):
        q = rng.standard_normal((6, 32)).astype(np.float32)
        docs = [rng.standard_normal((n, 32)).astype(np.float32) for n in (4, 11, 25, 1)]
        qn = np.asarray(l2_normalize(q))
        docs_n = [np.asarray(l2_normalize(d)) for d in docs]
        padded, mask = pad_ragged(docs_n)
        got = np.asarray(maxsim_scores_padded(qn, padded, mask))
        expected = [_np_maxsim(q, d) for d in docs]
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)

    def test_empty_doc_scores_zero(self, rng):
        q = rng.standard_normal((3, 16)).astype(np.float32)
        padded = np.zeros((2, 5, 16), dtype=np.float32)
        mask = np.zeros((2, 5), dtype=bool)
        padded[0, :2] = rng.standard_normal((2, 16))
        mask[0, :2] = True
        got = np.asarray(maxsim_scores_padded(q, padded, mask))
        assert got[1] == 0.0
        assert np.isfinite(got).all()

    def test_query_mask_drops_tokens(self, rng):
        q = rng.standard_normal((4, 16)).astype(np.float32)
        d = [rng.standard_normal((6, 16)).astype(np.float32)]
        padded, mask = pad_ragged(d)
        qmask = np.array([True, True, False, False])
        got = np.asarray(maxsim_scores_padded(q, padded, mask, qmask))
        expected = _np_maxsim(q[:2], d[0], normalize=False)
        np.testing.assert_allclose(got[0], expected, rtol=1e-4, atol=1e-4)

    def test_matrix_form(self, rng):
        queries = [rng.standard_normal((n, 16)).astype(np.float32) for n in (3, 5)]
        docs = [rng.standard_normal((n, 16)).astype(np.float32) for n in (7, 2, 9)]
        qpad, qmask = pad_ragged(queries)
        dpad, dmask = pad_ragged(docs)
        got = np.asarray(maxsim_matrix_padded(qpad, qmask, dpad, dmask))
        assert got.shape == (2, 3)
        for i, q in enumerate(queries):
            for j, d in enumerate(docs):
                np.testing.assert_allclose(
                    got[i, j], _np_maxsim(q, d, normalize=False), rtol=1e-4, atol=1e-4)
