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

    def test_int8_native_kernels_match_f32(self, rng):
        # int8 codes + scales through BOTH kernels vs the f32 store
        schema = CollectionSchema.standard(storage_dtype="int8", dim=DIM)
        b8 = IndexBuilder(schema)
        bf = IndexBuilder(CollectionSchema.standard(storage_dtype="float32", dim=DIM))
        for i in range(9):
            vecs = {
                "initial": rng.standard_normal((int(rng.integers(4, 30)), DIM)).astype(np.float32),
                "mean_pooling": rng.standard_normal((4, DIM)).astype(np.float32),
                "experimental_pooling": rng.standard_normal((5, DIM)).astype(np.float32),
                "global_pooling": rng.standard_normal((DIM,)).astype(np.float32),
            }
            b8.add(f"d{i}", vecs)
            bf.add(f"d{i}", vecs)
        i8, f32 = b8.seal(), bf.seal()
        queries = _norm(rng.standard_normal((2, 8, DIM)).astype(np.float32))
        qmask = np.ones((2, 8), dtype=bool)
        # prefetch kernel with per-row scales
        s8 = i8.store("mean_pooling")
        sf = f32.store("mean_pooling")
        got8 = np.asarray(pooled_maxsim_scores(
            np.transpose(np.asarray(s8.values), (1, 0, 2)),
            np.asarray(s8.mask).T, queries, qmask,
            np.asarray(s8.scales).T, block_d=8, interpret=True))
        ref = np.asarray(pooled_maxsim_scores(
            np.transpose(np.asarray(sf.values), (1, 0, 2)),
            np.asarray(sf.mask).T, queries, qmask, block_d=8, interpret=True))
        np.testing.assert_allclose(got8, ref, rtol=0.02, atol=0.02)
        # rerank kernel with per-doc scales
        r8, rf = i8.store("initial"), f32.store("initial")
        cand = np.array([[0, 3, 6, -1], [1, 4, 7, 8]], dtype=np.int32)
        got = np.asarray(rerank_candidates(
            r8.flat, r8.offsets, r8.lengths, queries, qmask, cand,
            r8.max_len, doc_scales=r8.scales, group=4, interpret=True))
        exp = np.asarray(rerank_candidates(
            rf.flat, rf.offsets, rf.lengths, queries, qmask, cand,
            rf.max_len, group=4, interpret=True))
        valid = cand >= 0
        np.testing.assert_allclose(got[valid], exp[valid], rtol=0.02, atol=0.05)

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


class TestUnalignedMaxLen:
    def test_rerank_window_rounding_preserves_scores(self):
        """ColQwen effective grids give arbitrary max_len (e.g. 126); the
        kernel rounds its DMA window to 32 — scores must be unchanged and
        reads stay in bounds (regression: Mosaic rejected 126-row slices)."""
        import jax.numpy as jnp
        import numpy as np

        from visual_rag_tpu import native
        from visual_rag_tpu.ops.kernels.maxsim_rerank import rerank_candidates

        rng = np.random.default_rng(0)
        lengths = np.array([126, 90, 117, 11, 126], np.int32)  # max_len 126
        mats = [rng.standard_normal((int(n), 32)).astype(np.float32)
                for n in lengths]
        flat, offsets = native.pack_aligned(
            np.concatenate(mats), lengths, align=32,
            tail_pad_rows=126, normalize=True)
        q = rng.standard_normal((2, 7, 32)).astype(np.float32)
        qn = q / (np.linalg.norm(q, axis=-1, keepdims=True) + 1e-8)
        qm = np.ones((2, 7), np.float32)
        cand = np.array([[0, 1, 4, -1], [2, 3, 0, 1]], np.int32)
        got = np.asarray(rerank_candidates(
            jnp.asarray(flat), jnp.asarray(offsets.astype(np.int32)),
            jnp.asarray(lengths), jnp.asarray(qn), jnp.asarray(qm),
            jnp.asarray(cand), 126, interpret=True))
        # numpy oracle
        for b in range(2):
            for j, c in enumerate(cand[b]):
                if c < 0:
                    continue
                d = flat[offsets[c]:offsets[c] + lengths[c]]
                want = (qn[b] @ d.T).max(axis=1).sum()
                assert got[b, j] == pytest.approx(want, rel=1e-4), (b, j)


class TestDedupRerankKernel:
    """Cross-query candidate dedup (VERDICT r2 #4): one DMA per unique doc;
    per-pair scores must stay identical to the plain kernel's semantics."""

    def test_matches_xla_rerank_with_heavy_sharing(self, small_index, rng):
        from visual_rag_tpu.ops.kernels.maxsim_rerank import (
            rerank_candidates_dedup,
        )

        store = small_index.store("initial")
        b, k = 5, 12
        queries = _norm(rng.standard_normal((b, 8, DIM)).astype(np.float32))
        qmask = np.ones((b, 8), dtype=bool)
        qmask[1, 5:] = False
        # skewed: every query draws from the same 6 docs + padding slots
        candidates = rng.integers(0, 6, (b, k)).astype(np.int32)
        candidates[0, -1] = -1
        candidates[3, 0] = -1
        got = np.asarray(rerank_candidates_dedup(
            store.flat, store.offsets, store.lengths,
            queries, qmask, candidates, store.max_len,
            group=4, n_slots=4, interpret=True))
        assert got.shape == (b, k)
        for i in range(b):
            expected = np.asarray(rerank_ragged(
                store.flat, store.offsets, store.lengths,
                queries[i][qmask[i]], candidates[i], store.max_len,
                compute_dtype="float32"))
            np.testing.assert_allclose(got[i], expected, rtol=1e-4, atol=1e-4)

    def test_matches_plain_kernel_uniform(self, small_index, rng):
        from visual_rag_tpu.ops.kernels.maxsim_rerank import (
            rerank_candidates,
            rerank_candidates_dedup,
        )

        store = small_index.store("initial")
        b, k = 3, 8
        queries = _norm(rng.standard_normal((b, 8, DIM)).astype(np.float32))
        qmask = np.ones((b, 8), dtype=bool)
        candidates = np.stack([
            rng.permutation(small_index.num_docs)[:k].astype(np.int32)
            for _ in range(b)])
        plain = np.asarray(rerank_candidates(
            store.flat, store.offsets, store.lengths,
            queries, qmask, candidates, store.max_len, group=4, interpret=True))
        dedup = np.asarray(rerank_candidates_dedup(
            store.flat, store.offsets, store.lengths,
            queries, qmask, candidates, store.max_len,
            group=4, interpret=True))
        np.testing.assert_allclose(dedup, plain, rtol=1e-4, atol=1e-4)


class TestSweepRerankKernel:
    """Range-sweep rerank (maxsim_sweep.py): one DMA per candidate-bearing
    row-range + P queries M-packed per matmul; scores must match the
    per-candidate kernel on every layout (multi-range, multi-block ranges,
    single-range small stores, int8 scales, unaligned NQ)."""

    def _plain(self, store, queries, qmask, candidates, **kw):
        from visual_rag_tpu.ops.kernels.maxsim_rerank import rerank_candidates
        return np.asarray(rerank_candidates(
            store.flat, store.offsets, store.lengths,
            queries, qmask, candidates, store.max_len,
            group=4, interpret=True, **kw))

    def _sweep(self, store, queries, qmask, candidates, r_step, **kw):
        from visual_rag_tpu.ops.kernels.maxsim_sweep import (
            rerank_candidates_sweep,
        )
        return np.asarray(rerank_candidates_sweep(
            store.flat, store.offsets, store.lengths,
            queries, qmask, candidates, store.max_len,
            r_step=r_step, interpret=True, **kw))

    @pytest.mark.parametrize("r_step", [64, 128, 4096])
    def test_matches_plain_kernel(self, small_index, rng, r_step):
        store = small_index.store("initial")
        b, k, nq = 5, 12, 16
        queries = _norm(rng.standard_normal((b, nq, DIM)).astype(np.float32))
        qmask = np.ones((b, nq), dtype=bool)
        qmask[1, 9:] = False
        candidates = rng.integers(0, small_index.num_docs, (b, k)).astype(np.int32)
        candidates[0, -1] = -1
        candidates[3, 0] = -1
        plain = self._plain(store, queries, qmask, candidates)
        sweep = self._sweep(store, queries, qmask, candidates, r_step)
        np.testing.assert_allclose(sweep, plain, rtol=1e-4, atol=1e-4)

    def test_multi_block_ranges_heavy_sharing(self, small_index, rng):
        # every query hits the same few docs -> ranges hold many pairs ->
        # several g_total-sized blocks share one window DMA (the bug class
        # where non-first blocks must still decode the range's buffer slot)
        store = small_index.store("initial")
        b, k, nq = 16, 10, 8
        queries = _norm(rng.standard_normal((b, nq, DIM)).astype(np.float32))
        qmask = np.ones((b, nq), dtype=bool)
        candidates = rng.integers(0, 5, (b, k)).astype(np.int32)
        plain = self._plain(store, queries, qmask, candidates)
        sweep = self._sweep(store, queries, qmask, candidates, 64, mgroups=1)
        np.testing.assert_allclose(sweep, plain, rtol=1e-4, atol=1e-4)

    def test_mostly_invalid_grid(self, small_index, rng):
        # sharded merges hand each shard a candidate grid where most entries
        # are -1 (owned by other shards): dead pairs must neither corrupt
        # scores nor consume slots
        store = small_index.store("initial")
        b, k, nq = 8, 16, 8
        queries = _norm(rng.standard_normal((b, nq, DIM)).astype(np.float32))
        qmask = np.ones((b, nq), dtype=bool)
        candidates = np.full((b, k), -1, np.int32)
        keep = rng.random((b, k)) < 0.15
        candidates[keep] = rng.integers(
            0, small_index.num_docs, int(keep.sum())).astype(np.int32)
        plain = self._plain(store, queries, qmask, candidates)
        sweep = self._sweep(store, queries, qmask, candidates, 64)
        np.testing.assert_allclose(sweep, plain, rtol=1e-4, atol=1e-4)

    def test_unaligned_nq_falls_back_to_p1(self, small_index, rng):
        store = small_index.store("initial")
        b, k, nq = 3, 7, 20  # nq % 8 != 0 -> no M-packing
        queries = _norm(rng.standard_normal((b, nq, DIM)).astype(np.float32))
        qmask = np.ones((b, nq), dtype=bool)
        candidates = rng.integers(0, small_index.num_docs, (b, k)).astype(np.int32)
        plain = self._plain(store, queries, qmask, candidates)
        sweep = self._sweep(store, queries, qmask, candidates, 96)
        np.testing.assert_allclose(sweep, plain, rtol=1e-4, atol=1e-4)

    def test_int8_per_doc_scales(self, rng):
        from visual_rag_tpu.index import CollectionSchema, IndexBuilder

        schema = CollectionSchema.standard(storage_dtype="int8", dim=DIM)
        builder = IndexBuilder(schema)
        for i in range(17):
            n = int(rng.integers(2, 30))
            builder.add(f"d{i}", {
                "initial": rng.standard_normal((n, DIM)).astype(np.float32),
                "mean_pooling": rng.standard_normal((3, DIM)).astype(np.float32),
                "experimental_pooling": rng.standard_normal((5, DIM)).astype(np.float32),
                "global_pooling": rng.standard_normal((DIM,)).astype(np.float32),
            })
        idx = builder.seal()
        store = idx.store("initial")
        b, k, nq = 4, 9, 16
        queries = _norm(rng.standard_normal((b, nq, DIM)).astype(np.float32))
        qmask = np.ones((b, nq), dtype=bool)
        candidates = rng.integers(0, idx.num_docs, (b, k)).astype(np.int32)
        plain = self._plain(store, queries, qmask, candidates,
                            doc_scales=store.scales)
        sweep = self._sweep(store, queries, qmask, candidates, 96,
                            doc_scales=store.scales)
        np.testing.assert_allclose(sweep, plain, rtol=1e-4, atol=1e-4)


class TestExhaustiveScanKernel:
    """Streaming exhaustive MaxSim scan (VERDICT r3 #3): every doc's window
    DMA'd once, scored against the GROUP-PACKED query batch — must match the
    XLA doc-major oracle bit-for-bit on f32 (same mask/empty-doc semantics)."""

    @staticmethod
    def _packed(queries, b, group=8):
        import jax

        from visual_rag_tpu.retrieval import batch as B
        from visual_rag_tpu.retrieval.plans import _prep_queries_packed

        (pw, pos, qid), nq, _rg = B.pack_queries_grouped(
            queries, DIM, group=group)
        prep = jax.jit(lambda a, c, d: _prep_queries_packed(a, c, d, b, nq))
        _tokens, _qmask, _pooled, pk = prep(pw, pos, qid)
        return pk

    def test_matches_xla_exhaustive(self, small_index, rng):
        from visual_rag_tpu.ops.kernels.maxsim_scan import (
            exhaustive_scores_packed,
        )
        from visual_rag_tpu.retrieval import batch as B

        store = small_index.store("initial")
        qs = [rng.standard_normal((int(rng.integers(4, 20)), DIM)).astype(np.float32)
              for _ in range(16)]
        pk = self._packed(qs, 16)
        ref = np.asarray(B.xla_exhaustive_packed(
            store.flat, store.offsets, store.lengths, pk["q"], pk["seg"],
            store.max_len, chunk=8))
        got = np.asarray(exhaustive_scores_packed(
            store.flat, store.offsets, store.lengths, pk["q"], pk["qid"],
            store.max_len, b=16, group=8, n_slots=2, m_tile=256,
            interpret=True))
        assert got.shape == (16, store.num_docs)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_int8_per_doc_scales(self, rng):
        from visual_rag_tpu.index import CollectionSchema, IndexBuilder
        from visual_rag_tpu.ops.kernels.maxsim_scan import (
            exhaustive_scores_packed,
        )
        from visual_rag_tpu.retrieval import batch as B

        schema = CollectionSchema.standard(storage_dtype="int8", dim=DIM)
        builder = IndexBuilder(schema)
        for i in range(13):
            n = int(rng.integers(2, 30))
            builder.add(f"d{i}", {
                "initial": rng.standard_normal((n, DIM)).astype(np.float32),
                "mean_pooling": rng.standard_normal((3, DIM)).astype(np.float32),
                "experimental_pooling": rng.standard_normal((5, DIM)).astype(np.float32),
                "global_pooling": rng.standard_normal((DIM,)).astype(np.float32),
            })
        store = builder.seal().store("initial")
        qs = [rng.standard_normal((int(rng.integers(4, 16)), DIM)).astype(np.float32)
              for _ in range(8)]
        pk = self._packed(qs, 8, group=4)
        ref = np.asarray(B.xla_exhaustive_packed(
            store.flat, store.offsets, store.lengths, pk["q"], pk["seg"],
            store.max_len, scales=store.scales, chunk=8))
        got = np.asarray(exhaustive_scores_packed(
            store.flat, store.offsets, store.lengths, pk["q"], pk["qid"],
            store.max_len, b=8, doc_scales=store.scales, group=4, n_slots=2,
            m_tile=256, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)

    def test_qdot_int8_kernel_matches_xla(self, rng):
        """int8-quantized-query scan (int8 x int8 -> int32 MXU dot): the
        Pallas kernel and the XLA packed path share the quantization math
        and must agree to f32 rounding; both must stay within the int8
        noise floor of the bf16-query scores."""
        from visual_rag_tpu.index import CollectionSchema, IndexBuilder
        from visual_rag_tpu.ops.kernels.maxsim_scan import (
            exhaustive_scores_packed,
        )
        from visual_rag_tpu.retrieval import batch as B

        schema = CollectionSchema.standard(storage_dtype="int8", dim=DIM)
        builder = IndexBuilder(schema)
        for i in range(17):
            n = int(rng.integers(2, 40))
            builder.add(f"d{i}", {
                "initial": rng.standard_normal((n, DIM)).astype(np.float32),
                "mean_pooling": rng.standard_normal((3, DIM)).astype(np.float32),
                "experimental_pooling": rng.standard_normal((5, DIM)).astype(np.float32),
                "global_pooling": rng.standard_normal((DIM,)).astype(np.float32),
            })
        store = builder.seal().store("initial")
        qs = [rng.standard_normal((int(rng.integers(4, 16)), DIM)).astype(np.float32)
              for _ in range(8)]
        pk = self._packed(qs, 8, group=4)
        ref_q = np.asarray(B.xla_exhaustive_packed(
            store.flat, store.offsets, store.lengths, pk["q"], pk["seg"],
            store.max_len, scales=store.scales, chunk=8, qdot_int8=True))
        got_q = np.asarray(exhaustive_scores_packed(
            store.flat, store.offsets, store.lengths, pk["q"], pk["qid"],
            store.max_len, b=8, doc_scales=store.scales, group=4,
            interpret=True, qdot_int8=True))
        np.testing.assert_allclose(got_q, ref_q, rtol=1e-5, atol=1e-5)
        base = np.asarray(B.xla_exhaustive_packed(
            store.flat, store.offsets, store.lengths, pk["q"], pk["seg"],
            store.max_len, scales=store.scales, chunk=8))
        assert np.abs(ref_q - base).max() < 2e-2

    def test_qdot_rejects_float_store(self, small_index, rng):
        from visual_rag_tpu.ops.kernels.maxsim_scan import (
            exhaustive_scores_packed,
        )

        store = small_index.store("initial")
        qs = [rng.standard_normal((6, DIM)).astype(np.float32)
              for _ in range(8)]
        pk = self._packed(qs, 8, group=4)
        with pytest.raises(ValueError, match="int8 store"):
            exhaustive_scores_packed(
                store.flat, store.offsets, store.lengths, pk["q"], pk["qid"],
                store.max_len, b=8, group=4, interpret=True, qdot_int8=True)
