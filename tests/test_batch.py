"""Batched search path (XLA fallbacks on CPU) vs per-query engine results."""

import numpy as np
import pytest

from visual_rag_tpu.index import CollectionSchema, IndexBuilder
from visual_rag_tpu.retrieval import RetrievalEngine, build_filter

DIM = 32


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    points = []
    for i in range(29):
        points.append(
            {
                "id": f"doc{i}",
                "vectors": {
                    "initial": rng.standard_normal(
                        (int(rng.integers(5, 50)), DIM)).astype(np.float32),
                    "mean_pooling": rng.standard_normal(
                        (int(rng.integers(3, 10)), DIM)).astype(np.float32),
                    "experimental_pooling": rng.standard_normal(
                        (int(rng.integers(3, 12)), DIM)).astype(np.float32),
                    "global_pooling": rng.standard_normal((DIM,)).astype(np.float32),
                },
                "payload": {"year": 2020 + (i % 3)},
            }
        )
    builder = IndexBuilder(CollectionSchema.standard(storage_dtype="float32", dim=DIM))
    builder.upload_batch(points)
    engine = RetrievalEngine(builder.seal(), compute_dtype="float32")
    queries = [
        np.random.default_rng(100 + i).standard_normal(
            (int(np.random.default_rng(i).integers(3, 12)), DIM)).astype(np.float32)
        for i in range(5)
    ]
    return engine, queries


ALL_MODES = [
    "single_full", "single_tiles", "single_pooled", "single_global",
    "single_experimental_tokens", "single_experimental_pooled",
    "two_stage", "three_stage",
]


class TestBatchMatchesSingle:
    @pytest.mark.parametrize("mode", ALL_MODES)
    def test_modes(self, setup, mode):
        engine, queries = setup
        kwargs = dict(mode=mode, top_k=5)
        if mode == "two_stage":
            kwargs.update(prefetch_k=10, stage1_mode="tokens_vs_standard_pooling")
        if mode == "three_stage":
            kwargs.update(stage1_k=15, stage2_k=8)
        batch = engine.search_embedded_batch(queries, **kwargs)
        assert len(batch) == len(queries)
        for q, res in zip(queries, batch):
            single = engine.search_embedded(q, **kwargs)
            assert [r["id"] for r in res] == [r["id"] for r in single], mode
            np.testing.assert_allclose(
                [r["score_final"] for r in res],
                [r["score_final"] for r in single], rtol=1e-4, atol=1e-4)

    def test_filter(self, setup):
        engine, queries = setup
        f = build_filter(year=2021)
        batch = engine.search_embedded_batch(
            queries, mode="two_stage", top_k=4, prefetch_k=8, filter_obj=f)
        for q, res in zip(queries, batch):
            single = engine.search_embedded(
                q, mode="two_stage", top_k=4, prefetch_k=8, filter_obj=f)
            assert [r["id"] for r in res] == [r["id"] for r in single]
            for r in res:
                assert r["payload"]["year"] == 2021

    def test_empty_batch(self, setup):
        engine, _ = setup
        assert engine.search_embedded_batch([]) == []

    def test_single_element_batch(self, setup):
        engine, queries = setup
        res = engine.search_embedded_batch([queries[0]], mode="single_global", top_k=3)
        assert len(res) == 1 and len(res[0]) == 3


class TestWarmup:
    def test_warmup_compiles_plans(self, setup):
        engine, queries = setup
        secs = engine.warmup(modes=("two_stage", "single_global"),
                             batch_sizes=(2,), n_query_tokens=8)
        assert secs >= 0.0
        # warmed plan serves immediately
        res = engine.search_embedded_batch(queries[:2], mode="two_stage", top_k=3)
        assert len(res) == 2


class TestPipelinedBatches:
    def test_generator_matches_sequential(self):
        import numpy as np

        from visual_rag_tpu.index import CollectionSchema, IndexBuilder
        from visual_rag_tpu.retrieval import RetrievalEngine

        rng = np.random.default_rng(8)
        b = IndexBuilder(CollectionSchema.standard(storage_dtype="float32", dim=16))
        for i in range(40):
            t = rng.standard_normal((12, 16)).astype(np.float32)
            b.add(f"d{i}", {"initial": t, "mean_pooling": t[:3],
                            "experimental_pooling": t[:3],
                            "global_pooling": t.mean(0)}, {})
        e = RetrievalEngine(b.seal(), compute_dtype="float32")
        batches = [[rng.standard_normal((6, 16)).astype(np.float32)
                    for _ in range(5)] for _ in range(4)]
        seq = [e.search_embedded_batch(qb, mode="two_stage", top_k=3,
                                       prefetch_k=10, with_payload=False)
               for qb in batches]
        pipe = list(e.search_embedded_batches(batches, mode="two_stage",
                                              top_k=3, prefetch_k=10,
                                              with_payload=False))
        assert len(pipe) == len(seq)
        for sb, pb in zip(seq, pipe):
            for sr, pr in zip(sb, pb):
                assert [x["id"] for x in sr] == [x["id"] for x in pr]

    def test_generator_with_empty_and_varied_batches(self):
        import numpy as np

        from visual_rag_tpu.index import CollectionSchema, IndexBuilder
        from visual_rag_tpu.retrieval import RetrievalEngine

        rng = np.random.default_rng(9)
        b = IndexBuilder(CollectionSchema.standard(storage_dtype="float32", dim=16))
        for i in range(10):
            t = rng.standard_normal((8, 16)).astype(np.float32)
            b.add(f"d{i}", {"initial": t, "mean_pooling": t[:2],
                            "experimental_pooling": t[:2],
                            "global_pooling": t.mean(0)}, {})
        e = RetrievalEngine(b.seal(), compute_dtype="float32")
        q = rng.standard_normal((4, 16)).astype(np.float32)
        out = list(e.search_embedded_batches(
            [[q], [], [q, q, q]], mode="single_full", top_k=2,
            with_payload=False))
        assert [len(x) for x in out] == [1, 0, 3]
        assert all(len(r) == 2 for x in out for r in x)


class TestRerankImplPolicy:
    """Static kernel-selection policy (EngineCommon._rerank_impl)."""

    def test_forced_impl_is_honored(self, setup):
        engine, _ = setup
        for impl in ("plain", "dedup", "sweep"):
            e2 = RetrievalEngine(engine.index, compute_dtype="float32",
                                 rerank_impl=impl)
            assert e2._rerank_impl(256, 200) == impl

    def test_invalid_impl_rejected(self, setup):
        engine, _ = setup
        with pytest.raises(ValueError, match="rerank_impl"):
            RetrievalEngine(engine.index, rerank_impl="bogus")

    def test_auto_policy_tiers(self, setup):
        engine, _ = setup
        # tiny batches skip the sort/scatter overhead entirely
        assert engine._rerank_impl(1, 200) == "plain"
        assert engine._rerank_impl(32, 200) == "dedup" or \
            engine._rerank_impl(32, 200) == "plain"
        # dense coverage on this small corpus -> sweep (cov >> threshold)
        rows, max_len, _, _, _ = engine._ragged_geom()
        span = ((max_len + 31) // 32) * 32
        b, k = 256, 200
        cov = b * k * span / rows
        expected = "sweep" if cov >= engine.SWEEP_MIN_COV else "dedup"
        assert engine._rerank_impl(b, k) == expected

    def test_forced_impls_agree_end_to_end(self, setup):
        # the three kernels are interchangeable: identical ids through the
        # fused batch path (CPU runs the XLA fallback for the rerank itself,
        # but the policy string must thread through plan compilation without
        # breaking shapes or caching)
        engine, queries = setup
        base = None
        for impl in ("plain", "dedup", "sweep"):
            e2 = RetrievalEngine(engine.index, compute_dtype="float32",
                                 rerank_impl=impl)
            out = e2.search_embedded_batch(queries, mode="two_stage", top_k=5,
                                           with_payload=False)
            ids = [[r["id"] for r in q] for q in out]
            if base is None:
                base = ids
            else:
                assert ids == base
