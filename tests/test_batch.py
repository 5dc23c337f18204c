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
