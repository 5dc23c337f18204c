"""RetrievalEngine vs a pure-numpy oracle for every retrieval mode.

The oracle mirrors the Qdrant semantics: stored vectors cosine-normalized,
MaxSim = sum_q max_d dot, pooled query = normalized mean of raw tokens.
"""

import numpy as np
import pytest

from visual_rag_tpu.index import CollectionSchema, IndexBuilder
from visual_rag_tpu.retrieval import RetrievalEngine, build_filter
from visual_rag_tpu.retrieval.filters import PayloadFilter

DIM = 32


def _norm(x, axis=-1):
    return x / (np.linalg.norm(x, axis=axis, keepdims=True) + 1e-12)


class Oracle:
    def __init__(self, points):
        self.points = points

    def maxsim(self, q_tokens, name, i):
        d = _norm(np.asarray(self.points[i]["vectors"][name], dtype=np.float32))
        if d.ndim == 1:
            d = d[None, :]
        sims = _norm(q_tokens) @ d.T
        return float(sims.max(axis=1).sum())

    def pooled_dot(self, q_tokens, name, i):
        qp = _norm(q_tokens.mean(axis=0))
        d = np.asarray(self.points[i]["vectors"][name], dtype=np.float32)
        if d.ndim == 1:
            return float(qp @ _norm(d))
        return float((_norm(d) @ qp).max())

    def rank(self, scores, k):
        order = np.argsort(-np.asarray(scores), kind="stable")
        return order[:k]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(42)
    points = []
    for i in range(37):
        points.append(
            {
                "id": f"doc{i}",
                "vectors": {
                    "initial": rng.standard_normal(
                        (int(rng.integers(5, 60)), DIM)).astype(np.float32),
                    "mean_pooling": rng.standard_normal(
                        (int(rng.integers(3, 12)), DIM)).astype(np.float32),
                    "experimental_pooling": rng.standard_normal(
                        (int(rng.integers(3, 14)), DIM)).astype(np.float32),
                    "global_pooling": rng.standard_normal((DIM,)).astype(np.float32),
                },
                "payload": {"year": 2020 + (i % 3), "source": f"s{i % 2}", "i": i},
            }
        )
    schema = CollectionSchema.standard(storage_dtype="float32", dim=DIM)
    builder = IndexBuilder(schema)
    builder.upload_batch(points)
    index = builder.seal()
    engine = RetrievalEngine(index, compute_dtype="float32")
    query = np.random.default_rng(7).standard_normal((9, DIM)).astype(np.float32)
    return points, engine, Oracle(points), query


SINGLE_MODES = {
    "single_full": ("maxsim", "initial"),
    "single_tiles": ("maxsim", "mean_pooling"),
    "single_pooled": ("pooled", "mean_pooling"),
    "single_global": ("pooled", "global_pooling"),
    "single_experimental_tokens": ("maxsim", "experimental_pooling"),
    "single_experimental_pooled": ("pooled", "experimental_pooling"),
}


class TestSingleStage:
    @pytest.mark.parametrize("mode", sorted(SINGLE_MODES))
    def test_matches_oracle(self, corpus, mode):
        points, engine, oracle, query = corpus
        kind, name = SINGLE_MODES[mode]
        fn = oracle.maxsim if kind == "maxsim" else oracle.pooled_dot
        expected_scores = [fn(query, name, i) for i in range(len(points))]
        expected_top = oracle.rank(expected_scores, 5)
        results = engine.search_embedded(query, mode=mode, top_k=5)
        assert [r["id"] for r in results] == [points[i]["id"] for i in expected_top]
        got = [r["score"] for r in results]
        np.testing.assert_allclose(
            got, [expected_scores[i] for i in expected_top], rtol=2e-4, atol=2e-4)
        assert results[0]["score_final"] == results[0]["score"]
        assert "payload" in results[0]

    def test_top_k_larger_than_corpus(self, corpus):
        points, engine, oracle, query = corpus
        results = engine.search_embedded(query, mode="single_global", top_k=1000)
        assert len(results) == len(points)


class TestTwoStage:
    @pytest.mark.parametrize(
        "stage1_mode",
        [
            "pooled_query_vs_standard_pooling",
            "tokens_vs_standard_pooling",
            "pooled_query_vs_experimental_pooling",
            "tokens_vs_experimental_pooling",
            "pooled_query_vs_global",
        ],
    )
    def test_matches_oracle(self, corpus, stage1_mode):
        points, engine, oracle, query = corpus
        n = len(points)
        prefetch_k = 12
        if stage1_mode == "pooled_query_vs_standard_pooling":
            s1 = [oracle.pooled_dot(query, "mean_pooling", i) for i in range(n)]
        elif stage1_mode == "tokens_vs_standard_pooling":
            s1 = [oracle.maxsim(query, "mean_pooling", i) for i in range(n)]
        elif stage1_mode == "pooled_query_vs_experimental_pooling":
            s1 = [oracle.pooled_dot(query, "experimental_pooling", i) for i in range(n)]
        elif stage1_mode == "tokens_vs_experimental_pooling":
            s1 = [oracle.maxsim(query, "experimental_pooling", i) for i in range(n)]
        else:
            s1 = [oracle.pooled_dot(query, "global_pooling", i) for i in range(n)]
        cands = oracle.rank(s1, prefetch_k)
        rr = {i: oracle.maxsim(query, "initial", i) for i in cands}
        expected = sorted(rr, key=lambda i: -rr[i])[:5]
        results = engine.search_embedded(
            query, mode="two_stage", top_k=5, prefetch_k=prefetch_k, stage1_mode=stage1_mode)
        assert [r["id"] for r in results] == [points[i]["id"] for i in expected]
        np.testing.assert_allclose(
            [r["score_final"] for r in results], [rr[i] for i in expected],
            rtol=2e-4, atol=2e-4)

    def test_deprecated_stage1_aliases(self, corpus):
        points, engine, oracle, query = corpus
        a = engine.search_embedded(
            query, mode="two_stage", top_k=3, stage1_mode="pooled_query_vs_tiles")
        b = engine.search_embedded(
            query, mode="two_stage", top_k=3,
            stage1_mode="pooled_query_vs_standard_pooling")
        assert [r["id"] for r in a] == [r["id"] for r in b]

    def test_default_prefetch_k(self, corpus):
        points, engine, oracle, query = corpus
        # default prefetch = max(100, 10*top_k) > corpus -> equals exhaustive rerank
        results = engine.search_embedded(query, mode="two_stage", top_k=4)
        full = {i: oracle.maxsim(query, "initial", i) for i in range(len(points))}
        expected = sorted(full, key=lambda i: -full[i])[:4]
        assert [r["id"] for r in results] == [points[i]["id"] for i in expected]

    def test_unknown_stage1_raises(self, corpus):
        _, engine, _, query = corpus
        with pytest.raises(ValueError, match="stage1_mode"):
            engine.search_embedded(query, mode="two_stage", stage1_mode="bogus")


class TestThreeStage:
    def test_matches_oracle(self, corpus):
        points, engine, oracle, query = corpus
        n = len(points)
        stage1_k, stage2_k, top_k = 20, 10, 5
        s1 = [oracle.pooled_dot(query, "global_pooling", i) for i in range(n)]
        c1 = set(oracle.rank(s1, stage1_k))
        s2 = {i: oracle.maxsim(query, "experimental_pooling", i) for i in c1}
        c2 = sorted(s2, key=lambda i: -s2[i])[:stage2_k]
        s3 = {i: oracle.maxsim(query, "initial", i) for i in c2}
        expected = sorted(s3, key=lambda i: -s3[i])[:top_k]
        results = engine.search_embedded(
            query, mode="three_stage", top_k=top_k, stage1_k=stage1_k, stage2_k=stage2_k)
        assert [r["id"] for r in results] == [points[i]["id"] for i in expected]
        for r, i in zip(results, expected):
            assert r["score_final"] == pytest.approx(s3[i], rel=2e-4)
            assert r["score_stage3"] == r["score_final"]
            assert r["score_stage1"] == pytest.approx(s1[i], rel=2e-3, abs=2e-3)
            assert r["score_stage2"] == pytest.approx(s2[i], rel=2e-3, abs=2e-3)


class TestThreeStageFilterDoc0:
    """Regression (ADVICE r1): with a payload filter, stage1_k > #matching docs
    pads c1 with -1 entries; a last-write-wins .set membership scatter erased a
    genuine doc-0 candidacy. Oracle must agree including doc 0."""

    def _oracle_ids(self, points, oracle, query, allowed, s1k, s2k, k):
        s1 = {i: oracle.pooled_dot(query, "global_pooling", i) for i in allowed}
        c1 = sorted(s1, key=lambda i: -s1[i])[:s1k]
        s2 = {i: oracle.maxsim(query, "experimental_pooling", i) for i in c1}
        c2 = sorted(s2, key=lambda i: -s2[i])[:s2k]
        s3 = {i: oracle.maxsim(query, "initial", i) for i in c2}
        return [points[i]["id"] for i in sorted(s3, key=lambda i: -s3[i])[:k]]

    def test_single_query_path(self, corpus):
        points, engine, oracle, query = corpus
        f = build_filter(year=2020)  # doc 0 has year 2020
        allowed = [i for i, p in enumerate(points) if p["payload"]["year"] == 2020]
        assert 0 in allowed
        s1k = len(allowed) + 10  # force -1 padding in c1
        expected = self._oracle_ids(points, oracle, query, allowed, s1k,
                                    len(allowed), len(allowed))
        results = engine.search_embedded(
            query, mode="three_stage", top_k=len(allowed), stage1_k=s1k,
            stage2_k=len(allowed), filter_obj=f)
        got = [r["id"] for r in results]
        assert got == expected
        assert points[0]["id"] in got

    def test_fused_batch_path(self, corpus):
        points, engine, oracle, query = corpus
        f = build_filter(year=2020)
        allowed = [i for i, p in enumerate(points) if p["payload"]["year"] == 2020]
        s1k = len(allowed) + 10
        expected = self._oracle_ids(points, oracle, query, allowed, s1k,
                                    len(allowed), len(allowed))
        batch = engine.search_embedded_batch(
            [query, query], mode="three_stage", top_k=len(allowed),
            stage1_k=s1k, stage2_k=len(allowed), filter_obj=f)
        for results in batch:
            got = [r["id"] for r in results]
            assert got == expected
            assert points[0]["id"] in got


class TestFilters:
    def test_filter_restricts_results(self, corpus):
        points, engine, oracle, query = corpus
        f = build_filter(year=2021)
        results = engine.search_embedded(query, mode="single_full", top_k=50, filter_obj=f)
        assert results, "filter should still match some docs"
        for r in results:
            assert r["payload"]["year"] == 2021
        allowed = [i for i, p in enumerate(points) if p["payload"]["year"] == 2021]
        scores = {i: oracle.maxsim(query, "initial", i) for i in allowed}
        expected = sorted(scores, key=lambda i: -scores[i])
        assert [r["id"] for r in results] == [points[i]["id"] for i in expected]

    def test_match_any(self, corpus):
        points, engine, _, query = corpus
        f = build_filter(year=[2020, 2021])
        results = engine.search_embedded(query, mode="single_global", top_k=50, filter_obj=f)
        assert {r["payload"]["year"] for r in results} <= {2020, 2021}

    def test_id_filter(self, corpus):
        points, engine, _, query = corpus
        ids = [points[3]["id"], points[5]["id"]]
        f = PayloadFilter(ids=ids)
        results = engine.search_embedded(query, mode="two_stage", top_k=10, filter_obj=f)
        assert sorted(r["id"] for r in results) == sorted(ids)

    def test_filter_in_two_stage(self, corpus):
        points, engine, oracle, query = corpus
        f = build_filter(source="s1")
        results = engine.search_embedded(
            query, mode="two_stage", top_k=5, prefetch_k=8, filter_obj=f)
        for r in results:
            assert r["payload"]["source"] == "s1"


class TestModesSurface:
    def test_unknown_mode_raises(self, corpus):
        _, engine, _, query = corpus
        with pytest.raises(ValueError, match="Unknown mode"):
            engine.search_embedded(query, mode="warp_drive")

    def test_1d_query_promoted(self, corpus):
        _, engine, _, query = corpus
        res = engine.search_embedded(query[0], mode="single_global", top_k=3)
        assert len(res) == 3


class TestInt8Engine:
    def test_int8_close_to_f32(self, corpus):
        points, _, oracle, query = corpus
        schema = CollectionSchema.standard(storage_dtype="int8", dim=DIM)
        builder = IndexBuilder(schema)
        builder.upload_batch(points)
        engine8 = RetrievalEngine(builder.seal(), compute_dtype="float32")
        res = engine8.search_embedded(query, mode="two_stage", top_k=5, prefetch_k=12)
        full = {i: oracle.maxsim(query, "initial", i) for i in range(len(points))}
        best = sorted(full, key=lambda i: -full[i])[:5]
        # int8 quantization may swap near-ties; require top-1 agreement and
        # score agreement within quantization tolerance
        assert res[0]["id"] == points[best[0]]["id"]
        assert res[0]["score_final"] == pytest.approx(full[best[0]], rel=0.02, abs=0.05)


class TestStage1Cut:
    """approx_max_k stage-1 cut policy (scale feature; small corpora exact)."""

    def test_auto_is_exact_below_threshold(self, corpus):
        _, engine, _, _ = corpus
        assert engine.stage1_cut == "auto"
        assert engine._approx_cut(10) is False  # 37 docs << 65536

    def test_explicit_approx_still_finds_docs(self, corpus):
        points, _, oracle, query = corpus
        from visual_rag_tpu.index import CollectionSchema, IndexBuilder
        schema = CollectionSchema.standard(storage_dtype="float32", dim=DIM)
        b = IndexBuilder(schema)
        b.upload_batch(points)
        eng = RetrievalEngine(b.seal(), compute_dtype="float32",
                              stage1_cut="approx")
        res = eng.search_embedded(query, mode="two_stage", top_k=5, prefetch_k=12)
        assert len(res) == 5
        # valid docs with exact (descending) rerank scores; recall quality at
        # scale is covered by the TPU scale profile (approx recall ~0.99 at
        # 100k docs — tiny corpora reorder more and aren't the target regime)
        ids = [r["id"] for r in res]
        assert len(set(ids)) == 5
        scores = [r["score_final"] for r in res]
        assert scores == sorted(scores, reverse=True)
        # prefetch_k >= corpus keeps the cut exhaustive even in approx mode
        full = {i: oracle.maxsim(query, "initial", i) for i in range(len(points))}
        expected = [points[i]["id"] for i in oracle.rank(list(full.values()), 5)]
        res_all = eng.search_embedded(query, mode="two_stage", top_k=5,
                                      prefetch_k=len(points))
        assert [r["id"] for r in res_all] == expected

    def test_bad_value_raises(self, corpus):
        points, engine, _, _ = corpus
        with pytest.raises(ValueError, match="stage1_cut"):
            RetrievalEngine(engine.index, stage1_cut="bogus")


class TestApproxCutQuality:
    """Planted-relevance corpus searched with the approx stage-1 cut forced:
    relevant docs must still rank first (the approx cut only risks dropping
    near-tie candidates deep in the prefetch tail, not clear winners)."""

    def test_planted_docs_survive_approx_cut(self):
        from visual_rag_tpu.index import CollectionSchema, IndexBuilder

        rng = np.random.default_rng(12)
        dim = 32
        queries = [rng.standard_normal((8, dim)).astype(np.float32)
                   for _ in range(5)]
        builder = IndexBuilder(CollectionSchema.standard(
            storage_dtype="float32", dim=dim))
        for i, q in enumerate(queries):
            planted = np.concatenate(
                [np.repeat(q, 2, axis=0),
                 0.1 * rng.standard_normal((14, dim)).astype(np.float32)])
            # pooled stage-1 signal: the query MEAN must appear in the pooled
            # rows (mean-of-8-random-tokens vs one token is only ~0.35 cosine)
            mp = np.concatenate([q.mean(axis=0, keepdims=True), planted[:3]])
            builder.add(f"rel{i}", {
                "initial": planted, "mean_pooling": mp,
                "experimental_pooling": mp,
                "global_pooling": q.mean(axis=0)}, {})
        for j in range(200):
            noise = rng.standard_normal((16, dim)).astype(np.float32)
            builder.add(f"n{j}", {
                "initial": noise, "mean_pooling": noise[:4],
                "experimental_pooling": noise[:4],
                "global_pooling": noise.mean(axis=0)}, {})
        engine = RetrievalEngine(builder.seal(), compute_dtype="float32",
                                 stage1_cut="approx")
        for i, q in enumerate(queries):
            res = engine.search_embedded(q, mode="two_stage", top_k=5,
                                         prefetch_k=20)
            assert res[0]["id"] == f"rel{i}", (i, [r["id"] for r in res[:3]])
            res3 = engine.search_embedded(q, mode="three_stage", top_k=5,
                                          stage1_k=40, stage2_k=20)
            assert res3[0]["id"] == f"rel{i}"
        batch = engine.search_embedded_batch(
            queries, mode="two_stage", top_k=3, prefetch_k=20,
            with_payload=False)
        for i, res in enumerate(batch):
            assert res[0]["id"] == f"rel{i}"


class TestThreeStageKClamp:
    def test_stage1_smaller_than_stage2_and_topk(self, corpus):
        """Regression (self-review r2): stage1_k < stage2_k with
        top_k > stage1_k crashed the fused batch plan (final top_k larger
        than the clamped stage-2 pool) while the per-query path worked."""
        points, engine, _, query = corpus
        per_query = engine.search_embedded(
            query, mode="three_stage", stage1_k=5, stage2_k=40, top_k=20)
        batch = engine.search_embedded_batch(
            [query], mode="three_stage", stage1_k=5, stage2_k=40, top_k=20)[0]
        assert len(per_query) == len(batch) == 5
        assert [r["id"] for r in batch] == [r["id"] for r in per_query]
