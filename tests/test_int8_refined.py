"""int8_refined storage: int8 kernels + int4-residual two-pass refinement.

VERDICT r3 #5: int8's ~3e-3 score-noise floor reorders near-tie top-10s
(measured overlap-vs-bf16 0.96 on the r2 corpus). The refined mode keeps all
hot kernels on 1-byte codes and re-scores only the int8 top window with a
per-row int4 residual (effective 12-bit storage, 1.53x int8 / 0.77x bf16
memory), restoring bf16-parity final rankings.
"""

import numpy as np
import pytest

from visual_rag_tpu.index import CollectionSchema, IndexBuilder
from visual_rag_tpu.retrieval import RetrievalEngine

DIM = 128


def _mk_points(rng, n_docs=300, clusters=12, spread=0.35):
    """Mildly clustered corpus: near-ties exist but are not pure noise."""
    centers = rng.standard_normal((clusters, DIM)).astype(np.float32)
    points = []
    for i in range(n_docs):
        c = centers[i % clusters]
        n = int(rng.integers(24, 64))
        toks = (c[None] + spread * rng.standard_normal((n, DIM))).astype(np.float32)
        mp = toks[: min(8, n)].copy()
        points.append({
            "id": f"doc{i}",
            "vectors": {
                "initial": toks,
                "mean_pooling": mp,
                "global_pooling": toks.mean(axis=0),
                "experimental_pooling": mp,
            },
            "payload": {"i": i},
        })
    return points, centers


def _build(points, storage_dtype):
    b = IndexBuilder(CollectionSchema.standard(storage_dtype=storage_dtype, dim=DIM))
    b.upload_batch(points)
    return b.seal()


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    points, centers = _mk_points(rng)
    queries = []
    for i in range(24):
        c = centers[i % len(centers)]
        q = (c[None] + 0.5 * rng.standard_normal((12, DIM))).astype(np.float32)
        queries.append(q)
    return points, queries


class TestStore:
    def test_residual_shrinks_error(self, corpus):
        points, _ = corpus
        idx = _build(points, "int8_refined")
        st = idx.store("initial")
        assert st.res4 is not None
        assert st.storage_dtype == "int8_refined"
        # reconstruct the normalized f32 rows both ways
        ref = _build(points, "float32").store("initial")
        truth = np.asarray(ref.flat)
        coarse = st.dequantized_flat(refined=False)
        fine = st.dequantized_flat(refined=True)
        e8 = np.abs(coarse - truth).mean()
        e12 = np.abs(fine - truth).mean()
        assert e12 < 0.15 * e8, (e8, e12)

    def test_memory_overhead_bounded(self, corpus):
        points, _ = corpus
        r = _build(points, "int8_refined").store("initial")
        p = _build(points, "int8").store("initial")
        b = _build(points, "bfloat16").store("initial")
        assert r.nbytes() < 1.6 * p.nbytes()
        assert r.nbytes() < 0.85 * b.nbytes()

    def test_pooled_stores_stay_plain_int8(self, corpus):
        points, _ = corpus
        idx = _build(points, "int8_refined")
        assert idx.store("mean_pooling").scales is not None
        assert idx.store("mean_pooling").values.dtype == np.int8


class TestQuality:
    def test_refined_matches_bf16_ranking(self, corpus):
        """Top-10 overlap vs the bf16 engine: refined must beat plain int8
        and reach >=0.98 on this corpus (the r3 target regime)."""
        points, queries = corpus
        eng_b = RetrievalEngine(_build(points, "bfloat16"), compute_dtype="float32")
        eng_8 = RetrievalEngine(_build(points, "int8"), compute_dtype="float32")
        eng_r = RetrievalEngine(_build(points, "int8_refined"), compute_dtype="float32")
        kw = dict(mode="two_stage", top_k=10, prefetch_k=100, with_payload=False)
        ov8, ovr = [], []
        for q in queries:
            ids_b = {h["id"] for h in eng_b.search_embedded(q, **kw)}
            ids_8 = {h["id"] for h in eng_8.search_embedded(q, **kw)}
            ids_r = {h["id"] for h in eng_r.search_embedded(q, **kw)}
            ov8.append(len(ids_b & ids_8) / 10)
            ovr.append(len(ids_b & ids_r) / 10)
        assert np.mean(ovr) >= np.mean(ov8) - 1e-9
        assert np.mean(ovr) >= 0.98, (np.mean(ov8), np.mean(ovr))

    def test_oracle_two_stage_equals_single_full(self, corpus):
        points, queries = corpus
        eng = RetrievalEngine(_build(points, "int8_refined"), compute_dtype="float32")
        for q in queries[:6]:
            full = eng.search_embedded(q, mode="single_full", top_k=10,
                                       with_payload=False)
            wide = eng.search_embedded(q, mode="two_stage", top_k=10,
                                       prefetch_k=len(points), with_payload=False)
            assert [h["id"] for h in full] == [h["id"] for h in wide]

    def test_scan_rerank_composes_with_refine(self, corpus):
        """rerank_impl='scan' gives int8-precision exhaustive scores; the
        int4-residual refine pass then re-scores the top window — results
        must match the plain-rerank refined engine exactly (same int8 cut,
        same refine math)."""
        points, queries = corpus
        idx = _build(points, "int8_refined")
        ep = RetrievalEngine(idx, compute_dtype="float32",
                             query_wire="packed", rerank_impl="plain")
        es = RetrievalEngine(idx, compute_dtype="float32",
                             query_wire="packed", rerank_impl="scan")
        qs = queries[:16]
        a = ep.search_embedded_batch(qs, mode="two_stage", top_k=10,
                                     prefetch_k=100, with_payload=False)
        b = es.search_embedded_batch(qs, mode="two_stage", top_k=10,
                                     prefetch_k=100, with_payload=False)
        for ra, rb in zip(a, b):
            assert {h["id"] for h in ra} == {h["id"] for h in rb}
            np.testing.assert_allclose(
                sorted(h["score_final"] for h in ra),
                sorted(h["score_final"] for h in rb), atol=5e-5)

    def test_three_stage_runs_refined(self, corpus):
        points, queries = corpus
        eng = RetrievalEngine(_build(points, "int8_refined"), compute_dtype="float32")
        res = eng.search_embedded(queries[0], mode="three_stage", top_k=5,
                                  stage1_k=100, stage2_k=40, with_payload=False)
        assert len(res) == 5
        scores = [r["score_final"] for r in res]
        assert scores == sorted(scores, reverse=True)
        assert all("score_stage2" in r and "score_stage1" in r for r in res)


class TestPathParity:
    def test_batched_equals_per_query(self, corpus):
        points, queries = corpus
        eng = RetrievalEngine(_build(points, "int8_refined"), compute_dtype="float32")
        batch = eng.search_embedded_batch(queries[:8], mode="two_stage",
                                          top_k=10, prefetch_k=100,
                                          with_payload=False)
        for q, got in zip(queries[:8], batch):
            ref = eng.search_embedded(q, mode="two_stage", top_k=10,
                                      prefetch_k=100, with_payload=False)
            assert [h["id"] for h in got] == [h["id"] for h in ref]

    def test_batched_single_full_refined(self, corpus):
        points, queries = corpus
        eng = RetrievalEngine(_build(points, "int8_refined"), compute_dtype="float32")
        batch = eng.search_embedded_batch(queries[:4], mode="single_full",
                                          top_k=10, with_payload=False)
        for q, got in zip(queries[:4], batch):
            ref = eng.search_embedded(q, mode="single_full", top_k=10,
                                      with_payload=False)
            assert [h["id"] for h in got] == [h["id"] for h in ref]


class TestPersist:
    def test_roundtrip_preserves_residuals(self, corpus, tmp_path):
        from visual_rag_tpu.index.persist import load_sealed, save_sealed

        points, queries = corpus
        idx = _build(points, "int8_refined")
        save_sealed(idx, tmp_path)
        idx2 = load_sealed(tmp_path)
        st, st2 = idx.store("initial"), idx2.store("initial")
        np.testing.assert_array_equal(np.asarray(st.res4), np.asarray(st2.res4))
        np.testing.assert_array_equal(np.asarray(st.res_scales),
                                      np.asarray(st2.res_scales))
        e1 = RetrievalEngine(idx, compute_dtype="float32")
        e2 = RetrievalEngine(idx2, compute_dtype="float32")
        for q in queries[:4]:
            a = e1.search_embedded(q, mode="two_stage", top_k=10, with_payload=False)
            b = e2.search_embedded(q, mode="two_stage", top_k=10, with_payload=False)
            assert [h["id"] for h in a] == [h["id"] for h in b]


class TestSharded:
    def test_sharded_ids_match_single_device(self, corpus):
        from visual_rag_tpu.parallel.mesh import make_mesh
        from visual_rag_tpu.parallel.sharded import ShardedEngine, ShardedIndex

        points, queries = corpus
        idx = _build(points, "int8_refined")
        single = RetrievalEngine(idx, compute_dtype="float32")
        mesh = make_mesh((8,), ("data",))
        si = ShardedIndex.from_index(idx, mesh)
        # both query wires: the cross-shard refine merge (_refined_merge) is
        # shared by the two- and three-stage bodies on either wire
        engines = [ShardedEngine(si, use_pallas=False),
                   ShardedEngine(si, use_pallas=False, query_wire="packed")]
        for mode, kw in (("two_stage", dict(prefetch_k=64)),
                         ("single_full", {}),
                         ("three_stage", dict(stage1_k=100, stage2_k=40))):
            for sharded in engines:
                got = sharded.search_embedded_batch(
                    queries[:4], mode=mode, top_k=10, with_payload=False,
                    **kw)
                for q, g in zip(queries[:4], got):
                    ref = single.search_embedded(q, mode=mode, top_k=10,
                                                 with_payload=False, **kw)
                    assert [h["id"] for h in g] == [h["id"] for h in ref], (
                        mode, sharded.query_wire)
