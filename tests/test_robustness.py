"""Regression tests for the round-2 advisor findings (ADVICE.md).

Each test pins one fixed defect:
  * empty (0-token) docs must rank below real docs with negative MaxSim
    sums in the exhaustive scans (they previously scored 0.0);
  * ragged tail padding covers the rerank kernel's 32-row-widened DMA
    window even when the LAST doc has 0 tokens;
  * filter masks are memoized per (signature, manifest version);
  * pad_queries_raw clips out-of-range values before the fp16 wire cast;
  * save_sealed commits sealed.vrag + sealed_meta.json near-atomically and
    rejects offsets beyond int32.
"""

import numpy as np
import pytest

from visual_rag_tpu.index import CollectionSchema, IndexBuilder
from visual_rag_tpu.retrieval import RetrievalEngine, build_filter
from visual_rag_tpu.retrieval.filters import PayloadFilter

DIM = 32


def _mk_point(rng, i, n_tokens):
    tokens = rng.standard_normal((max(n_tokens, 1), DIM)).astype(np.float32)
    if n_tokens == 0:
        tokens = tokens[:0]
    mp = rng.standard_normal((4, DIM)).astype(np.float32)
    return {
        "id": f"doc{i}",
        "vectors": {
            "initial": tokens,
            "mean_pooling": mp,
            "experimental_pooling": mp,
            "global_pooling": mp.mean(axis=0),
        },
        "payload": {"year": 2020 + (i % 2)},
    }


@pytest.fixture(scope="module")
def empty_tail_engine():
    """Corpus whose LAST doc has 0 tokens (worst case for the widened DMA
    window) plus a mid-corpus empty doc."""
    rng = np.random.default_rng(0)
    points = [_mk_point(rng, i, int(rng.integers(5, 40))) for i in range(10)]
    points[4] = _mk_point(rng, 4, 0)
    points.append(_mk_point(rng, 10, 0))  # trailing empty doc
    builder = IndexBuilder(CollectionSchema.standard(storage_dtype="float32", dim=DIM))
    builder.upload_batch(points)
    return RetrievalEngine(builder.seal(), compute_dtype="float32")


class TestEmptyDocs:
    def test_empty_docs_never_surface_in_single_full(self, empty_tail_engine):
        # an anti-correlated query makes every real doc score negative;
        # empty docs at 0.0 would then win — they must not appear at all
        rng = np.random.default_rng(3)
        q = rng.standard_normal((6, DIM)).astype(np.float32)
        res = empty_tail_engine.search_embedded(q, mode="single_full", top_k=11)
        ids = {r["id"] for r in res}
        assert "doc4" not in ids and "doc10" not in ids
        assert len(res) == 9  # every non-empty doc still surfaces

    def test_empty_docs_never_surface_in_batch_path(self, empty_tail_engine):
        rng = np.random.default_rng(4)
        qs = [rng.standard_normal((5, DIM)).astype(np.float32) for _ in range(3)]
        for res in empty_tail_engine.search_embedded_batch(
                qs, mode="single_full", top_k=11):
            ids = {r["id"] for r in res}
            assert "doc4" not in ids and "doc10" not in ids

    def test_two_stage_with_trailing_empty_doc(self, empty_tail_engine):
        # exercises the rerank gather with the last doc's aligned span == 0
        rng = np.random.default_rng(5)
        q = rng.standard_normal((6, DIM)).astype(np.float32)
        res = empty_tail_engine.search_embedded(
            q, mode="two_stage", top_k=11, prefetch_k=11)
        full = empty_tail_engine.search_embedded(q, mode="single_full", top_k=11)
        assert [r["id"] for r in res] == [r["id"] for r in full]


class TestFilterMaskCache:
    def test_signature_stable_and_order_insensitive(self):
        f1 = PayloadFilter(must=[("year", [2020, 2021])], ids=["a", "b"])
        f2 = PayloadFilter(must=[("year", [2021, 2020])], ids=["b", "a"])
        assert f1.signature() == f2.signature()
        f3 = PayloadFilter(must=[("year", [2020])])
        assert f1.signature() != f3.signature()

    def test_mask_evaluated_once_per_filter(self, empty_tail_engine, monkeypatch):
        engine = empty_tail_engine
        engine._mask_cache.clear()
        calls = {"n": 0}
        orig = PayloadFilter.evaluate

        def counting(self, manifest):
            calls["n"] += 1
            return orig(self, manifest)

        monkeypatch.setattr(PayloadFilter, "evaluate", counting)
        rng = np.random.default_rng(6)
        q = rng.standard_normal((4, DIM)).astype(np.float32)
        filt = build_filter(year=2020)
        for _ in range(3):
            engine.search_embedded(q, mode="single_tiles", top_k=3,
                                   filter_obj=filt)
        assert calls["n"] == 1
        # batch path shares the cache (adds only the f32 view, no re-eval)
        engine.search_embedded_batch([q], mode="single_tiles", top_k=3,
                                     filter_obj=filt)
        assert calls["n"] == 1

    def test_manifest_mutation_invalidates(self, empty_tail_engine, monkeypatch):
        engine = empty_tail_engine
        engine._mask_cache.clear()
        calls = {"n": 0}
        orig = PayloadFilter.evaluate

        def counting(self, manifest):
            calls["n"] += 1
            return orig(self, manifest)

        monkeypatch.setattr(PayloadFilter, "evaluate", counting)
        rng = np.random.default_rng(7)
        q = rng.standard_normal((4, DIM)).astype(np.float32)
        filt = build_filter(year=2021)
        engine.search_embedded(q, mode="single_tiles", top_k=3, filter_obj=filt)
        engine.index.manifest.version += 1  # simulates an append
        engine.search_embedded(q, mode="single_tiles", top_k=3, filter_obj=filt)
        assert calls["n"] == 2


class TestFp16WireClip:
    def test_out_of_range_query_stays_finite(self):
        from visual_rag_tpu.retrieval.batch import pad_queries_raw

        q = np.full((3, DIM), 1e6, dtype=np.float32)  # beyond fp16 max
        tokens, mask = pad_queries_raw([q], DIM, wire_dtype=np.float16)
        assert np.isfinite(np.asarray(tokens, dtype=np.float32)).all()

    def test_f32_wire_unchanged(self):
        from visual_rag_tpu.retrieval.batch import pad_queries_raw

        q = np.full((2, DIM), 1e6, dtype=np.float32)
        tokens, _ = pad_queries_raw([q], DIM, wire_dtype=np.float32)
        assert float(np.asarray(tokens).max()) == 1e6


class TestSealedPersistence:
    def test_meta_tmp_not_left_behind(self, tmp_path):
        from visual_rag_tpu.index.persist import load_sealed, save_sealed

        rng = np.random.default_rng(0)
        builder = IndexBuilder(
            CollectionSchema.standard(storage_dtype="float32", dim=DIM))
        builder.upload_batch(
            [_mk_point(rng, i, int(rng.integers(5, 20))) for i in range(5)])
        index = builder.seal()
        save_sealed(index, tmp_path)
        assert not (tmp_path / "sealed_meta.json.tmp").exists()
        assert not (tmp_path / "sealed.vrag.tmp").exists()
        revived = load_sealed(tmp_path)
        assert revived.manifest.ids == index.manifest.ids

    def test_offsets_beyond_int32_rejected(self, tmp_path):
        from visual_rag_tpu.index.persist import save_sealed

        rng = np.random.default_rng(1)
        builder = IndexBuilder(
            CollectionSchema.standard(storage_dtype="float32", dim=DIM))
        builder.upload_batch([_mk_point(rng, 0, 8)])
        index = builder.seal()
        index.stores["initial"].offsets = np.asarray([2**31 + 5], dtype=np.int64)
        with pytest.raises(ValueError, match="int32"):
            save_sealed(index, tmp_path)


class TestTokensVsGlobalSingleDispatch:
    def test_matches_per_token_sum(self, empty_tail_engine):
        import jax.numpy as jnp

        from visual_rag_tpu.retrieval.scoring import score_single

        engine = empty_tail_engine
        rng = np.random.default_rng(8)
        q = rng.standard_normal((5, DIM)).astype(np.float32)
        prep = engine._prep_query(q)
        fused = np.asarray(
            engine._score_store_tokens("global_pooling", prep["tokens"]))
        store = engine.index.store("global_pooling")
        loop = sum(
            np.asarray(score_single(store.values, prep["tokens"][i],
                                    store.scales, compute_dtype="float32"))
            for i in range(5)
        )
        np.testing.assert_allclose(fused, loop, rtol=1e-5, atol=1e-5)
