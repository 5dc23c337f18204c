"""Sharded engine (8-device virtual CPU mesh) vs single-device engine."""

import numpy as np
import pytest

from visual_rag_tpu.index import CollectionSchema, IndexBuilder
from visual_rag_tpu.parallel import ShardedEngine, ShardedIndex, make_mesh
from visual_rag_tpu.retrieval import RetrievalEngine, build_filter

DIM = 32


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(21)
    builder = IndexBuilder(CollectionSchema.standard(storage_dtype="float32", dim=DIM))
    for i in range(53):  # deliberately not divisible by 8 (tail-padded shards)
        builder.add(
            f"doc{i}",
            {
                "initial": rng.standard_normal(
                    (int(rng.integers(5, 40)), DIM)).astype(np.float32),
                "mean_pooling": rng.standard_normal(
                    (int(rng.integers(3, 9)), DIM)).astype(np.float32),
                "experimental_pooling": rng.standard_normal(
                    (int(rng.integers(3, 11)), DIM)).astype(np.float32),
                "global_pooling": rng.standard_normal((DIM,)).astype(np.float32),
            },
            {"year": 2020 + i % 3},
        )
    index = builder.seal()
    engine = RetrievalEngine(index, compute_dtype="float32")
    mesh = make_mesh((8,), ("data",))
    sengine = ShardedEngine(ShardedIndex.from_index(index, mesh), use_pallas=False)
    queries = [
        np.random.default_rng(200 + i).standard_normal((6 + i, DIM)).astype(np.float32)
        for i in range(4)
    ]
    return engine, sengine, queries


ALL_MODES = [
    "single_full", "single_tiles", "single_pooled", "single_global",
    "single_experimental_tokens", "single_experimental_pooled",
    "two_stage", "three_stage",
]


class TestShardedMatchesSingle:
    @pytest.mark.parametrize("mode", ALL_MODES)
    def test_modes(self, setup, mode):
        engine, sengine, queries = setup
        kwargs = dict(mode=mode, top_k=5)
        if mode == "two_stage":
            kwargs.update(prefetch_k=12, stage1_mode="tokens_vs_experimental_pooling")
        if mode == "three_stage":
            kwargs.update(stage1_k=20, stage2_k=9)
        sharded = sengine.search_embedded_batch(queries, **kwargs)
        reference = engine.search_embedded_batch(queries, **kwargs)
        for sr, rr in zip(sharded, reference):
            assert [r["id"] for r in sr] == [r["id"] for r in rr], mode
            np.testing.assert_allclose(
                [r["score_final"] for r in sr],
                [r["score_final"] for r in rr], rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("mode,kw", [
        ("single_full", {}),
        ("two_stage", dict(prefetch_k=12,
                           stage1_mode="tokens_vs_experimental_pooling")),
        ("three_stage", dict(stage1_k=20, stage2_k=9)),
    ], ids=["single_full", "two_stage", "three_stage"])
    def test_packed_wire_matches_single(self, setup, mode, kw):
        """Sharded PACKED wire (r4): ids must match the single-device engine
        exactly, like the padded wire does (the packed wire is transport +
        stage-1 M-packing only)."""
        engine, _sengine, queries = setup
        from visual_rag_tpu.parallel import ShardedIndex, make_mesh

        mesh = make_mesh((8,), ("data",))
        sp = ShardedEngine(
            ShardedIndex.from_index(engine.index, mesh),
            use_pallas=False, query_wire="packed")
        qs = queries * 8  # b=32: the packed group covers multiple queries
        sharded = sp.search_embedded_batch(qs, mode=mode, top_k=5,
                                           with_payload=False, **kw)
        reference = engine.search_embedded_batch(qs, mode=mode, top_k=5,
                                                 with_payload=False, **kw)
        for sr, rr in zip(sharded, reference):
            assert {h["id"] for h in sr} == {h["id"] for h in rr}
            np.testing.assert_allclose(
                sorted(h["score_final"] for h in sr),
                sorted(h["score_final"] for h in rr), atol=5e-5)

    def test_ragged_batch_sizes_bucket(self, setup):
        """Batch sizes not divisible by the pack group (33, 47, 65...) must
        work on the packed wire: the sharded engine buckets B exactly like
        RetrievalEngine (unbucketed b=33 crashed pack_queries_grouped with
        'batch 33 not divisible by group 32' — the serving batcher drains
        arbitrary batch sizes)."""
        engine, _sengine, queries = setup
        from visual_rag_tpu.parallel import ShardedIndex, make_mesh

        mesh = make_mesh((8,), ("data",))
        sp = ShardedEngine(
            ShardedIndex.from_index(engine.index, mesh),
            use_pallas=False, query_wire="packed")
        for b in (3, 33, 47):
            qs = (queries * ((b + 3) // 4))[:b]
            got = sp.search_embedded_batch(qs, mode="two_stage", top_k=5,
                                           prefetch_k=12, with_payload=False)
            ref = engine.search_embedded_batch(qs, mode="two_stage", top_k=5,
                                               prefetch_k=12,
                                               with_payload=False)
            assert len(got) == b
            for sr, rr in zip(got, ref):
                assert {h["id"] for h in sr} == {h["id"] for h in rr}
        # dense-array path slices the padding rows off too
        arr = sp.search_embedded_batch(qs, mode="two_stage", top_k=5,
                                       prefetch_k=12, with_payload=False,
                                       return_arrays=True)
        assert len(arr) == 47

    def test_packed_scan_rerank_matches(self, setup):
        """Packed wire + forced scan rerank on the 8-shard mesh: each shard
        scans its local store once and gathers merged candidates."""
        engine, _sengine, queries = setup
        from visual_rag_tpu.parallel import ShardedIndex, make_mesh

        mesh = make_mesh((8,), ("data",))
        sp = ShardedEngine(
            ShardedIndex.from_index(engine.index, mesh),
            use_pallas=False, query_wire="packed", rerank_impl="scan")
        qs = queries * 8
        sharded = sp.search_embedded_batch(qs, mode="two_stage", top_k=5,
                                           prefetch_k=12, with_payload=False)
        reference = engine.search_embedded_batch(qs, mode="two_stage", top_k=5,
                                                 prefetch_k=12,
                                                 with_payload=False)
        for sr, rr in zip(sharded, reference):
            assert {h["id"] for h in sr} == {h["id"] for h in rr}

    def test_three_stage_provenance(self, setup):
        engine, sengine, queries = setup
        sharded = sengine.search_embedded_batch(
            queries[:1], mode="three_stage", top_k=3, stage1_k=20, stage2_k=9)
        single = engine.search_embedded(
            queries[0], mode="three_stage", top_k=3, stage1_k=20, stage2_k=9)
        for sr, rr in zip(sharded[0], single):
            assert sr["score_stage1"] == pytest.approx(rr["score_stage1"], rel=1e-3, abs=1e-3)
            assert sr["score_stage2"] == pytest.approx(rr["score_stage2"], rel=1e-3, abs=1e-3)

    def test_filter(self, setup):
        engine, sengine, queries = setup
        f = build_filter(year=2022)
        sharded = sengine.search_embedded_batch(
            queries, mode="two_stage", top_k=5, prefetch_k=10, filter_obj=f)
        reference = engine.search_embedded_batch(
            queries, mode="two_stage", top_k=5, prefetch_k=10, filter_obj=f)
        for sr, rr in zip(sharded, reference):
            assert [r["id"] for r in sr] == [r["id"] for r in rr]
            for r in sr:
                assert r["payload"]["year"] == 2022

    def test_uneven_shards_no_phantom_docs(self, setup):
        _, sengine, queries = setup
        # 53 docs over 8 shards -> 3 padding slots; huge top_k must return 53
        res = sengine.search_embedded_batch([queries[0]], mode="single_global", top_k=100)
        assert len(res[0]) == 53
        assert len({r["id"] for r in res[0]}) == 53

    def test_empty_filter_match(self, setup):
        _, sengine, queries = setup
        res = sengine.search_embedded_batch(
            queries[:1], mode="two_stage", filter_obj=build_filter(year=1800))
        assert res == [[]]


def _build_index(storage_dtype):
    rng = np.random.default_rng(77)
    builder = IndexBuilder(CollectionSchema.standard(storage_dtype=storage_dtype, dim=DIM))
    for i in range(41):
        builder.add(
            f"doc{i}",
            {
                "initial": rng.standard_normal(
                    (int(rng.integers(5, 40)), DIM)).astype(np.float32),
                "mean_pooling": rng.standard_normal(
                    (int(rng.integers(3, 9)), DIM)).astype(np.float32),
                "experimental_pooling": rng.standard_normal(
                    (int(rng.integers(3, 11)), DIM)).astype(np.float32),
                "global_pooling": rng.standard_normal((DIM,)).astype(np.float32),
            },
            {"year": 2020 + i % 3},
        )
    return builder.seal()


class TestStorageDtypePreserved:
    """VERDICT r1 item 4: the sharded path must ship bf16/int8(+scales)
    shards, not f32 dequants — equal index memory vs single-device."""

    def test_int8_dtypes_and_nbytes(self):
        index = _build_index("int8")
        mesh = make_mesh((8,), ("data",))
        si = ShardedIndex.from_index(index, mesh)
        assert str(si.stores["initial"]["flat"].dtype) == "int8"
        assert "scales" in si.stores["initial"]
        assert str(si.stores["mean_pooling"]["vals_t"].dtype) == "int8"
        assert "scales_t" in si.stores["mean_pooling"]
        # device bytes comparable to the single-device int8 index (allowing
        # for shard tail padding + f32 masks), i.e. nowhere near 4x dequant
        f32_index = _build_index("float32")
        si_f32 = ShardedIndex.from_index(f32_index, mesh)
        assert si.nbytes() < 0.55 * si_f32.nbytes()

    def test_bf16_dtypes(self):
        index = _build_index("bfloat16")
        mesh = make_mesh((8,), ("data",))
        si = ShardedIndex.from_index(index, mesh)
        assert str(si.stores["initial"]["flat"].dtype) == "bfloat16"
        assert str(si.stores["mean_pooling"]["vals_t"].dtype) == "bfloat16"

    @pytest.mark.parametrize("storage_dtype", ["int8", "bfloat16"])
    def test_id_parity_vs_single_device(self, storage_dtype):
        """Sharded ids == single-device fused-batch ids at equal storage.

        The single-device fused plans and the shard bodies share the scoring
        functions, so with the same on-device dtypes the rankings must be
        identical (engine compute_dtype matched to the storage dtype)."""
        index = _build_index(storage_dtype)
        cd = "bfloat16" if storage_dtype in ("int8", "bfloat16") else "float32"
        engine = RetrievalEngine(index, compute_dtype=cd)
        mesh = make_mesh((8,), ("data",))
        sengine = ShardedEngine(ShardedIndex.from_index(index, mesh),
                                use_pallas=False)
        queries = [
            np.random.default_rng(300 + i).standard_normal((7, DIM)).astype(np.float32)
            for i in range(3)
        ]
        for mode, kwargs in [
            ("two_stage", dict(prefetch_k=12)),
            ("single_full", {}),
            ("three_stage", dict(stage1_k=20, stage2_k=9)),
        ]:
            sharded = sengine.search_embedded_batch(
                queries, mode=mode, top_k=5, **kwargs)
            reference = engine.search_embedded_batch(
                queries, mode=mode, top_k=5, **kwargs)
            for sr, rr in zip(sharded, reference):
                assert [r["id"] for r in sr] == [r["id"] for r in rr], (
                    storage_dtype, mode)


class TestThreeStageKClampSharded:
    def test_stage1_smaller_than_stage2_and_topk(self, setup):
        engine, sengine, queries = setup
        a = sengine.search_embedded_batch(
            queries[:1], mode="three_stage", stage1_k=5, stage2_k=40, top_k=20)
        b = engine.search_embedded_batch(
            queries[:1], mode="three_stage", stage1_k=5, stage2_k=40, top_k=20)
        assert [r["id"] for r in a[0]] == [r["id"] for r in b[0]]
        assert len(a[0]) == 5


class TestGatheredStage2Chunking:
    def test_chunked_gather_bit_exact(self, setup, monkeypatch):
        """The r5 query-chunked stage-2 candidate gather (HBM-transient cap)
        must be bit-exact vs the single-shot gather."""
        import jax.numpy as jnp

        from visual_rag_tpu.parallel import sharded as S

        rng = np.random.default_rng(11)
        p, d, dim, b, k, nq = 4, 30, 16, 8, 6, 5
        estore = {
            "vals_t": jnp.asarray(
                rng.standard_normal((p, d, dim)).astype(np.float32)),
            "mask_t": jnp.asarray(
                (rng.random((p, d)) > 0.2).astype(np.float32)),
        }
        tokens = jnp.asarray(rng.standard_normal((b, nq, dim)).astype(np.float32))
        qmask = jnp.asarray((rng.random((b, nq)) > 0.1).astype(np.float32))
        cand = rng.integers(-1, d, (b, k)).astype(np.int32)
        full = np.asarray(S._gathered_tokens_padded(estore, tokens, qmask, cand))
        monkeypatch.setattr(S, "GATHER_BUDGET_BYTES", 1)  # force max chunking
        chunked = np.asarray(S._gathered_tokens_padded(estore, tokens, qmask, cand))
        np.testing.assert_array_equal(full, chunked)
