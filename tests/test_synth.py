"""On-device synthetic corpus factory (index/synth.py)."""

import numpy as np
import pytest

from visual_rag_tpu.index.synth import (
    planted_queries,
    synthetic_index,
    synthetic_planted_index,
)
from visual_rag_tpu.retrieval import RetrievalEngine, build_filter


@pytest.mark.parametrize("storage_dtype",
                         ["bfloat16", "int8", "float32", "int8_refined"])
def test_layout_bitcompatible_with_engine(storage_dtype):
    idx = synthetic_index(300, min_tokens=40, max_tokens=90, pooled_rows=6,
                          storage_dtype=storage_dtype, payload_years=3,
                          chunk_rows=7000)  # force multi-chunk fill
    e = RetrievalEngine(idx, compute_dtype="float32")
    q = [np.random.default_rng(1).standard_normal((10, 128)).astype(np.float32)]
    full = [r["id"] for r in e.search_embedded_batch(q, mode="single_full", top_k=10)[0]]
    ts = [r["id"] for r in e.search_embedded_batch(
        q, mode="two_stage", top_k=10, prefetch_k=300)[0]]
    assert full == ts  # two_stage(prefetch >= corpus) oracle
    st = idx.stores["initial"]
    assert str(st.flat.dtype) == ("int8" if storage_dtype.startswith("int8")
                                  else storage_dtype)
    if storage_dtype == "int8_refined":
        assert st.res4 is not None and st.res_scales is not None
        assert st.res4.shape == (st.flat.shape[0], 64)
    # aligned offsets (Pallas DMA contract)
    offs = np.asarray(st.offsets)
    assert (offs % 32 == 0).all()
    # chunked fill is seamless: every doc's rows are unit-normalized
    lens = np.asarray(st.lengths)
    flat = st.dequantized_flat()
    for i in (0, 150, 299):
        rows = flat[offs[i] : offs[i] + lens[i]]
        norms = np.linalg.norm(rows, axis=1)
        np.testing.assert_allclose(
            norms, 1.0, atol=0.2 if storage_dtype == "int8" else 2e-2)


def test_payload_filter_columns():
    idx = synthetic_index(200, min_tokens=16, max_tokens=32, pooled_rows=4,
                          payload_years=4)
    e = RetrievalEngine(idx, compute_dtype="float32")
    q = [np.random.default_rng(2).standard_normal((6, 128)).astype(np.float32)]
    res = e.search_embedded_batch(q, mode="two_stage", top_k=50,
                                  prefetch_k=200,
                                  filter_obj=build_filter(year=2019))[0]
    assert res and all(r["payload"]["year"] == 2019 for r in res)


class TestPlanted:
    """Planted-relevance synth (VERDICT r4 #5: at-scale dtype quality)."""

    def test_relevance_is_planted_and_twins_share_vectors(self):
        from visual_rag_tpu.utils.metrics import ndcg_at_k

        idx, lat = synthetic_planted_index(
            400, clusters=20, min_tokens=24, max_tokens=48, pooled_rows=4,
            storage_dtype="float32", seed=11, chunk_rows=5000)
        queries, qrels = planted_queries(lat, 24, seed=12)
        e = RetrievalEngine(idx, compute_dtype="float32")
        res = e.search_embedded_batch(queries, mode="two_stage", top_k=5,
                                      prefetch_k=100)
        ndcgs = [ndcg_at_k([h["id"] for h in r], qrels[f"q{j}"], 5)
                 for j, r in enumerate(res)]
        # the target doc must dominate: planted relevance is discriminative
        assert np.mean(ndcgs) > 0.9

        # dtype-twin contract: same seed+latents, different storage dtype ->
        # SAME underlying vectors (int8 dequantizes to ~the f32 rows)
        idx8, _ = synthetic_planted_index(
            400, clusters=20, min_tokens=24, max_tokens=48, pooled_rows=4,
            storage_dtype="int8", seed=11, chunk_rows=5000, latents=lat)
        st, st8 = idx.stores["initial"], idx8.stores["initial"]
        f32 = np.asarray(st.dequantized_flat())
        d8 = np.asarray(st8.dequantized_flat())
        offs, lens = np.asarray(st.offsets), np.asarray(st.lengths)
        for i in (0, 99, 399):  # real rows only (tail pad carries no doc scale)
            a, b = f32[offs[i]:offs[i] + lens[i]], d8[offs[i]:offs[i] + lens[i]]
            assert np.abs(a - b).max() <= 0.5 / 127 + 1e-6

    def test_cluster_mates_are_near_ties(self):
        # docs in one cluster must score close to the target (the regime
        # where quantization noise can reorder) but below it
        idx, lat = synthetic_planted_index(
            200, clusters=10, min_tokens=24, max_tokens=40, pooled_rows=4,
            storage_dtype="float32", seed=5, chunk_rows=4000)
        queries, qrels = planted_queries(lat, 8, seed=6)
        e = RetrievalEngine(idx, compute_dtype="float32")
        res = e.search_embedded_batch(queries, mode="single_full", top_k=20)
        n_mates = []
        for j, r in enumerate(res):
            target = next(iter(qrels[f"q{j}"]))
            cluster = int(target[1:]) % 10
            n_mates.append(
                sum(1 for h in r if int(h["id"][1:]) % 10 == cluster))
        # same-cluster docs crowd the top-20 on average (vs 2 by chance)
        assert np.mean(n_mates) >= 4

    def test_refined_sidecar_layout(self):
        idx, _ = synthetic_planted_index(
            120, clusters=6, min_tokens=16, max_tokens=32, pooled_rows=4,
            storage_dtype="int8_refined", seed=3, chunk_rows=2000)
        st = idx.stores["initial"]
        assert st.res4 is not None and st.res4.shape[1] == 64
        e = RetrievalEngine(idx, compute_dtype="float32")
        q = [np.random.default_rng(0).standard_normal((8, 128))
             .astype(np.float32)]
        assert e.search_embedded_batch(q, mode="single_full", top_k=5)[0]


def test_sharded_from_synth():
    from visual_rag_tpu.parallel import ShardedEngine, ShardedIndex, make_mesh

    idx = synthetic_index(101, min_tokens=16, max_tokens=48, pooled_rows=4)
    mesh = make_mesh((8,), ("data",))
    se = ShardedEngine(ShardedIndex.from_index(idx, mesh), use_pallas=False)
    e = RetrievalEngine(idx)
    q = [np.random.default_rng(3).standard_normal((8, 128)).astype(np.float32)]
    a = [r["id"] for r in se.search_embedded_batch(q, mode="two_stage",
                                                   top_k=5, prefetch_k=20)[0]]
    b = [r["id"] for r in e.search_embedded_batch(q, mode="two_stage",
                                                  top_k=5, prefetch_k=20)[0]]
    assert a == b
