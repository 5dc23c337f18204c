"""On-device synthetic corpus factory (index/synth.py)."""

import numpy as np
import pytest

from visual_rag_tpu.index.synth import synthetic_index
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
