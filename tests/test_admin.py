"""Collection admin: residency toggles, dtype migration, payload indexes."""

import numpy as np
import pytest

from visual_rag_tpu.index import CollectionSchema, IndexBuilder
from visual_rag_tpu.index.admin import (
    convert_storage_dtype,
    ensure_collection_all_on_host,
    get_collection_info,
    modify_vector_residency,
    vector_residency,
)
from visual_rag_tpu.retrieval import RetrievalEngine


@pytest.fixture(scope="module")
def index():
    rng = np.random.default_rng(0)
    b = IndexBuilder(CollectionSchema.standard(storage_dtype="float32", dim=32))
    for i in range(9):
        b.add(f"d{i}", {
            "initial": rng.standard_normal((int(rng.integers(5, 30)), 32)).astype(np.float32),
            "mean_pooling": rng.standard_normal((4, 32)).astype(np.float32),
            "experimental_pooling": rng.standard_normal((6, 32)).astype(np.float32),
            "global_pooling": rng.standard_normal((32,)).astype(np.float32),
        }, {"year": 2020 + i % 2, "source": f"s{i % 3}"})
    return b.seal()


class TestResidency:
    def test_toggle_roundtrip_preserves_results(self, index):
        rng = np.random.default_rng(1)
        q = rng.standard_normal((4, 32)).astype(np.float32)
        before = RetrievalEngine(index, compute_dtype="float32").search_embedded(
            q, mode="two_stage", top_k=3)
        moved = modify_vector_residency(index, "initial", "host")
        assert vector_residency(moved.store("initial")) == "host"
        back = modify_vector_residency(moved, "initial", "device")
        after = RetrievalEngine(back, compute_dtype="float32").search_embedded(
            q, mode="two_stage", top_k=3)
        assert [r["id"] for r in before] == [r["id"] for r in after]

    def test_all_on_host(self, index):
        hosted = ensure_collection_all_on_host(index)
        for name in hosted.vector_names:
            assert vector_residency(hosted.store(name)) == "host"

    def test_info_includes_residency(self, index):
        info = get_collection_info(index)
        for name in index.vector_names:
            assert info["vectors"][name]["residency"] in ("host", "device")

    def test_bad_residency_raises(self, index):
        with pytest.raises(ValueError):
            modify_vector_residency(index, "initial", "tape")


class TestDtypeMigration:
    @pytest.mark.parametrize(
        "dtype", ["bfloat16", "float16", "int8", "int8_refined"])
    def test_convert_preserves_ranking(self, index, dtype):
        rng = np.random.default_rng(2)
        q = rng.standard_normal((4, 32)).astype(np.float32)
        base = RetrievalEngine(index, compute_dtype="float32").search_embedded(
            q, mode="single_global", top_k=3)
        conv = convert_storage_dtype(index, dtype)
        assert conv.storage_dtype == dtype
        res = RetrievalEngine(conv, compute_dtype="float32").search_embedded(
            q, mode="single_global", top_k=3)
        assert res[0]["id"] == base[0]["id"]
        if dtype == "int8":
            assert conv.store("initial").scales is not None
        if dtype == "int8_refined":  # int4 sidecar rebuilt on the ragged store
            assert conv.store("initial").res4 is not None

    def test_int8_roundtrip_to_f32(self, index):
        conv = convert_storage_dtype(convert_storage_dtype(index, "int8"), "float32")
        a = np.asarray(index.store("global_pooling").values)
        b = np.asarray(conv.store("global_pooling").values)
        assert np.abs(a - b).max() < 0.02  # one int8 quantization round


class TestPayloadIndexes:
    def test_interned_columns(self, index):
        codes, vocab = index.manifest.payload_index("source")
        assert len(vocab) == 3
        assert codes.shape == (9,)
        # codes decode back to the payload values
        inv = {v: k for k, v in vocab.items()}
        for i, c in enumerate(codes):
            assert inv[int(c)] == index.manifest.payload(i)["source"]

    def test_missing_field_codes(self, index):
        codes, vocab = index.manifest.payload_index("nonexistent")
        assert (codes == index.manifest.MISSING_CODE).all()
        assert vocab == {}
