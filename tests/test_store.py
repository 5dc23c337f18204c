"""Index store/builder/manifest: layouts, dtypes, persistence, idempotency."""

import numpy as np
import pytest

from visual_rag_tpu.index import CollectionSchema, IndexBuilder, Manifest
from visual_rag_tpu.index.builder import VectorSpec
from visual_rag_tpu.index.store import (
    PaddedMultiVectors,
    RaggedMultiVectors,
    SingleVectors,
    quantize_rows_int8,
)


def _make_point(rng, pid, n_tokens, payload=None):
    return {
        "id": pid,
        "vectors": {
            "initial": rng.standard_normal((n_tokens, 128)).astype(np.float32),
            "mean_pooling": rng.standard_normal((rng.integers(4, 33), 128)).astype(np.float32),
            "experimental_pooling": rng.standard_normal((rng.integers(4, 35), 128)).astype(
                np.float32
            ),
            "global_pooling": rng.standard_normal((128,)).astype(np.float32),
        },
        "payload": payload or {},
    }


class TestBuilderAndSeal:
    def test_build_seal_roundtrip(self, rng):
        schema = CollectionSchema.standard(storage_dtype="float32")
        builder = IndexBuilder(schema)
        pts = [_make_point(rng, f"p{i}", int(rng.integers(10, 200))) for i in range(7)]
        assert builder.upload_batch(pts) == 7
        # idempotent re-upload skipped
        assert builder.upload_batch(pts) == 0
        idx = builder.seal()
        assert idx.num_docs == 7
        assert set(idx.vector_names) == {
            "initial", "mean_pooling", "global_pooling", "experimental_pooling"}
        ragged = idx.store("initial")
        assert isinstance(ragged, RaggedMultiVectors)
        assert ragged.total_tokens == sum(p["vectors"]["initial"].shape[0] for p in pts)
        padded = idx.store("mean_pooling")
        assert isinstance(padded, PaddedMultiVectors)
        assert padded.num_docs == 7
        single = idx.store("global_pooling")
        assert isinstance(single, SingleVectors)
        info = idx.info()
        assert info["points_count"] == 7
        assert info["vectors"]["initial"]["kind"] == "multi_ragged"

    def test_vectors_are_normalized_at_seal(self, rng):
        schema = CollectionSchema.standard(storage_dtype="float32")
        builder = IndexBuilder(schema)
        builder.upload_batch([_make_point(rng, "p0", 20)])
        idx = builder.seal()
        flat = np.asarray(idx.store("initial").flat)
        np.testing.assert_allclose(np.linalg.norm(flat[:20], axis=1), 1.0, atol=1e-5)
        g = np.asarray(idx.store("global_pooling").values)
        np.testing.assert_allclose(np.linalg.norm(g, axis=1), 1.0, atol=1e-5)

    def test_missing_vector_raises(self, rng):
        builder = IndexBuilder(CollectionSchema.standard())
        p = _make_point(rng, "p0", 10)
        del p["vectors"]["mean_pooling"]
        with pytest.raises(ValueError, match="missing named vectors"):
            builder.add(p["id"], p["vectors"], p["payload"])

    def test_wrong_dim_raises(self, rng):
        builder = IndexBuilder(CollectionSchema.standard())
        p = _make_point(rng, "p0", 10)
        p["vectors"]["initial"] = rng.standard_normal((10, 64)).astype(np.float32)
        with pytest.raises(ValueError, match="expected"):
            builder.add(p["id"], p["vectors"], p["payload"])

    def test_save_load_roundtrip(self, rng, tmp_path):
        schema = CollectionSchema.standard(storage_dtype="float32")
        builder = IndexBuilder(schema)
        pts = [_make_point(rng, f"p{i}", 30, {"year": 2020 + i}) for i in range(3)]
        builder.upload_batch(pts)
        builder.save(tmp_path / "coll")
        loaded = IndexBuilder.load(tmp_path / "coll")
        assert len(loaded) == 3
        assert loaded.manifest.payload(1)["year"] == 2021
        # resume: skip existing, append new
        assert loaded.upload_batch(pts) == 0
        loaded.add("p_new", pts[0]["vectors"], {})
        idx = loaded.seal()
        assert idx.num_docs == 4
        sa = builder.seal().store("initial")
        sb = idx.store("initial")
        # per-doc token blocks identical (tail padding/alignment gaps excluded)
        for d in range(3):
            off_a, ln = int(np.asarray(sa.offsets)[d]), int(np.asarray(sa.lengths)[d])
            off_b = int(np.asarray(sb.offsets)[d])
            np.testing.assert_allclose(
                np.asarray(sa.flat)[off_a : off_a + ln],
                np.asarray(sb.flat)[off_b : off_b + ln], atol=1e-6)

    def test_max_rows_cap(self, rng):
        schema = CollectionSchema(
            vectors={
                "initial": VectorSpec("initial", "ragged"),
                "mean_pooling": VectorSpec("mean_pooling", "padded", max_rows=8),
                "global_pooling": VectorSpec("global_pooling", "single"),
                "experimental_pooling": VectorSpec("experimental_pooling", "padded"),
            },
            storage_dtype="float32",
        )
        builder = IndexBuilder(schema)
        builder.upload_batch([_make_point(rng, "p0", 50)])
        idx = builder.seal()
        assert idx.store("mean_pooling").max_rows == 8


class TestQuantization:
    def test_int8_roundtrip_error_small(self, rng):
        x = rng.standard_normal((40, 128)).astype(np.float32)
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        q, s = quantize_rows_int8(x)
        assert q.dtype == np.int8
        recon = q.astype(np.float32) * s[:, None]
        assert np.abs(recon - x).max() < 1.0 / 127

    def test_int8_store(self, rng):
        schema = CollectionSchema.standard(storage_dtype="int8")
        builder = IndexBuilder(schema)
        builder.upload_batch([_make_point(rng, f"p{i}", 20) for i in range(3)])
        idx = builder.seal()
        assert idx.store("initial").scales is not None
        assert str(idx.store("initial").flat.dtype) == "int8"
        deq = np.asarray(idx.store("mean_pooling").dequantized("float32"))
        norms = np.linalg.norm(
            deq[np.asarray(idx.store("mean_pooling").mask)], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=0.02)


class TestManifest:
    def test_lookup_and_masks(self):
        m = Manifest()
        m.add("a", {"filename": "x.pdf"})
        m.add("b", {"filename": "y.pdf"})
        assert m.index_of("b") == 1
        assert m.index_of("zz") is None
        assert m.existing_ids("x.pdf") == ["a"]
        np.testing.assert_array_equal(m.id_mask(["b", "zz"]), [False, True])
        with pytest.raises(ValueError):
            m.add("a", {})


class TestSealedPersistence:
    """Storage-dtype-native sealed-index save/load (no re-seal on restart)."""

    @pytest.mark.parametrize("storage_dtype", ["float32", "bfloat16", "int8"])
    def test_roundtrip_identical_results(self, storage_dtype, tmp_path):
        import numpy as np

        from visual_rag_tpu.index import (
            CollectionSchema,
            IndexBuilder,
            load_sealed,
            save_sealed,
        )
        from visual_rag_tpu.retrieval import RetrievalEngine

        rng = np.random.default_rng(31)
        b = IndexBuilder(CollectionSchema.standard(
            storage_dtype=storage_dtype, dim=32))
        for i in range(25):
            t = rng.standard_normal((int(rng.integers(5, 30)), 32)).astype(np.float32)
            b.add(f"d{i}", {"initial": t, "mean_pooling": t[:4],
                            "experimental_pooling": t[:4],
                            "global_pooling": t.mean(axis=0)},
                  {"year": 2020 + i % 2})
        index = b.seal()
        save_sealed(index, tmp_path)
        back = load_sealed(tmp_path, verify=True)
        assert back.num_docs == index.num_docs
        assert back.storage_dtype == storage_dtype
        st = back.stores["initial"]
        assert str(st.flat.dtype) == (
            "int8" if storage_dtype == "int8" else storage_dtype)
        q = rng.standard_normal((7, 32)).astype(np.float32)
        e1 = RetrievalEngine(index, compute_dtype="float32")
        e2 = RetrievalEngine(back, compute_dtype="float32")
        for mode, kw in [("single_full", {}), ("two_stage", dict(prefetch_k=10)),
                         ("three_stage", dict(stage1_k=15, stage2_k=8))]:
            a = e1.search_embedded(q, mode=mode, top_k=5, **kw)
            c = e2.search_embedded(q, mode=mode, top_k=5, **kw)
            assert [r["id"] for r in a] == [r["id"] for r in c], mode
            for ra, rc in zip(a, c):
                assert ra["score_final"] == pytest.approx(rc["score_final"], abs=1e-6)
        # filters survive through the manifest
        from visual_rag_tpu.retrieval import build_filter

        res = e2.search_embedded(q, mode="two_stage", top_k=20,
                                 filter_obj=build_filter(year=2021))
        assert res and all(r["payload"]["year"] == 2021 for r in res)

    def test_on_disk_bytes_match_storage_dtype(self, tmp_path):
        import numpy as np

        from visual_rag_tpu.index import (
            CollectionSchema,
            IndexBuilder,
            save_sealed,
        )

        rng = np.random.default_rng(5)

        def build(sd):
            b = IndexBuilder(CollectionSchema.standard(storage_dtype=sd, dim=64))
            for i in range(40):
                t = rng.standard_normal((64, 64)).astype(np.float32)
                b.add(f"d{i}", {"initial": t, "mean_pooling": t[:4],
                                "experimental_pooling": t[:4],
                                "global_pooling": t.mean(axis=0)}, {})
            return b.seal()

        sizes = {}
        for sd in ("float32", "bfloat16", "int8"):
            d = tmp_path / sd
            save_sealed(build(sd), d)
            sizes[sd] = (d / "sealed.vrag").stat().st_size
        assert sizes["bfloat16"] < 0.6 * sizes["float32"]
        assert sizes["int8"] < 0.65 * sizes["bfloat16"]
