"""Native host runtime (C++ via ctypes) vs numpy fallbacks."""

import numpy as np
import pytest

from visual_rag_tpu import native


class TestPackAligned:
    def test_alignment_and_normalization(self, rng):
        lens = rng.integers(1, 70, 20).astype(np.int32)
        src = rng.standard_normal((int(lens.sum()), 64)).astype(np.float32)
        flat, offs = native.pack_aligned(src, lens, align=32, tail_pad_rows=70)
        assert (offs % 32 == 0).all()
        pos = 0
        for i, ln in enumerate(lens):
            block = flat[offs[i] : offs[i] + ln]
            expected = src[pos : pos + ln]
            expected = expected / np.linalg.norm(expected, axis=1, keepdims=True)
            np.testing.assert_allclose(block, expected, rtol=1e-5, atol=1e-6)
            pos += ln
        # gaps are zeros
        if len(lens) > 1 and lens[0] % 32 != 0:
            assert np.abs(flat[lens[0] : offs[1]]).max() == 0.0

    def test_no_normalize(self, rng):
        lens = np.array([3], np.int32)
        src = rng.standard_normal((3, 8)).astype(np.float32)
        flat, offs = native.pack_aligned(src, lens, align=8, normalize=False)
        np.testing.assert_allclose(flat[:3], src, atol=1e-7)

    def test_empty(self):
        flat, offs = native.pack_aligned(
            np.zeros((0, 16), np.float32), np.zeros((0,), np.int32), tail_pad_rows=4)
        assert flat.shape[0] >= 1 and offs.shape == (0,)


class TestQuantize:
    def test_roundtrip_error_bound(self, rng):
        x = rng.standard_normal((37, 128)).astype(np.float32)
        q, s = native.quantize_int8(x)
        assert q.dtype == np.int8 and s.shape == (37,)
        recon = q.astype(np.float32) * s[:, None]
        # max error <= half a quantization step per row
        assert (np.abs(recon - x).max(axis=1) <= s * 0.5 + 1e-6).all()

    def test_zero_row(self):
        x = np.zeros((2, 8), np.float32)
        q, s = native.quantize_int8(x)
        assert (q == 0).all() and (s == 1.0).all()


class TestVragFormat:
    def test_roundtrip_all_dtypes(self, rng, tmp_path):
        path = tmp_path / "c.vrag"
        arrays = {
            "f32": rng.standard_normal((5, 8)).astype(np.float32),
            "f16": rng.standard_normal((3, 4)).astype(np.float16),
            "i8": rng.integers(-100, 100, (6, 2)).astype(np.int8),
            "i64": rng.integers(0, 1000, (7,)).astype(np.int64),
            "blob": np.frombuffer(b"payload bytes", dtype=np.uint8),
        }
        w = native.VragWriter(path)
        for k, v in arrays.items():
            w.add(k, v)
        w.close()
        back = native.read_store(path, verify=True)
        assert sorted(back) == sorted(arrays)
        for k in arrays:
            np.testing.assert_array_equal(back[k], arrays[k])

    def test_corruption_detected(self, rng, tmp_path):
        path = tmp_path / "c.vrag"
        w = native.VragWriter(path)
        w.add("x", rng.standard_normal((100, 8)).astype(np.float32))
        w.close()
        raw = bytearray(path.read_bytes())
        raw[-5] ^= 0xFF  # flip a data byte
        path.write_bytes(bytes(raw))
        with pytest.raises(ValueError, match="crc mismatch"):
            native.read_store(path, verify=True)

    def test_not_a_store(self, tmp_path):
        p = tmp_path / "x.vrag"
        p.write_bytes(b"definitely not vrag data")
        with pytest.raises(ValueError, match="not a VRAG1"):
            native.read_store(p)

    def test_bf16_roundtrip(self, rng, tmp_path):
        """bf16 arrays store as raw u16 (dtype code 2) and survive a
        roundtrip bitwise (ADVICE r1: the dtype check was inert)."""
        import ml_dtypes

        path = tmp_path / "b.vrag"
        arr = rng.standard_normal((9, 4)).astype(ml_dtypes.bfloat16)
        w = native.VragWriter(path)
        w.add("bf16", arr)
        w.close()
        back = native.read_store(path, verify=True)
        np.testing.assert_array_equal(
            back["bf16"].view(ml_dtypes.bfloat16), arr)

    def test_corrupt_header_rejected(self, rng, tmp_path):
        """A crafted ndim>8 header must fail cleanly, not overflow the
        caller's 8-slot shape rows (ADVICE r1 on vrs_read_toc)."""
        path = tmp_path / "c.vrag"
        w = native.VragWriter(path)
        w.add("x", rng.standard_normal((4, 2)).astype(np.float32))
        w.close()
        raw = bytearray(path.read_bytes())
        # section header: [u16 namelen]["x"][u8 dtype][u8 ndim]...
        ndim_pos = 16 + 2 + 1 + 1
        assert raw[ndim_pos] == 2
        raw[ndim_pos] = 200  # crafted ndim
        path.write_bytes(bytes(raw))
        with pytest.raises(ValueError):
            native.read_store(path, verify=True)

    def test_truncated_header_rejected(self, rng, tmp_path):
        path = tmp_path / "t.vrag"
        w = native.VragWriter(path)
        w.add("x", rng.standard_normal((64, 16)).astype(np.float32))
        w.close()
        raw = path.read_bytes()[:24]  # cut mid-header, keep section count
        path.write_bytes(raw)
        with pytest.raises(ValueError):
            native.read_store(path, verify=True)


class TestFilters:
    def test_eq_and_in_and_chaining(self):
        col_a = np.array([1, 2, 1, 3, 1, 2], np.int32)
        col_b = np.array([7, 7, 8, 8, 7, 9], np.int32)
        mask = native.filter_eq(col_a, 1)
        assert mask.tolist() == [1, 0, 1, 0, 1, 0]
        mask = native.filter_eq(col_b, 7, mask)  # AND chaining
        assert mask.tolist() == [1, 0, 0, 0, 1, 0]
        assert native.filter_in(col_a, [2, 3]).tolist() == [0, 1, 0, 1, 0, 1]


class TestDurability:
    def test_load_then_resave_roundtrip(self, rng, tmp_path):
        # regression: save() used to truncate the mmap the loaded views read
        # from, crashing mid-save and destroying the collection
        from visual_rag_tpu.index import CollectionSchema, IndexBuilder

        b = IndexBuilder(CollectionSchema.standard(storage_dtype="float32", dim=16))
        for i in range(4):
            b.add(f"d{i}", {
                "initial": rng.standard_normal((7, 16)).astype(np.float32),
                "mean_pooling": rng.standard_normal((3, 16)).astype(np.float32),
                "experimental_pooling": rng.standard_normal((4, 16)).astype(np.float32),
                "global_pooling": rng.standard_normal((16,)).astype(np.float32)})
        d = tmp_path / "coll"
        b.save(d)
        loaded = IndexBuilder.load(d)
        loaded.add("d_new", {
            "initial": rng.standard_normal((5, 16)).astype(np.float32),
            "mean_pooling": rng.standard_normal((3, 16)).astype(np.float32),
            "experimental_pooling": rng.standard_normal((4, 16)).astype(np.float32),
            "global_pooling": rng.standard_normal((16,)).astype(np.float32)})
        loaded.save(d)  # resave over the file we just loaded from
        again = IndexBuilder.load(d)
        assert len(again) == 5
        assert (d / "collection.vrag").stat().st_size > 16

    def test_empty_file_clear_error(self, tmp_path):
        p = tmp_path / "c.vrag"
        p.write_bytes(b"")
        with pytest.raises(ValueError, match="empty or truncated"):
            native.read_store(p)


class TestBf16Convert:
    def test_native_matches_ml_dtypes_bitwise(self):
        import ml_dtypes

        from visual_rag_tpu import native

        rng = np.random.default_rng(0)
        specials = np.array([0.0, -0.0, 1e-40, np.inf, -np.inf, np.nan],
                            np.float32)
        snan = np.array([0x7F800001, 0xFF800001], np.uint32).view(np.float32)
        x = np.concatenate([
            rng.standard_normal(4096).astype(np.float32), specials, snan,
        ]).reshape(-1, 1)
        a = native.f32_to_bf16(x)
        b = x.astype(ml_dtypes.bfloat16)
        assert np.array_equal(a.view(np.uint16), b.view(np.uint16))

    def test_empty(self):
        from visual_rag_tpu import native

        out = native.f32_to_bf16(np.zeros((0, 8), np.float32))
        assert out.shape == (0, 8)
