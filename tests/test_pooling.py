"""Pooling kernel contracts — ported behavioral specs from the reference tests
(reference: tests/test_pooling.py) plus parity checks against straightforward
numpy re-derivations of each contract."""

import numpy as np
import pytest

from visual_rag_tpu.ops import (
    adaptive_row_mean_pooling_from_grid,
    colpali_experimental_pooling_from_rows,
    colpali_row_mean_pooling,
    colsmol_experimental_pooling,
    colsmol_tile_4n_pooling_from_tiles,
    global_mean_pooling,
    sequence_chunk_mean_pooling,
    tile_level_mean_pooling,
    weighted_row_smoothing_same_length,
)


class TestTileLevelPooling:
    def test_basic_pooling(self, rng):
        num_tiles, ppt, dim = 13, 64, 128
        emb = rng.standard_normal((num_tiles * ppt, dim)).astype(np.float32)
        pooled = np.asarray(tile_level_mean_pooling(emb, num_tiles, ppt))
        assert pooled.shape == (num_tiles, dim)
        assert pooled.dtype == np.float32

    def test_pooling_is_tile_mean(self, rng):
        emb = rng.standard_normal((5 * 64, 128)).astype(np.float32)
        pooled = np.asarray(tile_level_mean_pooling(emb, 5, 64))
        for t in range(5):
            np.testing.assert_allclose(
                pooled[t], emb[t * 64 : (t + 1) * 64].mean(axis=0), rtol=1e-5, atol=1e-5
            )

    def test_partial_last_tile(self, rng):
        # 800 tokens / 64 per tile = 12.5 -> 13 tiles, last has 32 patches
        emb = rng.standard_normal((800, 128)).astype(np.float32)
        pooled = np.asarray(tile_level_mean_pooling(emb, 13, 64))
        assert pooled.shape == (13, 128)
        np.testing.assert_allclose(pooled[-1], emb[768:].mean(axis=0), rtol=1e-5, atol=1e-5)

    def test_tile_count_mismatch_recomputed(self, rng):
        # Declared tiles disagree with token count -> recomputed as ceil.
        emb = rng.standard_normal((640, 128)).astype(np.float32)
        pooled = np.asarray(tile_level_mean_pooling(emb, 99, 64))
        assert pooled.shape == (10, 128)

    def test_fp16_dtype_inference(self, rng):
        emb = rng.standard_normal((128, 128)).astype(np.float16)
        pooled = np.asarray(tile_level_mean_pooling(emb, 2, 64))
        assert pooled.dtype == np.float16


class TestColPaliRowMeanPooling:
    def test_square_grid(self, rng):
        emb = rng.standard_normal((32 * 32, 128)).astype(np.float32)
        pooled = np.asarray(colpali_row_mean_pooling(emb, 32))
        assert pooled.shape == (32, 128)
        np.testing.assert_allclose(
            pooled, emb.reshape(32, 32, 128).mean(axis=1), rtol=1e-5, atol=1e-5
        )

    def test_wrong_token_count_raises(self, rng):
        with pytest.raises(ValueError):
            colpali_row_mean_pooling(rng.standard_normal((100, 128)).astype(np.float32), 32)


class TestAdaptiveRowPooling:
    @staticmethod
    def _ref_bins(rows, target):
        h, dim = rows.shape
        edges = np.linspace(0, h, target + 1)
        out = np.zeros((target, dim), dtype=np.float32)
        for i in range(target):
            s = max(0, min(int(np.floor(edges[i])), h - 1))
            e = max(s + 1, min(int(np.ceil(edges[i + 1])), h))
            out[i] = rows[s:e].mean(axis=0)
        return out

    @pytest.mark.parametrize("h,w,target", [(40, 30, 32), (17, 9, 32), (64, 48, 16), (8, 8, 32)])
    def test_matches_reference_bins(self, rng, h, w, target):
        emb = rng.standard_normal((h * w, 128)).astype(np.float32)
        pooled = np.asarray(adaptive_row_mean_pooling_from_grid(
            emb, grid_h=h, grid_w=w, target_rows=target))
        rows = emb.reshape(h, w, 128).mean(axis=1)
        if h == target:
            expected = rows
        else:
            expected = self._ref_bins(rows, target)
        assert pooled.shape == (target, 128)
        np.testing.assert_allclose(pooled, expected, rtol=1e-4, atol=1e-5)

    def test_h_equals_one_repeats(self, rng):
        emb = rng.standard_normal((7, 128)).astype(np.float32)
        pooled = np.asarray(adaptive_row_mean_pooling_from_grid(
            emb, grid_h=1, grid_w=7, target_rows=4))
        assert pooled.shape == (4, 128)
        row = emb.mean(axis=0)
        for i in range(4):
            np.testing.assert_allclose(pooled[i], row, rtol=1e-5, atol=1e-5)

    def test_invalid_target_raises(self, rng):
        with pytest.raises(ValueError):
            adaptive_row_mean_pooling_from_grid(
                rng.standard_normal((4, 128)).astype(np.float32),
                grid_h=2, grid_w=2, target_rows=0)


class TestGlobalPooling:
    def test_global_mean(self, rng):
        emb = rng.standard_normal((832, 128)).astype(np.float32)
        pooled = np.asarray(global_mean_pooling(emb))
        assert pooled.shape == (128,)
        np.testing.assert_allclose(pooled, emb.mean(axis=0), rtol=1e-5, atol=1e-5)


class TestColPaliExperimentalPooling:
    def test_output_shape_n_plus_2(self, rng):
        for n in [4, 10, 32, 64]:
            rows = rng.standard_normal((n, 128)).astype(np.float32)
            pooled = np.asarray(colpali_experimental_pooling_from_rows(rows))
            assert pooled.shape == (n + 2, 128)

    def test_position_semantics(self, rng):
        rows = rng.standard_normal((10, 128)).astype(np.float32)
        pooled = np.asarray(colpali_experimental_pooling_from_rows(rows))
        np.testing.assert_allclose(pooled[0], rows[0], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(pooled[1], rows[:2].mean(axis=0), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(pooled[2], rows[:3].mean(axis=0), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(pooled[5], rows[3:6].mean(axis=0), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(pooled[-2], rows[-2:].mean(axis=0), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(pooled[-1], rows[-1], rtol=1e-5, atol=1e-5)

    def test_edge_cases(self, rng):
        assert np.asarray(colpali_experimental_pooling_from_rows(
            rng.standard_normal((1, 128)).astype(np.float32))).shape == (1, 128)
        rows2 = rng.standard_normal((2, 128)).astype(np.float32)
        pooled2 = np.asarray(colpali_experimental_pooling_from_rows(rows2))
        assert pooled2.shape == (3, 128)
        np.testing.assert_allclose(pooled2[1], rows2.mean(axis=0), rtol=1e-5, atol=1e-5)
        assert np.asarray(colpali_experimental_pooling_from_rows(
            rng.standard_normal((3, 128)).astype(np.float32))).shape == (5, 128)

    def test_window5(self, rng):
        rows = rng.standard_normal((10, 128)).astype(np.float32)
        pooled = np.asarray(colpali_experimental_pooling_from_rows(rows, window_size=5))
        assert pooled.shape == (14, 128)
        # i=0 -> center=-2 -> window rows[max(0,-4):min(9,0)+1] = rows[0:1]
        np.testing.assert_allclose(pooled[0], rows[0], rtol=1e-5, atol=1e-5)
        # i=7 -> center=5 -> rows[3:8]
        np.testing.assert_allclose(pooled[7], rows[3:8].mean(axis=0), rtol=1e-5, atol=1e-5)

    def test_even_window_raises(self, rng):
        with pytest.raises(ValueError):
            colpali_experimental_pooling_from_rows(
                rng.standard_normal((4, 128)).astype(np.float32), window_size=4)


class TestWeightedRowSmoothing:
    @staticmethod
    def _ref_smooth(rows, k, kernel, sigma=None):
        n, dim = rows.shape
        if k == 1 or n == 1:
            return rows.copy()
        center = (k - 1) / 2.0
        dist = np.abs(np.arange(k, dtype=np.float32) - center)
        if kernel == "uniform":
            w = np.ones((k,), dtype=np.float32)
        elif kernel == "triangular":
            w = np.clip((center + 1.0) - dist, 0.0, None).astype(np.float32)
        else:
            sig = max(0.5, center / 2.0) if sigma is None else sigma
            w = np.exp(-0.5 * (dist / sig) ** 2).astype(np.float32)
        w = w / w.sum()
        left = k // 2
        out = np.zeros_like(rows)
        for i in range(n):
            acc = np.zeros((dim,), dtype=np.float32)
            w_acc = 0.0
            for t in range(k):
                j = i - left + t
                if 0 <= j < n:
                    acc += w[t] * rows[j]
                    w_acc += w[t]
            out[i] = acc / w_acc if w_acc > 0 else rows[i]
        return out

    @pytest.mark.parametrize("kernel", ["uniform", "triangular", "gaussian"])
    @pytest.mark.parametrize("k", [2, 3, 4, 5])
    def test_matches_reference(self, rng, kernel, k):
        rows = rng.standard_normal((12, 128)).astype(np.float32)
        got = np.asarray(weighted_row_smoothing_same_length(rows, window_size=k, kernel=kernel))
        expected = self._ref_smooth(rows, k, kernel)
        assert got.shape == (12, 128)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_preserves_count_and_identity_k1(self, rng):
        rows = rng.standard_normal((6, 128)).astype(np.float32)
        got = np.asarray(weighted_row_smoothing_same_length(rows, window_size=1))
        np.testing.assert_allclose(got, rows, rtol=1e-6, atol=1e-6)

    def test_bad_kernel_raises(self, rng):
        with pytest.raises(ValueError):
            weighted_row_smoothing_same_length(
                rng.standard_normal((4, 128)).astype(np.float32), kernel="boxcar")


class TestColSmolExperimentalPooling:
    def test_prefix_means_plus_raw_last_tile(self, rng):
        emb = rng.standard_normal((5 * 64, 128)).astype(np.float32)
        pooled = np.asarray(colsmol_experimental_pooling(emb, num_tiles=5, patches_per_tile=64))
        # 4 prefix tile means + 64 raw last-tile patches
        assert pooled.shape == (4 + 64, 128)
        for t in range(4):
            np.testing.assert_allclose(
                pooled[t], emb[t * 64 : (t + 1) * 64].mean(axis=0), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(pooled[4:], emb[4 * 64 :], rtol=1e-6, atol=1e-6)

    def test_partial_last_tile(self, rng):
        emb = rng.standard_normal((300, 128)).astype(np.float32)  # 4 tiles + 44
        pooled = np.asarray(colsmol_experimental_pooling(emb, num_tiles=5, patches_per_tile=64))
        assert pooled.shape == (4 + 44, 128)


class TestColSmolTile4N:
    def test_interior_and_corner(self, rng):
        n_rows, n_cols = 3, 4
        tiles = rng.standard_normal((n_rows * n_cols + 1, 128)).astype(np.float32)
        out = np.asarray(colsmol_tile_4n_pooling_from_tiles(
            tiles, n_rows=n_rows, n_cols=n_cols, has_global=True))
        assert out.shape == tiles.shape
        grid = tiles[:12].reshape(3, 4, 128)
        # interior (1,1): self + 4 neighbors
        expected = np.stack(
            [grid[1, 1], grid[0, 1], grid[2, 1], grid[1, 0], grid[1, 2]]).mean(axis=0)
        np.testing.assert_allclose(out[1 * 4 + 1], expected, rtol=1e-5, atol=1e-5)
        # corner (0,0): self + right + down
        expected = np.stack([grid[0, 0], grid[1, 0], grid[0, 1]]).mean(axis=0)
        np.testing.assert_allclose(out[0], expected, rtol=1e-5, atol=1e-5)
        # global passthrough
        np.testing.assert_allclose(out[12], tiles[12], rtol=1e-6, atol=1e-6)

    def test_too_few_tiles_raises(self, rng):
        with pytest.raises(ValueError):
            colsmol_tile_4n_pooling_from_tiles(
                rng.standard_normal((5, 128)).astype(np.float32), n_rows=3, n_cols=4)


class TestSequenceChunkPooling:
    def test_shapes_and_means(self, rng):
        emb = rng.standard_normal((100, 128)).astype(np.float32)
        pooled = np.asarray(sequence_chunk_mean_pooling(emb, target_rows=32))
        assert pooled.shape == (32, 128)
