"""VisualEmbedder facade: backend dispatch, token info, pooling dispatch."""

import numpy as np
import pytest

from visual_rag_tpu.models.colvlm import ColVLMConfig
from visual_rag_tpu.models.embedder import VisualEmbedder, detect_backend
from visual_rag_tpu.models.processors import compute_tile_grid


class TestBackendDetect:
    def test_names(self):
        assert detect_backend("vidore/colSmol-500M") == "colsmol"
        assert detect_backend("vidore/colpali-v1.3") == "colpali"
        assert detect_backend("vidore/colqwen2.5-v0.2") == "colqwen2.5"
        assert detect_backend("Metric-AI/ColQwen2_5-ema") == "colqwen2.5"
        assert detect_backend("unknown/model") == "colpali"


class TestTileGrid:
    def test_reference_geometry(self):
        # 1024x1024 -> no downscale -> 2x2 tiles of 512
        _, _, cols, rows = compute_tile_grid(1024, 1024)
        assert (cols, rows) == (2, 2)
        # 4096 wide -> scaled to 2048 -> 4 cols
        w, h, cols, rows = compute_tile_grid(4096, 1024)
        assert w == 2048 and cols == 4
        _, _, cols, rows = compute_tile_grid(100, 100)
        assert (cols, rows) == (1, 1)


@pytest.fixture(scope="module")
def tiny_embedder():
    cfg = ColVLMConfig.tiny()
    return VisualEmbedder("vidore/colSmol-500M", config=cfg, batch_size=2)


@pytest.fixture(scope="module")
def images(rng):
    r = np.random.default_rng(0)
    return [r.random((300, 220, 3)).astype(np.float32) for _ in range(3)]


class TestEmbedder:
    def test_embed_query_filters_special_tokens(self, tiny_embedder):
        emb = tiny_embedder.embed_query("budget allocation report")
        # "query:" prefix + 3 words = 4 word tokens (bos id=1 filtered as <4)
        assert emb.shape == (4, tiny_embedder.cfg.embed_dim)
        assert np.isfinite(emb).all()

    def test_embed_queries_batch_deterministic(self, tiny_embedder):
        a = tiny_embedder.embed_queries(["alpha beta", "gamma delta epsilon"])
        b = tiny_embedder.embed_queries(["alpha beta", "gamma delta epsilon"])
        assert len(a) == 2
        np.testing.assert_allclose(a[0], b[0], atol=1e-5)
        assert a[0].shape[0] == 3 and a[1].shape[0] == 4

    def test_embed_images_token_info(self, tiny_embedder, images):
        embs, infos = tiny_embedder.embed_images(images, return_token_info=True)
        assert len(embs) == 3
        info = infos[0]
        assert info["n_rows"] == 1 and info["n_cols"] == 1  # small image, 1 tile
        assert info["num_tiles"] == 2  # grid + global
        assert info["num_visual_tokens"] == 2 * 64
        assert len(info["visual_token_indices"]) == 128
        # embedding covers image tokens + prompt tokens
        assert embs[0].shape[0] >= 128

    def test_extract_and_pool_colsmol(self, tiny_embedder, images):
        embs, infos = tiny_embedder.embed_images(images[:1], return_token_info=True)
        visual = tiny_embedder.extract_visual_embedding(embs[0], infos[0])
        assert visual.shape == (128, tiny_embedder.cfg.embed_dim)
        mp = tiny_embedder.mean_pool_visual_embedding(visual, infos[0])
        assert mp.shape == (2, tiny_embedder.cfg.embed_dim)  # 2 tiles
        ep = tiny_embedder.experimental_pool_visual_embedding(
            visual, infos[0], mean_pool=mp)
        assert ep.shape == (1 + 64, tiny_embedder.cfg.embed_dim)  # 1 tile mean + raw last
        gp = tiny_embedder.global_pool_from_mean_pool(mp)
        assert gp.shape == (tiny_embedder.cfg.embed_dim,)
        np.testing.assert_allclose(gp, mp.mean(axis=0), atol=1e-5)

    def test_colqwen_grid_and_pooling(self):
        import dataclasses

        # colqwen backend needs the 2x2-merge model variant
        cfg = dataclasses.replace(ColVLMConfig.tiny(), spatial_merge=2)
        emb = VisualEmbedder("vidore/colqwen2.5-v0.2", config=cfg, batch_size=2)
        imgs = [np.random.default_rng(1).random((200, 320, 3)).astype(np.float32)]
        embs, infos = emb.embed_images(imgs, return_token_info=True)
        info = infos[0]
        assert info["grid_h_eff"] * info["grid_w_eff"] == info["num_visual_tokens"]
        assert info["grid_h"] == 2 * info["grid_h_eff"]
        visual = emb.extract_visual_embedding(embs[0], info)
        mp = emb.mean_pool_visual_embedding(visual, info, target_vectors=32)
        assert mp.shape[0] == min(32, info["grid_h_eff"])
        # gaussian default kernel, same-length smoothing
        ep = emb.experimental_pool_visual_embedding(visual, info, mean_pool=mp)
        assert ep.shape == mp.shape
        ep_t = emb.experimental_pool_visual_embedding(
            visual, info, mean_pool=mp, kernel="triangular")
        assert ep_t.shape == mp.shape
        # legacy conv adds border rows (window 5 for colqwen -> +4)
        ep_l = emb.experimental_pool_visual_embedding(
            visual, info, mean_pool=mp, kernel="legacy")
        assert ep_l.shape[0] == mp.shape[0] + 4

    def test_query_fp16_output_dtype(self):
        cfg = ColVLMConfig.tiny()
        emb = VisualEmbedder("vidore/colSmol-500M", config=cfg, output_dtype=np.float16)
        q = emb.embed_query("hello world")
        assert q.dtype == np.float16


class TestQuerySorting:
    def test_length_sort_bucketing_preserves_order(self):
        cfg = ColVLMConfig.tiny()
        emb_sorted = VisualEmbedder("vidore/colSmol-500M", config=cfg,
                                    batch_size=2, sort_queries_by_length=True)
        emb_plain = VisualEmbedder("vidore/colSmol-500M", config=cfg,
                                   batch_size=2, sort_queries_by_length=False)
        queries = ["one", "a much longer query with many words here",
                   "two words", "medium length query text"]
        a = emb_sorted.embed_queries(queries)
        b = emb_plain.embed_queries(queries)
        # results come back in INPUT order regardless of internal bucketing
        # (reference visual_embedder.py:570-574 unsort)
        for x, y in zip(a, b):
            assert x.shape == y.shape
            np.testing.assert_allclose(x, y, atol=1e-5)


class TestPixelShuffle:
    def _cfg(self):
        import dataclasses

        tiny = ColVLMConfig.tiny()
        # shuffle=2: each tile = 16x16 = 256 real patches -> 64 tokens
        return dataclasses.replace(
            tiny, vision=dataclasses.replace(tiny.vision, pixel_shuffle=2,
                                             max_patches=2048))

    def test_tile_patches_and_token_counts(self):
        emb = VisualEmbedder("vidore/colSmol-500M", config=self._cfg(), batch_size=2)
        img = np.random.default_rng(0).random((300, 220, 3)).astype(np.float32)
        proc = emb.processor.process_images([img])
        # 1x1 tile grid + global = 2 tiles x 256 patches
        assert proc.patches.shape[1] == 2 * 256
        assert proc.window_ids is not None
        assert proc.window_ids[0, :256].max() == 0  # tile 0 segment
        assert proc.window_ids[0, 256:].min() == 1  # global tile segment
        info = proc.token_infos[0]
        assert info["num_visual_tokens"] == 2 * 64  # post-shuffle tokens
        embs, infos = emb.embed_images([img], return_token_info=True)
        visual = emb.extract_visual_embedding(embs[0], infos[0])
        assert visual.shape == (128, emb.cfg.embed_dim)
        mp = emb.mean_pool_visual_embedding(visual, infos[0])
        assert mp.shape == (2, emb.cfg.embed_dim)  # tile means unchanged

    def test_tiles_are_isolated_through_the_tower(self):
        import jax
        import jax.numpy as jnp

        from visual_rag_tpu.models.colvlm import ColVLM

        cfg = self._cfg()
        model = ColVLM(cfg)
        rng = np.random.default_rng(1)
        n = 2 * 256
        patches = rng.standard_normal((1, n, cfg.vision.patch_pixels)).astype(np.float32)
        pmask = np.ones((1, n), bool)
        wids = np.repeat(np.arange(2, dtype=np.int32), 256)[None, :]
        params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32),
                            jnp.ones((1, 4), bool), jnp.asarray(patches),
                            jnp.asarray(pmask), jnp.asarray(wids))

        def enc(p):
            return np.asarray(model.apply(
                params, jnp.asarray(p), jnp.asarray(pmask), jnp.asarray(wids),
                method=ColVLM.encode_images), np.float32)

        base = enc(patches)
        assert base.shape == (1, 2 * 64, cfg.text.hidden)  # 64 tokens per tile
        pert = patches.copy()
        pert[0, 10] += 3.0  # tile 0 patch
        out = enc(pert)
        # tile 1's 64 tokens must be bit-unchanged (per-tile attention)
        np.testing.assert_allclose(out[0, 64:], base[0, 64:], atol=1e-5)
        assert np.abs(out[0, :64] - base[0, :64]).max() > 1e-4
