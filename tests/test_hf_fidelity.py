"""HF-preprocessing fidelity (VERDICT r1 item 6): the ImageProcessor's
rescale/normalize constants are pinned to the published HF processors'
values per backend, verified against live transformers instances when
available and against hand-computed expected tensors always."""

import numpy as np
import pytest

from visual_rag_tpu.models.processors import (
    HF_IMAGE_STATS,
    ImageProcessor,
)

try:
    from transformers import (
        Idefics3ImageProcessor,
        Qwen2VLImageProcessor,
        SiglipImageProcessor,
    )
    HAVE_TF = True
except Exception:  # pragma: no cover
    HAVE_TF = False


class TestPinnedConstants:
    def test_colsmol_colpali_mean_std(self):
        for backend in ("colsmol", "colpali"):
            mean, std = HF_IMAGE_STATS[backend]
            assert mean == (0.5, 0.5, 0.5) and std == (0.5, 0.5, 0.5), backend

    def test_colqwen_clip_constants(self):
        mean, std = HF_IMAGE_STATS["colqwen2.5"]
        np.testing.assert_allclose(mean, (0.48145466, 0.4578275, 0.40821073))
        np.testing.assert_allclose(std, (0.26862954, 0.26130258, 0.27577711))
        assert HF_IMAGE_STATS["colqwen2"] == HF_IMAGE_STATS["colqwen2.5"]

    @pytest.mark.skipif(not HAVE_TF, reason="transformers unavailable")
    def test_against_live_hf_processors(self):
        assert tuple(Idefics3ImageProcessor().image_mean) == HF_IMAGE_STATS["colsmol"][0]
        assert tuple(Idefics3ImageProcessor().image_std) == HF_IMAGE_STATS["colsmol"][1]
        assert tuple(SiglipImageProcessor().image_mean) == HF_IMAGE_STATS["colpali"][0]
        assert tuple(SiglipImageProcessor().image_std) == HF_IMAGE_STATS["colpali"][1]
        q = Qwen2VLImageProcessor()
        np.testing.assert_allclose(q.image_mean, HF_IMAGE_STATS["colqwen2.5"][0])
        np.testing.assert_allclose(q.image_std, HF_IMAGE_STATS["colqwen2.5"][1])
        assert q.rescale_factor == pytest.approx(1 / 255)


class TestHandComputedTensors:
    """Uniform-color images have exactly predictable normalized pixel values
    regardless of the resize path: (v/255 - mean) / std."""

    @pytest.mark.parametrize("backend,value", [
        ("colsmol", 128), ("colpali", 200), ("colqwen2.5", 64)])
    def test_uniform_image_patch_values(self, backend, value):
        proc = ImageProcessor(backend=backend, image_token_id=99,
                              patch_pixels=48, vocab=512,
                              max_visual_tokens=64)
        img = np.full((96, 80, 3), value, dtype=np.uint8)
        out = proc.process_images([img])
        mean, std = HF_IMAGE_STATS[backend]
        expected = (value / 255.0 - np.asarray(mean)) / np.asarray(std)
        # every real patch pixel equals the per-channel expected value; the
        # patch layout is (y, x, channel) flattened so channels cycle fastest
        got = out.patches[0][out.patch_mask[0]].reshape(-1, 3)
        np.testing.assert_allclose(got, np.tile(expected, (got.shape[0], 1)),
                                   rtol=1e-5, atol=1e-6)

    def test_custom_stats_override(self):
        proc = ImageProcessor(backend="colsmol", image_token_id=99,
                              patch_pixels=48, vocab=512, max_visual_tokens=64,
                              image_mean=(0.0, 0.0, 0.0), image_std=(1.0, 1.0, 1.0))
        img = np.full((64, 64, 3), 255, dtype=np.uint8)
        out = proc.process_images([img])
        got = out.patches[0][out.patch_mask[0]]
        np.testing.assert_allclose(got, np.ones_like(got), rtol=1e-6)


class TestQwen2DRope:
    @pytest.mark.skipif(not HAVE_TF, reason="transformers unavailable")
    def test_rope_2d_matches_hf_vision_rotary(self):
        """Our _rope_2d == transformers' vision rotary (rot_pos_emb +
        apply_rotary_pos_emb_vision) on random q and 2D positions."""
        import torch
        from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
            Qwen2_5_VisionRotaryEmbedding,
            apply_rotary_pos_emb_vision,
        )

        import jax.numpy as jnp
        from visual_rag_tpu.models.colvlm import _rope_2d

        rng = np.random.default_rng(0)
        T, H, dh = 24, 2, 32
        q = rng.standard_normal((1, T, H, dh)).astype(np.float32)
        pos = rng.integers(0, 16, (1, T, 2)).astype(np.int32)

        # HF: freqs table over max position, gathered per patch axis pair
        rot = Qwen2_5_VisionRotaryEmbedding(dh // 2)
        table = rot(16)  # [16, dh/4]
        freqs = torch.cat([table[torch.from_numpy(pos[0, :, 0]).long()],
                           table[torch.from_numpy(pos[0, :, 1]).long()]], dim=-1)
        emb = torch.cat((freqs, freqs), dim=-1)
        cos, sin = emb.cos(), emb.sin()
        tq = torch.from_numpy(q[0])  # [T, H, dh]
        hf_q, _ = apply_rotary_pos_emb_vision(
            tq.unsqueeze(0), tq.unsqueeze(0), cos, sin)
        ours = _rope_2d(jnp.asarray(q), jnp.asarray(pos), 10000.0)
        np.testing.assert_allclose(np.asarray(ours)[0], hf_q[0].numpy(),
                                   rtol=1e-5, atol=1e-5)

    def test_processor_merge_block_order_matches_hf(self):
        """Qwen patch ordering/positions == HF rot_pos_emb's merge-block
        permute for the emitted grid."""
        from visual_rag_tpu.models.processors import ImageProcessor

        proc = ImageProcessor(backend="colqwen2.5", image_token_id=9,
                              patch_pixels=48, vocab=512, max_visual_tokens=64)
        img = np.random.default_rng(1).integers(
            0, 255, (64, 64, 3)).astype(np.uint8)
        out = proc.process_images([img])
        info = out.token_infos[0]
        gh, gw = info["grid_h"], info["grid_w"]
        m = 2
        # HF rot_pos_emb ordering (numpy transliteration)
        hpos = np.repeat(np.arange(gh), gw).reshape(gh, gw)
        wpos = np.tile(np.arange(gw), (gh, 1))

        def order(a):
            return a.reshape(gh // m, m, gw // m, m).transpose(0, 2, 1, 3).reshape(-1)

        expected = np.stack([order(hpos), order(wpos)], axis=-1)
        n = gh * gw
        np.testing.assert_array_equal(out.patch_positions[0][:n], expected)
        # consecutive m*m patches form one merge window (PatchMerger contract)
        pos = out.patch_positions[0][:n]
        for blk in range(n // (m * m)):
            rows = pos[blk * 4 : blk * 4 + 4]
            assert rows[:, 0].max() - rows[:, 0].min() == 1
            assert rows[:, 1].max() - rows[:, 1].min() == 1
        # window ids group 8x8 original-patch windows
        wid = out.window_ids[0][:n]
        expect_wid = (pos[:, 0] // 8) * (-(-gw // 8)) + (pos[:, 1] // 8)
        np.testing.assert_array_equal(wid, expect_wid)

    def test_rope_changes_attention_by_position(self):
        """With rope_2d, identical patch content at different positions gives
        different vision features (position sensitivity without a learned
        pos table)."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from visual_rag_tpu.models.colvlm import ColVLMConfig, VisionTower

        tiny = ColVLMConfig.tiny()
        cfg = dataclasses.replace(tiny.vision, rope_2d=True, learned_pos=False)
        tower = VisionTower(cfg, dtype=jnp.float32)
        rng = np.random.default_rng(2)
        patches = jnp.asarray(rng.standard_normal(
            (1, 16, cfg.patch_pixels)).astype(np.float32))
        mask = jnp.ones((1, 16), bool)
        pos_a = jnp.asarray(
            np.stack(np.meshgrid(np.arange(4), np.arange(4), indexing="ij"),
                     axis=-1).reshape(1, 16, 2).astype(np.int32))
        params = tower.init(jax.random.PRNGKey(0), patches, mask, None, pos_a)
        out_a = tower.apply(params, patches, mask, None, pos_a)
        pos_b = jnp.flip(pos_a, axis=1)  # same positions, different assignment
        out_b = tower.apply(params, patches, mask, None, pos_b)
        # identical content + rope -> outputs differ per-slot between layouts
        assert float(jnp.max(jnp.abs(out_a - out_b))) > 1e-3
