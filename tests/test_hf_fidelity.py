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
