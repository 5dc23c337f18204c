"""Numerical forward parity against LIVE tiny-random HF torch models.

The reference's embedding path IS the HF torch forward (colpali-engine wraps
Idefics3 / PaliGemma / Qwen2.5-VL — reference visual_embedder.py:153-323).
These tests instantiate tiny-random torch models in memory, convert their
state dicts with models/convert.py, and assert the flax ColVLM forward equals
the torch forward (last hidden -> 128-d projection -> L2 norm) within fp32
tolerance. This closes the parity gap no synthetic state dict can: the HF
modeling code itself is the oracle.

Fidelity quirks these tests discovered and now pin:
- Idefics3 vision position ids are epsilon-BUCKETIZED: at full tile
  resolution the per-axis ids come out [0, 0, 1, ..., side-2], not
  sequential (modeling_idefics3.py Idefics3VisionEmbeddings.forward).
- PaliGemma is a prefix-LM: the ColPali embedding forward uses FULL
  bidirectional attention (TextConfig.causal=False).
- Qwen2.5-VL text uses M-RoPE; position ids verified equal to HF
  get_rope_index.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from visual_rag_tpu.models.colvlm import (  # noqa: E402
    ColVLM,
    ColVLMConfig,
    TextConfig,
    VisionConfig,
)
from visual_rag_tpu.models.convert import convert_state_dict  # noqa: E402

EMBED_DIM = 16


def _project_torch(h, sd, am):
    e = torch.nn.functional.linear(
        h, sd["custom_text_proj.weight"], sd["custom_text_proj.bias"])
    e = e / (e.norm(dim=-1, keepdim=True) + 1e-8)
    return (e * torch.tensor(am)[..., None]).numpy()


def _with_proj(model):
    torch.manual_seed(1)
    sd = dict(model.state_dict())
    sd["custom_text_proj.weight"] = torch.randn(EMBED_DIM, 64) * 0.1
    sd["custom_text_proj.bias"] = torch.randn(EMBED_DIM) * 0.1
    return sd


def _patchify_rowcol(img_chw, grid, ps):
    """[C,H,W] -> [N, ps*ps*C] patches, row-major, (ph, pw, C) flattening —
    the processors.py convention the converter's patch_conv transform matches."""
    gh, gw = grid
    x = img_chw.transpose(1, 2, 0)  # [H, W, C]
    x = x.reshape(gh, ps, gw, ps, 3).transpose(0, 2, 1, 3, 4)
    return x.reshape(gh * gw, ps * ps * 3)


# ---------------------------------------------------------------------------
# Idefics3 (ColSmol backend)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def idefics3_pair():
    from transformers import Idefics3Config, Idefics3ForConditionalGeneration

    torch.manual_seed(0)
    hf_cfg = Idefics3Config(
        vision_config=dict(hidden_size=64, num_hidden_layers=2,
                           num_attention_heads=4, intermediate_size=256,
                           patch_size=4, image_size=64, num_channels=3),
        text_config=dict(hidden_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         intermediate_size=128, vocab_size=512,
                         rope_theta=100000.0, max_position_embeddings=128,
                         rms_norm_eps=1e-6, tie_word_embeddings=False),
        scale_factor=2, image_token_id=500)
    model = Idefics3ForConditionalGeneration(hf_cfg).eval().float()
    cfg = ColVLMConfig(
        vision=VisionConfig(hidden=64, layers=2, heads=4, mlp_ratio=4.0,
                            patch_pixels=48, max_patches=256, pixel_shuffle=2,
                            attn_bias=True),
        text=TextConfig(hidden=64, layers=2, heads=4, kv_heads=2,
                        mlp_hidden=128, vocab=512, rope_theta=100000.0,
                        max_seq=128),
        embed_dim=EMBED_DIM, spatial_merge=1, image_token_id=500,
        dtype="float32", proj_bias=True, connector_bias=False,
        hf_layout="idefics3")
    sd = _with_proj(model)
    params, report = convert_state_dict(sd, cfg)
    return model, cfg, sd, params, report


class TestIdefics3:
    def test_all_keys_map(self, idefics3_pair):
        _, _, _, _, report = idefics3_pair
        assert report["missing"] == []
        assert [u for u in report["unused"] if "lm_head" not in u] == []

    def test_page_forward_parity(self, idefics3_pair):
        model, cfg, sd, params, _ = idefics3_pair
        rng = np.random.default_rng(0)
        px = rng.standard_normal((1, 1, 3, 64, 64)).astype(np.float32)
        ids = np.concatenate(
            [np.array([1, 2, 3]), np.full(64, 500), np.array([4, 5])])[None]
        am = np.ones_like(ids)
        with torch.no_grad():
            out = model.model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(am),
                pixel_values=torch.tensor(px),
                pixel_attention_mask=torch.ones(1, 1, 64, 64, dtype=torch.bool))
            e_t = _project_torch(out.last_hidden_state, sd, am)
        patches = _patchify_rowcol(px[0, 0], (16, 16), 4)[None]
        e_j = np.asarray(ColVLM(cfg).apply(
            params, jnp.asarray(ids), jnp.asarray(am), jnp.asarray(patches),
            jnp.ones((1, 256), bool), None))
        np.testing.assert_allclose(e_t, e_j, atol=2e-5)

    def test_query_forward_parity(self, idefics3_pair):
        model, cfg, sd, params, _ = idefics3_pair
        ids = np.array([[7, 8, 9, 10, 11, 12]])
        am = np.ones_like(ids)
        with torch.no_grad():
            out = model.model(input_ids=torch.tensor(ids),
                              attention_mask=torch.tensor(am))
            e_t = _project_torch(out.last_hidden_state, sd, am)
        e_j = np.asarray(ColVLM(cfg).apply(
            params, jnp.asarray(ids), jnp.asarray(am)))
        np.testing.assert_allclose(e_t, e_j, atol=2e-5)


# ---------------------------------------------------------------------------
# PaliGemma (ColPali backend)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def paligemma_pair():
    from transformers import PaliGemmaConfig, PaliGemmaForConditionalGeneration

    torch.manual_seed(0)
    hf_cfg = PaliGemmaConfig(
        vision_config=dict(hidden_size=64, num_hidden_layers=2,
                           num_attention_heads=4, intermediate_size=256,
                           patch_size=4, image_size=32, num_channels=3,
                           projection_dim=64),
        text_config=dict(hidden_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=1,
                         intermediate_size=128, vocab_size=512,
                         rope_theta=10000.0, max_position_embeddings=128,
                         head_dim=16, hidden_act="gelu_pytorch_tanh"),
        projection_dim=64, image_token_index=500)
    model = PaliGemmaForConditionalGeneration(hf_cfg).eval().float()
    cfg = ColVLMConfig(
        vision=VisionConfig(hidden=64, layers=2, heads=4, mlp_ratio=4.0,
                            patch_pixels=48, max_patches=64, pixel_shuffle=1,
                            attn_bias=True),
        text=TextConfig(hidden=64, layers=2, heads=4, kv_heads=1,
                        mlp_hidden=128, vocab=512, rope_theta=10000.0,
                        max_seq=128, mlp_act="gelu_tanh", rms_offset=True,
                        embed_scale=True, causal=False),
        embed_dim=EMBED_DIM, spatial_merge=1, image_token_id=500,
        dtype="float32", proj_bias=True, connector_bias=True,
        hf_layout="paligemma")
    sd = _with_proj(model)
    params, report = convert_state_dict(sd, cfg)
    return model, cfg, sd, params, report


class TestPaliGemma:
    def test_all_keys_map(self, paligemma_pair):
        _, _, _, _, report = paligemma_pair
        assert report["missing"] == []
        # the SigLIP pooling head is unused by design (ColPali never runs it)
        real_unused = [u for u in report["unused"]
                       if "lm_head" not in u and ".head." not in u]
        assert real_unused == []

    def test_page_forward_parity(self, paligemma_pair):
        model, cfg, sd, params, _ = paligemma_pair
        rng = np.random.default_rng(0)
        px = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
        ids = np.concatenate([np.full(64, 500), np.array([1, 2, 3, 4, 5])])[None]
        am = np.ones_like(ids)
        with torch.no_grad():
            out = model.model(input_ids=torch.tensor(ids),
                              attention_mask=torch.tensor(am),
                              pixel_values=torch.tensor(px))
            e_t = _project_torch(out.last_hidden_state, sd, am)
        patches = _patchify_rowcol(px[0], (8, 8), 4)[None]
        e_j = np.asarray(ColVLM(cfg).apply(
            params, jnp.asarray(ids), jnp.asarray(am), jnp.asarray(patches),
            jnp.ones((1, 64), bool), None))
        np.testing.assert_allclose(e_t, e_j, atol=2e-5)

    def test_query_forward_parity(self, paligemma_pair):
        model, cfg, sd, params, _ = paligemma_pair
        ids = np.array([[7, 8, 9, 10]])
        am = np.ones_like(ids)
        with torch.no_grad():
            out = model.model(input_ids=torch.tensor(ids),
                              attention_mask=torch.tensor(am))
            e_t = _project_torch(out.last_hidden_state, sd, am)
        e_j = np.asarray(ColVLM(cfg).apply(
            params, jnp.asarray(ids), jnp.asarray(am)))
        np.testing.assert_allclose(e_t, e_j, atol=2e-5)


# ---------------------------------------------------------------------------
# Qwen2.5-VL (ColQwen2.5 backend)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def qwen_pair():
    from transformers import Qwen2_5_VLConfig, Qwen2_5_VLForConditionalGeneration

    torch.manual_seed(0)
    hf_cfg = Qwen2_5_VLConfig(
        vision_config=dict(depth=2, hidden_size=64, intermediate_size=128,
                           num_heads=4, patch_size=4, temporal_patch_size=2,
                           spatial_merge_size=2, window_size=32,
                           fullatt_block_indexes=[1], out_hidden_size=64,
                           hidden_act="silu", in_channels=3,
                           tokens_per_second=2),
        text_config=dict(hidden_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         intermediate_size=128, vocab_size=512,
                         rope_theta=1000000.0, max_position_embeddings=128,
                         rms_norm_eps=1e-6, tie_word_embeddings=False,
                         rope_scaling={"type": "mrope",
                                       "mrope_section": [2, 3, 3]}),
        image_token_id=500, vision_start_token_id=498,
        vision_end_token_id=499)
    model = Qwen2_5_VLForConditionalGeneration(hf_cfg).eval().float()
    cfg = ColVLMConfig(
        vision=VisionConfig(hidden=64, layers=2, heads=4, mlp_ratio=2.0,
                            patch_pixels=48, max_patches=4096, window_side=8,
                            full_attn_layers=(1,), attn_bias=True,
                            mlp_gated=True, rms_norm=True, patch_bias=False,
                            learned_pos=False, post_ln=False, rope_2d=True),
        text=TextConfig(hidden=64, layers=2, heads=4, kv_heads=2,
                        mlp_hidden=128, vocab=512, rope_theta=1000000.0,
                        max_seq=128, attn_qkv_bias=True,
                        mrope_section=(2, 3, 3)),
        embed_dim=EMBED_DIM, spatial_merge=2, image_token_id=500,
        dtype="float32", proj_bias=True, hf_layout="qwen2.5")
    sd = _with_proj(model)
    params, report = convert_state_dict(sd, cfg)
    return model, cfg, sd, params, report


def _qwen_inputs(gh=8, gw=12, ps=4):
    """One image at pre-merge grid gh x gw: both HF pixel_values (merge-block
    order, (C, tp, ph, pw) flat, image doubled over temporal) and the flax
    processor-format inputs from the SAME pixels."""
    from visual_rag_tpu.models.processors import ImageProcessor

    rng = np.random.default_rng(0)
    canvas = rng.standard_normal((gh * ps, gw * ps, 3)).astype(np.float32)
    img = canvas.transpose(2, 0, 1)
    pat = np.stack([img, img])  # temporal duplicate
    m = 2
    p = pat.reshape(2, 3, gh // m, m, ps, gw // m, m, ps)
    p = p.transpose(2, 5, 3, 6, 1, 0, 4, 7)
    hf_pv = p.reshape(gh * gw, 3 * 2 * ps * ps).copy()
    proc = ImageProcessor(backend="colqwen2.5", image_token_id=500,
                          patch_pixels=3 * ps * ps, vocab=512,
                          max_visual_tokens=(gh // 2) * (gw // 2),
                          pixel_shuffle=1)
    patches, info = proc._image_tokens_colqwen(
        canvas, max_tokens=(gh // 2) * (gw // 2))
    assert (info["grid_h"], info["grid_w"]) == (gh, gw)
    return hf_pv, patches, info


class TestQwen25VL:
    def test_all_keys_map(self, qwen_pair):
        _, _, _, _, report = qwen_pair
        assert report["missing"] == []
        assert [u for u in report["unused"] if "lm_head" not in u] == []

    def test_vision_tower_parity(self, qwen_pair):
        model, cfg, _, params, _ = qwen_pair
        gh, gw = 8, 12
        hf_pv, patches, info = _qwen_inputs(gh, gw)
        with torch.no_grad():
            vout = model.model.visual(torch.tensor(hf_pv),
                                      grid_thw=torch.tensor([[1, gh, gw]]))
        bound = ColVLM(cfg).bind(params)
        ei = bound.encode_images(
            jnp.asarray(patches[None]), jnp.ones((1, gh * gw), bool),
            jnp.asarray(info["_window_ids"][None]),
            jnp.asarray(info["_patch_positions"][None]))
        np.testing.assert_allclose(vout.numpy(), np.asarray(ei)[0], atol=2e-4)

    def test_page_forward_parity_with_mrope(self, qwen_pair):
        model, cfg, sd, params, _ = qwen_pair
        gh, gw = 8, 12
        hf_pv, patches, info = _qwen_inputs(gh, gw)
        n_tok = (gh // 2) * (gw // 2)
        ids = np.concatenate(
            [np.array([1, 2, 498]), np.full(n_tok, 500),
             np.array([499, 3, 4])])[None]
        am = np.ones_like(ids)
        with torch.no_grad():
            out = model.model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(am),
                pixel_values=torch.tensor(hf_pv),
                image_grid_thw=torch.tensor([[1, gh, gw]]))
            e_t = _project_torch(out.last_hidden_state, sd, am)
        e_j = np.asarray(ColVLM(cfg).apply(
            params, jnp.asarray(ids), jnp.asarray(am),
            jnp.asarray(patches[None]), jnp.ones((1, gh * gw), bool),
            jnp.asarray(info["_window_ids"][None]),
            jnp.asarray(info["_patch_positions"][None])))
        np.testing.assert_allclose(e_t, e_j, atol=5e-4)

    def test_mrope_position_ids_match_hf(self, qwen_pair):
        model, cfg, _, params, _ = qwen_pair
        gh, gw = 8, 12
        _, patches, info = _qwen_inputs(gh, gw)
        n_tok = (gh // 2) * (gw // 2)
        ids = np.concatenate(
            [np.array([1, 2, 498]), np.full(n_tok, 500),
             np.array([499, 3, 4])])[None]
        am = np.ones_like(ids)
        hf_pos, _ = model.model.get_rope_index(
            torch.tensor(ids), image_grid_thw=torch.tensor([[1, gh, gw]]),
            attention_mask=torch.tensor(am))  # [3, B, L]
        bound = ColVLM(cfg).bind(params)
        mine = np.asarray(bound._mrope_positions(
            jnp.asarray(ids), jnp.asarray(am),
            jnp.asarray(info["_patch_positions"][None])))  # [B, L, 3]
        np.testing.assert_array_equal(
            hf_pos.numpy().transpose(1, 2, 0), mine)

    def test_query_forward_parity(self, qwen_pair):
        model, cfg, sd, params, _ = qwen_pair
        ids = np.array([[7, 8, 9, 10, 11]])
        am = np.ones_like(ids)
        with torch.no_grad():
            out = model.model(input_ids=torch.tensor(ids),
                              attention_mask=torch.tensor(am))
            e_t = _project_torch(out.last_hidden_state, sd, am)
        e_j = np.asarray(ColVLM(cfg).apply(
            params, jnp.asarray(ids), jnp.asarray(am)))
        np.testing.assert_allclose(e_t, e_j, atol=2e-5)
