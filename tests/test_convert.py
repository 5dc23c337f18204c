"""Checkpoint conversion: synthetic HF state dict -> working ColVLM params."""

import jax
import jax.numpy as jnp
import numpy as np

from visual_rag_tpu.models.colvlm import ColVLM, ColVLMConfig
from visual_rag_tpu.models.convert import (
    convert_state_dict,
    param_mapping,
    validate_against_model,
)


def synthetic_state_dict(cfg: ColVLMConfig, prefix: str = "model.", seed: int = 0):
    """HF-shaped state dict with the right shapes for `cfg`."""
    rng = np.random.default_rng(seed)
    v, t = cfg.vision, cfg.text
    side = int(round((v.patch_pixels / 3) ** 0.5))
    sd = {
        f"{prefix}vision_model.embeddings.patch_embedding.weight":
            rng.standard_normal((v.hidden, 3, side, side)).astype(np.float32),
        f"{prefix}vision_model.embeddings.patch_embedding.bias":
            rng.standard_normal((v.hidden,)).astype(np.float32),
        f"{prefix}vision_model.embeddings.position_embedding.weight":
            rng.standard_normal((v.max_patches, v.hidden)).astype(np.float32),
        f"{prefix}vision_model.post_layernorm.weight": np.ones(v.hidden, np.float32),
        f"{prefix}vision_model.post_layernorm.bias": np.zeros(v.hidden, np.float32),
        f"{prefix}text_model.embed_tokens.weight":
            rng.standard_normal((t.vocab, t.hidden)).astype(np.float32),
        f"{prefix}text_model.norm.weight": np.ones(t.hidden, np.float32),
        "custom_text_proj.weight":
            rng.standard_normal((cfg.embed_dim, t.hidden)).astype(np.float32),
        f"{prefix}connector.modality_projection.proj.weight":
            rng.standard_normal((t.hidden, v.hidden)).astype(np.float32),
        f"{prefix}connector.modality_projection.proj.bias":
            rng.standard_normal((t.hidden,)).astype(np.float32),
    }
    dh_v = v.hidden // v.heads
    for i in range(v.layers):
        p = f"{prefix}vision_model.encoder.layers.{i}"
        sd[f"{p}.self_attn.q_proj.weight"] = rng.standard_normal(
            (v.heads * dh_v, v.hidden)).astype(np.float32)
        sd[f"{p}.self_attn.k_proj.weight"] = rng.standard_normal(
            (v.heads * dh_v, v.hidden)).astype(np.float32)
        sd[f"{p}.self_attn.v_proj.weight"] = rng.standard_normal(
            (v.heads * dh_v, v.hidden)).astype(np.float32)
        sd[f"{p}.self_attn.out_proj.weight"] = rng.standard_normal(
            (v.hidden, v.hidden)).astype(np.float32)
        sd[f"{p}.layer_norm1.weight"] = np.ones(v.hidden, np.float32)
        sd[f"{p}.layer_norm1.bias"] = np.zeros(v.hidden, np.float32)
        sd[f"{p}.layer_norm2.weight"] = np.ones(v.hidden, np.float32)
        sd[f"{p}.layer_norm2.bias"] = np.zeros(v.hidden, np.float32)
        mlp = int(v.hidden * v.mlp_ratio)
        sd[f"{p}.mlp.fc1.weight"] = rng.standard_normal((mlp, v.hidden)).astype(np.float32)
        sd[f"{p}.mlp.fc1.bias"] = np.zeros(mlp, np.float32)
        sd[f"{p}.mlp.fc2.weight"] = rng.standard_normal((v.hidden, mlp)).astype(np.float32)
        sd[f"{p}.mlp.fc2.bias"] = np.zeros(v.hidden, np.float32)
    dh_t = t.hidden // t.heads
    for i in range(t.layers):
        p = f"{prefix}text_model.layers.{i}"
        sd[f"{p}.self_attn.q_proj.weight"] = rng.standard_normal(
            (t.heads * dh_t, t.hidden)).astype(np.float32)
        sd[f"{p}.self_attn.k_proj.weight"] = rng.standard_normal(
            (t.kv_heads * dh_t, t.hidden)).astype(np.float32)
        sd[f"{p}.self_attn.v_proj.weight"] = rng.standard_normal(
            (t.kv_heads * dh_t, t.hidden)).astype(np.float32)
        sd[f"{p}.self_attn.o_proj.weight"] = rng.standard_normal(
            (t.hidden, t.hidden)).astype(np.float32)
        sd[f"{p}.input_layernorm.weight"] = np.ones(t.hidden, np.float32)
        sd[f"{p}.post_attention_layernorm.weight"] = np.ones(t.hidden, np.float32)
        sd[f"{p}.mlp.gate_proj.weight"] = rng.standard_normal(
            (t.mlp_hidden, t.hidden)).astype(np.float32)
        sd[f"{p}.mlp.up_proj.weight"] = rng.standard_normal(
            (t.mlp_hidden, t.hidden)).astype(np.float32)
        sd[f"{p}.mlp.down_proj.weight"] = rng.standard_normal(
            (t.hidden, t.mlp_hidden)).astype(np.float32)
    return sd


class TestConvert:
    def test_full_conversion_and_forward(self):
        cfg = ColVLMConfig.tiny()
        sd = synthetic_state_dict(cfg)
        params, report = convert_state_dict(sd, cfg)
        assert not report["missing"], report["missing"][:5]
        assert not report["unused"]
        issues = validate_against_model(params, cfg)
        assert not issues, issues[:5]
        # converted params drive a real forward
        model = ColVLM(cfg)
        out = model.apply(
            jax.tree.map(jnp.asarray, params),
            jnp.ones((1, 6), jnp.int32), jnp.ones((1, 6), bool))
        assert out.shape == (1, 6, cfg.embed_dim)
        assert bool(jnp.isfinite(out).all())

    def test_linear_transpose_semantics(self):
        cfg = ColVLMConfig.tiny()
        sd = synthetic_state_dict(cfg)
        params, _ = convert_state_dict(sd, cfg)
        w_hf = sd["model.text_model.layers.0.self_attn.q_proj.weight"]
        w_fx = params["params"]["layer_0"]["attn"]["q"]["kernel"]
        np.testing.assert_allclose(w_fx, w_hf.T)

    def test_missing_and_unused_reported(self):
        cfg = ColVLMConfig.tiny()
        sd = synthetic_state_dict(cfg)
        del sd["model.text_model.norm.weight"]
        sd["model.someother.weight"] = np.zeros(3, np.float32)
        _, report = convert_state_dict(sd, cfg)
        assert "text_model.norm.weight" in report["missing"]
        assert "someother.weight" in report["unused"]

    def test_prefix_tolerance(self):
        cfg = ColVLMConfig.tiny()
        sd = synthetic_state_dict(cfg, prefix="vlm.model.")
        _, report = convert_state_dict(sd, cfg)
        assert not report["missing"]

    def test_mapping_covers_all_model_leaves(self):
        # every non-merger leaf of the model tree must be reachable by a rule
        cfg = ColVLMConfig.tiny()
        paths = {tuple(p) for _, p, _ in param_mapping(cfg)}
        import jax

        from visual_rag_tpu.models.colvlm import ColVLM

        model = ColVLM(cfg)
        ref = jax.eval_shape(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
            jnp.zeros((1, 4), bool), jnp.zeros((1, 16, cfg.vision.patch_pixels)),
            jnp.zeros((1, 16), bool)))
        leaves = []

        def walk(node, path):
            if hasattr(node, "shape"):
                leaves.append(path)
                return
            for k, v in node.items():
                walk(v, path + (k,))

        walk(ref["params"], ())
        uncovered = [p for p in leaves if p not in paths
                     and "connector" not in p and "merger" not in p]
        assert not uncovered, uncovered[:5]
