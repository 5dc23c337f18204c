"""HF checkpoint -> ColVLM parameter conversion.

The reference loads torch checkpoints through colpali-engine; here the same
weights map onto the flax ColVLM param tree. The mapping is declarative
(:func:`param_mapping`) so it is testable without downloading anything: given
any state dict (torch tensors or numpy arrays) with HF-style keys, produce the
ColVLM params, reporting what matched and what's missing.

Key layout (ColSmol / SmolVLM2-style names; ColPali/ColQwen differ only in
prefixes, handled by ``KEY_PREFIXES``):

    model.vision_model.embeddings.patch_embedding.weight   -> vision patch_embed
    model.vision_model.embeddings.position_embedding.weight-> vision pos_embed
    model.vision_model.encoder.layers.{i}.self_attn.{q,k,v,out}_proj.weight
    model.vision_model.encoder.layers.{i}.layer_norm{1,2}.{weight,bias}
    model.vision_model.encoder.layers.{i}.mlp.fc{1,2}.{weight,bias}
    model.text_model.layers.{i}.self_attn.{q,k,v,o}_proj.weight
    model.text_model.layers.{i}.mlp.{gate,up,down}_proj.weight
    model.text_model.layers.{i}.{input,post_attention}_layernorm.weight
    model.text_model.embed_tokens.weight                   -> tok_embed
    model.text_model.norm.weight                           -> final_norm
    custom_text_proj.weight / embedding_proj_layer.weight  -> proj

Weight-shape conventions: HF Linear stores [out, in]; flax Dense kernels are
[in, out] — transposed on the way in. Conv patch embeds are flattened to the
[patch_pixels, hidden] dense kernel.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Tuple

import numpy as np

from visual_rag_tpu.models.colvlm import ColVLMConfig

logger = logging.getLogger(__name__)

KEY_PREFIXES = (
    "model.", "vlm.model.", "model.model.",  # backbone nestings seen in the wild
)


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu()
        if hasattr(x, "float") and "bfloat16" in str(x.dtype):
            x = x.float()
        x = x.numpy()
    return np.asarray(x)


def _strip_prefix(key: str) -> str:
    for p in KEY_PREFIXES:
        if key.startswith(p):
            return key[len(p):]
    return key


def _siglip_vision_rules(cfg: ColVLMConfig, prefixes: Tuple[str, ...]):
    """SigLIP tower rules (Idefics3/ColSmol and PaliGemma/ColPali exports).

    ``prefixes`` are the candidate nestings, e.g. ``("vision_model.",)`` for
    Idefics3 or ``("vision_tower.vision_model.", "vision_model.")`` for
    PaliGemma (exact HF key inventory verified against transformers 4.57).
    """
    def cand(suffix: str) -> Tuple[str, ...]:
        return tuple(p + suffix for p in prefixes)

    rules: List[Tuple[Any, Tuple[str, ...], str]] = [
        (cand("embeddings.patch_embedding.weight"),
         ("vision", "patch_embed", "kernel"), "patch_conv"),
        (cand("embeddings.patch_embedding.bias"),
         ("vision", "patch_embed", "bias"), "raw"),
        (cand("embeddings.position_embedding.weight"),
         ("vision", "pos_embed"), "raw"),
        (cand("post_layernorm.weight"), ("vision", "post_ln", "scale"), "raw"),
        (cand("post_layernorm.bias"), ("vision", "post_ln", "bias"), "raw"),
    ]
    for i in range(cfg.vision.layers):
        blk = ("vision", f"block_{i}")
        lyr = f"encoder.layers.{i}"
        rules += [
            (cand(f"{lyr}.self_attn.q_proj.weight"), blk + ("attn", "q", "kernel"), "linear"),
            (cand(f"{lyr}.self_attn.k_proj.weight"), blk + ("attn", "k", "kernel"), "linear"),
            (cand(f"{lyr}.self_attn.v_proj.weight"), blk + ("attn", "v", "kernel"), "linear"),
            (cand(f"{lyr}.self_attn.out_proj.weight"), blk + ("attn", "o", "kernel"), "linear"),
            (cand(f"{lyr}.layer_norm1.weight"), blk + ("ln1", "scale"), "raw"),
            (cand(f"{lyr}.layer_norm1.bias"), blk + ("ln1", "bias"), "raw"),
            (cand(f"{lyr}.layer_norm2.weight"), blk + ("ln2", "scale"), "raw"),
            (cand(f"{lyr}.layer_norm2.bias"), blk + ("ln2", "bias"), "raw"),
            (cand(f"{lyr}.mlp.fc1.weight"), blk + ("fc1", "kernel"), "linear"),
            (cand(f"{lyr}.mlp.fc1.bias"), blk + ("fc1", "bias"), "raw"),
            (cand(f"{lyr}.mlp.fc2.weight"), blk + ("fc2", "kernel"), "linear"),
            (cand(f"{lyr}.mlp.fc2.bias"), blk + ("fc2", "bias"), "raw"),
        ]
        if cfg.vision.attn_bias:  # SigLIP attention biases (real checkpoints)
            rules += [
                (cand(f"{lyr}.self_attn.q_proj.bias"), blk + ("attn", "q", "bias"), "raw"),
                (cand(f"{lyr}.self_attn.k_proj.bias"), blk + ("attn", "k", "bias"), "raw"),
                (cand(f"{lyr}.self_attn.v_proj.bias"), blk + ("attn", "v", "bias"), "raw"),
                (cand(f"{lyr}.self_attn.out_proj.bias"), blk + ("attn", "o", "bias"), "raw"),
            ]
    return rules


def _qwen_vision_rules(cfg: ColVLMConfig):
    """Qwen2.5-VL tower rules (exact HF names: visual.blocks.N.attn.qkv
    fused, RMSNorm norm1/norm2, biased SwiGLU MLP, merger ln_q + mlp.0/2,
    Conv3d patch embed with temporal_patch_size=2)."""
    rules: List[Tuple[Any, Tuple[str, ...], str]] = [
        (("visual.patch_embed.proj.weight",),
         ("vision", "patch_embed", "kernel"), "patch_conv3d"),
        (("visual.merger.ln_q.weight",), ("merger", "ln_q", "scale"), "raw"),
        (("visual.merger.mlp.0.weight",), ("merger", "fc1", "kernel"), "linear"),
        (("visual.merger.mlp.0.bias",), ("merger", "fc1", "bias"), "raw"),
        (("visual.merger.mlp.2.weight",), ("merger", "fc2", "kernel"), "linear"),
        (("visual.merger.mlp.2.bias",), ("merger", "fc2", "bias"), "raw"),
    ]
    for i in range(cfg.vision.layers):
        blk = ("vision", f"block_{i}")
        lyr = f"visual.blocks.{i}"
        rules += [
            ((f"{lyr}.attn.qkv.weight",), blk + ("attn", "q", "kernel"), "qkv_w_0"),
            ((f"{lyr}.attn.qkv.weight",), blk + ("attn", "k", "kernel"), "qkv_w_1"),
            ((f"{lyr}.attn.qkv.weight",), blk + ("attn", "v", "kernel"), "qkv_w_2"),
            ((f"{lyr}.attn.qkv.bias",), blk + ("attn", "q", "bias"), "qkv_b_0"),
            ((f"{lyr}.attn.qkv.bias",), blk + ("attn", "k", "bias"), "qkv_b_1"),
            ((f"{lyr}.attn.qkv.bias",), blk + ("attn", "v", "bias"), "qkv_b_2"),
            ((f"{lyr}.attn.proj.weight",), blk + ("attn", "o", "kernel"), "linear"),
            ((f"{lyr}.attn.proj.bias",), blk + ("attn", "o", "bias"), "raw"),
            ((f"{lyr}.norm1.weight",), blk + ("ln1", "scale"), "raw"),
            ((f"{lyr}.norm2.weight",), blk + ("ln2", "scale"), "raw"),
            ((f"{lyr}.mlp.gate_proj.weight",), blk + ("mlp", "gate", "kernel"), "linear"),
            ((f"{lyr}.mlp.gate_proj.bias",), blk + ("mlp", "gate", "bias"), "raw"),
            ((f"{lyr}.mlp.up_proj.weight",), blk + ("mlp", "up", "kernel"), "linear"),
            ((f"{lyr}.mlp.up_proj.bias",), blk + ("mlp", "up", "bias"), "raw"),
            ((f"{lyr}.mlp.down_proj.weight",), blk + ("mlp", "down", "kernel"), "linear"),
            ((f"{lyr}.mlp.down_proj.bias",), blk + ("mlp", "down", "bias"), "raw"),
        ]
    return rules


def param_mapping(cfg: ColVLMConfig) -> List[Tuple[Any, Tuple[str, ...], str]]:
    """[(hf_key_candidates, flax_path, transform)] for the given config.

    transform: 'linear' (transpose [out,in]->[in,out]), 'raw', 'patch_conv'
    (conv [H, C, k, k] -> [k*k*C, H]), 'patch_conv3d' (Qwen Conv3d, temporal
    dim summed since frames are duplicated), 'embed' (raw [vocab, hidden]),
    'qkv_{w,b}_{0,1,2}' (fused qkv slices). Exact key inventories verified
    per backend against transformers 4.57 synthetic models (hf_layout:
    idefics3 | paligemma | qwen2.5).
    """
    layout = getattr(cfg, "hf_layout", "idefics3")
    # text backbone prefix candidates per layout
    text_pre = {
        "idefics3": ("text_model.",),
        "paligemma": ("language_model.", "text_model."),
        "qwen2.5": ("language_model.", "text_model."),
    }.get(layout, ("text_model.", "language_model."))

    def tc(suffix: str) -> Tuple[str, ...]:
        return tuple(p + suffix for p in text_pre)

    rules: List[Tuple[Any, Tuple[str, ...], str]] = [
        (tc("embed_tokens.weight"), ("tok_embed", "embedding"), "embed"),
        (tc("norm.weight"), ("final_norm", "scale"), "raw"),
        # projection head name varies by backend (colpali vs smolvlm exports)
        (("custom_text_proj.weight", "embedding_proj_layer.weight"),
         ("embedding_proj", "kernel"), "linear"),
    ]
    if cfg.proj_bias:
        rules.append((("custom_text_proj.bias", "embedding_proj_layer.bias"),
                      ("embedding_proj", "bias"), "raw"))
    if cfg.spatial_merge > 1:
        rules += _qwen_vision_rules(cfg)
    else:
        # vision->text connector (SmolVLM modality projection / PaliGemma
        # multi_modal_projector)
        rules.append((
            ("connector.modality_projection.proj.weight",
             "multi_modal_projector.linear.weight"),
            ("connector", "kernel"), "linear"))
        if cfg.connector_bias:
            rules.append((
                ("connector.modality_projection.proj.bias",
                 "multi_modal_projector.linear.bias"),
                ("connector", "bias"), "raw"))
        vis_pre = (("vision_tower.vision_model.", "vision_model.")
                   if layout == "paligemma" else ("vision_model.",))
        rules += _siglip_vision_rules(cfg, vis_pre)
    for i in range(cfg.text.layers):
        blk = (f"layer_{i}",)
        lyr = f"layers.{i}"
        rules += [
            (tc(f"{lyr}.self_attn.q_proj.weight"), blk + ("attn", "q", "kernel"), "linear"),
            (tc(f"{lyr}.self_attn.k_proj.weight"), blk + ("attn", "k", "kernel"), "linear"),
            (tc(f"{lyr}.self_attn.v_proj.weight"), blk + ("attn", "v", "kernel"), "linear"),
            (tc(f"{lyr}.self_attn.o_proj.weight"), blk + ("attn", "o", "kernel"), "linear"),
            (tc(f"{lyr}.input_layernorm.weight"), blk + ("ln1", "scale"), "raw"),
            (tc(f"{lyr}.post_attention_layernorm.weight"), blk + ("ln2", "scale"), "raw"),
            (tc(f"{lyr}.mlp.gate_proj.weight"), blk + ("mlp", "gate", "kernel"), "linear"),
            (tc(f"{lyr}.mlp.up_proj.weight"), blk + ("mlp", "up", "kernel"), "linear"),
            (tc(f"{lyr}.mlp.down_proj.weight"), blk + ("mlp", "down", "kernel"), "linear"),
        ]
        if cfg.text.attn_qkv_bias:  # Qwen2/2.5 text q/k/v biases
            rules += [
                (tc(f"{lyr}.self_attn.q_proj.bias"), blk + ("attn", "q", "bias"), "raw"),
                (tc(f"{lyr}.self_attn.k_proj.bias"), blk + ("attn", "k", "bias"), "raw"),
                (tc(f"{lyr}.self_attn.v_proj.bias"), blk + ("attn", "v", "bias"), "raw"),
            ]
    return rules


def _transform(value: np.ndarray, how: str) -> np.ndarray:
    if how == "linear":
        return value.T.astype(np.float32)
    if how == "patch_conv":
        # [hidden, C, k, k] -> patches flattened [k*k*C, hidden] matching the
        # processor's (row, col, channel) patch flattening
        h, c, kh, kw = value.shape
        return value.transpose(2, 3, 1, 0).reshape(kh * kw * c, h).astype(np.float32)
    if how == "patch_conv3d":
        # Qwen2.5-VL Conv3d [hidden, C, t, k, k] with temporal_patch_size t=2
        # and the image duplicated across frames: Linear(w)([x, x]) equals
        # (sum_t w_t) @ x, so the temporal dim folds into one 2-D kernel.
        h, c, t, kh, kw = value.shape
        v = value.sum(axis=2)
        return v.transpose(2, 3, 1, 0).reshape(kh * kw * c, h).astype(np.float32)
    if how.startswith("qkv_w_"):  # fused [3H, H] -> slice -> [H, H].T
        i = int(how[-1])
        h = value.shape[0] // 3
        return value[i * h : (i + 1) * h].T.astype(np.float32)
    if how.startswith("qkv_b_"):  # fused [3H] -> slice [H]
        i = int(how[-1])
        h = value.shape[0] // 3
        return value[i * h : (i + 1) * h].astype(np.float32)
    return value.astype(np.float32)


def convert_state_dict(
    state_dict: Dict[str, Any], cfg: ColVLMConfig
) -> Tuple[Dict[str, Any], Dict[str, List[str]]]:
    """HF state dict -> {'params': tree}; returns (params, report).

    report = {'matched': [...], 'missing': [...], 'unused': [...]}
    """
    normalized = {_strip_prefix(k): v for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    matched: List[str] = []
    missing: List[str] = []
    consumed: set = set()  # fused sources (qwen qkv) feed several paths
    for hf_key, path, how in param_mapping(cfg):
        candidates = hf_key if isinstance(hf_key, tuple) else (hf_key,)
        found = next((k for k in candidates if k in normalized), None)
        if found is None:
            missing.append(candidates[0])
            continue
        value = _transform(_np(normalized[found]), how)
        consumed.add(found)
        node = params
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = value
        matched.append(hf_key)
    for k in consumed:
        normalized.pop(k, None)
    if cfg.text.scan_layers:
        # scanned decoder layout: stack layer_{i} subtrees into the single
        # nn.scan param tree (leaves [L, ...]) under scan_blocks/layers_scan
        per_layer = [params.pop(f"layer_{i}", None)
                     for i in range(cfg.text.layers)]
        if all(p is not None for p in per_layer):
            def stack(nodes):
                if isinstance(nodes[0], dict):
                    return {k: stack([n[k] for n in nodes]) for k in nodes[0]}
                return np.stack(nodes)

            params["scan_blocks"] = {"layers_scan": {"block": stack(per_layer)}}
        else:
            missing.append("scan_blocks (incomplete per-layer decoder keys)")
    unused = sorted(normalized.keys())
    report = {"matched": matched, "missing": missing, "unused": unused}
    if missing:
        logger.warning("checkpoint conversion: %d keys missing (e.g. %s)",
                       len(missing), missing[:3])
    return {"params": params}, report


def _find_subconfigs(js: Dict[str, Any]):
    """Locate the text/vision sub-config dicts inside an HF ``config.json``.

    HF exports nest them differently per family (``text_config`` /
    ``vision_config`` at top level for Idefics3 and PaliGemma; sometimes
    under ``vlm_config`` for colpali-engine exports), so this walks the whole
    JSON and classifies any dict carrying ``hidden_size``: a text backbone
    has ``vocab_size``; a vision tower has ``patch_size``/``depth``.
    """
    text = None
    vision = None

    def walk(node):
        nonlocal text, vision
        if not isinstance(node, dict):
            return
        if "hidden_size" in node:
            if "vocab_size" in node and text is None:
                text = node
            elif ("patch_size" in node or "depth" in node) and vision is None:
                vision = node
        for v in node.values():
            walk(v)

    walk(js)
    return text, vision


def config_from_checkpoint(
    path: str,
    model_name: str = "",
    state_dict: Dict[str, Any] | None = None,
) -> ColVLMConfig:
    """Derive a ColVLMConfig from a local HF checkpoint directory.

    Turnkey real-weights path (reference loads shapes implicitly through
    colpali-engine's AutoModel, model_loader.py): start from the backend
    default for ``model_name`` (or the directory name), then override every
    field ``config.json`` specifies, and finally take ``embed_dim`` from the
    projection tensor's actual shape when a state dict is provided. Works on
    full-size exports and on tiny-random test exports alike.
    """
    import dataclasses
    import json
    import os

    from visual_rag_tpu.models.embedder import _CONFIG_BY_BACKEND, detect_backend

    backend = detect_backend(model_name or os.path.basename(os.path.normpath(path)))
    cfg: ColVLMConfig = _CONFIG_BY_BACKEND[backend]()

    cfg_path = os.path.join(path, "config.json")
    if os.path.isfile(cfg_path):
        with open(cfg_path, encoding="utf-8") as f:
            js = json.load(f)
        tjs, vjs = _find_subconfigs(js)
        if tjs:
            t = cfg.text
            heads = int(tjs.get("num_attention_heads", t.heads))
            cfg = dataclasses.replace(cfg, text=dataclasses.replace(
                t,
                hidden=int(tjs.get("hidden_size", t.hidden)),
                layers=int(tjs.get("num_hidden_layers", t.layers)),
                heads=heads,
                kv_heads=int(tjs.get("num_key_value_heads", heads)),
                mlp_hidden=int(tjs.get("intermediate_size", t.mlp_hidden)),
                vocab=int(tjs.get("vocab_size", t.vocab)),
                rope_theta=float(tjs.get("rope_theta", t.rope_theta)),
            ))
        if vjs:
            v = cfg.vision
            hidden = int(vjs.get("hidden_size", v.hidden))
            ps = int(vjs.get("patch_size", 0))
            mlp_ratio = (float(vjs["intermediate_size"]) / hidden
                         if "intermediate_size" in vjs else v.mlp_ratio)
            kw = dict(
                hidden=hidden,
                layers=int(vjs.get("depth", vjs.get("num_hidden_layers", v.layers))),
                heads=int(vjs.get("num_heads", vjs.get("num_attention_heads", v.heads))),
                mlp_ratio=mlp_ratio,
            )
            if ps:
                kw["patch_pixels"] = 3 * ps * ps
            if "fullatt_block_indexes" in vjs:  # Qwen2.5-VL windowed ViT
                kw["full_attn_layers"] = tuple(vjs["fullatt_block_indexes"])
                if ps and "window_size" in vjs:
                    kw["window_side"] = int(vjs["window_size"]) // (
                        ps * max(1, int(vjs.get("spatial_merge_size", 1))))
            cfg = dataclasses.replace(cfg, vision=dataclasses.replace(v, **kw))
            if "spatial_merge_size" in vjs:
                cfg = dataclasses.replace(
                    cfg, spatial_merge=int(vjs["spatial_merge_size"]))
        # Idefics3/SmolVLM pixel-shuffle factor (HF names it scale_factor)
        for src in (js, tjs or {}, vjs or {}):
            if "scale_factor" in src:
                cfg = dataclasses.replace(cfg, vision=dataclasses.replace(
                    cfg.vision, pixel_shuffle=int(src["scale_factor"])))
                break
        for key in ("image_token_id", "image_token_index"):
            if key in js:
                cfg = dataclasses.replace(cfg, image_token_id=int(js[key]))
        for key in ("embedding_dim", "dim"):
            if key in js:
                cfg = dataclasses.replace(cfg, embed_dim=int(js[key]))

    if state_dict:
        normalized = {_strip_prefix(k): v for k, v in state_dict.items()}
        for proj_key in ("custom_text_proj.weight", "embedding_proj_layer.weight"):
            if proj_key in normalized:
                # HF Linear [out, in]: out IS the late-interaction dim
                cfg = dataclasses.replace(
                    cfg, embed_dim=int(_np(normalized[proj_key]).shape[0]))
                break
        pos_key = next(
            (k for k in normalized
             if k.endswith("embeddings.position_embedding.weight")), None)
        if pos_key is not None and cfg.vision.pixel_shuffle <= 1:
            # sequential positions: the table's rows ARE the per-page patch
            # budget (with pixel shuffle the table is per-tile and max_patches
            # stays the page budget — see colvlm SigLIPVision pos sizing)
            rows = int(_np(normalized[pos_key]).shape[0])
            cfg = dataclasses.replace(
                cfg, vision=dataclasses.replace(cfg.vision, max_patches=rows))
    return cfg


def read_state_dict(path: str) -> Dict[str, Any]:
    """Load and merge all ``*.safetensors`` shards under a local directory."""
    import glob
    import os

    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {path}")
    from safetensors.numpy import load_file

    state: Dict[str, Any] = {}
    for f in files:
        state.update(load_file(f))
    return state


def load_checkpoint(path_or_repo: str, cfg: ColVLMConfig):
    """Load safetensors from a local dir or the HF hub (network gated)."""
    import os

    if not os.path.isdir(path_or_repo):  # hub repo id (network gated)
        from huggingface_hub import snapshot_download  # gated heavy dep

        path_or_repo = snapshot_download(
            path_or_repo, allow_patterns=["*.safetensors"])
    return convert_state_dict(read_state_dict(path_or_repo), cfg)


def validate_against_model(params, cfg: ColVLMConfig) -> List[str]:
    """Shape-check converted params against a fresh model init; returns issues."""
    import jax
    import jax.numpy as jnp

    from visual_rag_tpu.models.colvlm import ColVLM

    model = ColVLM(cfg)
    m2 = cfg.spatial_merge * cfg.spatial_merge
    n_patches = max(m2 * 4, 16)
    ref = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, 8), bool),
            jnp.zeros((1, n_patches, cfg.vision.patch_pixels)),
            jnp.zeros((1, n_patches), bool)))
    issues: List[str] = []

    def walk(ref_node, got_node, path):
        if hasattr(ref_node, "shape"):
            if got_node is None:
                issues.append(f"missing {path}")
            elif tuple(got_node.shape) != tuple(ref_node.shape):
                # pos_embed rows may legitimately differ (max_patches choice)
                if "pos_embed" not in path:
                    issues.append(
                        f"shape mismatch {path}: got {tuple(got_node.shape)} "
                        f"want {tuple(ref_node.shape)}")
            return
        for k, v in ref_node.items():
            walk(v, (got_node or {}).get(k), f"{path}/{k}")

    walk(ref, params, "")
    return issues
