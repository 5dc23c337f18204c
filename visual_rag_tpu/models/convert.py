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


def param_mapping(cfg: ColVLMConfig) -> List[Tuple[str, Tuple[str, ...], str]]:
    """[(hf_key_pattern, flax_path, transform)] for the given config.

    transform: 'linear' (transpose [out,in]->[in,out]), 'raw', 'patch_conv'
    (conv [H, C, k, k] -> [k*k*C, H]), 'embed' (raw [vocab, hidden]).
    """
    rules: List[Tuple[str, Tuple[str, ...], str]] = [
        ("vision_model.embeddings.patch_embedding.weight",
         ("vision", "patch_embed", "kernel"), "patch_conv"),
        ("vision_model.embeddings.patch_embedding.bias",
         ("vision", "patch_embed", "bias"), "raw"),
        ("vision_model.embeddings.position_embedding.weight",
         ("vision", "pos_embed"), "raw"),
        ("vision_model.post_layernorm.weight", ("vision", "post_ln", "scale"), "raw"),
        ("vision_model.post_layernorm.bias", ("vision", "post_ln", "bias"), "raw"),
        ("text_model.embed_tokens.weight", ("tok_embed", "embedding"), "embed"),
        ("text_model.norm.weight", ("final_norm", "scale"), "raw"),
        # projection head name varies by backend (colpali vs smolvlm exports)
        (("custom_text_proj.weight", "embedding_proj_layer.weight"),
         ("embedding_proj", "kernel"), "linear"),
        # vision->text connector (SmolVLM modality projection / PaliGemma
        # multi_modal_projector); absent for merge>1 configs (PatchMerger)
        (("connector.modality_projection.proj.weight",
          "multi_modal_projector.linear.weight"),
         ("connector", "kernel"), "linear"),
        (("connector.modality_projection.proj.bias",
          "multi_modal_projector.linear.bias"),
         ("connector", "bias"), "raw"),
    ]
    for i in range(cfg.vision.layers):
        v = f"vision_model.encoder.layers.{i}"
        blk = ("vision", f"block_{i}")
        rules += [
            (f"{v}.self_attn.q_proj.weight", blk + ("attn", "q", "kernel"), "linear"),
            (f"{v}.self_attn.k_proj.weight", blk + ("attn", "k", "kernel"), "linear"),
            (f"{v}.self_attn.v_proj.weight", blk + ("attn", "v", "kernel"), "linear"),
            (f"{v}.self_attn.out_proj.weight", blk + ("attn", "o", "kernel"), "linear"),
            (f"{v}.layer_norm1.weight", blk + ("ln1", "scale"), "raw"),
            (f"{v}.layer_norm1.bias", blk + ("ln1", "bias"), "raw"),
            (f"{v}.layer_norm2.weight", blk + ("ln2", "scale"), "raw"),
            (f"{v}.layer_norm2.bias", blk + ("ln2", "bias"), "raw"),
            (f"{v}.mlp.fc1.weight", blk + ("fc1", "kernel"), "linear"),
            (f"{v}.mlp.fc1.bias", blk + ("fc1", "bias"), "raw"),
            (f"{v}.mlp.fc2.weight", blk + ("fc2", "kernel"), "linear"),
            (f"{v}.mlp.fc2.bias", blk + ("fc2", "bias"), "raw"),
        ]
    for i in range(cfg.text.layers):
        t = f"text_model.layers.{i}"
        blk = (f"layer_{i}",)
        rules += [
            (f"{t}.self_attn.q_proj.weight", blk + ("attn", "q", "kernel"), "linear"),
            (f"{t}.self_attn.k_proj.weight", blk + ("attn", "k", "kernel"), "linear"),
            (f"{t}.self_attn.v_proj.weight", blk + ("attn", "v", "kernel"), "linear"),
            (f"{t}.self_attn.o_proj.weight", blk + ("attn", "o", "kernel"), "linear"),
            (f"{t}.input_layernorm.weight", blk + ("ln1", "scale"), "raw"),
            (f"{t}.post_attention_layernorm.weight", blk + ("ln2", "scale"), "raw"),
            (f"{t}.mlp.gate_proj.weight", blk + ("mlp", "gate", "kernel"), "linear"),
            (f"{t}.mlp.up_proj.weight", blk + ("mlp", "up", "kernel"), "linear"),
            (f"{t}.mlp.down_proj.weight", blk + ("mlp", "down", "kernel"), "linear"),
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
    for hf_key, path, how in param_mapping(cfg):
        candidates = hf_key if isinstance(hf_key, tuple) else (hf_key,)
        found = next((k for k in candidates if k in normalized), None)
        if found is None:
            missing.append(candidates[0])
            continue
        value = _transform(_np(normalized.pop(found)), how)
        node = params
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = value
        matched.append(hf_key)
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


def load_checkpoint(path_or_repo: str, cfg: ColVLMConfig):
    """Load safetensors from a local dir or the HF hub (network gated)."""
    import glob
    import os

    files: List[str] = []
    if os.path.isdir(path_or_repo):
        files = sorted(glob.glob(os.path.join(path_or_repo, "*.safetensors")))
    else:  # hub repo id
        from huggingface_hub import snapshot_download  # gated heavy dep

        local = snapshot_download(path_or_repo, allow_patterns=["*.safetensors"])
        files = sorted(glob.glob(os.path.join(local, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {path_or_repo}")
    from safetensors.numpy import load_file

    state: Dict[str, Any] = {}
    for f in files:
        state.update(load_file(f))
    return convert_state_dict(state, cfg)


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
