"""JAX ColVLM embedders — the device-native replacement for torch/colpali-engine.

The reference drives four torch ColVLM backends (ColSmol-500M / ColPali-v1.3 /
ColQwen2 / ColQwen2.5 — reference visual_embedder.py:63-68) through one
VisualEmbedder facade. Here the same facade sits on a config-driven flax
ColVLM: SigLIP-style vision tower, optional Qwen-style 2x2 patch merger,
Llama/Gemma-style decoder LM with GQA+RoPE, and a 128-d late-interaction
projection head. Training (models/train.py) is the in-batch-negative
late-interaction contrastive objective used by the ColPali family.
"""

from visual_rag_tpu.models.colvlm import ColVLM, ColVLMConfig  # noqa: F401
from visual_rag_tpu.models.embedder import VisualEmbedder  # noqa: F401
