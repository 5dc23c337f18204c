"""Pallas TPU kernels for the retrieval hot paths.

- :mod:`prefetch_topk` — blocked batched MaxSim over padded pooled stores
  (stage-1 prefetch; replaces Qdrant's HNSW+comparator, exactly)
- :mod:`maxsim_rerank` — fused gather-free exact MaxSim over candidates'
  ragged token blocks streamed from HBM (stage-2 rerank)
- :mod:`maxsim_scan` — streaming exhaustive MaxSim over the whole ragged
  store (single_full at corpus scale: each doc window DMA'd once, scored
  against the group-packed query batch, similarity tiles never touch HBM)

Both kernels fall back to interpret mode on non-TPU backends (tests run them
interpreted on CPU against the XLA oracle).
"""

from visual_rag_tpu.ops.kernels.prefetch_topk import (  # noqa: F401
    pooled_maxsim_scores,
    pooled_maxsim_scores_qbatch,
)
from visual_rag_tpu.ops.kernels.maxsim_rerank import rerank_candidates  # noqa: F401
from visual_rag_tpu.ops.kernels.maxsim_scan import exhaustive_scores_packed  # noqa: F401
