"""Cross-cutting utilities: IR metrics, deterministic IDs, atomic IO."""

from visual_rag_tpu.utils.metrics import mrr_at_k, ndcg_at_k, recall_at_k  # noqa: F401
from visual_rag_tpu.utils.ids import generate_point_id, union_point_id  # noqa: F401
