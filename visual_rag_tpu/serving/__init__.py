"""In-process serving layer: HTTP API with dynamic request batching."""

from visual_rag_tpu.serving.aserver import AsyncSearchServer  # noqa: F401
from visual_rag_tpu.serving.server import DynamicBatcher, SearchServer  # noqa: F401
from visual_rag_tpu.serving.workers import MultiWorkerServer  # noqa: F401
