"""Query planner: single/two/three-stage retrieval over the device index.

Mode surface parity with the reference facade (SURVEY Appendix B):
``single_full``, ``single_tiles``, ``single_pooled``, ``single_global``,
``single_experimental_tokens``, ``single_experimental_pooled``, ``two_stage``
(5 stage-1 modes), ``three_stage``.
"""

from visual_rag_tpu.retrieval.engine import RetrievalEngine  # noqa: F401
from visual_rag_tpu.retrieval.facade import MultiVectorRetriever  # noqa: F401
from visual_rag_tpu.retrieval.filters import build_filter, PayloadFilter  # noqa: F401
