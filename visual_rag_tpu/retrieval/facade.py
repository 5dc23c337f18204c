"""MultiVectorRetriever: the text-in, results-out facade.

API parity with the reference facade (multi_vector.py:30-247): owns the
embedder and the engine, `search(query_text)` embeds then delegates,
`search_embedded(mode=...)` exposes the full mode surface, `build_filter`
re-exported. The reference's latent three_stage TypeError
(multi_vector.py:238-245) is fixed here: three_stage accepts stage1_k/stage2_k
and `search()` forwards them.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

from visual_rag_tpu.retrieval.engine import RetrievalEngine
from visual_rag_tpu.retrieval.filters import PayloadFilter, build_filter

logger = logging.getLogger(__name__)


class MultiVectorRetriever:
    """Embedder + engine behind one search call (reference facade parity)."""

    def __init__(
        self,
        index=None,
        *,
        index_dir: Optional[str] = None,
        collection: Optional[str] = None,
        embedder=None,
        model_name: str = "vidore/colSmol-500M",
        experimental_vector_name: str = "experimental_pooling",
        compute_dtype: Optional[str] = None,
    ):
        if index is None:
            if index_dir is None or collection is None:
                raise ValueError("pass a SealedIndex or index_dir+collection")
            from visual_rag_tpu.index import IndexBuilder

            index = IndexBuilder.load(Path(index_dir) / collection).seal()
        if embedder is None:
            from visual_rag_tpu.models.embedder import VisualEmbedder

            embedder = VisualEmbedder(model_name)
        self.embedder = embedder
        self.engine = RetrievalEngine(
            index,
            experimental_vector_name=experimental_vector_name,
            compute_dtype=compute_dtype,
        )

    # -- facade API ----------------------------------------------------------

    build_filter = staticmethod(build_filter)

    def search(
        self,
        query_text: str,
        mode: str = "two_stage",
        top_k: int = 10,
        prefetch_k: Optional[int] = None,
        stage1_mode: str = "pooled_query_vs_standard_pooling",
        stage1_k: Optional[int] = None,
        stage2_k: Optional[int] = None,
        filter_obj: Optional[PayloadFilter] = None,
    ) -> List[Dict[str, Any]]:
        """Embed the text and search (reference multi_vector.py:152-177).

        Routed through the fused single-dispatch batch plan (B=1): the
        unfused per-query path pays one device round trip per stage.
        """
        q = self.embedder.embed_query(query_text)
        return self.engine.search_embedded_batch(
            [q], mode=mode, top_k=top_k, prefetch_k=prefetch_k,
            stage1_mode=stage1_mode, stage1_k=stage1_k, stage2_k=stage2_k,
            filter_obj=filter_obj)[0]

    def search_embedded(self, query_embedding, **kwargs) -> List[Dict[str, Any]]:
        return self.engine.search_embedded(query_embedding, **kwargs)

    def search_batch(self, query_texts: Sequence[str], **kwargs):
        """Batched text search — the TPU-native high-QPS path."""
        embs = self.embedder.embed_queries(list(query_texts))
        return self.engine.search_embedded_batch(embs, **kwargs)
