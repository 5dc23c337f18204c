"""Device-resident named-vector index — the TPU-native replacement for Qdrant.

A collection holds, per document, several *named vector* representations
(reference schema: qdrant_indexer.py:197-247, SURVEY Appendix A):

- ``initial``            ragged [n_tokens, 128] full token matrix (MaxSim)
- ``mean_pooling``       small multivector (tile/row means)
- ``experimental_*``     smoothed / conv pooled multivectors
- ``global_pooling``     one vector per doc

Here these live as HBM-resident arrays: pooled multivectors in dense padded
[D, P, dim] layout (single-einsum MaxSim on the MXU), the full token store in
padding-free ragged layout with per-doc offset tables, and payloads host-side
in a manifest.
"""

from visual_rag_tpu.index.store import (  # noqa: F401
    PaddedMultiVectors,
    RaggedMultiVectors,
    SingleVectors,
    SealedIndex,
)
from visual_rag_tpu.index.builder import IndexBuilder, CollectionSchema  # noqa: F401
from visual_rag_tpu.index.manifest import Manifest  # noqa: F401
from visual_rag_tpu.index.persist import load_sealed, save_sealed  # noqa: F401
