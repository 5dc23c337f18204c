"""visual_rag_tpu — TPU-native visual document retrieval framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``Ara-Yeroyan/visual-rag-toolkit`` (reference at /root/reference): ColBERT/ColPali
late-interaction retrieval over visual document pages, with the external Qdrant
scoring engine replaced by an in-process, HBM-resident, device-native index and
query engine.

Layer map (mirrors reference ``visual_rag/__init__.py`` but TPU-first):

- :mod:`visual_rag_tpu.ops`      — pooling / MaxSim math as XLA+Pallas kernels
- :mod:`visual_rag_tpu.index`    — device-resident named-vector index (replaces Qdrant)
- :mod:`visual_rag_tpu.retrieval`— single/two/three-stage query planner
- :mod:`visual_rag_tpu.models`   — JAX ColVLM embedders (replaces torch/colpali-engine)
- :mod:`visual_rag_tpu.parallel` — mesh-sharded corpus + distributed top-k merge
- :mod:`visual_rag_tpu.pipeline` — PDF -> images -> embeddings -> index ingest
- :mod:`visual_rag_tpu.utils`    — metrics, deterministic IDs, atomic IO
"""

from __future__ import annotations

import logging
import sys

__version__ = "0.1.0"

_LOG_FORMAT = "%(asctime)s | %(levelname)-7s | %(name)s | %(message)s"


def setup_logging(level: int = logging.INFO, stream=None) -> logging.Logger:
    """Configure the package logger (reference: visual_rag/__init__.py:39-59).

    Idempotent: repeated calls update the level without stacking handlers.
    """
    logger = logging.getLogger("visual_rag_tpu")
    logger.setLevel(level)
    if not logger.handlers:
        handler = logging.StreamHandler(stream or sys.stderr)
        handler.setFormatter(logging.Formatter(_LOG_FORMAT, datefmt="%H:%M:%S"))
        logger.addHandler(handler)
    return logger


# Default logger attached at import, INFO level (reference behavior,
# visual_rag/__init__.py:66-74), but without emoji noise.
setup_logging()

# Lazy attribute access for heavy submodules so that `import visual_rag_tpu`
# stays cheap and does not force jax initialization (reference uses the same
# lazy-optional-import pattern at visual_rag/__init__.py:79-123).
_LAZY_ATTRS = {
    "VisualEmbedder": "visual_rag_tpu.models.embedder",
    "ColVLM": "visual_rag_tpu.models.colvlm",
    "IndexBuilder": "visual_rag_tpu.index.builder",
    "SealedIndex": "visual_rag_tpu.index.store",
    "RetrievalEngine": "visual_rag_tpu.retrieval.engine",
    "MultiVectorRetriever": "visual_rag_tpu.retrieval.facade",
    "ProcessingPipeline": "visual_rag_tpu.pipeline.pipeline",
    "load_config": "visual_rag_tpu.config",
    "demo": "visual_rag_tpu.demo_runner",
}


def __getattr__(name: str):
    target = _LAZY_ATTRS.get(name)
    if target is None:
        raise AttributeError(f"module 'visual_rag_tpu' has no attribute {name!r}")
    import importlib

    mod = importlib.import_module(target)
    value = getattr(mod, name)
    globals()[name] = value
    return value


def __dir__():
    return sorted(list(globals().keys()) + list(_LAZY_ATTRS.keys()))
