"""Multi-chip serving: corpus sharded over an ICI mesh with distributed top-k.

This is the TPU-native replacement for the reference's "Qdrant server as the
scoring cluster" (SURVEY §2.5): the document axis is sharded over a
``jax.sharding.Mesh`` axis, every query plan runs per-shard under
``shard_map`` (Pallas kernels inside on TPU), and stages merge through
all-gather + replicated top-k so results are *bit-identical* to the
single-device engine (same candidate sets, same tie-breaking by doc id).
"""

from visual_rag_tpu.parallel.mesh import make_mesh  # noqa: F401
from visual_rag_tpu.parallel.sharded import ShardedIndex, ShardedEngine  # noqa: F401
from visual_rag_tpu.parallel.pipeline import gpipe_apply, pipelined_decoder  # noqa: F401
from visual_rag_tpu.parallel.ring_attention import ring_attention  # noqa: F401
