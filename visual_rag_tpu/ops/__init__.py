"""Device-native math ops: pooling kernels, MaxSim scoring, quantization.

These are the TPU-native re-implementations of the reference's numpy pooling
module (reference: visual_rag/embedding/pooling.py) and of the MaxSim scoring
that the reference delegates to the external Qdrant server.
"""

from visual_rag_tpu.ops.pooling import (  # noqa: F401
    adaptive_row_mean_pooling_from_grid,
    colpali_experimental_pooling_from_rows,
    colpali_row_mean_pooling,
    colsmol_experimental_pooling,
    colsmol_tile_4n_pooling_from_tiles,
    global_mean_pooling,
    sequence_chunk_mean_pooling,
    tile_level_mean_pooling,
    weighted_row_smoothing_same_length,
)
from visual_rag_tpu.ops.maxsim import (  # noqa: F401
    compute_maxsim_batch,
    compute_maxsim_score,
    l2_normalize,
    maxsim_scores_padded,
)
