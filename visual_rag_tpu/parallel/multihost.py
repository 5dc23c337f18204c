"""Multi-host (pod) initialization over DCN.

SURVEY §2.5 / §5: the reference's only "distribution" is a remote Qdrant
server; the TPU-native equivalent scales past one host by initializing
``jax.distributed`` over DCN and building the serving/training mesh across all
processes' devices. Single-host environments (like this dev box) are a no-op.

Usage (one call per process, before any jax computation):

    from visual_rag_tpu.parallel.multihost import initialize
    initialize()                       # from TPU pod env vars
    initialize(coordinator="host0:1234", num_processes=4, process_id=hostidx)
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

_initialized = False


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed; returns True when multi-process is active.

    With no args, relies on the TPU pod metadata / env vars
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID) that
    ``jax.distributed.initialize`` reads natively.
    """
    global _initialized
    if _initialized:
        return True
    import jax

    env_coord = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    single_host = env_coord is None and num_processes in (None, 1)
    if single_host:
        logger.info("single-host run; jax.distributed not initialized")
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    logger.info("jax.distributed initialized: process %d / %d",
                jax.process_index(), jax.process_count())
    return True


def global_serving_mesh(axis: str = "data"):
    """All-process device mesh for corpus sharding (ICI within hosts, DCN across)."""
    import jax

    from visual_rag_tpu.parallel.mesh import make_mesh

    return make_mesh((jax.device_count(),), (axis,), devices=jax.devices())
