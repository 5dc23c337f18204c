"""Persistent XLA compilation cache setup.

Fused query plans and Pallas kernels can take minutes to compile on remote/
tunneled TPUs; the persistent cache makes every shape a one-time cost across
processes. Enabled by the engine, bench, and graft entry points (idempotent).
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_enabled = False


def enable_compilation_cache(path: str | None = None) -> bool:
    global _enabled
    if os.environ.get("VISUALRAG_DISABLE_COMPILE_CACHE"):
        # kill switch: forced-CPU dry runs disable the cache so AOT results
        # compiled under other host CPU feature sets don't spray
        # machine-mismatch warnings (and CPU compiles are cheap anyway)
        return False
    if _enabled:
        return True
    try:
        import jax

        cache_dir = path or os.environ.get(
            "VISUALRAG_JAX_CACHE", os.path.expanduser("~/.cache/visual_rag_tpu_jax"))
        # per-backend subdirs: cpu executables cached from another process's
        # feature detection trip XLA's machine-mismatch warnings otherwise
        cache_dir = os.path.join(cache_dir, jax.default_backend())
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _enabled = True
        return True
    except Exception as exc:  # cache is an optimization, never a requirement
        logger.info("compilation cache unavailable: %s", exc)
        return False
