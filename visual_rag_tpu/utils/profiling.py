"""Profiling helpers: wall-clock metric accounting + jax.profiler traces.

SURVEY §5: the reference reports per-query latency lists -> avg/p95/QPS and
wall time (run_qdrant_beir.py:290-442) with no tracer. Here the same metric
names come out of :class:`LatencyRecorder`, and device-level traces come from
:func:`trace` (view with TensorBoard or xprof).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List


class LatencyRecorder:
    """Collects per-query latencies; summarizes with the reference's names."""

    def __init__(self) -> None:
        self.latencies: List[float] = []
        self._t0 = time.time()

    @contextlib.contextmanager
    def measure(self, n_queries: int = 1):
        start = time.time()
        yield
        dt = time.time() - start
        self.latencies.extend([dt / max(n_queries, 1)] * n_queries)

    def summary(self) -> Dict[str, Any]:
        import numpy as np

        lat = np.asarray(self.latencies or [0.0])
        wall = time.time() - self._t0
        total = float(lat.sum())
        return {
            "num_queries": len(self.latencies),
            "avg_latency_ms": float(lat.mean() * 1000),
            "p95_latency_ms": float(np.percentile(lat, 95) * 1000),
            "qps": (len(self.latencies) / total) if total > 0 else 0.0,
            "wall_time_s": wall,
            "search_time_s": total,
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/visual_rag_tpu_trace"):
    """Capture a jax.profiler device trace around a block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
