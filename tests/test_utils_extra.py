"""Profiling, compilation cache, multihost helpers."""

import time


from visual_rag_tpu.utils.profiling import LatencyRecorder, trace


class TestLatencyRecorder:
    def test_metric_names_and_values(self):
        rec = LatencyRecorder()
        with rec.measure(4):
            time.sleep(0.02)
        with rec.measure(2):
            time.sleep(0.01)
        s = rec.summary()
        assert s["num_queries"] == 6
        # reference metric-name parity (run_qdrant_beir.py:423-442)
        for key in ("avg_latency_ms", "p95_latency_ms", "qps",
                    "wall_time_s", "search_time_s"):
            assert key in s
        assert s["avg_latency_ms"] >= 4.0  # 30ms / 6 queries
        assert s["qps"] > 0

    def test_empty_summary(self):
        s = LatencyRecorder().summary()
        assert s["num_queries"] == 0 and s["qps"] == 0.0


class TestTrace:
    def test_trace_writes_files(self, tmp_path):
        import jax.numpy as jnp

        with trace(str(tmp_path)) as log_dir:
            x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
            x.block_until_ready()
        import pathlib

        files = list(pathlib.Path(log_dir).rglob("*"))
        assert files, "profiler wrote nothing"


class TestCompilationCache:
    def test_enable_idempotent(self, tmp_path, monkeypatch):
        import visual_rag_tpu.utils.cache as cache

        monkeypatch.setattr(cache, "_enabled", False)
        monkeypatch.setenv("VISUALRAG_JAX_CACHE", str(tmp_path))
        assert cache.enable_compilation_cache() is True
        assert cache.enable_compilation_cache() is True  # second call no-op
        import pathlib

        # per-backend subdir created
        assert any(p.is_dir() for p in pathlib.Path(tmp_path).iterdir())


class TestMultihost:
    def test_single_host_noop(self, monkeypatch):
        from visual_rag_tpu.parallel import multihost

        monkeypatch.setattr(multihost, "_initialized", False)
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert multihost.initialize() is False

    def test_global_serving_mesh(self):
        from visual_rag_tpu.parallel.multihost import global_serving_mesh

        mesh = global_serving_mesh()
        assert mesh.axis_names == ("data",)
        assert int(mesh.shape["data"]) == 8  # the virtual CPU mesh
