"""Multi-host init: mocked wiring checks + a REAL 2-process group test.

The real test (TestRealTwoProcessGroup) spawns two subprocesses that each
force a 4-device virtual CPU platform, join one jax.distributed group over
localhost (Gloo collectives — the CPU stand-in for DCN), shard a corpus over
the 8-device global mesh, and assert sharded-search id parity against the
single-device engine in BOTH processes. SURVEY §2.5 DCN row, un-mocked.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import jax
import pytest

from visual_rag_tpu.parallel import multihost


@pytest.fixture(autouse=True)
def reset_state(monkeypatch):
    monkeypatch.setattr(multihost, "_initialized", False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    yield


class TestInitialize:
    def test_single_host_is_noop(self):
        assert multihost.initialize() is False

    def test_explicit_args_call_jax_distributed(self, monkeypatch):
        calls = {}

        def fake_init(coordinator_address=None, num_processes=None,
                      process_id=None):
            calls.update(addr=coordinator_address, n=num_processes,
                         pid=process_id)

        monkeypatch.setattr(jax.distributed, "initialize", fake_init)
        ok = multihost.initialize(coordinator="host0:1234", num_processes=4,
                                  process_id=2)
        assert ok is True
        assert calls == {"addr": "host0:1234", "n": 4, "pid": 2}
        # second call short-circuits (no re-init)
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: pytest.fail("re-initialized"))
        assert multihost.initialize() is True

    def test_env_coordinator_triggers_init(self, monkeypatch):
        called = []
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "pod-leader:8476")
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: called.append(kw))
        assert multihost.initialize() is True
        # env-driven path lets jax.distributed read the env itself
        assert called == [
            {"coordinator_address": None, "num_processes": None,
             "process_id": None}]


class TestGlobalServingMesh:
    def test_covers_all_devices(self):
        mesh = multihost.global_serving_mesh()
        assert mesh.axis_names == ("data",)
        assert mesh.devices.size == jax.device_count()


class TestRealTwoProcessGroup:
    def test_sharded_search_id_parity_across_processes(self):
        """2 live processes x 4 CPU devices -> one 8-device serving mesh."""
        worker = Path(__file__).parent / "multihost_worker.py"
        with socket.socket() as s:  # grab a free localhost port
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(pid), str(port)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env)
            for pid in (0, 1)
        ]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=420)
                outs.append(out)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            pytest.fail(f"multi-host workers timed out; partial: {outs}")
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
            assert f"MULTIHOST_SEARCH_OK pid={pid}" in out, out[-2000:]
