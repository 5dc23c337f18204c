"""Multi-host init wiring (mocked jax.distributed; no pod available here)."""


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
