"""Subprocess worker for the REAL 2-process multi-host test (test_multihost.py).

Each worker forces a 4-device virtual CPU platform, joins a 2-process
jax.distributed group over localhost (Gloo collectives), builds the same
41-doc corpus, shards it over the 8-device global mesh, and asserts sharded
search ids equal the single-device engine for two_stage / single_full /
three_stage. Replaces the DCN leg of SURVEY 2.5 with a live process group.
"""
import os, sys
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
pid = int(sys.argv[1]); port = sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
from visual_rag_tpu.parallel import multihost
multihost.initialize(coordinator=f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2 and jax.device_count() == 8
import numpy as np
from visual_rag_tpu.index import CollectionSchema, IndexBuilder
from visual_rag_tpu.retrieval import RetrievalEngine
from visual_rag_tpu.parallel.sharded import ShardedEngine, ShardedIndex

rng = np.random.default_rng(77)
builder = IndexBuilder(CollectionSchema.standard(storage_dtype="float32", dim=32))
for i in range(41):
    builder.add(f"doc{i}", {
        "initial": rng.standard_normal((int(rng.integers(5, 40)), 32)).astype(np.float32),
        "mean_pooling": rng.standard_normal((int(rng.integers(3, 9)), 32)).astype(np.float32),
        "experimental_pooling": rng.standard_normal((int(rng.integers(3, 11)), 32)).astype(np.float32),
        "global_pooling": rng.standard_normal((32,)).astype(np.float32),
    }, {"year": 2020 + i % 3})
index = builder.seal()
mesh = multihost.global_serving_mesh()
assert mesh.devices.size == 8
sengine = ShardedEngine(ShardedIndex.from_index(index, mesh, axis="data"), use_pallas=False)
queries = [np.random.default_rng(300 + i).standard_normal((7, 32)).astype(np.float32)
           for i in range(3)]
got = {}
for mode, kw in [("two_stage", dict(prefetch_k=12)), ("single_full", {}),
                 ("three_stage", dict(stage1_k=20, stage2_k=9))]:
    res = sengine.search_embedded_batch(queries, mode=mode, top_k=5,
                                        with_payload=False, **kw)
    got[mode] = [[r["id"] for r in row] for row in res]
ref_engine = RetrievalEngine(index, compute_dtype="float32")
for mode, kw in [("two_stage", dict(prefetch_k=12)), ("single_full", {}),
                 ("three_stage", dict(stage1_k=20, stage2_k=9))]:
    ref = ref_engine.search_embedded_batch(queries, mode=mode, top_k=5,
                                           with_payload=False, **kw)
    want = [[r["id"] for r in row] for row in ref]
    assert got[mode] == want, (pid, mode, got[mode], want)
print(f"MULTIHOST_SEARCH_OK pid={pid}", flush=True)
