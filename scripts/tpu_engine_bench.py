"""End-to-end engine benchmark on the real TPU: QPS per mode, batch sweep."""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import time

import jax
import numpy as np

from visual_rag_tpu.index import CollectionSchema, IndexBuilder
from visual_rag_tpu.retrieval import RetrievalEngine

print("backend", jax.default_backend())
rng = np.random.default_rng(0)
D, DIM = 3000, 128
builder = IndexBuilder(CollectionSchema.standard(storage_dtype="bfloat16"))
t0 = time.time()
for i in range(D):
    n_tiles = int(rng.integers(5, 14))
    n = n_tiles * 64
    tokens = rng.standard_normal((n, DIM)).astype(np.float32)
    mp = tokens.reshape(n_tiles, 64, DIM).mean(axis=1)
    builder.add(
        f"d{i}",
        {
            "initial": tokens,
            "mean_pooling": mp,
            "experimental_pooling": np.concatenate([mp[:-1], tokens[-64:]]),
            "global_pooling": mp.mean(axis=0),
        },
        {"year": 2020 + i % 4},
    )
print(f"host accumulate {time.time()-t0:.1f}s")
t0 = time.time()
idx = builder.seal()
print(f"seal {time.time()-t0:.1f}s; {idx.nbytes()/1e6:.0f} MB, docs {idx.num_docs}")
engine = RetrievalEngine(idx)

queries = [
    rng.standard_normal((int(rng.integers(8, 25)), DIM)).astype(np.float32)
    for _ in range(256)
]

for mode, kw in [
    ("two_stage", dict(prefetch_k=200, stage1_mode="tokens_vs_experimental_pooling")),
    ("two_stage", dict(prefetch_k=200, stage1_mode="pooled_query_vs_standard_pooling")),
    ("three_stage", dict(stage1_k=1000, stage2_k=300)),
    ("single_full", {}),
    ("single_tiles", {}),
]:
    for bs in (64,):
        # warm
        engine.search_embedded_batch(queries[:bs], mode=mode, top_k=10, **kw)
        t0 = time.time()
        n_done = 0
        for s in range(0, 256, bs):
            engine.search_embedded_batch(queries[s : s + bs], mode=mode, top_k=10, **kw)
            n_done += min(bs, 256 - s)
        dt = time.time() - t0
        print(f"{mode:12s} {str(kw)[:48]:48s} bs={bs:3d}: "
              f"{n_done/dt:8.1f} QPS  ({dt/n_done*1000:.2f} ms/q)")

# per-query (reference-style sequential) for comparison
engine.search_embedded(queries[0], mode="two_stage", top_k=10, prefetch_k=200)
t0 = time.time()
for q in queries[:32]:
    engine.search_embedded(q, mode="two_stage", top_k=10, prefetch_k=200)
dt = time.time() - t0
print(f"sequential two_stage: {32/dt:.1f} QPS ({dt/32*1000:.2f} ms/q)")
