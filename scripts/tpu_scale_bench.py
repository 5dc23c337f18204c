"""Scale benchmark: QPS vs corpus size (3k / 10k / 30k docs)."""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import time

import numpy as np

from visual_rag_tpu.index import CollectionSchema, IndexBuilder
from visual_rag_tpu.retrieval import RetrievalEngine

rng = np.random.default_rng(0)
DIM = 128
queries = [rng.standard_normal((int(rng.integers(8, 25)), DIM)).astype(np.float32)
           for _ in range(128)]

for d in (3000, 10000, 30000):
    builder = IndexBuilder(CollectionSchema.standard(storage_dtype="bfloat16"))
    t0 = time.time()
    for i in range(d):
        n_tiles = int(rng.integers(5, 14))
        tokens = rng.standard_normal((n_tiles * 64, DIM)).astype(np.float32)
        mp = tokens.reshape(n_tiles, 64, DIM).mean(axis=1)
        builder.add(f"d{i}", {
            "initial": tokens, "mean_pooling": mp,
            "experimental_pooling": np.concatenate([mp[:-1], tokens[-64:]]),
            "global_pooling": mp.mean(axis=0)})
    acc = time.time() - t0
    t0 = time.time()
    engine = RetrievalEngine(builder.seal())
    seal = time.time() - t0
    print(f"D={d}: accumulate {acc:.0f}s seal {seal:.0f}s "
          f"({engine.index.nbytes()/1e6:.0f} MB)", flush=True)
    for mode, kw in [("two_stage", dict(prefetch_k=200,
                                        stage1_mode="tokens_vs_experimental_pooling")),
                     ("three_stage", dict(stage1_k=1000, stage2_k=300))]:
        engine.search_embedded_batch(queries[:64], mode=mode, top_k=10, **kw)  # warm
        t0 = time.time()
        for s in range(0, 128, 64):
            engine.search_embedded_batch(queries[s:s+64], mode=mode, top_k=10, **kw)
        dt = time.time() - t0
        print(f"  D={d} {mode}: {128/dt:.0f} QPS ({dt/128*1000:.2f} ms/q)", flush=True)
