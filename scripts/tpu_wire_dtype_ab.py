"""A/B: f32 vs f16 query wire at serving batch sizes on the real TPU.

The r4 decision (f32 wire) assumed the saved transfer was ~10 ms; the r5
drift instrumentation measured the tunnel at 20-60 MB/s content-compressed,
making the 12.5 MB saved per 2048-query batch worth 100-600 ms. Interleaved
A/B in ONE process (the only comparison this box's drift allows).
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main():
    from visual_rag_tpu.index.synth import synthetic_index
    from visual_rag_tpu.retrieval import RetrievalEngine

    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    idx = synthetic_index(docs, min_tokens=320, max_tokens=832,
                          pooled_rows=10, storage_dtype="bfloat16", seed=0)
    engines = {
        "f32": RetrievalEngine(idx, wire_dtype="f32"),
        "f16": RetrievalEngine(idx, wire_dtype="f16"),
    }
    rng = np.random.default_rng(1)
    qs = [rng.standard_normal((int(rng.integers(8, 25)), 128)).astype(np.float32)
          for _ in range(bs)]
    kw = dict(mode="two_stage", top_k=10, prefetch_k=200, with_payload=False,
              return_arrays=True)
    rung = [qs]
    n_rep = max(2, 8192 // bs)

    for name, e in engines.items():
        for _ in e.search_embedded_batches(rung * 2, **kw):
            pass  # warm/compile
        print(f"# warmed {name}", flush=True)

    # id parity spot check (f16 rounding may flip exact near-ties only)
    a = engines["f32"].search_embedded_batch(qs[:64], mode="two_stage",
                                             top_k=10, prefetch_k=200,
                                             with_payload=False)
    b = engines["f16"].search_embedded_batch(qs[:64], mode="two_stage",
                                             top_k=10, prefetch_k=200,
                                             with_payload=False)
    ov = np.mean([len({h["id"] for h in x} & {h["id"] for h in y}) / 10
                  for x, y in zip(a, b)])
    t1 = np.mean([x[0]["id"] == y[0]["id"] for x, y in zip(a, b)])
    print(f"# top-10 overlap f16 vs f32: {ov:.4f}, top-1 agree {t1:.3f}",
          flush=True)

    res = {"f32": [], "f16": []}
    for it in range(6):
        for name, e in engines.items():
            t0 = time.time()
            for _ in e.search_embedded_batches(rung * n_rep, **kw):
                pass
            qps = n_rep * bs / (time.time() - t0)
            res[name].append(qps)
            print(f"iter {it} {name}: {qps:7.1f} QPS", flush=True)
    for name, v in res.items():
        v = sorted(v)
        print(f"{name}: min {v[0]:.0f} med {v[len(v)//2]:.0f} "
              f"max {v[-1]:.0f} QPS", flush=True)


if __name__ == "__main__":
    main()
