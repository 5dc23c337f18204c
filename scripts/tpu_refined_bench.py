"""Engine-level int8 vs int8_refined throughput at corpus scale.

int8_refined scans with int8-quantized queries (qdot: 2x MXU rate) and
re-scores the final window at 12-bit precision — since r4 it should be
FASTER than plain int8 at higher ranking quality. Measures single_full and
two_stage through the pipelined engine path on the real chip.

Usage: python scripts/tpu_refined_bench.py [n_docs] [batch] [reps]
Honors VISUALRAG_PLATFORM=cpu for smoke runs.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))  # noqa: E402,E501
import os
import time

import numpy as np

if os.environ.get("VISUALRAG_PLATFORM"):
    os.environ["JAX_PLATFORMS"] = os.environ["VISUALRAG_PLATFORM"]
import jax  # noqa: E402
if os.environ.get("VISUALRAG_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VISUALRAG_PLATFORM"])

from visual_rag_tpu.index.synth import synthetic_index  # noqa: E402
from visual_rag_tpu.retrieval import RetrievalEngine  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
BS = int(sys.argv[2]) if len(sys.argv) > 2 else 256
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
MIN_T, MAX_T = (128, 256) if N_DOCS >= 30_000 else (320, 832)

print("backend", jax.default_backend(), flush=True)
rng = np.random.default_rng(1)
qs = [rng.standard_normal((int(rng.integers(8, 25)), 128)).astype(np.float32)
      for _ in range(BS)]
batches = [qs]

for dtype in ("int8", "int8_refined"):
    t0 = time.time()
    idx = synthetic_index(N_DOCS, min_tokens=MIN_T, max_tokens=MAX_T,
                          pooled_rows=10, storage_dtype=dtype, seed=0)
    eng = RetrievalEngine(idx)
    print(f"[{dtype}] synth+engine in {time.time()-t0:.0f} s", flush=True)
    for mode, kw in (("single_full", {}),
                     ("two_stage", dict(prefetch_k=200))):
        run = dict(mode=mode, top_k=10, with_payload=False,
                   return_arrays=True, **kw)
        for _ in eng.search_embedded_batches(batches * 2, **run):  # warm
            pass
        best = 1e9
        for _ in range(REPS):
            t0 = time.time()
            for _r in eng.search_embedded_batches(batches * 4, **run):
                pass
            best = min(best, (time.time() - t0) / 4)
        print(f"[{dtype}] {mode:12s} {best*1000:7.1f} ms/batch "
              f"({BS/best:6.0f} QPS)", flush=True)
    del idx, eng  # free HBM before the next dtype
