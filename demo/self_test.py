"""Engine smoke test (reference demo/test_qdrant_connection.py).

The reference pings the external Qdrant server; here the engine is
in-process, so the equivalent health check builds a tiny synthetic
collection on the ambient backend and runs every search mode through it.

    python -m demo.self_test
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_self_test(num_docs: int = 64, verbose: bool = True) -> dict:
    import jax
    import numpy as np

    from visual_rag_tpu.index.synth import synthetic_index
    from visual_rag_tpu.retrieval import RetrievalEngine, build_filter

    out: dict = {"backend": jax.default_backend(),
                 "devices": jax.device_count()}
    t0 = time.time()
    idx = synthetic_index(num_docs, min_tokens=32, max_tokens=96,
                          pooled_rows=6, payload_years=3)
    engine = RetrievalEngine(idx)
    out["build_s"] = round(time.time() - t0, 2)
    q = np.random.default_rng(0).standard_normal((12, 128)).astype(np.float32)
    modes = ["single_full", "single_tiles", "single_pooled", "single_global",
             "single_experimental_tokens", "single_experimental_pooled",
             "two_stage", "three_stage"]
    for mode in modes:
        t0 = time.time()
        res = engine.search_embedded(q, mode=mode, top_k=3, prefetch_k=16,
                                     stage1_k=32, stage2_k=16)
        ok = len(res) == 3
        out[mode] = {"ok": ok, "ms": round((time.time() - t0) * 1000, 1)}
        if verbose:
            print(f"{mode:28s} {'OK' if ok else 'FAIL'} "
                  f"({out[mode]['ms']} ms)")
    res = engine.search_embedded(q, mode="two_stage", top_k=10,
                                 filter_obj=build_filter(year=2019))
    out["filtered"] = {"ok": all(r["payload"]["year"] == 2019 for r in res)}
    out["ok"] = all(v.get("ok", True) for v in out.values()
                    if isinstance(v, dict))
    if verbose:
        print("self test:", "PASS" if out["ok"] else "FAIL")
    return out


if __name__ == "__main__":
    sys.exit(0 if run_self_test()["ok"] else 1)
