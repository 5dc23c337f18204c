"""Measure cross-query rerank dedup (VERDICT r2 #4) on the real TPU.

Compares rerank_candidates vs rerank_candidates_dedup at the serving shape
(B=256 queries x K=200 candidates, 100k-doc bf16 corpus) on:
  * uniform candidates (worst case for dedup: ~no sharing) — must not regress
  * skewed candidates (queries share hot docs; zipf-ish pools) — the win case
Also asserts on-chip score parity between the two kernels.

Run from the repo root: python scripts/tpu_rerank_dedup_bench.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def timed(fn, *args, reps=5, **kw):
    out = fn(*args, **kw)
    out.block_until_ready()
    float(np.asarray(out[0, 0]))  # force a real fetch (axon: block can lie)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        float(np.asarray(out[0, 0]))
        best = min(best, time.perf_counter() - t0)
    return out, best * 1e3


def main():
    import jax.numpy as jnp

    from visual_rag_tpu.index.synth import synthetic_index
    from visual_rag_tpu.ops.kernels.maxsim_rerank import (
        rerank_candidates,
        rerank_candidates_dedup,
    )
    from visual_rag_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    b, k, nq, dim = 256, 200, 24, 128
    print(f"corpus: {d} docs bf16; rerank {b}x{k} candidates", flush=True)
    index = synthetic_index(d, min_tokens=320, max_tokens=832,
                            storage_dtype="bfloat16", seed=0)
    store = index.stores["initial"]
    rng = np.random.default_rng(1)
    q = rng.standard_normal((b, nq, dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True) + 1e-8
    qm = np.ones((b, nq), np.float32)
    qj, qmj = jnp.asarray(q), jnp.asarray(qm)

    cases = {
        "uniform": rng.integers(0, d, (b, k)).astype(np.int32),
        # skewed: all queries draw from a 2k-doc hot pool (~96% dup rate)
        "skewed_2k_pool": rng.integers(0, 2000, (b, k)).astype(np.int32),
        # moderately skewed: 10k pool (~80% dup rate)
        "skewed_10k_pool": rng.integers(0, 10_000, (b, k)).astype(np.int32),
    }
    for name, cand in cases.items():
        uniq = len(np.unique(cand[cand >= 0]))
        cj = jnp.asarray(cand)
        plain, t_plain = timed(
            rerank_candidates, store.flat, store.offsets, store.lengths,
            qj, qmj, cj, store.max_len)
        dedup, t_dedup = timed(
            rerank_candidates_dedup, store.flat, store.offsets, store.lengths,
            qj, qmj, cj, store.max_len)
        pd, dd = np.asarray(plain), np.asarray(dedup)
        err = np.abs(np.where(pd < -1e29, 0, pd - dd)).max()
        agree = ((pd < -1e29) == (dd < -1e29)).all()
        print(f"{name:16s} uniq={uniq:6d}/{b*k}  plain={t_plain:7.2f} ms  "
              f"dedup={t_dedup:7.2f} ms  speedup={t_plain/t_dedup:5.2f}x  "
              f"max_err={err:.2e} neginf_agree={bool(agree)}", flush=True)


if __name__ == "__main__":
    main()
