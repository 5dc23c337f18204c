"""int8-query (qdot) exhaustive-scan microbenchmark on the real chip.

Times ops/kernels/maxsim_scan.exhaustive_scores_packed on an int8 store with
bf16 queries (the r4 default) vs int8-quantized queries (qdot_int8=True:
int8 x int8 -> int32 MXU dot at 2x the bf16 rate on v5e), and reports the
score agreement + top-10 overlap between the two.

Usage: python scripts/tpu_qdot_bench.py [n_docs] [n_queries]
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
import jax.numpy as jnp  # noqa: E402

from visual_rag_tpu.index.synth import synthetic_index  # noqa: E402
from visual_rag_tpu.ops.kernels.maxsim_scan import (  # noqa: E402
    exhaustive_scores_packed,
)
from visual_rag_tpu.retrieval import batch as B  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_Q = int(sys.argv[2]) if len(sys.argv) > 2 else 256
MIN_T, MAX_T = (128, 256) if N_DOCS >= 30_000 else (320, 832)

print("backend", jax.default_backend(), flush=True)
idx = synthetic_index(N_DOCS, min_tokens=MIN_T, max_tokens=MAX_T,
                      pooled_rows=10, storage_dtype="int8", seed=0)
store = idx.store("initial")
print(f"store: {N_DOCS} docs x {MIN_T}-{MAX_T} tok int8, "
      f"max_len={store.max_len}", flush=True)

rng = np.random.default_rng(1)
qs = [rng.standard_normal((int(rng.integers(8, 25)), 128)).astype(np.float32)
      for _ in range(N_Q)]
(q1, pos, qid), nq, _rg = B.pack_queries_grouped(qs, 128, group=16)
qn = q1 / (np.linalg.norm(q1, axis=1, keepdims=True) + 1e-8)
qn = qn * (qid.reshape(-1) >= 0)[:, None]
qnj, qidj = jnp.asarray(qn), jnp.asarray(qid)


def run(qdot):
    return exhaustive_scores_packed(
        store.flat, store.offsets, store.lengths, qnj, qidj,
        store.max_len, b=N_Q, doc_scales=store.scales, qdot_int8=qdot)


def timed(qdot, reps=5):
    out = run(qdot)  # warm/compile
    _ = float(np.asarray(out[:1, :1])[0, 0])  # force materialization (axon)
    best = 1e9
    for _i in range(reps):
        t0 = time.time()
        out = run(qdot)
        _ = float(np.asarray(out[:1, :1])[0, 0])
        best = min(best, time.time() - t0)
    return best, out


t_b, s_b = timed(False)
t_q, s_q = timed(True)
sb, sq = np.asarray(s_b), np.asarray(s_q)
ov = np.mean([
    len(set(np.argsort(-sb[i])[:10]) & set(np.argsort(-sq[i])[:10])) / 10
    for i in range(min(64, N_Q))])
print(f"bf16-q scan: {t_b*1000:8.1f} ms/batch  ({N_Q/t_b:7.0f} QPS device-side)")
print(f"int8-q scan: {t_q*1000:8.1f} ms/batch  ({N_Q/t_q:7.0f} QPS device-side)")
print(f"speedup: {t_b/t_q:.2f}x  |  max |ds|={np.abs(sb-sq).max():.2e}  "
      f"top-10 overlap={ov:.3f}")
