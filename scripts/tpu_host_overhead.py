"""Decompose the per-batch host/tunnel overhead of search_embedded_batch.

At every corpus size the fused two_stage batch costs ~140 ms while the device
stages sum to ~15-40 ms — this script measures where the rest goes:
query padding, host->device transfer (f32 vs bf16 wire), plan dispatch+fetch,
and result assembly.

Usage: python scripts/tpu_host_overhead.py [--docs 30000]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=30000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from visual_rag_tpu.index.synth import synthetic_index
    from visual_rag_tpu.retrieval import RetrievalEngine
    from visual_rag_tpu.retrieval import batch as BATCH
    from visual_rag_tpu.retrieval import plans

    idx = synthetic_index(args.docs)
    engine = RetrievalEngine(idx)
    rng = np.random.default_rng(7)
    B = args.batch
    queries = [rng.standard_normal((int(rng.integers(8, 25)), 128)).astype(np.float32)
               for _ in range(B)]

    # full end-to-end
    kw = dict(mode="two_stage", top_k=10, prefetch_k=200,
              stage1_mode="pooled_query_vs_standard_pooling", with_payload=False)
    engine.search_embedded_batch(queries, **kw)
    t0 = time.time()
    for _ in range(args.reps):
        engine.search_embedded_batch(queries, **kw)
    t_e2e = (time.time() - t0) / args.reps

    # 1) host padding
    t0 = time.time()
    for _ in range(args.reps):
        tokens, qmask, pooled = BATCH.pad_queries(queries, 128)
    t_pad = (time.time() - t0) / args.reps

    # 2) host->device transfer of the padded batch (f32 vs bf16 wire)
    def xfer(arrs):
        outs = [jax.device_put(a) for a in arrs]
        for o in outs:
            o.block_until_ready()
        float(np.asarray(outs[0]).ravel()[0])  # axon: force real completion
        return outs

    tok_np = np.asarray(tokens)
    t0 = time.time()
    for _ in range(args.reps):
        xfer([tok_np, np.asarray(qmask), np.asarray(pooled)])
    t_xfer32 = (time.time() - t0) / args.reps
    tok16 = tok_np.astype(np.float16)
    t0 = time.time()
    for _ in range(args.reps):
        xfer([tok16, np.asarray(qmask), np.asarray(pooled)])
    t_xfer16 = (time.time() - t0) / args.reps

    # 3) plan dispatch + scalar sync (device work + RTT, no result fetch).
    # Plans now take RAW tokens + qmask (prep happens in-plan).
    tokens_d = jnp.asarray(tokens)
    qmask_d = jnp.asarray(qmask, jnp.float32)
    s1 = engine._fused_arrays("mean_pooling")
    ragged = engine._fused_arrays("initial")
    common = dict(kind="pooled_padded", pk=200, k=10, ds=idx.num_docs,
                  max_len=idx.stores["initial"].max_len,
                  use_pallas=engine.batch_scorer.use_pallas,
                  approx=engine._approx_cut(200))
    vals, ids = plans.two_stage_plan(s1, ragged, None, tokens_d, qmask_d,
                                     **common)
    float(np.asarray(vals).ravel()[0])
    t0 = time.time()
    for _ in range(args.reps):
        vals, ids = plans.two_stage_plan(s1, ragged, None, tokens_d, qmask_d,
                                         **common)
        float(np.asarray(vals)[0, 0])
    t_plan = (time.time() - t0) / args.reps

    # 4) result fetch + assembly
    t0 = time.time()
    for _ in range(args.reps):
        engine._batch_results(ids, False, score_stage2=vals, score_final=vals)
    t_asm = (time.time() - t0) / args.reps

    out = {
        "docs": args.docs, "batch": B,
        "e2e_ms": round(t_e2e * 1000, 1),
        "pad_ms": round(t_pad * 1000, 1),
        "xfer_f32_ms": round(t_xfer32 * 1000, 1),
        "xfer_f16_ms": round(t_xfer16 * 1000, 1),
        "plan_dispatch_ms": round(t_plan * 1000, 1),
        "assembly_ms": round(t_asm * 1000, 1),
        "tokens_mb": round(tok_np.nbytes / 1e6, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
