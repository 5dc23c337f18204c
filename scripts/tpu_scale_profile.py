"""Large-corpus scale profile on the real TPU (VERDICT r1 item 3).

Builds an N-doc synthetic index ENTIRELY in HBM (no tunnel transfer), then
measures:
- end-to-end QPS for two_stage (pooled-query and query-tokens stage-1),
  three_stage, and (optionally) exhaustive single_full
- per-stage decomposition: stage-1 scan, top-k cut, rerank — with effective
  HBM bandwidth for the stage-1 scan (bytes-of-store / time-per-batch)
- jax.lax.approx_max_k vs top_k for the stage-1 cut (agreement + speed),
  re-testing the round-1 dead end at 100k+ docs as planned

Usage: python scripts/tpu_scale_profile.py --docs 200000 --dtype bfloat16
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def sync(x):
    """Force completion on the axon backend (block_until_ready can return
    before data exists over the tunnel; a scalar fetch cannot). Only ever
    call on SCALAR outputs — fetching a full array pays tunnel transfer."""
    return float(np.asarray(x).ravel()[0])


def best_of(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def timeit_device(fn, reps=5):
    """Sustained per-call seconds for a jitted fn returning a SCALAR: enqueue
    `reps` calls back-to-back (async dispatch pipelines the tunnel RTT) and
    sync once at the end."""
    r = fn()
    sync(r)  # warm + drain
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    sync(r)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--min-tokens", type=int, default=128)
    ap.add_argument("--max-tokens", type=int, default=256)
    ap.add_argument("--pooled-rows", type=int, default=12)
    ap.add_argument("--prefetch-k", type=int, default=200)
    ap.add_argument("--modes", default="pooled,tokens,three",
                    help="comma list of pooled,tokens,three (or 'none'); "
                         "single_full is added by --exhaustive")
    ap.add_argument("--stage-batch", type=int, default=256,
                    help="batch size for the per-stage decomposition "
                         "([B, D] f32 score transients OOM at bs=1024 "
                         "next to a 12 GB index)")
    ap.add_argument("--pipeline", action="store_true",
                    help="measure mode QPS with the pipelined batches API "
                         "(search_embedded_batches) instead of sequential "
                         "batch calls — comparable to the bench.py headline")
    ap.add_argument("--skip-stages", action="store_true")
    ap.add_argument("--exhaustive", action="store_true",
                    help="also run single_full (slow at scale)")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from visual_rag_tpu.index.synth import synthetic_index
    from visual_rag_tpu.parallel.sharded import (
        _local_pooled_padded,
        _local_tokens_padded,
    )
    from visual_rag_tpu.retrieval import RetrievalEngine
    from visual_rag_tpu.retrieval import batch as BATCH

    d = args.docs
    print(f"== building {d} docs ({args.dtype}) on device ==", flush=True)
    t0 = time.time()
    idx = synthetic_index(d, min_tokens=args.min_tokens,
                          max_tokens=args.max_tokens,
                          pooled_rows=args.pooled_rows,
                          storage_dtype=args.dtype)
    sync(idx.stores["global_pooling"].values)
    build_s = time.time() - t0
    gb = idx.nbytes() / 1e9
    print(f"built in {build_s:.0f}s, index {gb:.2f} GB", flush=True)

    engine = RetrievalEngine(idx)
    rng = np.random.default_rng(7)
    B = args.batch
    queries = [rng.standard_normal((int(rng.integers(8, 25)), 128)).astype(np.float32)
               for _ in range(B)]
    report = {"docs": d, "dtype": args.dtype, "batch": B,
              "index_gb": round(gb, 2), "build_s": round(build_s, 1)}

    # ---- end-to-end modes ---------------------------------------------------
    sel = set(args.modes.split(","))
    modes = [(n, kw) for key, n, kw in [
        ("pooled", "two_stage/pooled_q",
         dict(mode="two_stage", prefetch_k=args.prefetch_k,
              stage1_mode="pooled_query_vs_standard_pooling")),
        ("tokens", "two_stage/tokens",
         dict(mode="two_stage", prefetch_k=args.prefetch_k,
              stage1_mode="tokens_vs_standard_pooling")),
        ("three", "three_stage",
         dict(mode="three_stage", stage1_k=1000, stage2_k=300)),
    ] if key in sel]
    if args.exhaustive:
        modes.append(("single_full", dict(mode="single_full")))
    for name, kw in modes:
        kwr = dict(kw, top_k=10, with_payload=False)
        if args.pipeline:
            kwr["return_arrays"] = True
            n_rep = max(2, min(8, 4096 // B))
            for _ in engine.search_embedded_batches([queries] * 2, **kwr):
                pass  # warm
            dt = best_of(lambda: [None for _ in engine.search_embedded_batches(
                [queries] * n_rep, **kwr)]) / n_rep
        else:
            engine.search_embedded_batch(queries, **kwr)
            dt = best_of(lambda: engine.search_embedded_batch(queries, **kwr))
        qps = B / dt
        report[name] = {"qps": round(qps, 1), "ms_per_batch": round(dt * 1000, 1)}
        print(f"{name:24s} {qps:8.1f} QPS  ({dt * 1000:.1f} ms/batch of {B})",
              flush=True)
        if args.json_out:  # incremental: keep results if a later phase OOMs
            Path(args.json_out).write_text(json.dumps(report, indent=1))

    # ---- stage decomposition ------------------------------------------------
    if args.skip_stages:
        if args.json_out:
            Path(args.json_out).write_text(json.dumps(report, indent=1))
        print(json.dumps(report), flush=True)
        return
    if args.stage_batch < B:
        queries = queries[: args.stage_batch]
        B = args.stage_batch
        report["stage_batch"] = B
    tokens, qmask, pooled = BATCH.pad_queries(queries, 128)
    qmask = jnp.asarray(qmask, jnp.float32)
    s1 = engine._fused_arrays("mean_pooling")
    ragged = engine._fused_arrays("initial")
    store = idx.stores["mean_pooling"]
    store_bytes = store.values.size * store.values.dtype.itemsize

    # scalar-extracting jits: timing must not fetch [B, D] over the tunnel
    pooled_fn = jax.jit(lambda s, p: _local_pooled_padded(s, p))
    pooled_fn_s = jax.jit(lambda s, p: _local_pooled_padded(s, p)[0, 0])
    tokens_fn_s = jax.jit(
        lambda s, t, qm: _local_tokens_padded(s, t, qm, True)[0, 0])
    scores = pooled_fn(s1, pooled)
    t_pool = timeit_device(lambda: pooled_fn_s(s1, pooled))
    t_tok = timeit_device(lambda: tokens_fn_s(s1, tokens, qmask))
    bw_pool = store_bytes / t_pool / 1e9
    bw_tok = store_bytes / t_tok / 1e9
    print(f"stage1 pooled_q scan:   {t_pool*1000:7.2f} ms/batch  "
          f"eff-BW {bw_pool:6.1f} GB/s", flush=True)
    print(f"stage1 tokens scan:     {t_tok*1000:7.2f} ms/batch  "
          f"eff-BW {bw_tok:6.1f} GB/s (compute-bound at NQ~32)", flush=True)

    topk_fn = jax.jit(lambda s: jax.lax.top_k(s, args.prefetch_k)[1])
    topk_fn_s = jax.jit(lambda s: jax.lax.top_k(s, args.prefetch_k)[1][0, 0])
    t_topk = timeit_device(lambda: topk_fn_s(scores))
    approx_fn = jax.jit(lambda s: jax.lax.approx_max_k(s, args.prefetch_k)[1])
    approx_fn_s = jax.jit(
        lambda s: jax.lax.approx_max_k(s, args.prefetch_k)[1][0, 0])
    t_approx = timeit_device(lambda: approx_fn_s(scores))
    exact_ids = np.asarray(topk_fn(scores))
    approx_ids = np.asarray(approx_fn(scores))
    agree = np.mean([len(set(a) & set(b)) / len(a)
                     for a, b in zip(exact_ids, approx_ids)])
    print(f"topk cut (lax.top_k):   {t_topk*1000:7.2f} ms/batch", flush=True)
    print(f"approx_max_k cut:       {t_approx*1000:7.2f} ms/batch  "
          f"recall-vs-exact {agree:.4f}", flush=True)

    cand = jnp.asarray(exact_ids[:, :args.prefetch_k].astype(np.int32))
    from visual_rag_tpu.ops.kernels.maxsim_rerank import rerank_candidates

    max_len = idx.stores["initial"].max_len
    rr_fn = jax.jit(lambda rg, t, qm, c: rerank_candidates(
        rg["flat"], rg["offsets"], rg["lengths"], t, qm, c, max_len,
        doc_scales=rg.get("scales"))[0, 0])
    t_rr = timeit_device(lambda: rr_fn(ragged, tokens, qmask, cand))
    print(f"rerank {args.prefetch_k} cands:      {t_rr*1000:7.2f} ms/batch",
          flush=True)

    report["stages_ms"] = {
        "stage1_pooled_scan": round(t_pool * 1000, 2),
        "stage1_tokens_scan": round(t_tok * 1000, 2),
        "topk": round(t_topk * 1000, 2),
        "approx_max_k": round(t_approx * 1000, 2),
        "approx_recall": round(float(agree), 4),
        "rerank": round(t_rr * 1000, 2),
    }
    report["stage1_eff_gbps"] = {"pooled": round(bw_pool, 1),
                                 "tokens": round(bw_tok, 1)}
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(report, indent=1))
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
