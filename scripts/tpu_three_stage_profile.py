"""Profile three_stage at corpus scale, per stage (VERDICT r4 #4).

three_stage @100k was 1785-1818 QPS in the r3 refresh vs two_stage 3119+ —
this script decomposes one batch into its plan stages so the wall is named:
  s1    pooled query vs global_pooling scan + approx cut to stage1_k
  s2    gathered MaxSim of query tokens vs the stage-1 candidates'
        experimental_pooling rows + exact cut to stage2_k
  s3    exact rerank of the stage-2 survivors (dedup/sweep/scan policy)
and measures the full pipelined mode at several batch sizes next to
two_stage on the same corpus.

Usage: python scripts/tpu_three_stage_profile.py [--docs 100000]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def _sync(x):
    return float(np.asarray(x).ravel()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100000)
    ap.add_argument("--batches", type=str, default="256,1024,2048")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--s1k", type=int, default=1000)
    ap.add_argument("--s2k", type=int, default=300)
    ap.add_argument("--skip-qps", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from visual_rag_tpu.index.synth import synthetic_index
    from visual_rag_tpu.parallel import sharded as S
    from visual_rag_tpu.retrieval import RetrievalEngine
    from visual_rag_tpu.retrieval import batch as B
    from visual_rag_tpu.retrieval import plans

    idx = synthetic_index(args.docs)
    engine = RetrievalEngine(idx)
    rng = np.random.default_rng(7)
    out = {"docs": args.docs, "s1k": args.s1k, "s2k": args.s2k}

    # ---- pipelined mode QPS at each batch size: three_stage vs two_stage
    for bs in ([] if args.skip_qps
               else [int(x) for x in args.batches.split(",")]):
        queries = [rng.standard_normal((int(rng.integers(8, 25)), 128))
                   .astype(np.float32) for _ in range(bs)]
        for mode, kw in (
            ("three_stage", dict(mode="three_stage", stage1_k=args.s1k,
                                 stage2_k=args.s2k)),
            ("two_stage", dict(mode="two_stage", prefetch_k=200)),
        ):
            kwr = dict(kw, top_k=10, with_payload=False, return_arrays=True)
            try:
                for _ in engine.search_embedded_batches([queries] * 2, **kwr):
                    pass
                best = 0.0
                for _ in range(args.reps):
                    t0 = time.time()
                    n_rep = max(2, 8192 // bs)
                    for _ in engine.search_embedded_batches(
                            [queries] * n_rep, **kwr):
                        pass
                    best = max(best, n_rep * bs / (time.time() - t0))
                out[f"{mode}_qps_bs{bs}"] = round(best, 1)
            except Exception as e:
                out[f"{mode}_qps_bs{bs}"] = f"ERR {type(e).__name__}: {e}"
            print(f"# {mode} bs={bs}: {out[f'{mode}_qps_bs{bs}']}",
                  file=sys.stderr, flush=True)

    # ---- per-stage decomposition at bs=256 (jitted pieces, warm best-of)
    bs = 256
    queries = [rng.standard_normal((int(rng.integers(8, 25)), 128))
               .astype(np.float32) for _ in range(bs)]
    dim = 128
    (q1, q2, q3), nq, _rg = B.pack_queries_grouped(queries, dim,
                                                   wire_dtype=np.float32)
    gstore = engine._fused_arrays("global_pooling")
    estore = engine._fused_arrays("experimental_pooling")
    ragged = engine._fused_arrays("initial")
    max_len = idx.stores["initial"].max_len
    ds = idx.num_docs
    use_pallas = engine.batch_scorer.use_pallas
    approx = engine._approx_cut(min(args.s1k, args.s2k))

    # stores are passed as ARGUMENTS: closing over device arrays embeds
    # them as HLO constants -> remote_compile HTTP 413 at corpus scale
    @jax.jit
    def stage1(gstore, ragged, q1, q2, q3):
        tokens, qmask, pooled, packed = plans._prep_wire(
            q1, q2, q3, "packed", bs, nq)
        s1 = S._local_stage1("pooled_single", gstore, ragged, tokens, qmask,
                             pooled, ds, max_len, use_pallas)
        v1, c1 = plans._topk_masked(s1, args.s1k, None, approx=approx)
        return tokens, qmask, c1

    @jax.jit
    def stage2(estore, tokens, qmask, c1):
        s2c = S._gathered_tokens_padded(estore, tokens, qmask, c1)
        v2, pos2 = jax.lax.top_k(s2c, args.s2k)
        c2 = jnp.where(v2 > plans.NEG_INF / 2,
                       jnp.take_along_axis(c1, pos2, axis=1), -1)
        return c2.astype(jnp.int32)

    impl = engine._rerank_impl(bs, args.s2k, n_docs=ds,
                               m_packed=int(q1.shape[0]),
                               rg=int(q3.shape[1]))
    out["rerank_impl_bs256"] = impl

    @jax.jit
    def stage3(ragged, q1, q2, q3, c2):
        tokens, qmask, pooled, packed = plans._prep_wire(
            q1, q2, q3, "packed", bs, nq)
        rr = S._local_rerank(ragged, tokens, qmask, c2, max_len, use_pallas,
                             impl=impl, packed=packed)
        vals, pos = jax.lax.top_k(rr, 10)
        return vals

    tokens, qmask, c1 = stage1(gstore, ragged, q1, q2, q3)
    c2 = stage2(estore, tokens, qmask, c1)
    _sync(stage3(ragged, q1, q2, q3, c2))

    def best_of(f, *a):
        best = 1e9
        for _ in range(max(3, args.reps)):
            t0 = time.time()
            r = f(*a)
            _sync(r[-1] if isinstance(r, tuple) else r)
            best = min(best, time.time() - t0)
        return round(best * 1000, 1)

    out["s1_ms"] = best_of(stage1, gstore, ragged, q1, q2, q3)
    out["s2_ms"] = best_of(stage2, estore, tokens, qmask, c1)
    out["s3_ms"] = best_of(stage3, ragged, q1, q2, q3, c2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
