"""Seal-path decomposition at corpus scale (VERDICT r4 #7).

The r2 numbers — seal 30k docs ~= 112 s, 60k ~= 149 s — were described as
"tunnel-transfer bound" without a measurement. This script builds a host
corpus (the reference's upload_batch hot path, qdrant_indexer.py:341-507),
then decomposes IndexBuilder.seal() into its phases:

  host     per-store concatenate + native pack_aligned (normalize+scatter)
           + dtype conversion (bf16 RNE loop / per-doc int8 quantize)
  wire     jnp.asarray device transfers: count, bytes, seconds -> MB/s

plus a raw tunnel-bandwidth probe (256 MB and 1 GB single transfers) so the
wire share can be named a bandwidth wall or an overhead problem.

Usage: python scripts/tpu_seal_profile.py [--docs 60000]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

if os.environ.get("VISUALRAG_PLATFORM"):
    os.environ["JAX_PLATFORMS"] = os.environ["VISUALRAG_PLATFORM"]
    import jax

    jax.config.update("jax_platforms", os.environ["VISUALRAG_PLATFORM"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=60000)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--min-tokens", type=int, default=128)
    ap.add_argument("--max-tokens", type=int, default=256)
    ap.add_argument("--pooled-rows", type=int, default=12)
    ap.add_argument("--probe-bw", action="store_true",
                    help="raw tunnel bandwidth probe (256 MB + 1 GB)")
    ap.add_argument("--legacy", action="store_true",
                    help="force the legacy one-shot build + per-transfer "
                         "wire attribution (syncs each transfer, so do NOT "
                         "use it to time the streaming path)")
    ap.add_argument("--compare", action="store_true",
                    help="run legacy, streaming, legacy again in ONE process "
                         "(same drift window) and report the speedup")
    args = ap.parse_args()
    if args.legacy:
        os.environ["VISUALRAG_SEAL_STREAM"] = "never"

    import jax
    import jax.numpy as jnp

    from visual_rag_tpu import native
    from visual_rag_tpu.index import CollectionSchema, IndexBuilder

    out = {"docs": args.docs, "dtype": args.dtype}

    def sync(x):
        return float(np.asarray(x).ravel()[0])

    if args.probe_bw:
        for mb in (256, 1024):
            buf = np.zeros((mb * 1024 * 1024 // 256, 128), dtype=np.float16)
            sync(jnp.asarray(buf[:128]))  # claim + warm path
            t0 = time.time()
            dev = jnp.asarray(buf)
            sync(dev[:1])
            dt = time.time() - t0
            out[f"probe_{mb}mb_s"] = round(dt, 2)
            out[f"probe_{mb}mb_mbps"] = round(mb / dt, 1)
            print(f"# raw transfer {mb} MB: {dt:.2f}s = {mb/dt:.0f} MB/s",
                  file=sys.stderr, flush=True)
            del dev, buf

    # ---- host corpus (rng mats, reference's post-embedding shapes) ---------
    rng = np.random.default_rng(3)
    t0 = time.time()
    b = IndexBuilder(CollectionSchema.standard(storage_dtype=args.dtype))
    for i in range(args.docs):
        n = int(rng.integers(args.min_tokens, args.max_tokens + 1))
        t = rng.standard_normal((n, 128)).astype(np.float32)
        mp = rng.standard_normal((args.pooled_rows, 128)).astype(np.float32)
        b.add(f"p{i}", {"initial": t, "mean_pooling": mp,
                        "experimental_pooling": mp,
                        "global_pooling": mp.mean(axis=0)})
    out["host_gen_s"] = round(time.time() - t0, 1)
    print(f"# host corpus generated in {out['host_gen_s']}s",
          file=sys.stderr, flush=True)

    # ---- instrumented seal: phase timers around the store builders ---------
    # (mirrors IndexBuilder.seal(); store.py build() is the unit under test)
    from visual_rag_tpu.index import store as ST

    # Pay the axon terminal claim BEFORE timing: the first jit EXECUTION in a
    # process can stall 4-12 min (CLAUDE.md); any real serving/bench process
    # pays it once at engine warm-up, so charging it to the seal would
    # misattribute a fixed process cost to the seal path (round-5 finding:
    # the streaming chunk loop ran in ~10 s while the final sync waited ~240 s
    # on the claim).
    import jax as _jax
    import jax.numpy as _jnp

    t0 = time.time()
    sync(_jax.jit(lambda x: x + 1.0)(_jnp.zeros((8, 128))))
    out["claim_s"] = round(time.time() - t0, 1)
    print(f"# terminal claim + first compile: {out['claim_s']}s",
          file=sys.stderr, flush=True)

    phases = {}
    wire_bytes = 0
    wire_s = 0.0
    n_transfers = 0

    orig_asarray = jnp.asarray

    def timed_asarray(x, *a, **kw):
        nonlocal wire_bytes, wire_s, n_transfers
        arr = np.asarray(x)
        t0 = time.time()
        dev = orig_asarray(arr, *a, **kw)
        sync(dev.ravel()[:1])
        wire_s += time.time() - t0
        wire_bytes += arr.size * arr.dtype.itemsize
        n_transfers += 1
        return dev

    def run_seal(mode):
        """One full seal pass; mode 'legacy' (with wire attribution) or
        'streaming'. Returns a result dict."""
        nonlocal wire_bytes, wire_s, n_transfers
        wire_bytes, wire_s, n_transfers = 0, 0.0, 0
        os.environ["VISUALRAG_SEAL_STREAM"] = (
            "never" if mode == "legacy" else "always")
        phases = {}
        t_seal0 = time.time()
        stores = {}
        for name, spec in b.schema.vectors.items():
            mats = b._vectors[name]
            t0 = time.time()
            if mode == "legacy":
                ST.jnp.asarray = timed_asarray
            try:
                if spec.layout == "ragged":
                    stores[name] = ST.RaggedMultiVectors.build(
                        mats, storage_dtype=args.dtype, dim=spec.dim)
                elif spec.layout == "padded":
                    stores[name] = ST.PaddedMultiVectors.build(
                        mats, storage_dtype=args.dtype, dim=spec.dim)
                else:
                    stores[name] = ST.SingleVectors.build(
                        mats, storage_dtype=args.dtype, dim=spec.dim)
            finally:
                ST.jnp.asarray = orig_asarray
            # force materialization: per-store walls include in-flight chunks
            main = getattr(stores[name], "flat", None)
            if main is None:
                main = stores[name].values
            sync(main.ravel()[:1])
            phases[name] = round(time.time() - t0, 2)
            print(f"# [{mode}] store {name}: {phases[name]}s "
                  f"(wire so far {wire_bytes/1e6:.0f} MB in {wire_s:.1f}s)",
                  file=sys.stderr, flush=True)
        res = {"mode": mode,
               "seal_total_s": round(time.time() - t_seal0, 1),
               "per_store_s": phases}
        if mode == "legacy":
            res["wire_transfers"] = n_transfers
            res["wire_mb"] = round(wire_bytes / 1e6, 1)
            res["wire_s"] = round(wire_s, 1)
            res["wire_mbps"] = (round(wire_bytes / 1e6 / wire_s, 1)
                                if wire_s else None)
            res["host_s"] = round(res["seal_total_s"] - wire_s, 1)
        del stores
        return res

    if args.compare:
        # same process, same drift window: legacy first (its fresh-page
        # faults are the real first-build cost), streaming second, then a
        # second legacy pass to bracket drift
        out["legacy"] = run_seal("legacy")
        out["streaming"] = run_seal("streaming")
        out["legacy2"] = run_seal("legacy")
        lg = min(out["legacy"]["seal_total_s"], out["legacy2"]["seal_total_s"])
        out["speedup_vs_best_legacy"] = round(
            lg / out["streaming"]["seal_total_s"], 2)
    else:
        out.update(run_seal("legacy" if args.legacy else "streaming"))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
