"""End-to-end library-surface verification on the default backend (real TPU).

Drives ingest -> seal -> search across all 8 modes, checks the exhaustive
oracle invariant (two_stage prefetch>=corpus vs single_full at the documented
bf16 tolerance), and re-runs the edge-case probes from the verify skill.
Exits 0 and prints VERIFY_OK on success.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

t0 = time.time()
import jax  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

from visual_rag_tpu import IndexBuilder, RetrievalEngine  # noqa: E402
from visual_rag_tpu.index import CollectionSchema  # noqa: E402
from visual_rag_tpu.ops import (  # noqa: E402
    colsmol_experimental_pooling,
    global_mean_pooling,
    tile_level_mean_pooling,
)
from visual_rag_tpu.retrieval import build_filter  # noqa: E402

rng = np.random.default_rng(0)
b = IndexBuilder(CollectionSchema.standard(storage_dtype="bfloat16"))
for i in range(50):
    t = rng.standard_normal((int(rng.integers(4, 14)) * 64, 128)).astype(np.float32)
    mp = np.asarray(tile_level_mean_pooling(t, t.shape[0] // 64))
    b.add(
        f"p{i}",
        {
            "initial": t,
            "mean_pooling": mp,
            "experimental_pooling": np.asarray(
                colsmol_experimental_pooling(t, t.shape[0] // 64)
            ),
            "global_pooling": np.asarray(global_mean_pooling(mp)),
        },
        {"year": 2020 + i % 4},
    )
e = RetrievalEngine(b.seal())
q = rng.standard_normal((20, 128)).astype(np.float32)
print(f"sealed 50 docs @ {time.time()-t0:.1f}s", flush=True)

for mode in [
    "single_full",
    "single_tiles",
    "single_pooled",
    "single_global",
    "single_experimental_tokens",
    "single_experimental_pooled",
]:
    top = e.search_embedded(q, mode=mode, top_k=5, with_payload=False)[0]
    print(mode, top["id"], round(top.get("score", top.get("score_final", 0)), 4), flush=True)

ts = e.search_embedded(q, mode="two_stage", top_k=5, prefetch_k=50, with_payload=False)
th = e.search_embedded(q, mode="three_stage", top_k=5, stage1_k=100, stage2_k=30,
                       with_payload=False)
fl = e.search_embedded(q, mode="two_stage", filter_obj=build_filter(year=2022))
print("two_stage", ts[0]["id"], "three_stage", th[0]["id"], "filtered", fl[0]["id"], flush=True)
assert all(h["payload"]["year"] == 2022 for h in fl)

# Oracle: two_stage(prefetch>=corpus) vs single_full, bf16 tolerance
exact = e.search_embedded(q, mode="single_full", top_k=10, with_payload=False)
wide = e.search_embedded(q, mode="two_stage", top_k=10, prefetch_k=50, with_payload=False)
ids_e = [h["id"] for h in exact]
ids_w = [h["id"] for h in wide]
assert ids_e[0] == ids_w[0], (ids_e, ids_w)
assert len(set(ids_e) & set(ids_w)) >= 9, (ids_e, ids_w)
print("oracle ok", flush=True)

# Batched path parity vs per-query path (top-1 + overlap at bf16)
qs = [rng.standard_normal((int(rng.integers(8, 25)), 128)).astype(np.float32)
      for _ in range(8)]
bat = e.search_embedded_batch(qs, mode="two_stage", top_k=5, prefetch_k=50,
                              with_payload=False)
for qq, res in zip(qs, bat):
    ref = e.search_embedded(qq, mode="two_stage", top_k=5, prefetch_k=50,
                            with_payload=False)
    assert res[0]["id"] == ref[0]["id"]
print("batched parity ok", flush=True)

# Edge probes
try:
    e.search_embedded(q, mode="bogus")
    raise AssertionError("no ValueError")
except ValueError as err:
    assert "single_full" in str(err)
assert e.search_embedded(q, mode="two_stage", filter_obj=build_filter(year=1900)) == []
assert len(e.search_embedded(q, mode="single_full", top_k=500, with_payload=False)) == 50
empty = RetrievalEngine(IndexBuilder(CollectionSchema.standard()).seal())
assert empty.search_embedded(q) == []
print("edge probes ok", flush=True)

# r4 paths: packed query wire + scan rerank must match the padded/plain
# engine id-for-id (same math, different transport/stage-2 layout)
qs32 = [rng.standard_normal((int(rng.integers(8, 25)), 128)).astype(np.float32)
        for _ in range(32)]
ep = RetrievalEngine(e.index, query_wire="packed", rerank_impl="scan")
for res, ref in zip(
        ep.search_embedded_batch(qs32, mode="two_stage", top_k=5,
                                 prefetch_k=50, with_payload=False),
        e.search_embedded_batch(qs32, mode="two_stage", top_k=5,
                                prefetch_k=50, with_payload=False)):
    got, want = {h["id"] for h in res}, {h["id"] for h in ref}
    assert len(got & want) >= 4, (got, want)  # bf16 boundary ties allowed
print("packed/scan parity ok", flush=True)

# r4 sharded engine on the real chip (1-shard mesh), packed wire + scan
from visual_rag_tpu.parallel import ShardedEngine, ShardedIndex, make_mesh  # noqa: E402

mesh = make_mesh((1,), ("data",))
sp = ShardedEngine(ShardedIndex.from_index(e.index, mesh),
                   use_pallas=True, query_wire="packed", rerank_impl="scan")
for res, ref in zip(
        sp.search_embedded_batch(qs32, mode="two_stage", top_k=5,
                                 prefetch_k=50, with_payload=False),
        e.search_embedded_batch(qs32, mode="two_stage", top_k=5,
                                prefetch_k=50, with_payload=False)):
    got, want = {h["id"] for h in res}, {h["id"] for h in ref}
    assert len(got & want) >= 4, (got, want)
print("sharded packed/scan parity ok", flush=True)
print(f"VERIFY_OK in {time.time()-t0:.1f}s", flush=True)
