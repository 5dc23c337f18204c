"""A/B: tokens-mode stage-1 kernel formulations at corpus scale.

The r5 scale decomposition measured the packed tokens stage-1 at 150-250 ms
per 256-query batch at 200k-500k docs (~10% MXU): `_kernel_packed` runs the
pooled store's P rows as P separate [Rg,dim]x[dim,BD] matmuls inside a
fori_loop, each with K=128 and VPU max/mask between them. Variants here fold
the P loop into ONE [Rg,dim] x [P*BD,dim]^T MXU dot and reduce max over P on
the reshaped (lane-aligned) output.

Usage: python scripts/tpu_tokens_kernel_ab.py [docs] [batch]
"""

import functools
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from visual_rag_tpu.index.synth import synthetic_index
    from visual_rag_tpu.ops.kernels.prefetch_topk import (
        pooled_maxsim_scores_packed,
    )
    from visual_rag_tpu.retrieval import batch as B

    NEG_INF = -1e30
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    idx = synthetic_index(docs, min_tokens=128, max_tokens=256,
                          pooled_rows=12, storage_dtype="bfloat16", seed=3)
    store = idx.stores["mean_pooling"]
    vals_t = jnp.moveaxis(store.values, 1, 0)  # [P, D, dim]
    mask_t = jnp.moveaxis(jnp.asarray(store.mask, jnp.float32), 1, 0)

    rng = np.random.default_rng(5)
    qs = [rng.standard_normal((int(rng.integers(8, 25)), 128)).astype(np.float32)
          for _ in range(bs)]
    (q1, q2, q3), nq, rg = B.pack_queries_grouped(qs, 128,
                                                  wire_dtype=np.float32)
    qp = jnp.asarray(q1)          # [G*Rg, dim]
    qid = jnp.asarray(q3)         # [G, Rg] int32 owner
    g, rg = qid.shape
    gq = bs // g
    seg = (jax.lax.broadcasted_iota(jnp.int32, (g, gq, rg), 1)
           == qid[:, None, :]).astype(jnp.float32)
    # normalize query tokens like plans._prep_queries does
    qn = qp / jnp.maximum(jnp.linalg.norm(qp, axis=1, keepdims=True), 1e-12)

    def sync(x):
        # fetch ONE element (x[:1,:1] is a device slice) — np.asarray(x)
        # would pull the whole [B, D] f32 matrix through the tunnel
        return float(np.asarray(x[:1, :1])[0, 0])

    def timeit(name, fn, *args, n=5):
        out = fn(*args)
        sync(out)
        best = 1e9
        for _ in range(n):
            t0 = time.time()
            out = fn(*args)
            sync(out)
            best = min(best, time.time() - t0)
        print(f"{name:24s} {best*1000:8.2f} ms/batch of {bs}", flush=True)
        return out

    # ---- current kernel -----------------------------------------------------
    cur = functools.partial(pooled_maxsim_scores_packed, block_d=256)
    ref = timeit("current packed", lambda: cur(vals_t, mask_t, qn, seg))

    # ---- V1: single fused dot, f32 sims, max over P on reshaped output ------
    def make_fused(bd, sims_dtype):
        def kern(vals_ref, mask_ref, q_ref, seg_ref, out_ref):
            p, _bd, dim = vals_ref.shape
            rg_ = q_ref.shape[1]
            q = q_ref[0]
            flat = vals_ref[...].reshape(p * _bd, dim)  # leading-dim flatten
            sims = jax.lax.dot_general(
                q, flat.astype(q.dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=sims_dtype,
            )  # [Rg, P*BD]
            sims3 = sims.reshape(rg_, p, _bd)  # lane dim stays BD (aligned)
            m3 = mask_ref[...].reshape(1, p, _bd)
            sims3 = jnp.where(m3 > 0, sims3.astype(jnp.float32), NEG_INF)
            per_tok = jnp.max(sims3, axis=1)  # [Rg, BD]
            has = jnp.max(mask_ref[...], axis=0, keepdims=True) > 0
            per_tok = jnp.where(has, per_tok, 0.0)
            out_ref[0] = jax.lax.dot_general(
                seg_ref[0], per_tok,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @functools.partial(jax.jit, static_argnames=())
        def run(vals_t, mask_t, qpk, seg):
            p, d, dim = vals_t.shape
            n_blocks = int(pl.cdiv(d, bd))
            d_pad = n_blocks * bd
            if d_pad != d:
                vals_t = jnp.pad(vals_t, ((0, 0), (0, d_pad - d), (0, 0)))
                mask_t = jnp.pad(mask_t, ((0, 0), (0, d_pad - d)))
            qpk = qpk.reshape(g, rg, dim).astype(vals_t.dtype)
            return pl.pallas_call(
                kern,
                grid=(g, n_blocks),
                in_specs=[
                    pl.BlockSpec((p, bd, dim), lambda gi, i: (0, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((p, bd), lambda gi, i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, rg, dim), lambda gi, i: (gi, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, gq, rg), lambda gi, i: (gi, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, gq, bd), lambda gi, i: (gi, 0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((g, gq, d_pad), jnp.float32),
            )(vals_t, mask_t, qpk, seg).reshape(g * gq, d_pad)[:, :d]

        return run

    for bd in (128, 256, 512):
        try:
            fn = make_fused(bd, jnp.float32)
            out = timeit(f"fused bd={bd} sims=f32",
                         lambda fn=fn: fn(vals_t, mask_t, qn, seg))
            err = float(np.asarray(
                jnp.max(jnp.abs(out - ref)).reshape(1, 1))[0, 0])
            print(f"  max |diff| vs current: {err:.5f}", flush=True)
        except Exception as e:
            print(f"fused bd={bd} FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
