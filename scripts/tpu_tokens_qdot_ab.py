"""A/B: qdot (int8-query) tokens stage-1 vs bf16-query on an int8 store.

Same-process interleaved kernel timing (qdot_int8 is a static arg of
pooled_maxsim_scores_packed -> two independent traces), plus the stage-1
candidate-set agreement at serving prefetch depths: the exact rerank that
follows a prefetch re-scores the final window, so the ranking cost of qdot
is ONLY missed candidates — measured here as top-pk overlap per query.

Usage: python scripts/tpu_tokens_qdot_ab.py [docs] [batch] [pk]
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from visual_rag_tpu.index.synth import synthetic_index
    from visual_rag_tpu.ops.kernels.prefetch_topk import (
        auto_block_d_packed,
        pooled_maxsim_scores_packed,
    )
    from visual_rag_tpu.retrieval import batch as B

    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    pk = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    idx = synthetic_index(docs, min_tokens=128, max_tokens=256,
                          pooled_rows=12, storage_dtype="int8", seed=3)
    store = idx.stores["mean_pooling"]
    vals_t = jnp.moveaxis(store.values, 1, 0)  # [P, D, dim] int8 codes
    mask_t = jnp.moveaxis(jnp.asarray(store.mask, jnp.float32), 1, 0)
    scales_t = jnp.moveaxis(jnp.asarray(store.scales, jnp.float32), 1, 0)

    rng = np.random.default_rng(5)
    qs = [rng.standard_normal((int(rng.integers(8, 25)), 128)).astype(np.float32)
          for _ in range(bs)]
    (q1, q2, q3), nq, rg = B.pack_queries_grouped(qs, 128,
                                                  wire_dtype=np.float32)
    qp = jnp.asarray(q1)
    qid = jnp.asarray(q3)
    g, rg = qid.shape
    gq = bs // g
    seg = (jax.lax.broadcasted_iota(jnp.int32, (g, gq, rg), 1)
           == qid[:, None, :]).astype(jnp.float32)
    qn = qp / jnp.maximum(jnp.linalg.norm(qp, axis=1, keepdims=True), 1e-12)

    bd = auto_block_d_packed(int(vals_t.shape[0]), 1, rg, 128)
    print(f"docs={docs} bs={bs} pk={pk} block_d={bd}", flush=True)

    def sync(x):
        return float(np.asarray(x[:1, :1])[0, 0])

    def timeit(name, fn, n=7):
        out = fn()
        sync(out)
        best = 1e9
        for _ in range(n):
            t0 = time.time()
            out = fn()
            sync(out)
            best = min(best, time.time() - t0)
        print(f"{name:20s} {best * 1000:8.2f} ms/batch of {bs}", flush=True)
        return out

    a = timeit("bf16-q stage-1", lambda: pooled_maxsim_scores_packed(
        vals_t, mask_t, qn, seg, scales_t, block_d=bd))
    b = timeit("qdot stage-1", lambda: pooled_maxsim_scores_packed(
        vals_t, mask_t, qn, seg, scales_t, block_d=bd, qdot_int8=True))

    # ---- V2: rg-chunked sims (smaller f32 tile -> bigger doc blocks) -------
    import functools

    import jax.numpy as jnp2  # noqa: F401
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NEG_INF = -1e30

    def make_v2(bd, rc, qdot):
        def kern(vals_ref, mask_ref, scales_ref, q_ref, seg_ref, out_ref,
                 per_tok_ref):
            p, _bd, dim = vals_ref.shape
            rg_ = q_ref.shape[1]
            flat = vals_ref[...].reshape(p * _bd, dim)
            m3 = mask_ref[...].reshape(1, p, _bd)
            sc = scales_ref[...].reshape(1, p * _bd)
            for r0 in range(0, rg_, rc):
                rcc = min(rc, rg_ - r0)
                q = q_ref[0, r0:r0 + rcc, :]
                if qdot:
                    sims = jax.lax.dot_general(
                        q, flat,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32)
                else:
                    sims = jax.lax.dot_general(
                        q, flat.astype(q.dtype),
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                sims = sims * sc
                sims3 = sims.reshape(rcc, p, _bd)
                sims3 = jnp.where(m3 > 0, sims3, NEG_INF)
                per_tok_ref[r0:r0 + rcc, :] = jnp.max(sims3, axis=1)
            has = jnp.max(mask_ref[...], axis=0, keepdims=True) > 0
            pt = jnp.where(has, per_tok_ref[...], 0.0)
            out_ref[0] = jax.lax.dot_general(
                seg_ref[0], pt,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @jax.jit
        def run(vals_t, mask_t, scales_t, qpk, seg):
            p, d, dim = vals_t.shape
            n_blocks = int(pl.cdiv(d, bd))
            d_pad = n_blocks * bd
            if d_pad != d:
                vals_t = jnp.pad(vals_t, ((0, 0), (0, d_pad - d), (0, 0)))
                mask_t = jnp.pad(mask_t, ((0, 0), (0, d_pad - d)))
                scales_t = jnp.pad(scales_t, ((0, 0), (0, d_pad - d)))
            if qdot:
                from visual_rag_tpu.ops.kernels.maxsim_scan import (
                    quantize_queries_int8)

                qc, qsc = quantize_queries_int8(qpk)
                qpk3 = qc.reshape(g, rg, dim)
                segw = seg * qsc.reshape(g, 1, rg)
            else:
                qpk3 = qpk.reshape(g, rg, dim).astype(jnp.bfloat16)
                segw = seg
            return pl.pallas_call(
                kern,
                grid=(g, n_blocks),
                in_specs=[
                    pl.BlockSpec((p, bd, dim), lambda gi, i: (0, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((p, bd), lambda gi, i: (0, i),
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
                scratch_shapes=[pltpu.VMEM((rg, bd), jnp.float32)],
            )(vals_t, mask_t, scales_t, qpk3, segw
              ).reshape(g * gq, d_pad)[:, :d]

        return run

    for bd_v, rc_v, qd_v in ((256, 128, False), (512, 128, False),
                             (256, 128, True), (512, 128, True),
                             (512, 256, True), (1024, 128, True)):
        try:
            fn = make_v2(bd_v, rc_v, qd_v)
            out = timeit(f"v2 bd={bd_v} rc={rc_v} qdot={int(qd_v)}",
                         lambda fn=fn: fn(vals_t, mask_t, scales_t, qn, seg))
            err = float(np.asarray(jnp.max(jnp.abs(
                out - (b if qd_v else a))).reshape(1, 1))[0, 0])
            print(f"  max |diff| vs {'qdot' if qd_v else 'bf16'} ref: "
                  f"{err:.5f}", flush=True)
        except Exception as e:
            print(f"v2 bd={bd_v} rc={rc_v} qdot={int(qd_v)} FAILED: "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)

    # candidate agreement at prefetch depth pk (and a tighter top-10 view)
    for k in (pk, 10):
        ia = jax.lax.top_k(a, k)[1]
        ib = jax.lax.top_k(b, k)[1]
        ia_n, ib_n = np.asarray(ia), np.asarray(ib)
        ov = np.mean([len(set(ra) & set(rb)) / k
                      for ra, rb in zip(ia_n, ib_n)])
        top1 = float(np.mean(ia_n[:, 0] == ib_n[:, 0]))
        print(f"top-{k}: overlap {ov:.4f}  top-1 agree {top1:.4f}", flush=True)


if __name__ == "__main__":
    main()
