"""Group-packed query wire + packed kernels + bucketed exhaustive scan (r4).

The packed wire (batch.pack_queries_grouped) ships only real query tokens
(+<=10% group padding); plans reconstruct the padded [B, NQ, dim] view with
one device scatter, so pooled-query modes and the rerank path are
bit-identical to the padded wire. tokens_vs_* stage-1 and the exhaustive
scan use the densely packed tokens directly (M dim = real tokens) — same
math, different accumulation order, so score parity is asserted to 5e-5 on
CPU f32.

Reference behavior being preserved: search results across all modes
(reference multi_vector.py:192-247); the packed wire is a TPU-side transport
optimization only.
"""

import numpy as np
import pytest

from visual_rag_tpu.index.synth import synthetic_index
from visual_rag_tpu.retrieval import RetrievalEngine
from visual_rag_tpu.retrieval import batch as B

DIM = 128


def _queries(n, rng, lo=5, hi=25):
    return [rng.standard_normal((int(rng.integers(lo, hi)), DIM)).astype(np.float32)
            for _ in range(n)]


@pytest.fixture(scope="module")
def small_index():
    return synthetic_index(300, min_tokens=32, max_tokens=96, pooled_rows=4,
                           storage_dtype="float32", seed=0)


class TestPackQueriesGrouped:
    def test_reconstruction_matches_padded(self):
        rng = np.random.default_rng(1)
        qs = _queries(64, rng)
        tok_p, mask_p = B.pad_queries_raw(qs, DIM)
        (packed, pos, qid), nq, rg = B.pack_queries_grouped(qs, DIM)
        assert nq == tok_p.shape[1]
        b = len(qs)
        flat = np.zeros((b * nq, DIM), np.float32)
        posn = np.asarray(pos)
        sel = posn < b * nq
        flat[posn[sel]] = np.asarray(packed)[sel]
        np.testing.assert_array_equal(flat.reshape(b, nq, DIM), np.asarray(tok_p))
        # qid row ownership: packed row g*rg+r belongs to query g*group+qid
        qidn = np.asarray(qid)
        g = qidn.shape[0]
        group = b // g
        for grp in range(g):
            owners = qidn[grp][qidn[grp] >= 0]
            # tokens of a group are packed query-major and contiguous
            assert (np.diff(owners) >= 0).all()
            counts = np.bincount(owners, minlength=group)
            lens = [qs[grp * group + j].shape[0] for j in range(group)]
            np.testing.assert_array_equal(counts, lens)

    def test_pad_rows_are_zero_and_sentinel(self):
        rng = np.random.default_rng(2)
        qs = _queries(32, rng)
        (packed, pos, qid), nq, rg = B.pack_queries_grouped(qs, DIM)
        pn, posn, qidn = (np.asarray(x) for x in (packed, pos, qid))
        pad_rows = qidn.reshape(-1) < 0
        assert (pn[pad_rows] == 0).all()
        assert (posn[pad_rows] == len(qs) * nq).all()

    def test_empty_batch_returns_empty_wire(self):
        """b=0 must yield a legal all-pad wire, not ZeroDivisionError
        (pad_queries_raw handles b=0; direct wire users hit this)."""
        (packed, pos, qid), nq, rg = B.pack_queries_grouped([], DIM)
        assert packed.shape[1] == DIM and (np.asarray(qid) == -1).all()
        assert (np.asarray(packed) == 0).all()

    def test_fp16_wire_clips(self):
        rng = np.random.default_rng(3)
        qs = _queries(32, rng)
        qs[0][0, 0] = 1e6  # would overflow fp16
        (packed, pos, qid), nq, rg = B.pack_queries_grouped(
            qs, DIM, wire_dtype=np.float16)
        assert np.isfinite(np.asarray(packed).astype(np.float32)).all()


class TestPackedEngineParity:
    MODES = [("two_stage", dict(prefetch_k=50)),
             ("two_stage", dict(prefetch_k=50, stage1_mode="tokens_vs_standard_pooling")),
             ("two_stage", dict(prefetch_k=50, stage1_mode="tokens_vs_experimental_pooling")),
             ("single_full", {}),
             ("single_tiles", {}),
             ("single_pooled", {}),
             ("single_global", {}),
             ("single_experimental_tokens", {}),
             ("three_stage", dict(stage1_k=100, stage2_k=40))]

    @pytest.mark.parametrize("mode,kw", MODES,
                             ids=[f"{m}-{kw.get('stage1_mode','')}" for m, kw in MODES])
    def test_mode_parity(self, small_index, mode, kw):
        ep = RetrievalEngine(small_index, query_wire="padded")
        ek = RetrievalEngine(small_index, query_wire="packed")
        rng = np.random.default_rng(4)
        qs = _queries(64, rng)
        a = ep.search_embedded_batch(qs, mode=mode, top_k=5, with_payload=False, **kw)
        b = ek.search_embedded_batch(qs, mode=mode, top_k=5, with_payload=False, **kw)
        for ra, rb in zip(a, b):
            sa = sorted(h["score_final"] for h in ra)
            sb = sorted(h["score_final"] for h in rb)
            np.testing.assert_allclose(sa, sb, atol=5e-5)
            # scores this far apart cannot silently reorder: sets must agree
            assert {h["id"] for h in ra} == {h["id"] for h in rb}

    @pytest.mark.parametrize("mode,kw", [
        ("two_stage", dict(prefetch_k=50)),
        ("two_stage", dict(prefetch_k=300)),  # prefetch >= corpus: == single_full
        ("three_stage", dict(stage1_k=100, stage2_k=40)),
    ], ids=["two_stage", "two_stage_oracle", "three_stage"])
    def test_scan_rerank_matches_plain(self, small_index, mode, kw):
        """rerank_impl='scan' (whole-store streaming pass + candidate gather,
        the r4 high-coverage policy) must rank identically to the plain
        per-candidate rerank."""
        ep = RetrievalEngine(small_index, query_wire="packed",
                             rerank_impl="plain")
        es = RetrievalEngine(small_index, query_wire="packed",
                             rerank_impl="scan")
        rng = np.random.default_rng(11)
        qs = _queries(64, rng)
        a = ep.search_embedded_batch(qs, mode=mode, top_k=5,
                                     with_payload=False, **kw)
        b = es.search_embedded_batch(qs, mode=mode, top_k=5,
                                     with_payload=False, **kw)
        for ra, rb in zip(a, b):
            sa = sorted(h["score_final"] for h in ra)
            sb = sorted(h["score_final"] for h in rb)
            np.testing.assert_allclose(sa, sb, atol=5e-5)
            assert {h["id"] for h in ra} == {h["id"] for h in rb}

    def test_explicit_scan_runs_off_tpu(self, small_index, monkeypatch):
        """An explicit rerank_impl='scan' must actually reach the scan gather
        path on the XLA (non-Pallas) backend — r4 regression: it was silently
        replaced with 'plain', making the parity tests above vacuous on CPU."""
        import visual_rag_tpu.retrieval.plans as plans

        impls = []
        orig = plans._local_rerank

        def spy(*a, **k):
            impls.append(k.get("impl", "plain"))
            return orig(*a, **k)

        monkeypatch.setattr(plans, "_local_rerank", spy)
        es = RetrievalEngine(small_index, query_wire="packed",
                             rerank_impl="scan")
        es.search_embedded_batch(_queries(64, np.random.default_rng(5)),
                                 mode="two_stage", top_k=5, prefetch_k=50,
                                 with_payload=False)
        assert "scan" in impls

    def test_scan_policy_gates(self, small_index):
        """auto policy: scan only when candidate windows outnumber docs
        severalfold AND the kernel geometry fits VMEM."""
        from visual_rag_tpu.ops.kernels.maxsim_scan import scan_kernel_fits

        e = RetrievalEngine(small_index, query_wire="packed")
        geom = dict(n_docs=small_index.num_docs, m_packed=1024)
        assert e._rerank_impl(64, 50, **geom) == "scan"  # 3200 >= 4*300
        assert e._rerank_impl(64, 10, **geom) != "scan"  # 640 < 4*300
        assert e._rerank_impl(64, 50) != "scan"          # padded wire: no geom
        # the streamed-query kernel is batch-size independent: a huge packed
        # token count still fits (the r4a resident-q design did not)
        huge = dict(n_docs=small_index.num_docs, m_packed=200_000)
        assert e._rerank_impl(64, 50, **huge) == "scan"
        # the VMEM gate now trips only on pathological window geometry
        import jax.numpy as jnp
        assert not scan_kernel_fits(1024, 128, 24_000, jnp.bfloat16)

    def test_pooled_stage1_bit_identical(self, small_index):
        """pooled-query modes never touch the packed tokens: results must be
        BIT-identical to the padded wire (reconstruction is exact)."""
        ep = RetrievalEngine(small_index, query_wire="padded")
        ek = RetrievalEngine(small_index, query_wire="packed")
        rng = np.random.default_rng(5)
        qs = _queries(32, rng)
        a = ep.search_embedded_batch(qs, mode="two_stage", top_k=10,
                                     prefetch_k=60, with_payload=False)
        b = ek.search_embedded_batch(qs, mode="two_stage", top_k=10,
                                     prefetch_k=60, with_payload=False)
        for ra, rb in zip(a, b):
            assert [h["id"] for h in ra] == [h["id"] for h in rb]
            np.testing.assert_array_equal(
                [h["score_final"] for h in ra], [h["score_final"] for h in rb])

    def test_small_batch_falls_back_to_padded(self, small_index):
        # auto wire only packs at B>=32; explicit packed works for any
        # power-of-two bucket (group = min(32, B) divides B)
        ek = RetrievalEngine(small_index, query_wire="packed")
        rng = np.random.default_rng(6)
        qs = _queries(3, rng)
        out = ek.search_embedded_batch(qs, mode="two_stage", top_k=5,
                                       prefetch_k=50, with_payload=False)
        ref = [small_index] and RetrievalEngine(small_index).search_embedded_batch(
            qs, mode="two_stage", top_k=5, prefetch_k=50, with_payload=False)
        assert [[h["id"] for h in r] for r in out] == \
               [[h["id"] for h in r] for r in ref]


class TestBucketedExhaustive:
    def test_buckets_bit_exact(self):
        """Doc-length bucketing of the exhaustive scan is BIT-exact: per-doc
        scores don't depend on chunking/bucket membership."""
        idx = synthetic_index(4500, min_tokens=16, max_tokens=128,
                              pooled_rows=4, storage_dtype="float32", seed=7)
        eng = RetrievalEngine(idx)  # D >= 4096: buckets auto-enabled
        store = idx.store("initial")
        spec = B.make_exhaustive_buckets(np.asarray(store.lengths))
        assert spec is not None and len(spec["sizes"]) > 1
        assert sum(spec["sizes"]) == 4500
        rng = np.random.default_rng(8)
        qs = _queries(8, rng)
        got = eng.search_embedded_batch(qs, mode="single_full", top_k=10,
                                        with_payload=False)
        # unbucketed reference: same engine machinery, buckets disabled
        eng2 = RetrievalEngine(idx)
        eng2._bucket_cache[eng2.full_vector_name] = (None, ())
        want = eng2.search_embedded_batch(qs, mode="single_full", top_k=10,
                                          with_payload=False)
        for rg, rw in zip(got, want):
            assert [h["id"] for h in rg] == [h["id"] for h in rw]
            np.testing.assert_array_equal(
                [h["score"] for h in rg], [h["score"] for h in rw])

    def test_make_buckets_skips_small_or_uniform(self):
        assert B.make_exhaustive_buckets(np.full(1000, 64)) is None  # small
        assert B.make_exhaustive_buckets(np.full(8192, 64)) is None  # uniform

    def test_bucket_geometry(self):
        lens = np.concatenate([np.full(3000, 32), np.full(3000, 512)])
        spec = B.make_exhaustive_buckets(lens)
        assert spec is not None
        assert sum(spec["sizes"]) == 6000
        assert max(spec["max_lens"]) == 512
        perm, inv = spec["perm"], spec["inv_perm"]
        np.testing.assert_array_equal(perm[inv], np.arange(6000))


class TestPackedKernelInterpret:
    def test_packed_kernel_matches_xla(self):
        """pooled_maxsim_scores_packed (interpret) == the packed XLA fallback
        == the padded qbatch XLA path, on random padded stores."""
        import jax.numpy as jnp

        from visual_rag_tpu.ops.kernels.prefetch_topk import (
            pooled_maxsim_scores_packed)
        from visual_rag_tpu.parallel.sharded import (
            _local_tokens_padded, _local_tokens_padded_packed)
        from visual_rag_tpu.retrieval.plans import _prep_queries_packed

        rng = np.random.default_rng(9)
        p, d, dim = 4, 40, DIM
        vals = rng.standard_normal((p, d, dim)).astype(np.float32)
        mask = (rng.random((p, d)) > 0.2).astype(np.float32)
        mask[:, 5] = 0.0  # one empty doc
        qs = _queries(32, rng)
        (packed, pos, qid), nq, rg = B.pack_queries_grouped(qs, dim)
        tokens, qmask, pooled, pk = _prep_queries_packed(
            jnp.asarray(packed), jnp.asarray(pos), jnp.asarray(qid),
            len(qs), nq)
        s1 = {"vals_t": jnp.asarray(vals), "mask_t": jnp.asarray(mask)}
        want = np.asarray(_local_tokens_padded(s1, tokens, qmask, False))
        got_xla = np.asarray(_local_tokens_padded_packed(
            s1, pk["q"], pk["seg"], False))
        np.testing.assert_allclose(got_xla, want, atol=2e-4, rtol=1e-4)
        got_kernel = np.asarray(pooled_maxsim_scores_packed(
            jnp.asarray(vals), jnp.asarray(mask), pk["q"], pk["seg"],
            None, block_d=128, interpret=True))
        np.testing.assert_allclose(got_kernel, want, atol=2e-4, rtol=1e-4)


class TestTokensQdot:
    """qdot stage-1 (late r5): on int8 pooled stores, a PREFETCH tokens scan
    quantizes the query rows too and rides the int8 MXU rate. The exact
    rerank that always follows a prefetch re-scores the final window, so the
    query rounding only perturbs candidate selection — final scores must be
    untouched. Modes whose tokens_padded scores are final keep bf16 queries.
    """

    @pytest.fixture(scope="class")
    def int8_store(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(21)
        p, d, dim = 4, 48, DIM
        vals = rng.standard_normal((p, d, dim)).astype(np.float32)
        scales = (np.abs(vals).max(axis=2) / 127.0 + 1e-9).astype(np.float32)
        codes = np.clip(np.round(vals / scales[:, :, None]),
                        -127, 127).astype(np.int8)
        mask = (rng.random((p, d)) > 0.2).astype(np.float32)
        mask[:, 7] = 0.0  # one empty doc
        return {"vals_t": jnp.asarray(codes), "mask_t": jnp.asarray(mask),
                "scales_t": jnp.asarray(scales)}

    def _wire(self, n=32, seed=22):
        import jax.numpy as jnp

        from visual_rag_tpu.retrieval.plans import _prep_queries_packed

        rng = np.random.default_rng(seed)
        qs = _queries(n, rng)
        (packed, pos, qid), nq, rg = B.pack_queries_grouped(qs, DIM)
        return _prep_queries_packed(jnp.asarray(packed), jnp.asarray(pos),
                                    jnp.asarray(qid), n, nq)

    def test_qdot_paths_agree(self, int8_store):
        """Packed Pallas kernel (interpret), packed XLA fallback and padded
        XLA/qbatch fallbacks must agree on the qdot scores (f32 accumulation
        order is the only difference)."""
        from visual_rag_tpu.ops.kernels.prefetch_topk import (
            pooled_maxsim_scores_packed, pooled_maxsim_scores_qbatch)
        from visual_rag_tpu.parallel.sharded import (
            _local_tokens_padded, _local_tokens_padded_packed)

        tokens, qmask, pooled, pk = self._wire()
        want = np.asarray(_local_tokens_padded_packed(
            int8_store, pk["q"], pk["seg"], False, qdot=True))
        got_pad = np.asarray(_local_tokens_padded(
            int8_store, tokens, qmask, False, qdot=True))
        np.testing.assert_allclose(got_pad, want, atol=2e-4, rtol=1e-4)
        got_kernel = np.asarray(pooled_maxsim_scores_packed(
            int8_store["vals_t"], int8_store["mask_t"], pk["q"], pk["seg"],
            int8_store["scales_t"], block_d=128, interpret=True,
            qdot_int8=True))
        np.testing.assert_allclose(got_kernel, want, atol=2e-4, rtol=1e-4)
        got_qb = np.asarray(pooled_maxsim_scores_qbatch(
            int8_store["vals_t"], int8_store["mask_t"], tokens, qmask,
            int8_store["scales_t"], block_d=128, q_chunk=8, interpret=True,
            qdot_int8=True))
        np.testing.assert_allclose(got_qb, want, atol=2e-4, rtol=1e-4)

    def test_qdot_close_to_bf16_queries(self, int8_store):
        """Query rounding is ~2^-8 relative — qdot stage-1 scores track the
        bf16-query scores closely and agree on the per-query top doc for a
        decisive (non-tied) corpus."""
        from visual_rag_tpu.parallel.sharded import _local_tokens_padded_packed

        _, _, _, pk = self._wire(seed=23)
        a = np.asarray(_local_tokens_padded_packed(
            int8_store, pk["q"], pk["seg"], False, qdot=False))
        b = np.asarray(_local_tokens_padded_packed(
            int8_store, pk["q"], pk["seg"], False, qdot=True))
        # per-token rounding ~2^-8 x ~20 tokens/query: abs tolerance only
        # (scores near zero make relative bounds meaningless)
        np.testing.assert_allclose(a, b, atol=0.1)
        assert np.abs(a - b).mean() < 0.05

    def test_two_stage_qdot_final_scores_unchanged(self, monkeypatch):
        """With prefetch >= corpus BOTH stage-1 variants select every doc, so
        the exact rerank decides everything: qdot-on and qdot-off two_stage
        must return identical hits. (The off-run uses a different batch
        bucket: _TOKENS_QDOT is read at trace time and the plan cache keys on
        static args only, so same-shape calls would reuse the qdot trace.)"""
        import visual_rag_tpu.parallel.sharded as sh

        idx = synthetic_index(257, min_tokens=32, max_tokens=96,
                              pooled_rows=4, storage_dtype="int8", seed=24)
        eng = RetrievalEngine(idx, query_wire="packed")
        rng = np.random.default_rng(25)
        qs = _queries(33, rng)
        kw = dict(mode="two_stage", top_k=7, prefetch_k=257,
                  stage1_mode="tokens_vs_standard_pooling", with_payload=False)
        on = eng.search_embedded_batch(qs[:32], **kw)  # bucket 32, qdot on
        monkeypatch.setattr(sh, "_TOKENS_QDOT", False)
        off = eng.search_embedded_batch(qs, **kw)  # bucket 64: fresh trace
        for ra, rb in zip(on, off[:32]):
            assert [h["id"] for h in ra] == [h["id"] for h in rb]
            np.testing.assert_array_equal(
                [h["score_final"] for h in ra],
                [h["score_final"] for h in rb])

    def test_final_score_modes_keep_bf16_queries(self, monkeypatch):
        """single_tiles returns tokens_padded scores as FINAL scores — the
        stage-1 qdot gate must stay off there (and on for the two_stage
        prefetch) on the same int8 store."""
        import visual_rag_tpu.parallel.sharded as sh

        seen = []
        orig = sh._local_tokens_padded_packed

        def spy(s1, q, seg, use_pallas, qdot=False):
            seen.append(qdot)
            return orig(s1, q, seg, use_pallas, qdot=qdot)

        monkeypatch.setattr(sh, "_local_tokens_padded_packed", spy)
        # fresh corpus geometry -> fresh jit traces (the spy only observes
        # tracing, and cached plans from other tests would bypass it)
        idx = synthetic_index(211, min_tokens=32, max_tokens=96,
                              pooled_rows=4, storage_dtype="int8", seed=26)
        eng = RetrievalEngine(idx, query_wire="packed")
        qs = _queries(32, np.random.default_rng(27))
        eng.search_embedded_batch(qs, mode="single_tiles", top_k=3,
                                  with_payload=False)
        assert seen == [False]
        seen.clear()
        eng.search_embedded_batch(
            qs, mode="two_stage", top_k=3, prefetch_k=40,
            stage1_mode="tokens_vs_standard_pooling", with_payload=False)
        assert seen == [True]


class TestReturnArraysAndDepth:
    def test_return_arrays_matches_dicts(self, small_index):
        eng = RetrievalEngine(small_index)
        rng = np.random.default_rng(10)
        qs = _queries(13, rng)
        ref = eng.search_embedded_batch(qs, mode="two_stage", top_k=5,
                                        prefetch_k=50, with_payload=False)
        raw = eng.search_embedded_batch(qs, mode="two_stage", top_k=5,
                                        prefetch_k=50, with_payload=False,
                                        return_arrays=True)
        assert raw.ids.shape == (13, 5)
        for rd, ri, rs, rv in zip(ref, raw.ids, raw.scores, raw.valid):
            assert [i for i, v in zip(ri, rv) if v] == [h["id"] for h in rd]
            np.testing.assert_allclose(
                [s for s, v in zip(rs, rv) if v],
                [h["score_final"] for h in rd], atol=1e-6)
        d2 = raw.to_dicts()
        assert [[h["id"] for h in r] for r in d2] == \
               [[h["id"] for h in r] for r in ref]

    def test_return_arrays_rejects_payload(self, small_index):
        eng = RetrievalEngine(small_index)
        with pytest.raises(ValueError):
            eng.search_embedded_batch([np.ones((4, DIM), np.float32)],
                                      return_arrays=True, with_payload=True)

    def test_depth_pipelining_parity(self, small_index):
        eng = RetrievalEngine(small_index)
        rng = np.random.default_rng(11)
        qs = _queries(24, rng)
        batches = [qs[i::3] for i in range(3)]
        kw = dict(mode="two_stage", top_k=5, prefetch_k=50, with_payload=False)
        seq = [eng.search_embedded_batch(b, **kw) for b in batches]
        for depth in (1, 2, 4):
            pip = list(eng.search_embedded_batches(batches, depth=depth, **kw))
            assert [[[h["id"] for h in r] for r in x] for x in pip] == \
                   [[[h["id"] for h in r] for r in x] for x in seq]

    def test_pool_lru_eviction_bounds_memory(self):
        """A tail of distinct wire shapes must not retain depth buffers per
        shape forever (long-lived serving OOM): total bytes are LRU-capped,
        and the most recently used key survives eviction."""
        from visual_rag_tpu.utils.hostbuf import HostBufferPool

        pool = HostBufferPool(depth=2, max_bytes=64 * 1024)
        hot = pool.get((1024,), np.float32)  # 4 KB x2 slots
        for n in range(1, 20):  # 19 distinct shapes, 8 KB of slots each
            pool.get((1024 + n,), np.float32)
        assert pool._bytes <= 64 * 1024 + 2 * (1024 + 19) * 4
        assert len(pool._slots) < 19
        # the hot key was evicted long ago; re-getting it re-warms fresh slots
        again = pool.get((1024,), np.float32)
        assert again is not hot
        # and a just-used key is never the eviction victim
        pool.get((1024,), np.float32)
        assert ((1024,), np.dtype(np.float32).str) in pool._slots

    def test_pool_wrap_no_aliasing(self, small_index):
        """10 DIFFERENT same-shape batches through depth-4 pipelining: the
        rotating _WirePool wraps twice; any buffer mutated while a previous
        batch's wire was still live would corrupt that batch's results."""
        eng = RetrievalEngine(small_index, query_wire="packed")
        rng = np.random.default_rng(12)
        # same query lengths across batches -> identical wire shapes ->
        # every batch hits the same pool slot cycle
        lens = [int(rng.integers(5, 25)) for _ in range(16)]
        batches = [[rng.standard_normal((n, DIM)).astype(np.float32)
                    for n in lens] for _ in range(10)]
        kw = dict(mode="two_stage", top_k=5, prefetch_k=50, with_payload=False)
        seq = [eng.search_embedded_batch(b, **kw) for b in batches]
        pip = list(eng.search_embedded_batches(batches, depth=4, **kw))
        assert [[[h["id"] for h in r] for r in x] for x in pip] == \
               [[[h["id"] for h in r] for r in x] for x in seq]

    def test_empty_batch_arrays(self, small_index):
        eng = RetrievalEngine(small_index)
        out = eng.search_embedded_batch([], with_payload=False,
                                        return_arrays=True)
        assert len(out) == 0


class TestWireDtype:
    """r5 f16 query wire (auto at bs >= 1024 on TPU; measured +40% sustained
    at bs=2048 — the query wire dominates per-batch tunnel payload)."""

    def test_f16_wire_near_parity_with_f32(self, small_index):
        e32 = RetrievalEngine(small_index, wire_dtype="f32")
        e16 = RetrievalEngine(small_index, wire_dtype="f16")
        rng = np.random.default_rng(5)
        qs = [rng.standard_normal((int(rng.integers(6, 20)), 128)).astype(np.float32)
              for _ in range(32)]
        kw = dict(mode="two_stage", top_k=10, prefetch_k=50,
                  with_payload=False)
        a = e32.search_embedded_batch(qs, **kw)
        b = e16.search_embedded_batch(qs, **kw)
        for ra, rb in zip(a, b):
            assert ra[0]["id"] == rb[0]["id"]  # top-1 robust to f16 rounding
            da = {h["id"]: h.get("score_final", h.get("score")) for h in ra}
            db = {h["id"]: h.get("score_final", h.get("score")) for h in rb}
            common = set(da) & set(db)
            assert len(common) >= 9  # at most one near-tie boundary swap
            # per-id score shift bounded by f16 query rounding noise
            assert max(abs(da[i] - db[i]) for i in common) < 5e-3

    def test_wire_dtype_validation(self, small_index):
        with pytest.raises(ValueError, match="wire_dtype"):
            RetrievalEngine(small_index, wire_dtype="bf16")

    def test_auto_keeps_f32_off_tpu(self, small_index):
        # CPU tests pin bit-exact cross-path equality; auto must not flip
        # them to f16 there
        eng = RetrievalEngine(small_index)
        assert eng.wire_dtype in ("auto", "f32")
