"""Strict bench oracle (VERDICT r4 #3): bench.py's correctness witness must
assert exact id-list equality modulo equal-score tie swaps — not the old
top-1 + 9/10 overlap, which a regression dropping one id per query would
pass. These tests pin the checker's semantics on CPU and run the full
oracle pass (single_full vs two_stage(prefetch=corpus)) on a small corpus.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import run_strict_oracle, strict_rank_equal  # noqa: E402


def _hits(pairs, key="score"):
    return [{"id": i, key: s} for i, s in pairs]


class TestStrictRankEqual:
    def test_identical_lists_pass(self):
        ex = _hits([("a", 3.0), ("b", 2.0), ("c", 1.0)])
        wd = _hits([("a", 3.0), ("b", 2.0), ("c", 1.0)], key="score_final")
        assert strict_rank_equal(ex, wd)

    def test_tie_swap_within_equal_scores_passes(self):
        ex = _hits([("a", 3.0), ("b", 2.0), ("c", 2.0), ("d", 1.0)])
        wd = _hits([("a", 3.0), ("c", 2.0), ("b", 2.0), ("d", 1.0)],
                   key="score_final")
        assert strict_rank_equal(ex, wd)

    def test_boundary_tie_members_may_differ(self):
        # the last (cut) score group may surface different members: both
        # engines are exact, a doc carrying exactly the boundary score is a
        # legitimate top-k member under tie swapping
        ex = _hits([("a", 3.0), ("b", 1.0), ("c", 1.0)])
        wd = _hits([("a", 3.0), ("b", 1.0), ("e", 1.0)], key="score_final")
        assert strict_rank_equal(ex, wd)

    def test_dropped_id_with_distinct_score_fails(self):
        # the regression the old 9/10-overlap oracle would have passed
        ex = _hits([("a", 3.0), ("b", 2.5), ("c", 2.0), ("d", 1.5),
                    ("e", 1.2), ("f", 1.1), ("g", 1.05), ("h", 1.02),
                    ("i", 1.01), ("j", 1.0)])
        wd = _hits([(i, s) for i, s in
                    [("a", 3.0), ("b", 2.5), ("x", 2.0), ("d", 1.5),
                     ("e", 1.2), ("f", 1.1), ("g", 1.05), ("h", 1.02),
                     ("i", 1.01), ("j", 1.0)]], key="score_final")
        assert not strict_rank_equal(ex, wd)

    def test_score_mismatch_fails(self):
        ex = _hits([("a", 3.0), ("b", 2.0)])
        wd = _hits([("a", 3.0), ("b", 2.1)], key="score_final")
        assert not strict_rank_equal(ex, wd)

    def test_rank_flip_between_distinct_scores_fails(self):
        # same sets, same score ARRAYS, but an id carries different scores in
        # the two lists — a compensating double error must not pass
        ex = _hits([("a", 3.0), ("b", 2.0)])
        wd = _hits([("b", 3.0), ("a", 2.0)], key="score_final")
        assert not strict_rank_equal(ex, wd)

    def test_length_mismatch_fails(self):
        ex = _hits([("a", 3.0), ("b", 2.0)])
        wd = _hits([("a", 3.0)], key="score_final")
        assert not strict_rank_equal(ex, wd)

    def test_tolerance_covers_reduction_order_noise(self):
        ex = _hits([("a", 3.0), ("b", 2.0)])
        wd = _hits([("a", 3.0 + 2e-5), ("b", 2.0 - 2e-5)], key="score_final")
        assert not strict_rank_equal(ex, wd, score_tol=0.0)
        assert strict_rank_equal(ex, wd, score_tol=1e-4)


def test_run_strict_oracle_on_cpu_engine():
    """CPU f32: two_stage(prefetch=corpus) must be exactly rank-equal to
    single_full (the suite-wide correctness oracle) — through the strict
    checker with the small reduction-order tolerance bench.py uses on CPU."""
    from visual_rag_tpu.index.synth import synthetic_index
    from visual_rag_tpu.retrieval import RetrievalEngine

    idx = synthetic_index(120, min_tokens=40, max_tokens=90, pooled_rows=6,
                          storage_dtype="float32", seed=3)
    engine = RetrievalEngine(idx, compute_dtype="float32")
    rng = np.random.default_rng(5)
    queries = [rng.standard_normal((int(rng.integers(8, 25)), 128))
               .astype(np.float32) for _ in range(16)]
    assert run_strict_oracle(engine, queries, idx.num_docs, score_tol=1e-4)


def test_run_strict_oracle_catches_wrong_engine(monkeypatch):
    """Sanity: the oracle is falsifiable — a doctored engine whose two_stage
    silently drops the true top-1 must fail the strict check."""
    from visual_rag_tpu.index.synth import synthetic_index
    from visual_rag_tpu.retrieval import RetrievalEngine

    idx = synthetic_index(120, min_tokens=40, max_tokens=90, pooled_rows=6,
                          storage_dtype="float32", seed=3)
    engine = RetrievalEngine(idx, compute_dtype="float32")
    rng = np.random.default_rng(5)
    queries = [rng.standard_normal((12, 128)).astype(np.float32)
               for _ in range(4)]

    orig = engine.search_embedded_batch

    def doctored(qs, mode="two_stage", **kw):
        res = orig(qs, mode=mode, **kw)
        if mode == "two_stage":
            res = [row[1:] + row[:1] for row in res]  # rotate ranks
        return res

    monkeypatch.setattr(engine, "search_embedded_batch", doctored)
    assert not run_strict_oracle(engine, queries, idx.num_docs,
                                 score_tol=1e-4)
