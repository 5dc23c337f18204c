"""Retrieval quality metrics, vectorized.

Protocol parity with the reference evaluation (gains are ``2^rel - 1``
discounted by ``log2(rank + 1)``; MRR is the reciprocal rank of the first
relevant hit; recall is the fraction of relevant docs retrieved) — see
reference benchmarks/vidore_tatdqa_test/metrics.py. Implementation is a
single cumulative gain curve per ranking: every @k cutoff is one index into
the cumsum, so the harness can evaluate all cutoffs in one pass
(``metrics_at_ks``). Numerical equality with the scalar reference formulas
is pinned by tests/test_reference_parity.py.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Sequence

import numpy as np


def _dcg_curve(rels: np.ndarray) -> np.ndarray:
    """Cumulative DCG at every prefix length of ``rels`` (1-indexed ranks)."""
    if rels.size == 0:
        return np.zeros(0, dtype=np.float64)
    gains = np.exp2(np.maximum(rels, 0.0)) - 1.0
    discounts = np.log2(np.arange(2.0, rels.size + 2.0))
    return np.cumsum(gains / discounts)


def _rel_vector(ranking: Sequence[str], qrels: Mapping[str, int], k: int) -> np.ndarray:
    return np.asarray(
        [float(qrels.get(doc_id, 0)) for doc_id in ranking[:k]], dtype=np.float64
    )


def _curve_at(curve: np.ndarray, k: int) -> float:
    if curve.size == 0 or k <= 0:
        return 0.0
    return float(curve[min(k, curve.size) - 1])


def ndcg_at_k(ranking: List[str], qrels: Dict[str, int], k: int) -> float:
    dcg = _curve_at(_dcg_curve(_rel_vector(ranking, qrels, k)), k)
    ideal = np.sort(np.asarray(list(qrels.values()), dtype=np.float64))[::-1][:k]
    idcg = _curve_at(_dcg_curve(ideal), k)
    return dcg / idcg if idcg > 0 else 0.0


def mrr_at_k(ranking: List[str], qrels: Dict[str, int], k: int) -> float:
    hits = _rel_vector(ranking, qrels, k) > 0
    if not hits.any():
        return 0.0
    return 1.0 / (int(np.argmax(hits)) + 1)


def _unique_hits(ranking: Sequence[str], relevant, kmax: int) -> np.ndarray:
    """Boolean per-rank vector: relevant AND first occurrence (set
    semantics — a duplicated doc id in a ranking counts once, matching the
    reference's ``len(retrieved_set & relevant_set)`` recall)."""
    seen = set()
    out = np.zeros(min(kmax, len(ranking)), dtype=bool)
    for i, doc_id in enumerate(ranking[:kmax]):
        if doc_id in relevant and doc_id not in seen:
            seen.add(doc_id)
            out[i] = True
    return out


def recall_at_k(ranking: List[str], qrels: Dict[str, int], k: int) -> float:
    relevant = {doc_id for doc_id, rel in qrels.items() if rel > 0}
    if not relevant:
        return 0.0
    return float(_unique_hits(ranking, relevant, k).sum()) / len(relevant)


def metrics_at_ks(
    ranking: List[str], qrels: Dict[str, int], ks: Sequence[int]
) -> Dict[str, float]:
    """All three metrics at every cutoff in ``ks`` from one gain curve.

    Equivalent to calling the scalar functions per cutoff, but the ranking is
    scored once: one relevance vector, one cumulative DCG curve, one ideal
    curve — each @k is an O(1) lookup.
    """
    kmax = max(ks) if ks else 0
    rels = _rel_vector(ranking, qrels, kmax)
    curve = _dcg_curve(rels)
    ideal = np.sort(np.asarray(list(qrels.values()), dtype=np.float64))[::-1][:kmax]
    icurve = _dcg_curve(ideal)
    hits = rels > 0
    first_hit = int(np.argmax(hits)) + 1 if hits.any() else 0
    relevant = {doc_id for doc_id, rel in qrels.items() if rel > 0}
    uhits = _unique_hits(ranking, relevant, kmax)
    hit_counts = np.cumsum(uhits) if uhits.size else np.zeros(0)
    n_relevant = len(relevant)

    out: Dict[str, float] = {}
    for k in ks:
        idcg = _curve_at(icurve, k)
        out[f"ndcg@{k}"] = _curve_at(curve, k) / idcg if idcg > 0 else 0.0
        out[f"mrr@{k}"] = 1.0 / first_hit if 0 < first_hit <= k else 0.0
        out[f"recall@{k}"] = (
            float(hit_counts[min(k, hit_counts.size) - 1]) / n_relevant
            if k > 0 and n_relevant and hit_counts.size
            else 0.0
        )
    return out
