"""Retrieval quality metrics — exact protocol parity with the reference.

Reference: benchmarks/vidore_tatdqa_test/metrics.py:6-39. Gains are
``2^rel - 1`` with ``log2(i+2)`` discount; MRR is first-relevant reciprocal
rank; recall is fraction-of-relevant-retrieved. These run on host (tiny), the
heavy part (producing the ranking) runs on device.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence


def _dcg(relevances: Sequence[float]) -> float:
    score = 0.0
    for i, rel in enumerate(relevances):
        if rel <= 0:
            continue
        score += (2.0**rel - 1.0) / math.log2(i + 2)
    return score


def ndcg_at_k(ranking: List[str], qrels: Dict[str, int], k: int) -> float:
    rels = [float(qrels.get(doc_id, 0)) for doc_id in ranking[:k]]
    dcg = _dcg(rels)
    ideal = sorted((float(v) for v in qrels.values()), reverse=True)[:k]
    idcg = _dcg(ideal)
    if idcg <= 0:
        return 0.0
    return dcg / idcg


def mrr_at_k(ranking: List[str], qrels: Dict[str, int], k: int) -> float:
    for i, doc_id in enumerate(ranking[:k]):
        if qrels.get(doc_id, 0) > 0:
            return 1.0 / (i + 1)
    return 0.0


def recall_at_k(ranking: List[str], qrels: Dict[str, int], k: int) -> float:
    relevant = {doc_id for doc_id, rel in qrels.items() if rel > 0}
    if not relevant:
        return 0.0
    return len(set(ranking[:k]) & relevant) / len(relevant)
