"""Payload filtering: host-evaluated conditions -> device candidate bitmask.

Reference semantics: TwoStageRetriever.build_filter (two_stage.py:436-480)
builds Qdrant Filter(must=[FieldCondition(MatchValue|MatchAny)]) over the
fields year / source / district / filename / has_text; per-dataset evaluation
scope adds a dataset equality condition (run_qdrant_beir.py:1987-1997); stage
chaining uses HasIdCondition. Here every condition compiles to a boolean doc
mask over the manifest, ANDed together, shipped to the device once per query.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

Scalar = Union[str, int, float, bool]


@dataclasses.dataclass
class PayloadFilter:
    """Conjunction of field conditions; each value may be scalar or list (MatchAny)."""

    must: List[Tuple[str, Union[Scalar, Sequence[Scalar]]]] = dataclasses.field(
        default_factory=list
    )
    ids: Optional[Sequence[str]] = None  # HasIdCondition equivalent

    def is_empty(self) -> bool:
        return not self.must and self.ids is None

    def signature(self) -> Tuple:
        """Hashable identity for mask caching (engine._doc_mask memo).

        The reference harness's per_dataset scope re-applies ONE filter for
        hundreds of consecutive queries (run_qdrant_beir.py:1987-1997);
        re-evaluating + re-transferring the identical mask per search was
        pure host overhead. List values and id sets are order-insensitive
        (MatchAny / HasIdCondition semantics), so the signature sorts them;
        large id sets hash as a frozenset (O(n), still far cheaper than the
        per-doc evaluation they replace).
        """
        must_sig = tuple(
            (field,
             tuple(sorted(map(repr, value)))
             if isinstance(value, (list, tuple, set, frozenset)) else value)
            for field, value in self.must
        )
        ids_sig = (None if self.ids is None
                   else (len(self.ids), hash(frozenset(self.ids))))
        return (must_sig, ids_sig)

    def evaluate(self, manifest) -> np.ndarray:
        """Boolean mask [num_docs] over the manifest.

        Uses the manifest's interned payload-index columns + the native
        columnar kernels (visual_rag_tpu.native) — one vectorized pass per
        condition instead of a python dict lookup per doc.
        """
        from visual_rag_tpu import native

        n = len(manifest)
        mask = np.ones((n,), dtype=np.uint8)
        for field, value in self.must:
            codes, vocab = manifest.payload_index(field)
            if isinstance(value, (list, tuple, set, frozenset)):
                wanted = [vocab[v] for v in value if v in vocab]
                if not wanted:
                    return np.zeros((n,), dtype=bool)
                mask = native.filter_in(codes, wanted, mask)
            else:
                code = vocab.get(value)
                if code is None:
                    return np.zeros((n,), dtype=bool)
                mask = native.filter_eq(codes, code, mask)
        out = mask.astype(bool)
        if self.ids is not None:
            out &= manifest.id_mask(self.ids)
        return out


def build_filter(
    year: Optional[Union[int, Sequence[int]]] = None,
    source: Optional[Union[str, Sequence[str]]] = None,
    district: Optional[Union[str, Sequence[str]]] = None,
    filename: Optional[Union[str, Sequence[str]]] = None,
    has_text: Optional[bool] = None,
    extra: Optional[Dict[str, Any]] = None,
) -> Optional[PayloadFilter]:
    """Reference-parity filter builder (two_stage.py:436-480).

    Returns None when no condition is given (matching the reference, which
    passes filter_obj=None through to Qdrant).
    """
    must: List[Tuple[str, Any]] = []
    for field, value in (
        ("year", year),
        ("source", source),
        ("district", district),
        ("filename", filename),
        ("has_text", has_text),
    ):
        if value is not None:
            must.append((field, value))
    for field, value in (extra or {}).items():
        if value is not None:
            must.append((field, value))
    if not must:
        return None
    return PayloadFilter(must=must)
