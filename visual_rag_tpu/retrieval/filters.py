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

    def evaluate(self, manifest) -> np.ndarray:
        """Boolean mask [num_docs] over the manifest."""
        n = len(manifest)
        mask = np.ones((n,), dtype=bool)
        for field, value in self.must:
            col = np.array(
                [_match(manifest.payloads[i].get(field), value) for i in range(n)],
                dtype=bool,
            )
            mask &= col
        if self.ids is not None:
            mask &= manifest.id_mask(self.ids)
        return mask


def _match(payload_value: Any, cond: Union[Scalar, Sequence[Scalar]]) -> bool:
    if isinstance(cond, (list, tuple, set, frozenset)):
        return payload_value in cond
    return payload_value == cond


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
