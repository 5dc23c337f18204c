"""Host-side collection manifest: IDs, payloads, filterable fields.

Mirrors the Qdrant payload plane (reference: pipeline.py:569-618 payload
assembly; qdrant_indexer.py payload indexes): document identity and metadata
stay host-side; only a boolean candidate mask crosses to the device per query.

Persistence makes indexing idempotent and resumable (reference --resume /
skip-existing semantics, SURVEY §5): the manifest is saved alongside the
vector shards and reloaded with content-addressed IDs intact.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Iterable, List, Optional

import numpy as np


class Manifest:
    """Ordered point registry: position in the device arrays == doc index.

    Payload *indexes* (reference create_payload_indexes,
    qdrant_indexer.py:264-339) become interned int32 columns here: each
    indexed field gets a code column + value vocabulary, so filters evaluate
    through the native columnar kernels instead of per-doc python dict lookups.
    """

    def __init__(self) -> None:
        self.ids: List[str] = []
        self.payloads: List[Dict[str, Any]] = []
        self._id_to_idx: Dict[str, int] = {}
        self._columns: Dict[str, np.ndarray] = {}  # field -> int32 codes
        self._vocabs: Dict[str, Dict[Any, int]] = {}  # field -> value -> code
        # bumped on every mutation; filter-mask caches key on (filter
        # signature, version) so appends invalidate stale masks
        self.version: int = 0

    def __len__(self) -> int:
        return len(self.ids)

    def __contains__(self, point_id: str) -> bool:
        return point_id in self._id_to_idx

    def add(self, point_id: str, payload: Optional[Dict[str, Any]] = None) -> int:
        if point_id in self._id_to_idx:
            raise ValueError(f"Duplicate point id: {point_id}")
        idx = len(self.ids)
        self.ids.append(point_id)
        self.payloads.append(dict(payload or {}))
        self._id_to_idx[point_id] = idx
        self._columns.clear()  # indexes are rebuilt lazily after appends
        self.version += 1
        return idx

    # -- payload indexes -----------------------------------------------------

    MISSING_CODE = -1

    def create_payload_index(self, field: str) -> None:
        """Intern one payload field into an int32 code column."""
        vocab: Dict[Any, int] = {}
        codes = np.empty((len(self.ids),), dtype=np.int32)
        for i, pl in enumerate(self.payloads):
            v = pl.get(field)
            if v is None:
                codes[i] = self.MISSING_CODE
                continue
            code = vocab.get(v)
            if code is None:
                code = len(vocab)
                vocab[v] = code
            codes[i] = code
        self._columns[field] = codes
        self._vocabs[field] = vocab

    def payload_index(self, field: str):
        """(codes, vocab) for an indexed field, building it on first use."""
        if field not in self._columns:
            self.create_payload_index(field)
        return self._columns[field], self._vocabs[field]

    def indexed_fields(self) -> List[str]:
        return sorted(self._columns.keys())

    def index_of(self, point_id: str) -> Optional[int]:
        return self._id_to_idx.get(point_id)

    def indices_of(self, point_ids: Iterable[str]) -> np.ndarray:
        out = [self._id_to_idx[p] for p in point_ids if p in self._id_to_idx]
        return np.asarray(out, dtype=np.int32)

    def payload(self, idx: int) -> Dict[str, Any]:
        return self.payloads[idx]

    def existing_ids(self, filename: Optional[str] = None) -> List[str]:
        """IDs already indexed, optionally restricted to one source filename.

        Reference: qdrant_indexer.get_existing_ids (filename-filtered scroll).
        """
        if filename is None:
            return list(self.ids)
        return [
            pid
            for pid, pl in zip(self.ids, self.payloads)
            if pl.get("filename") == filename or pl.get("pdf_filename") == filename
        ]

    def id_mask(self, point_ids: Iterable[str]) -> np.ndarray:
        """Boolean doc mask from an ID set (HasIdCondition equivalent)."""
        mask = np.zeros((len(self.ids),), dtype=bool)
        for p in point_ids:
            i = self._id_to_idx.get(p)
            if i is not None:
                mask[i] = True
        return mask

    # -- persistence ---------------------------------------------------------

    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            for pid, pl in zip(self.ids, self.payloads):
                f.write(json.dumps({"id": pid, "payload": pl}, default=str) + "\n")

    @classmethod
    def load(cls, path: str | Path) -> "Manifest":
        m = cls()
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                m.add(rec["id"], rec.get("payload") or {})
        return m
