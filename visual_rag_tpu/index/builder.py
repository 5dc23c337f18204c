"""Index builder: host-side accumulation -> sealed device collection.

This replaces the reference's QdrantIndexer upload path (reference:
qdrant_indexer.py:131-507): ``create_collection`` becomes a
:class:`CollectionSchema`, ``upload_batch`` becomes :meth:`IndexBuilder.add`
(idempotent via deterministic IDs, skip-existing supported), and the HNSW
build becomes :meth:`IndexBuilder.seal`, which lays the accumulated vectors
out into device-resident stores (no ANN graph needed — blocked brute force on
the MXU is exact and fast at these scales, which also removes the reference's
``indexing_threshold`` / ``exact=True`` knobs).

Persistence: ``save``/``load`` round-trip the collection through an on-disk
directory (npz shards + manifest JSONL + schema JSON), the TPU equivalent of
Qdrant's durable collection (SURVEY §5 checkpoint/resume).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from visual_rag_tpu.index.manifest import Manifest
from visual_rag_tpu.index.store import (
    DEFAULT_DIM,
    PaddedMultiVectors,
    RaggedMultiVectors,
    SealedIndex,
    SingleVectors,
)

VALID_LAYOUTS = ("ragged", "padded", "single")


@dataclasses.dataclass
class VectorSpec:
    """One named vector in the collection schema."""

    name: str
    layout: str  # ragged | padded | single
    dim: int = DEFAULT_DIM
    max_rows: Optional[int] = None  # padded layout row cap (None = max observed)

    def __post_init__(self):
        if self.layout not in VALID_LAYOUTS:
            raise ValueError(f"layout must be one of {VALID_LAYOUTS}, got {self.layout!r}")


@dataclasses.dataclass
class CollectionSchema:
    """Named-vector schema (reference collection schema, SURVEY Appendix A)."""

    vectors: Dict[str, VectorSpec]
    storage_dtype: str = "bfloat16"

    @classmethod
    def standard(
        cls,
        experimental_names: Sequence[str] = ("experimental_pooling",),
        storage_dtype: str = "bfloat16",
        dim: int = DEFAULT_DIM,
    ) -> "CollectionSchema":
        """The reference's default schema: initial + mean + global + experimental(s).

        Reference: qdrant_indexer.create_collection (qdrant_indexer.py:197-247).
        """
        vectors = {
            "initial": VectorSpec("initial", "ragged", dim),
            "mean_pooling": VectorSpec("mean_pooling", "padded", dim),
            "global_pooling": VectorSpec("global_pooling", "single", dim),
        }
        for name in experimental_names:
            vectors[name] = VectorSpec(name, "padded", dim)
        return cls(vectors=vectors, storage_dtype=storage_dtype)

    def to_json(self) -> Dict[str, Any]:
        return {
            "storage_dtype": self.storage_dtype,
            "vectors": {
                n: {"layout": v.layout, "dim": v.dim, "max_rows": v.max_rows}
                for n, v in self.vectors.items()
            },
        }

    @classmethod
    def from_json(cls, obj: Dict[str, Any]) -> "CollectionSchema":
        return cls(
            vectors={
                n: VectorSpec(n, v["layout"], v.get("dim", DEFAULT_DIM), v.get("max_rows"))
                for n, v in obj["vectors"].items()
            },
            storage_dtype=obj.get("storage_dtype", "bfloat16"),
        )


class IndexBuilder:
    """Accumulates points host-side; ``seal()`` produces the device index."""

    def __init__(self, schema: CollectionSchema):
        self.schema = schema
        self.manifest = Manifest()
        self._vectors: Dict[str, List[np.ndarray]] = {n: [] for n in schema.vectors}

    def __len__(self) -> int:
        return len(self.manifest)

    def check_exists(self, point_id: str) -> bool:
        return point_id in self.manifest

    def get_existing_ids(self, filename: Optional[str] = None):
        """IDs already indexed, optionally by source filename.

        Reference: qdrant_indexer.get_existing_ids (:522-578) — here a host
        manifest lookup instead of a Qdrant scroll.
        """
        return self.manifest.existing_ids(filename)

    def add(
        self,
        point_id: str,
        vectors: Dict[str, np.ndarray],
        payload: Optional[Dict[str, Any]] = None,
        skip_existing: bool = True,
    ) -> bool:
        """Add one point. Returns False when skipped as already present."""
        if point_id in self.manifest:
            if skip_existing:
                return False
            raise ValueError(f"Point {point_id} already indexed")
        missing = set(self.schema.vectors) - set(vectors)
        if missing:
            raise ValueError(f"Point {point_id} missing named vectors: {sorted(missing)}")
        staged: Dict[str, np.ndarray] = {}
        for name, spec in self.schema.vectors.items():
            arr = np.asarray(vectors[name], dtype=np.float32)
            if spec.layout == "single":
                arr = arr.reshape(-1)
                if arr.shape[0] != spec.dim:
                    raise ValueError(
                        f"{name}: expected dim {spec.dim}, got shape {arr.shape}"
                    )
            else:
                if arr.ndim != 2 or arr.shape[1] != spec.dim:
                    raise ValueError(
                        f"{name}: expected [n, {spec.dim}] matrix, got shape {arr.shape}"
                    )
            staged[name] = arr
        self.manifest.add(point_id, payload)
        for name, arr in staged.items():
            self._vectors[name].append(arr)
        return True

    def upload_batch(self, points: Sequence[Dict[str, Any]], skip_existing: bool = True) -> int:
        """Batch add; each point dict has keys id/vectors/payload.

        API parity with reference upload_batch (qdrant_indexer.py:341-507) —
        retry/bisect logic is unnecessary in-process.
        """
        added = 0
        for p in points:
            if self.add(p["id"], p["vectors"], p.get("payload"), skip_existing=skip_existing):
                added += 1
        return added

    def seal(self) -> SealedIndex:
        """Lay out accumulated vectors as device-resident stores."""
        stores: Dict[str, object] = {}
        dt = self.schema.storage_dtype
        for name, spec in self.schema.vectors.items():
            mats = self._vectors[name]
            if spec.layout == "ragged":
                stores[name] = RaggedMultiVectors.build(mats, storage_dtype=dt, dim=spec.dim)
            elif spec.layout == "padded":
                stores[name] = PaddedMultiVectors.build(
                    mats, storage_dtype=dt, max_rows=spec.max_rows, dim=spec.dim
                )
            else:
                stores[name] = SingleVectors.build(mats, storage_dtype=dt, dim=spec.dim)
        return SealedIndex(stores=stores, manifest=self.manifest, storage_dtype=dt)

    # -- persistence (VRAG1 single-file format via the native runtime) -------

    def save(self, directory: str | Path) -> None:
        """Persist to <dir>/collection.vrag + schema.json (+ manifest.jsonl).

        Vector payload goes through the native VRAG1 writer: raw sections with
        crc32s, no compression CPU on the save path, zero-copy mmap reads.
        """
        from visual_rag_tpu import native

        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        with open(directory / "schema.json", "w", encoding="utf-8") as f:
            json.dump(self.schema.to_json(), f, indent=2)
        self.manifest.save(directory / "manifest.jsonl")
        # write-to-temp + atomic replace: saving over a loaded collection must
        # never truncate the file its own mmap'd views may still read from
        tmp_path = directory / "collection.vrag.tmp"
        writer = native.VragWriter(tmp_path)
        try:
            for name, mats in self._vectors.items():
                spec = self.schema.vectors[name]
                dim = spec.dim
                if mats:
                    data = np.concatenate(
                        [np.asarray(m, np.float32).reshape(-1, dim) for m in mats], axis=0)
                    lengths = np.asarray(
                        [1 if spec.layout == "single" else m.reshape(-1, dim).shape[0]
                         for m in mats], dtype=np.int64)
                else:
                    data = np.zeros((0, dim), dtype=np.float32)
                    lengths = np.zeros((0,), dtype=np.int64)
                writer.add(f"vec__{name}__data", data)
                writer.add(f"vec__{name}__lengths", lengths)
        finally:
            writer.close()
        import os

        os.replace(tmp_path, directory / "collection.vrag")

    @classmethod
    def load(cls, directory: str | Path) -> "IndexBuilder":
        from visual_rag_tpu import native

        directory = Path(directory)
        with open(directory / "schema.json", "r", encoding="utf-8") as f:
            schema = CollectionSchema.from_json(json.load(f))
        builder = cls(schema)
        builder.manifest = Manifest.load(directory / "manifest.jsonl")
        sections = native.read_store(directory / "collection.vrag")
        for name, spec in schema.vectors.items():
            data = np.asarray(sections[f"vec__{name}__data"])
            lengths = np.asarray(sections[f"vec__{name}__lengths"])
            mats: List[np.ndarray] = []
            pos = 0
            for ln in lengths:
                # copy out of the mmap: views would dangle if the collection
                # file is later replaced (and block in-place re-saves)
                block = np.array(data[pos : pos + int(ln)])
                mats.append(block[0] if spec.layout == "single" else block)
                pos += int(ln)
            builder._vectors[name] = mats
            if len(mats) != len(builder.manifest):
                raise ValueError(
                    f"Corrupt collection: {name} has {len(mats)} arrays for "
                    f"{len(builder.manifest)} points")
        return builder
