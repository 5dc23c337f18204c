"""Deterministic content-addressed point IDs.

Indexing is idempotent because IDs are pure functions of content coordinates
(reference: pipeline.py:694-700, qdrant_indexer.py:602-613,
run_qdrant_beir.py:87-91): SHA-256 of a stable key, folded into a UUID.
"""

from __future__ import annotations

import hashlib
import uuid


def _sha_uuid(key: str) -> str:
    digest = hashlib.sha256(key.encode("utf-8")).hexdigest()
    return str(uuid.UUID(digest[:32]))


def generate_point_id(filename: str, page_number: int) -> str:
    """Deterministic UUID for one page chunk: sha256('{filename}:page:{n}')."""
    return _sha_uuid(f"{filename}:page:{page_number}")


def generate_chunk_id(filename: str, page_number: int) -> str:
    """Alias used by the processing pipeline (reference: pipeline.py:694-700)."""
    return generate_point_id(filename, page_number)


def union_point_id(dataset: str, source_doc_id: str, namespace: str | None = None) -> str:
    """Namespaced benchmark ID: sha256('[{namespace}::]{dataset}::{doc_id}').

    Reference: run_qdrant_beir.py:85-91 (union-corpus namespacing so multiple
    datasets can share one collection without ID collisions).
    """
    ns = f"{namespace}::{dataset}" if namespace else dataset
    return _sha_uuid(f"{ns}::{source_doc_id}")


def stable_doc_uuid(key: str) -> str:
    """Generic stable UUID from any string key (dataset loader usage)."""
    return _sha_uuid(key)
