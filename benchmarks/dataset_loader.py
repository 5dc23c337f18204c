"""ViDoRe dataset loaders: BEIR-shape (v2) and paired-shape (v1).

Parity with reference benchmarks/vidore_tatdqa_test/dataset_loader.py:
- CorpusDoc / Query dataclasses with stable sha256 UUIDs (:9-30)
- BEIR loader handling the three dataset shapes (single config with
  corpus/queries/qrels splits; beir-named configs; separate configs) with
  field-tolerant row parsing (:84-313)
- qrels normalization dropping non-positive scores (:55-73)
- v1 paired loader (1 query <-> 1 page, constructed qrels) (:318-359)
- load_vidore_dataset_auto protocol sniffing (:362-375)

HF `datasets` is optional: every loader also accepts already-materialized
row iterables (dicts), which is what the hermetic tests use.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, Iterable, List, Mapping, Optional

from visual_rag_tpu.utils.ids import stable_doc_uuid

logger = logging.getLogger(__name__)

# dataset-name aliases (reference :115-161)
DATASET_ALIASES = {
    "esg_reports_v2": "vidore/esg_reports_v2",
    "biomedical_lectures_v2": "vidore/biomedical_lectures_v2",
    "economics_reports_v2": "vidore/economics_reports_v2",
    "esg_reports_human_labeled_v2": "vidore/esg_reports_human_labeled_v2",
}


@dataclasses.dataclass
class CorpusDoc:
    doc_id: str
    image: Any = None
    embedding: Any = None  # optional precomputed [n, dim]
    metadata: Dict[str, Any] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class Query:
    query_id: str
    text: str
    metadata: Dict[str, Any] = dataclasses.field(default_factory=dict)
    # optional precomputed token embedding [nq, dim] (air-gapped / replayed
    # evaluation runs; mirrors CorpusDoc.embedding)
    embedding: Any = None


def _as_str(x) -> str:
    if x is None:
        return ""
    return str(x)


def _first_field(row: Mapping[str, Any], names: Iterable[str], default=None):
    for n in names:
        if n in row and row[n] is not None:
            return row[n]
    return default


def normalize_qrels(raw: Iterable[Mapping[str, Any]]) -> Dict[str, Dict[str, int]]:
    """Rows {query-id, corpus-id, score} -> {qid: {doc_id: rel}}, dropping <=0.

    Reference :55-73.
    """
    qrels: Dict[str, Dict[str, int]] = {}
    for row in raw:
        qid = _as_str(_first_field(row, ("query-id", "query_id", "qid")))
        did = _as_str(_first_field(row, ("corpus-id", "corpus_id", "doc-id", "doc_id")))
        score = _first_field(row, ("score", "relevance", "rel"), 1)
        try:
            score = int(score)
        except (TypeError, ValueError):
            score = 1
        if not qid or not did or score <= 0:
            continue
        qrels.setdefault(qid, {})[did] = score
    return qrels


def parse_corpus_rows(rows: Iterable[Mapping[str, Any]]) -> List[CorpusDoc]:
    """Field-tolerant corpus parsing (reference :266-313)."""
    docs: List[CorpusDoc] = []
    for i, row in enumerate(rows):
        doc_id = _as_str(_first_field(row, ("corpus-id", "corpus_id", "_id", "id", "docid"),
                                      default=str(i)))
        image = _first_field(row, ("image", "page_image", "img"))
        emb = _first_field(row, ("embedding", "embeddings"))
        meta = {k: v for k, v in row.items()
                if k not in ("image", "page_image", "img", "embedding", "embeddings")
                and isinstance(v, (str, int, float, bool))}
        docs.append(CorpusDoc(doc_id=doc_id, image=image, embedding=emb, metadata=meta))
    return docs


def parse_query_rows(rows: Iterable[Mapping[str, Any]]) -> List[Query]:
    queries: List[Query] = []
    for i, row in enumerate(rows):
        qid = _as_str(_first_field(row, ("query-id", "query_id", "_id", "id"),
                                   default=str(i)))
        text = _as_str(_first_field(row, ("query", "text", "question"), default=""))
        emb = row.get("embedding")
        if emb is not None:
            import numpy as np

            emb = np.asarray(emb, dtype=np.float32)
        queries.append(Query(query_id=qid, text=text, embedding=emb))
    return queries


def drop_empty_queries(queries: List[Query], qrels: Dict[str, Dict[str, int]]):
    """Evaluation keeps only queries with at least one positive (reference)."""
    kept = [q for q in queries
            if (q.text.strip() or q.embedding is not None)
            and qrels.get(q.query_id)]
    dropped = len(queries) - len(kept)
    if dropped:
        logger.info("Dropped %d queries without text or positives", dropped)
    return kept


@dataclasses.dataclass
class BeirDataset:
    name: str
    corpus: List[CorpusDoc]
    queries: List[Query]
    qrels: Dict[str, Dict[str, int]]


def load_beir_from_rows(
    name: str,
    corpus_rows: Iterable[Mapping[str, Any]],
    query_rows: Iterable[Mapping[str, Any]],
    qrels_rows: Iterable[Mapping[str, Any]],
) -> BeirDataset:
    """Materialize a BEIR dataset from row iterables (hermetic path)."""
    corpus = parse_corpus_rows(corpus_rows)
    queries = parse_query_rows(query_rows)
    qrels = normalize_qrels(qrels_rows)
    queries = drop_empty_queries(queries, qrels)
    return BeirDataset(name=name, corpus=corpus, queries=queries, qrels=qrels)


def load_vidore_beir_dataset(name: str, split: str = "test") -> BeirDataset:
    """Load a ViDoRe v2 BEIR dataset from the HF hub (reference :84-202).

    Tries, in order: a single config with corpus/queries/qrels splits; the
    beir-named configs; separate ``<name>-corpus``-style datasets.
    """
    import datasets  # gated: heavy optional dep

    resolved = DATASET_ALIASES.get(name, name)
    candidates = [resolved]
    if not resolved.endswith("_v2"):
        candidates.append(resolved + "_v2")
    last_err: Optional[Exception] = None
    for cand in candidates:
        for loader in (_load_single_config, _load_named_configs, _load_separate):
            try:
                corpus_rows, query_rows, qrels_rows = loader(datasets, cand, split)
                return load_beir_from_rows(name, corpus_rows, query_rows, qrels_rows)
            except Exception as exc:  # try next shape
                last_err = exc
    raise RuntimeError(f"Could not load BEIR dataset {name!r}: {last_err}")


def _load_single_config(datasets, name, split):
    ds = datasets.load_dataset(name)
    return ds["corpus"], ds["queries"], ds["qrels"]


def _load_named_configs(datasets, name, split):
    corpus = datasets.load_dataset(name, "corpus")["test"]
    queries = datasets.load_dataset(name, "queries")["test"]
    qrels = datasets.load_dataset(name, "qrels")["test"]
    return corpus, queries, qrels


def _load_separate(datasets, name, split):
    corpus = datasets.load_dataset(f"{name}-corpus")["test"]
    queries = datasets.load_dataset(f"{name}-queries")["test"]
    qrels = datasets.load_dataset(f"{name}-qrels")["test"]
    return corpus, queries, qrels


def load_vidore_paired_dataset(name: str, split: str = "test") -> BeirDataset:
    """ViDoRe v1 paired shape: one row = (query, page); qrels constructed 1:1.

    Reference :318-359.
    """
    import datasets

    rows = datasets.load_dataset(name)[split]
    return load_paired_from_rows(name, rows)


def load_paired_from_rows(name: str, rows: Iterable[Mapping[str, Any]]) -> BeirDataset:
    corpus: List[CorpusDoc] = []
    queries: List[Query] = []
    qrels: Dict[str, Dict[str, int]] = {}
    for i, row in enumerate(rows):
        src = _as_str(_first_field(row, ("image_filename", "_id", "docid"), default=str(i)))
        doc_id = stable_doc_uuid(f"{name}::{src}")
        text = _as_str(_first_field(row, ("query", "question", "text"), default=""))
        corpus.append(CorpusDoc(
            doc_id=doc_id,
            image=_first_field(row, ("image", "page_image")),
            metadata={"source_id": src}))
        if text.strip():
            qid = f"q{i}"
            queries.append(Query(query_id=qid, text=text))
            qrels[qid] = {doc_id: 1}
    return BeirDataset(name=name, corpus=corpus, queries=queries, qrels=qrels)


def load_local_json_dataset(path: str) -> BeirDataset:
    """Load a BEIR dataset from one JSON file (hermetic / air-gapped runs).

    Shape: {"name": ..., "corpus": [{"corpus-id", "embedding"|"image"...}],
    "queries": [{"query-id", "query"}], "qrels": [{"query-id", "corpus-id",
    "score"}]}. Embeddings may be nested lists.
    """
    import json

    with open(path, "r", encoding="utf-8") as f:
        obj = json.load(f)
    return load_beir_from_rows(
        obj.get("name") or str(path), obj["corpus"], obj["queries"], obj["qrels"])


def load_vidore_dataset_auto(name: str, split: str = "test") -> BeirDataset:
    """Protocol sniffing: local JSON file, BEIR shape, then paired shape.

    Reference :362-375 plus a local-file path for air-gapped environments.
    """
    if name.endswith(".json"):
        return load_local_json_dataset(name)
    try:
        return load_vidore_beir_dataset(name, split)
    except Exception:
        return load_vidore_paired_dataset(name, split)
