"""Host IO helpers: atomic JSON writes, append-only JSONL failure logs.

Reference recovery semantics (SURVEY §5): atomic report writes via
tempfile+os.replace (run_qdrant_beir.py:494-506) and append-only JSONL failure
logs enabling --resume / --retry-failures (run_qdrant_beir.py:101-103).
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path
from typing import Any, Dict, Iterable, List


def write_json_atomic(path: str | Path, obj: Any, indent: int = 2) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=str(path.parent), suffix=".tmp")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(obj, f, indent=indent, default=str)
        os.replace(tmp, str(path))
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def append_jsonl(path: str | Path, record: Dict[str, Any]) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "a", encoding="utf-8") as f:
        f.write(json.dumps(record, default=str) + "\n")


def read_jsonl(path: str | Path) -> List[Dict[str, Any]]:
    path = Path(path)
    if not path.is_file():
        return []
    out: List[Dict[str, Any]] = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return out


def dedupe_jsonl(path: str | Path, key_fields: Iterable[str]) -> int:
    """Rewrite a JSONL file keeping the last record per key tuple.

    Reference: scripts/dedupe_failure_logs.py. Returns records kept.
    """
    records = read_jsonl(path)
    seen: Dict[tuple, Dict[str, Any]] = {}
    for rec in records:
        seen[tuple(rec.get(k) for k in key_fields)] = rec
    path = Path(path)
    fd, tmp = tempfile.mkstemp(dir=str(path.parent), suffix=".tmp")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        for rec in seen.values():
            f.write(json.dumps(rec, default=str) + "\n")
    os.replace(tmp, str(path))
    return len(seen)
