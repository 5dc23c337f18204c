"""Shared helpers for the ops scripts."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_platform = os.environ.get("VISUALRAG_PLATFORM")
if _platform:  # e.g. VISUALRAG_PLATFORM=cpu for small host-side admin jobs
    import jax

    jax.config.update("jax_platforms", _platform)


def load_builder(index_dir: str, collection: str):
    from visual_rag_tpu.index import IndexBuilder

    path = Path(index_dir) / collection
    if not (path / "schema.json").exists():
        raise SystemExit(f"No collection at {path}")
    return IndexBuilder.load(path), path
