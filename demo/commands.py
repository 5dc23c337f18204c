"""Reproducibility command/code builders for the demo UI.

Mirrors reference demo/commands.py (build command strings + generated Python
snippets for index/eval configs) for the TPU stack. Pure functions — the UI
renders their output in st.code blocks; tests exercise them headlessly.
"""

from __future__ import annotations

import shlex
from typing import Any, Dict, List


def build_index_command(config: Dict[str, Any]) -> str:
    """Shell command reproducing an indexing run (reference commands.py:38)."""
    parts: List[str] = [
        "python", "-m", "benchmarks.run_tpu_beir",
        "--datasets", *config.get("datasets", []),
        "--collection", str(config["collection"]),
        "--model", str(config.get("model", "vidore/colSmol-500M")),
        "--index",
    ]
    if config.get("storage_dtype"):
        parts += ["--storage-dtype", str(config["storage_dtype"])]
    if config.get("crop"):
        parts.append("--crop")
    if config.get("max_mean_pool_vectors"):
        parts += ["--max-mean-pool-vectors", str(config["max_mean_pool_vectors"])]
    if config.get("resume"):
        parts.append("--resume")
    return " ".join(shlex.quote(p) for p in parts)


def build_eval_command(config: Dict[str, Any]) -> str:
    """Shell command reproducing an evaluation run (reference commands.py:169)."""
    parts: List[str] = [
        "python", "-m", "benchmarks.run_tpu_beir",
        "--datasets", *config.get("datasets", []),
        "--collection", str(config["collection"]),
        "--model", str(config.get("model", "vidore/colSmol-500M")),
        "--mode", str(config.get("mode", "two_stage")),
        "--evaluate",
    ]
    mode = config.get("mode", "two_stage")
    if mode == "two_stage":
        parts += ["--stage1-mode",
                  str(config.get("stage1_mode", "tokens_vs_standard_pooling")),
                  "--prefetch-k", str(config.get("prefetch_k", 200))]
    elif mode == "three_stage":
        parts += ["--stage1-k", str(config.get("stage1_k", 1000)),
                  "--stage2-k", str(config.get("stage2_k", 300))]
    parts += ["--top-k", str(config.get("top_k", 100)),
              "--evaluation-scope", str(config.get("evaluation_scope", "union"))]
    if config.get("num_shards", 1) > 1:
        parts += ["--num-shards", str(config["num_shards"])]
    if config.get("storage_dtype"):
        parts += ["--storage-dtype", str(config["storage_dtype"])]
    return " \\\n  ".join(
        " ".join(shlex.quote(p) for p in group)
        for group in _group_flags(parts))


def _group_flags(parts: List[str]) -> List[List[str]]:
    """Split a flat argv into display lines: program + one line per flag."""
    groups: List[List[str]] = [[]]
    for p in parts:
        if p.startswith("--"):
            groups.append([p])
        else:
            groups[-1].append(p)
    return [g for g in groups if g]


def generate_python_index_code(config: Dict[str, Any]) -> str:
    """Standalone Python snippet reproducing an indexing run in-process."""
    datasets = ", ".join(f'"{d}"' for d in config.get("datasets", []))
    return f'''from pathlib import Path

from benchmarks.dataset_loader import load_vidore_dataset_auto
from benchmarks.run_tpu_beir import index_beir_corpus, make_schema_for_embedder
from visual_rag_tpu.index import IndexBuilder
from visual_rag_tpu.models.embedder import VisualEmbedder

COLLECTION = "{config["collection"]}"
MODEL = "{config.get("model", "vidore/colSmol-500M")}"
DATASETS = [{datasets}]
INDEX_DIR = Path("{config.get("index_dir", "indexes")}") / COLLECTION

embedder = VisualEmbedder(MODEL)
builder = (IndexBuilder.load(INDEX_DIR)
           if (INDEX_DIR / "schema.json").exists()
           else IndexBuilder(make_schema_for_embedder(
               embedder, "{config.get("storage_dtype", "bfloat16")}")))
for name in DATASETS:
    ds = load_vidore_dataset_auto(name)
    stats = index_beir_corpus(ds, embedder, builder, COLLECTION,
                              crop={bool(config.get("crop", False))})
    print(name, stats)
builder.save(INDEX_DIR)
'''


def generate_python_eval_code(config: Dict[str, Any]) -> str:
    """Standalone Python snippet reproducing an evaluation run in-process
    (reference commands.py:195 generate_python_eval_code, TPU stack)."""
    datasets = ", ".join(f'"{d}"' for d in config.get("datasets", []))
    mode = config.get("mode", "two_stage")
    extra = ""
    if mode == "two_stage":
        extra = (f'    stage1_mode="{config.get("stage1_mode", "tokens_vs_standard_pooling")}",\n'
                 f'    prefetch_k={config.get("prefetch_k", 200)},\n')
    elif mode == "three_stage":
        extra = (f'    stage1_k={config.get("stage1_k", 1000)},\n'
                 f'    stage2_k={config.get("stage2_k", 300)},\n')
    shard_setup = ""
    engine_expr = "RetrievalEngine(builder.seal())"
    if config.get("num_shards", 1) > 1:
        shard_setup = (
            "from visual_rag_tpu.parallel import ShardedEngine, ShardedIndex, make_mesh\n")
        engine_expr = (f'ShardedEngine(ShardedIndex.from_index(\n'
                       f'    builder.seal(), make_mesh(({config["num_shards"]},), ("data",))))')
    return f'''from pathlib import Path

from benchmarks.dataset_loader import load_vidore_dataset_auto
from benchmarks.run_tpu_beir import evaluate
from visual_rag_tpu.index import IndexBuilder
from visual_rag_tpu.models.embedder import VisualEmbedder
from visual_rag_tpu.retrieval import RetrievalEngine
{shard_setup}
COLLECTION = "{config["collection"]}"
MODEL = "{config.get("model", "vidore/colSmol-500M")}"
DATASETS = [{datasets}]
INDEX_DIR = Path("{config.get("index_dir", "indexes")}") / COLLECTION

embedder = VisualEmbedder(MODEL)
builder = IndexBuilder.load(INDEX_DIR)
engine = {engine_expr}
for name in DATASETS:
    ds = load_vidore_dataset_auto(name)
    report = evaluate(
        ds, embedder, engine, COLLECTION,
        mode="{mode}",
{extra}        top_k={config.get("top_k", 100)},
        scope="{config.get("evaluation_scope", "union")}")
    print(name, {{k: round(v, 4) for k, v in report["metrics"].items()
                 if k in ("ndcg@5", "ndcg@10", "recall@10")}})
'''
