"""Configuration system: YAML discovery + env overrides + dot-path access.

Mirrors the reference semantics (reference: visual_rag/config.py:33-227):

- discovery order: ``$VISUALRAG_CONFIG`` > ``./config.yaml`` > ``./visual_rag.yaml``
  > ``~/.visual_rag/config.yaml``
- cached raw-config load (``load_config(reload=True)`` to refresh)
- environment-variable override map with type coercion inferred from the
  existing YAML value's type
- dot-path ``get("a.b.c", default)`` and section getters with defaults
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)

try:  # pyyaml is in the base env, but stay import-safe like the reference
    import yaml

    _HAS_YAML = True
except Exception:  # pragma: no cover
    yaml = None
    _HAS_YAML = False

# Env var -> config dot-path (reference: config.py:110-161). Qdrant-specific
# endpoints are replaced by engine knobs; model/env names are kept so reference
# users' environments keep working.
ENV_OVERRIDES: Dict[str, str] = {
    "VISUALRAG_MODEL": "embedding.model",
    "VISUALRAG_DEVICE": "embedding.device",
    "VISUALRAG_BATCH_SIZE": "embedding.batch_size",
    "VISUALRAG_INCLUDE_SPECIAL_TOKENS": "embedding.include_special_tokens",
    "VISUALRAG_STORAGE_DTYPE": "index.storage_dtype",
    "VISUALRAG_COLLECTION": "index.collection",
    "VISUALRAG_INDEX_DIR": "index.directory",
    "VISUALRAG_PREFETCH_K": "retrieval.prefetch_k",
    "VISUALRAG_TOP_K": "retrieval.top_k",
    "VISUALRAG_MESH_SHARDS": "parallel.num_shards",
}

_CONFIG_FILENAMES = ("config.yaml", "visual_rag.yaml")
_raw_config_cache: Optional[Dict[str, Any]] = None
_config_path_cache: Optional[str] = None


def _discover_config_path() -> Optional[Path]:
    env_path = os.environ.get("VISUALRAG_CONFIG")
    if env_path:
        p = Path(env_path).expanduser()
        if p.is_file():
            return p
        logger.warning("VISUALRAG_CONFIG=%s does not exist; ignoring", env_path)
    for name in _CONFIG_FILENAMES:
        p = Path.cwd() / name
        if p.is_file():
            return p
    home = Path.home() / ".visual_rag" / "config.yaml"
    if home.is_file():
        return home
    return None


def _coerce(value: str, like: Any) -> Any:
    """Coerce an env string to the type of the existing YAML value."""
    if isinstance(like, bool):
        return value.strip().lower() in ("1", "true", "yes", "on")
    if isinstance(like, int):
        try:
            return int(value)
        except ValueError:
            return value
    if isinstance(like, float):
        try:
            return float(value)
        except ValueError:
            return value
    return value


def _set_dotted(cfg: Dict[str, Any], dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        nxt = node.get(k)
        if not isinstance(nxt, dict):
            nxt = {}
            node[k] = nxt
        node = nxt
    node[keys[-1]] = value


def _get_dotted(cfg: Dict[str, Any], dotted: str, default: Any = None) -> Any:
    node: Any = cfg
    for k in dotted.split("."):
        if not isinstance(node, dict) or k not in node:
            return default
        node = node[k]
    return node


def load_config(path: Optional[str] = None, reload: bool = False) -> Dict[str, Any]:
    """Load (and cache) the YAML config with env overrides applied."""
    global _raw_config_cache, _config_path_cache
    if _raw_config_cache is not None and not reload and path is None:
        return _raw_config_cache

    cfg: Dict[str, Any] = {}
    cfg_path = Path(path).expanduser() if path else _discover_config_path()
    if cfg_path is not None and _HAS_YAML:
        try:
            with open(cfg_path, "r", encoding="utf-8") as f:
                loaded = yaml.safe_load(f)
            if isinstance(loaded, dict):
                cfg = loaded
            _config_path_cache = str(cfg_path)
        except Exception as exc:  # malformed YAML -> empty config, like reference
            logger.warning("Failed to load config %s: %s", cfg_path, exc)

    for env_name, dotted in ENV_OVERRIDES.items():
        raw = os.environ.get(env_name)
        if raw is None:
            continue
        existing = _get_dotted(cfg, dotted)
        _set_dotted(cfg, dotted, _coerce(raw, existing))

    _raw_config_cache = cfg
    return cfg


def config_path() -> Optional[str]:
    """Path of the YAML file the active config was loaded from (if any)."""
    return _config_path_cache


def get(dotted: str, default: Any = None) -> Any:
    """Dot-path lookup into the cached config (reference: config.py:164-185)."""
    return _get_dotted(load_config(), dotted, default)


def get_section(name: str, defaults: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Return a top-level section merged over the provided defaults."""
    merged = dict(defaults or {})
    section = load_config().get(name)
    if isinstance(section, dict):
        merged.update(section)
    return merged


def get_embedding_config() -> Dict[str, Any]:
    return get_section(
        "embedding",
        {"model": "vidore/colSmol-500M", "batch_size": 8, "include_special_tokens": False},
    )


def get_index_config() -> Dict[str, Any]:
    return get_section(
        "index",
        {"collection": "visual_rag", "storage_dtype": "bfloat16", "directory": "index_data"},
    )


def get_retrieval_config() -> Dict[str, Any]:
    return get_section("retrieval", {"top_k": 10, "prefetch_k": None})


def get_parallel_config() -> Dict[str, Any]:
    return get_section("parallel", {"num_shards": 1})


def reset_cache() -> None:
    """Clear the cached config (used by tests)."""
    global _raw_config_cache, _config_path_cache
    _raw_config_cache = None
    _config_path_cache = None
