"""Sealed-index persistence: storage-dtype-native, device-reloadable.

``IndexBuilder.save`` persists the PRE-seal raw f32 matrices and re-seals on
load — correct but expensive (seal of 10k docs is ~240 s over a tunneled
TPU, and f32 doubles bf16 / quadruples int8 collection bytes on disk).
These functions persist the SEALED store arrays themselves through the
native VRAG1 writer (bf16 rides as raw u16, int8 codes + scales as-is), so
a restart is one mmap read + device_put per array — the "device-reloadable
shards keyed by the same IDs" checkpoint story of SURVEY §5.

    save_sealed(index, dir)   ->  dir/{sealed.vrag, schema.json,
                                       manifest.jsonl, sealed_meta.json}
    load_sealed(dir)          ->  SealedIndex (arrays on the default device)
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict

import jax.numpy as jnp
import numpy as np

from visual_rag_tpu.index.manifest import Manifest
from visual_rag_tpu.index.store import (
    PaddedMultiVectors,
    RaggedMultiVectors,
    SealedIndex,
    SingleVectors,
)


def _np_for_write(arr) -> np.ndarray:
    """Device/host array -> numpy in its storage dtype (bf16 stays bf16;
    the VRAG writer stores it as raw u16, dtype code 2)."""
    return np.asarray(arr)


def save_sealed(index: SealedIndex, directory) -> None:
    from visual_rag_tpu import native

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    index.manifest.save(directory / "manifest.jsonl")
    meta: Dict[str, dict] = {"storage_dtype": index.storage_dtype, "stores": {}}
    tmp = directory / "sealed.vrag.tmp"
    writer = native.VragWriter(tmp)
    try:
        for name, store in index.stores.items():
            if isinstance(store, RaggedMultiVectors):
                meta["stores"][name] = {
                    "kind": "ragged", "max_len": store.max_len,
                    "dtype": str(store.flat.dtype),
                    "has_scales": store.scales is not None,
                    "has_res4": store.res4 is not None}
                writer.add(f"{name}__flat", _np_for_write(store.flat))
                if store.res4 is not None:  # int8+int4 refinement sidecar
                    writer.add(f"{name}__res4", np.asarray(store.res4))
                    writer.add(f"{name}__res_scales",
                               np.asarray(store.res_scales, np.float32))
                offsets = np.asarray(store.offsets)
                if offsets.size and int(offsets.max()) > np.iinfo(np.int32).max:
                    raise ValueError(
                        f"store {name!r} has offsets beyond int32 "
                        f"({int(offsets.max())}); VRAG1 persists int32 row "
                        f"offsets — shard the index before sealing")
                writer.add(f"{name}__offsets", offsets.astype(np.int32))
                writer.add(f"{name}__lengths",
                           np.asarray(store.lengths, np.int32))
                if store.scales is not None:
                    writer.add(f"{name}__scales",
                               np.asarray(store.scales, np.float32))
            elif isinstance(store, PaddedMultiVectors):
                meta["stores"][name] = {
                    "kind": "padded", "dtype": str(store.values.dtype),
                    "has_scales": store.scales is not None}
                writer.add(f"{name}__values", _np_for_write(store.values))
                writer.add(f"{name}__mask",
                           np.asarray(store.mask).astype(np.uint8))
                if store.scales is not None:
                    writer.add(f"{name}__scales",
                               np.asarray(store.scales, np.float32))
            elif isinstance(store, SingleVectors):
                meta["stores"][name] = {
                    "kind": "single", "dtype": str(store.values.dtype),
                    "has_scales": store.scales is not None}
                writer.add(f"{name}__values", _np_for_write(store.values))
                if store.scales is not None:
                    writer.add(f"{name}__scales",
                               np.asarray(store.scales, np.float32))
            else:  # pragma: no cover
                raise TypeError(f"unknown store type for {name!r}")
    finally:
        writer.close()
    import os

    # Two-file commit: stage BOTH, then os.replace both (meta last). A crash
    # between the replaces leaves a new vrag with the OLD meta for at most
    # one window — and meta is replaced immediately after vrag, so the
    # exposure is the ordering, not a partially-written meta. The previous
    # order (vrag replaced before meta was even written) could pair a new
    # vrag with a stale or missing meta and mis-revive dtypes/kinds.
    meta_tmp = directory / "sealed_meta.json.tmp"
    meta_tmp.write_text(json.dumps(meta, indent=2))
    os.replace(tmp, directory / "sealed.vrag")
    os.replace(meta_tmp, directory / "sealed_meta.json")


def _revive(arr: np.ndarray, dtype_name: str) -> jnp.ndarray:
    if dtype_name == "bfloat16":
        import ml_dtypes

        arr = arr.view(ml_dtypes.bfloat16)  # stored as raw u16
    return jnp.asarray(arr)


def load_sealed(directory, verify: bool = False) -> SealedIndex:
    from visual_rag_tpu import native

    directory = Path(directory)
    meta = json.loads((directory / "sealed_meta.json").read_text())
    manifest = Manifest.load(directory / "manifest.jsonl")
    sections = native.read_store(directory / "sealed.vrag", verify=verify)
    stores: Dict[str, object] = {}
    for name, m in meta["stores"].items():
        scales = (jnp.asarray(np.array(sections[f"{name}__scales"]))
                  if m["has_scales"] else None)
        if m["kind"] == "ragged":
            stores[name] = RaggedMultiVectors(
                flat=_revive(np.array(sections[f"{name}__flat"]), m["dtype"]),
                offsets=jnp.asarray(np.array(sections[f"{name}__offsets"])),
                lengths=jnp.asarray(np.array(sections[f"{name}__lengths"])),
                max_len=int(m["max_len"]), scales=scales,
                res4=(jnp.asarray(np.array(sections[f"{name}__res4"]))
                      if m.get("has_res4") else None),
                res_scales=(jnp.asarray(np.array(
                    sections[f"{name}__res_scales"]))
                    if m.get("has_res4") else None))
        elif m["kind"] == "padded":
            stores[name] = PaddedMultiVectors(
                values=_revive(np.array(sections[f"{name}__values"]), m["dtype"]),
                mask=jnp.asarray(
                    np.array(sections[f"{name}__mask"]).astype(bool)),
                scales=scales)
        else:
            stores[name] = SingleVectors(
                values=_revive(np.array(sections[f"{name}__values"]), m["dtype"]),
                scales=scales)
    return SealedIndex(stores=stores, manifest=manifest,
                       storage_dtype=meta["storage_dtype"])
