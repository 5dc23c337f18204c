"""Collection administration: residency, dtype migration, introspection.

The reference's QdrantAdmin (qdrant_admin.py:52-261) patches collection
config: per-vector on_disk/in_ram toggles, HNSW parameters, optimizer
thresholds. The TPU-native equivalents:

- on_disk / in_ram        -> host-memory vs device-HBM residency
  (:func:`modify_vector_residency`, :func:`ensure_collection_all_on_device`,
  :func:`ensure_collection_all_on_host`)
- storage dtype migration -> :func:`convert_storage_dtype` (f32/bf16/fp16/int8
  requantization without re-embedding)
- HNSW m/ef, indexing_threshold -> no equivalents needed: scoring is exact
  blocked brute force on the MXU, so there is no ANN graph to tune (this also
  removes the reference's exact=True escape hatch).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from visual_rag_tpu.index.store import (
    RaggedMultiVectors,
    SealedIndex,
    quantize_rows_int8,
)

logger = logging.getLogger(__name__)

RESIDENCIES = ("device", "host")


def _place(arr: Optional[jnp.ndarray], residency: str):
    if arr is None:
        return None
    if residency == "host":
        target = jax.devices("cpu")[0]
    else:
        target = jax.devices()[0]
    return jax.device_put(arr, target)


def vector_residency(store) -> str:
    """Current residency of a store's primary array."""
    arr = getattr(store, "values", None)
    if arr is None:
        arr = store.flat
    dev = list(arr.devices())[0]
    return "host" if dev.platform == "cpu" else "device"


def modify_vector_residency(index: SealedIndex, name: str, residency: str) -> SealedIndex:
    """Move one named vector store between device HBM and host memory."""
    if residency not in RESIDENCIES:
        raise ValueError(f"residency must be one of {RESIDENCIES}")
    store = index.store(name)
    moved = dataclasses.replace(
        store,
        **{
            f: _place(getattr(store, f), residency)
            for f in ("values", "mask", "scales", "flat", "offsets", "lengths")
            if hasattr(store, f)
        },
    )
    stores = dict(index.stores)
    stores[name] = moved
    logger.info("vector %r -> %s", name, residency)
    return dataclasses.replace(index, stores=stores)


def ensure_collection_all_on_device(index: SealedIndex) -> SealedIndex:
    """All stores into device HBM (reference ensure_collection_all_in_ram)."""
    for name in index.vector_names:
        index = modify_vector_residency(index, name, "device")
    return index


def ensure_collection_all_on_host(index: SealedIndex) -> SealedIndex:
    """All stores into host memory (reference ensure_collection_all_on_disk)."""
    for name in index.vector_names:
        index = modify_vector_residency(index, name, "host")
    return index


def convert_storage_dtype(index: SealedIndex, storage_dtype: str) -> SealedIndex:
    """Re-encode every store's vectors in a new storage dtype.

    int8 <-> float conversions requantize from the dequantized values (the
    stored vectors are already cosine-normalized, so no renormalization).
    """
    stores: Dict[str, object] = {}
    for name, store in index.stores.items():
        if isinstance(store, RaggedMultiVectors):
            # rebuild from per-doc matrices: int8 ragged stores carry PER-DOC
            # scales, which the generic per-row requantization cannot produce
            stores[name] = RaggedMultiVectors.build(
                store.doc_matrices(), storage_dtype=storage_dtype,
                dim=store.dim)
            continue
        vals = np.asarray(store.dequantized(jnp.float32))
        if storage_dtype in ("int8", "int8_refined"):
            # int8_refined's int4 sidecar lives only on the ragged token
            # store (rebuilt above); padded/single stores pack like int8 —
            # same contract as store._pack_storage
            q, s = quantize_rows_int8(vals)
            new_vals, new_scales = jnp.asarray(q), jnp.asarray(s)
        else:
            new_vals = jnp.asarray(vals.astype(jnp.dtype(storage_dtype)))
            new_scales = None
        stores[name] = dataclasses.replace(
            store, values=new_vals, scales=new_scales)
    return dataclasses.replace(index, stores=stores, storage_dtype=storage_dtype)


def get_collection_info(index: SealedIndex) -> Dict[str, object]:
    """Collection status incl. per-vector residency (reference get_collection_info)."""
    info = index.info()
    for name in index.vector_names:
        info["vectors"][name]["residency"] = vector_residency(index.store(name))
    return info
