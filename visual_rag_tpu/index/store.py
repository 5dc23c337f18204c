"""HBM-resident vector stores: padded, ragged, and single-vector layouts.

Design (SURVEY §7.1): the Qdrant collection's named vectors become device
arrays —

- :class:`PaddedMultiVectors` — pooled representations have a small, bounded
  row count (<= a few dozen), so they are stored dense ``[D, P, dim]`` with a
  validity mask. MaxSim over the whole corpus is then ONE einsum + masked max:
  ideal MXU shape, no segments, no scatter.
- :class:`RaggedMultiVectors` — the full ``initial`` token store is ragged
  (hundreds-to-thousands of tokens per page, reference stores it on_disk).
  Padding-free flat ``[total_tokens, dim]`` plus per-doc ``(offset, length)``;
  candidate gather happens only for reranked docs.
- :class:`SingleVectors` — dense ``[D, dim]`` (``global_pooling``).

All stores hold vectors **cosine-normalized at seal time** (Qdrant normalizes
on upsert for cosine distance — reference qdrant_indexer.py:205-239), in a
configurable storage dtype: float32 / bfloat16 / float16 / int8 (int8 carries
per-row scales, BASELINE config[4]).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

DEFAULT_DIM = 128

_STORAGE_DTYPES = ("float32", "bfloat16", "float16", "int8", "int8_refined")


def _residual_int4(flat_f32, codes, doc_scales, offsets, lengths):
    """Per-row int4 residual sidecar for two-pass int8 refinement.

    ``codes`` are the per-doc-scale int8 codes; the residual
    ``r = x - s_doc * c8`` is quantized per row at ``rs = max|r| / 7`` and
    packed two nibbles per byte ``(c4 + 8)``: column ``2j`` in the low
    nibble, ``2j+1`` in the high nibble. Adds 0.5 byte/component + 4
    bytes/row (~1.53x int8, 0.77x bf16) and restores bf16-parity ranking:
    int8 alone has a ~0.003 abs score-noise floor that reorders near-tie
    top-10s (measured: overlap-vs-bf16 0.98 -> 0.996 on random corpora; on
    adversarial near-tie corpora every 8-16 bit dtype is equally
    noise-limited). The refine pass re-scores only the int8 top candidates,
    so the stage-1/rerank kernels keep reading 1-byte codes.
    """
    n, dim = flat_f32.shape
    if dim % 2:
        raise ValueError("int8_refined requires an even dim")
    row_scale = np.zeros((n,), dtype=np.float32)
    offs = np.asarray(offsets)
    lens = np.asarray(lengths)
    for o, l in zip(offs.tolist(), lens.tolist()):
        if l:
            row_scale[o : o + l] = 1.0
    # residual only on real rows (alignment padding stays zero)
    r = flat_f32 - doc_scale_rows(offs, lens, doc_scales, n)[:, None] * codes.astype(np.float32)
    r *= row_scale[:, None]
    rs = np.abs(r).max(axis=1) / 7.0
    rs = np.maximum(rs, 1e-12).astype(np.float32)
    c4 = np.clip(np.rint(r / rs[:, None]), -7, 7).astype(np.int8) + 8  # [1,15]
    packed = (c4[:, 0::2] | (c4[:, 1::2] << 4)).astype(np.uint8)
    # honor the "alignment padding stays zero" contract in the stored BYTES
    # too (nibble-encoding a 0 residual is 0x88): padding rows already score
    # 0 via rs=0, but zeroed bytes keep the streaming build bit-identical
    packed *= (row_scale[:, None] > 0)
    rs = (rs * row_scale).astype(np.float32)  # padding rows contribute 0
    return packed, rs


def doc_scale_rows(offsets, lengths, doc_scales, n_rows: int) -> np.ndarray:
    """Expand per-doc scales to a per-row vector (aligned padding rows = 0)."""
    out = np.zeros((n_rows,), dtype=np.float32)
    ds = np.asarray(doc_scales, dtype=np.float32)
    for i, (o, l) in enumerate(zip(np.asarray(offsets).tolist(),
                                   np.asarray(lengths).tolist())):
        if l:
            out[o : o + l] = ds[i]
    return out


def _normalize_rows(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    norms = np.linalg.norm(x, axis=-1, keepdims=True)
    return (x / np.maximum(norms, eps)).astype(np.float32)


def quantize_rows_int8(x: np.ndarray):
    """Per-row symmetric int8 quantization: scale = max|row| / 127 (native)."""
    from visual_rag_tpu import native

    return native.quantize_int8(np.asarray(x, dtype=np.float32))


def _pack_storage(x: np.ndarray, storage_dtype: str):
    """Normalized f32 rows -> (values, scales-or-None) in the storage dtype."""
    if storage_dtype in ("int8", "int8_refined"):
        # the int4 refinement sidecar only exists on the ragged token store
        # (it refines exact rerank scores); pooled/single stores feed
        # approximate candidate cuts where per-row int8 is already enough
        return quantize_rows_int8(x)
    if storage_dtype == "bfloat16":
        from visual_rag_tpu import native

        return native.f32_to_bf16(np.asarray(x, np.float32)), None
    return x.astype(jnp.dtype(storage_dtype)), None


@dataclasses.dataclass
class PaddedMultiVectors:
    """Dense padded multivector store: values [D, P, dim], mask [D, P]."""

    values: jnp.ndarray  # [D, P, dim] storage dtype
    mask: jnp.ndarray  # [D, P] bool
    scales: Optional[jnp.ndarray] = None  # [D, P] f32 for int8 storage
    kind: str = "multi"

    @property
    def num_docs(self) -> int:
        return int(self.values.shape[0])

    @property
    def max_rows(self) -> int:
        return int(self.values.shape[1])

    @property
    def dim(self) -> int:
        return int(self.values.shape[2])

    @property
    def storage_dtype(self) -> str:
        return str(self.values.dtype)

    def nbytes(self) -> int:
        n = self.values.size * self.values.dtype.itemsize + self.mask.size
        if self.scales is not None:
            n += self.scales.size * 4
        return n

    def dequantized(self, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
        """Values in a matmul-ready dtype (int8 rows rescaled)."""
        if self.scales is not None:
            return (self.values.astype(jnp.float32) * self.scales[..., None]).astype(compute_dtype)
        return self.values.astype(compute_dtype)

    @classmethod
    def build(cls, mats, storage_dtype: str = "bfloat16", max_rows: Optional[int] = None,
              dim: Optional[int] = None):
        """Stack ragged host matrices [n_i, dim] into a padded device store."""
        mats = [np.asarray(m, dtype=np.float32) for m in mats]
        dim = mats[0].shape[1] if mats else (dim or DEFAULT_DIM)
        if max_rows is None:
            max_rows = max((m.shape[0] for m in mats), default=1)
        max_rows = max(1, int(max_rows))
        d = len(mats)
        if d:
            from visual_rag_tpu.index import stream

            if stream.should_stream(d * max_rows * dim * 4, max_rows, dim):
                return stream.build_padded_streaming(
                    mats, storage_dtype=storage_dtype, dim=dim,
                    max_rows=max_rows)
        out = np.zeros((d, max_rows, dim), dtype=np.float32)
        mask = np.zeros((d, max_rows), dtype=bool)
        for i, m in enumerate(mats):
            t = min(m.shape[0], max_rows)
            if t:
                out[i, :t] = _normalize_rows(m[:t])
                mask[i, :t] = True
        values, scales = _pack_storage(out, storage_dtype)
        return cls(
            values=jnp.asarray(values),
            mask=jnp.asarray(mask),
            scales=None if scales is None else jnp.asarray(scales),
        )


@dataclasses.dataclass
class RaggedMultiVectors:
    """Padding-free ragged token store: flat [N, dim] + per-doc offset table."""

    flat: jnp.ndarray  # [total_tokens, dim] storage dtype
    offsets: jnp.ndarray  # [D] int32
    lengths: jnp.ndarray  # [D] int32
    max_len: int  # max tokens per doc (static gather width)
    scales: Optional[jnp.ndarray] = None  # [D] f32 PER-DOC scales for int8
    res4: Optional[jnp.ndarray] = None  # [N, dim//2] uint8 packed int4 residual
    res_scales: Optional[jnp.ndarray] = None  # [N] f32 per-row residual scales
    kind: str = "multi_ragged"

    @property
    def num_docs(self) -> int:
        return int(self.offsets.shape[0])

    @property
    def dim(self) -> int:
        return int(self.flat.shape[1])

    @property
    def total_tokens(self) -> int:
        """Real (un-padded, un-aligned) token count across all docs."""
        import numpy as np

        return int(np.asarray(self.lengths).sum())

    @property
    def storage_dtype(self) -> str:
        if self.res4 is not None:
            return "int8_refined"
        return str(self.flat.dtype)

    def nbytes(self) -> int:
        n = self.flat.size * self.flat.dtype.itemsize + self.offsets.size * 8
        if self.scales is not None:
            n += self.scales.size * 4
        if self.res4 is not None:
            n += self.res4.size
        if self.res_scales is not None:
            n += self.res_scales.size * 4
        return n

    def dequantized_flat(self, refined: bool = True) -> np.ndarray:
        """f32 flat token matrix with per-doc int8 scales applied (and, when
        present and ``refined``, the int4 residual sidecar added back)."""
        flat = np.asarray(self.flat, dtype=np.float32)
        if self.scales is not None:
            offs = np.asarray(self.offsets)
            lens = np.asarray(self.lengths)
            s = np.asarray(self.scales)
            for i in range(len(offs)):
                flat[offs[i] : offs[i] + lens[i]] *= s[i]
        if refined and self.res4 is not None:
            packed = np.asarray(self.res4)
            c4 = np.empty(flat.shape, dtype=np.float32)
            c4[:, 0::2] = (packed & 15).astype(np.int8) - 8
            c4[:, 1::2] = (packed >> 4).astype(np.int8) - 8
            flat += c4 * np.asarray(self.res_scales, np.float32)[:, None]
        return flat

    def doc_matrices(self):
        """Host list of per-doc [n_i, dim] f32 matrices (dequantized)."""
        flat = self.dequantized_flat()
        offs = np.asarray(self.offsets)
        lens = np.asarray(self.lengths)
        return [flat[offs[i] : offs[i] + lens[i]].copy() for i in range(len(offs))]

    @classmethod
    def build(cls, mats, storage_dtype: str = "bfloat16", dim: Optional[int] = None):
        from visual_rag_tpu import native

        mats = [np.asarray(m, dtype=np.float32) for m in mats]
        dim = mats[0].shape[1] if mats else (dim or DEFAULT_DIM)
        lengths = np.array([m.shape[0] for m in mats], dtype=np.int32)
        max_len = int(lengths.max()) if len(mats) else 1
        if len(mats):
            from visual_rag_tpu.index import stream

            aligned = ((lengths.astype(np.int64) + 31) // 32) * 32
            est = (int(aligned.sum()) + ((max_len + 31) // 32) * 32) * dim * 4
            if stream.should_stream(est, int(aligned.max()), dim):
                return stream.build_ragged_streaming(
                    mats, storage_dtype=storage_dtype, dim=dim)
        src = (np.concatenate(mats, axis=0) if mats
               else np.zeros((0, dim), dtype=np.float32))
        # Each doc's block starts 32-row-aligned so Pallas DMA windows are
        # provably tile-aligned (f32/bf16/int8 tilings); tail padding of
        # ceil32(max_len) rows keeps fixed-width windows in bounds — the
        # rerank kernel widens its window to ceil32(max_len), and a trailing
        # zero-length doc has an aligned span of 0 rows, so max_len alone
        # could leave up to 31 rows of the widened window out of bounds.
        # The normalize + scatter runs in the native OpenMP runtime when
        # available.
        flat, offsets = native.pack_aligned(
            src, lengths, align=32, tail_pad_rows=((max_len + 31) // 32) * 32,
            normalize=True)
        res4 = res_scales = None
        if storage_dtype in ("int8", "int8_refined"):
            # PER-DOC scales (not per-row): a doc-constant scale commutes with
            # the row-max and query-sum, so kernels apply it once per
            # candidate score instead of per token row. Runs in the native
            # OpenMP runtime when available.
            values, scales = native.quantize_per_doc(flat, offsets, lengths)
            if storage_dtype == "int8_refined":
                res4, res_scales = _residual_int4(
                    flat, values, scales, offsets, lengths)
        else:
            values, scales = _pack_storage(flat, storage_dtype)
        return cls(
            flat=jnp.asarray(values),
            offsets=jnp.asarray(offsets.astype(np.int32)),
            lengths=jnp.asarray(lengths),
            max_len=max_len,
            scales=None if scales is None else jnp.asarray(scales),
            res4=None if res4 is None else jnp.asarray(res4),
            res_scales=None if res_scales is None else jnp.asarray(res_scales),
        )


@dataclasses.dataclass
class SingleVectors:
    """Dense single-vector store: values [D, dim] (e.g. global_pooling)."""

    values: jnp.ndarray  # [D, dim]
    scales: Optional[jnp.ndarray] = None  # [D] f32 for int8
    kind: str = "single"

    @property
    def num_docs(self) -> int:
        return int(self.values.shape[0])

    @property
    def dim(self) -> int:
        return int(self.values.shape[1])

    @property
    def storage_dtype(self) -> str:
        return str(self.values.dtype)

    def nbytes(self) -> int:
        n = self.values.size * self.values.dtype.itemsize
        if self.scales is not None:
            n += self.scales.size * 4
        return n

    def dequantized(self, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
        if self.scales is not None:
            return (self.values.astype(jnp.float32) * self.scales[:, None]).astype(compute_dtype)
        return self.values.astype(compute_dtype)

    @classmethod
    def build(cls, vecs, storage_dtype: str = "bfloat16", dim: Optional[int] = None):
        if len(vecs) == 0:
            arr = np.zeros((0, dim or DEFAULT_DIM), dtype=np.float32)
        else:
            arr = np.asarray(vecs, dtype=np.float32)
        if arr.ndim != 2:
            arr = arr.reshape(len(vecs), -1)
        arr = _normalize_rows(arr)
        values, scales = _pack_storage(arr, storage_dtype)
        return cls(
            values=jnp.asarray(values),
            scales=None if scales is None else jnp.asarray(scales),
        )


@dataclasses.dataclass
class SealedIndex:
    """An immutable device-resident collection snapshot ready for queries."""

    stores: Dict[str, object]  # name -> Padded/Ragged/Single store
    manifest: "object"  # visual_rag_tpu.index.manifest.Manifest
    storage_dtype: str = "bfloat16"

    @property
    def num_docs(self) -> int:
        for s in self.stores.values():
            return s.num_docs
        return 0

    @property
    def vector_names(self):
        return sorted(self.stores.keys())

    def store(self, name: str):
        if name not in self.stores:
            raise KeyError(
                f"Named vector {name!r} not in collection (have: {self.vector_names})"
            )
        return self.stores[name]

    def nbytes(self) -> int:
        return sum(s.nbytes() for s in self.stores.values())

    def info(self) -> Dict[str, object]:
        """Collection introspection (reference: qdrant_indexer.get_collection_info)."""
        return {
            "points_count": self.num_docs,
            "vectors": {
                name: {
                    "kind": s.kind,
                    "storage_dtype": s.storage_dtype,
                    "nbytes": s.nbytes(),
                    **(
                        {"max_rows": s.max_rows}
                        if isinstance(s, PaddedMultiVectors)
                        else {"max_len": s.max_len, "total_tokens": s.total_tokens}
                        if isinstance(s, RaggedMultiVectors)
                        else {}
                    ),
                }
                for name, s in self.stores.items()
            },
            "index_nbytes": self.nbytes(),
            "status": "green",
        }
