"""Pooling kernels for multi-vector page embeddings — TPU-native design.

Behavioral parity targets (reference: visual_rag/embedding/pooling.py, specs in
reference tests/test_pooling.py), re-designed for XLA/TPU:

The reference implements every pooling as a Python row loop over numpy arrays.
All of these poolings are *linear* maps of the input rows, so here each one is
expressed as a single static weight matrix ``W`` (built host-side from static
shapes, cached) applied as ``W @ rows`` — one MXU matmul instead of a scalar
loop. This makes every pooling jit-able, batchable, differentiable, and fast on
TPU, while matching the reference outputs to float tolerance.

Dtype contract (reference: pooling.py:19-32): compute in float32; output dtype
is the explicit ``output_dtype`` if given, else float16 inputs stay float16 and
everything else (including bfloat16) becomes float32.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "tile_level_mean_pooling",
    "colpali_row_mean_pooling",
    "adaptive_row_mean_pooling_from_grid",
    "colsmol_experimental_pooling",
    "colpali_experimental_pooling_from_rows",
    "weighted_row_smoothing_same_length",
    "colsmol_tile_4n_pooling_from_tiles",
    "global_mean_pooling",
    "sequence_chunk_mean_pooling",
    "infer_output_dtype",
]


def _torch_to_numpy(x):
    """torch.Tensor -> float32 numpy (bf16 upcast first), else None.

    Accepting torch tensors keeps the reference's input surface
    (pooling.py:19-32 handles torch fp16/bf16/fp32) so users switching from
    the reference need no call-site changes. Lazy check: torch never imported
    here.
    """
    if type(x).__module__.split(".")[0] != "torch":
        return None
    x = x.detach().cpu()
    if "bfloat16" in str(x.dtype):
        x = x.float()
    return x.numpy().astype(np.float32)


def infer_output_dtype(x, output_dtype=None):
    """fp16 -> fp16; anything else (incl. bf16) -> fp32, unless overridden.

    Reference: pooling.py:19-32 (torch fp16 -> fp16 likewise).
    """
    if output_dtype is not None:
        return jnp.dtype(output_dtype)
    dt = getattr(x, "dtype", jnp.float32)
    if "float16" in str(dt) and "bfloat16" not in str(dt):
        return jnp.dtype(jnp.float16)
    return jnp.dtype(jnp.float32)


def _as_f32(x):
    """f32 in the INPUT's backend: jax stays on device, anything else stays
    host-side numpy. Over a tunneled TPU, per-page pooling matmuls are
    microseconds of FLOPs but 10-30 ms of dispatch RTT each — host numpy is
    the fast path for the ingest fan-out; device arrays keep the device path
    (on-device ingest fusion, tests in interpret mode)."""
    if isinstance(x, jax.Array):
        return jnp.asarray(x, dtype=jnp.float32)
    t = _torch_to_numpy(x)
    if t is not None:
        return t
    return np.asarray(x, dtype=np.float32)


def _wmatmul(w_np, emb, out_dtype):
    """weights @ emb in emb's backend (weights are cached host arrays)."""
    if isinstance(emb, jax.Array):
        return jnp.matmul(jnp.asarray(w_np), emb,
                          preferred_element_type=jnp.float32).astype(out_dtype)
    return np.matmul(np.asarray(w_np, np.float32), emb).astype(out_dtype)


# ---------------------------------------------------------------------------
# Weight-matrix builders (host-side, static shapes, cached)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=4096)
def _tile_mean_weights(num_tokens: int, num_tiles: int, patches_per_tile: int):
    """W[t, i] = 1/|tile t| for tokens i in tile t; partial last tile tolerated.

    Mirrors reference pooling.py:76-98: if token count mismatches
    num_tiles*patches_per_tile, the tile count is recomputed as
    ceil(num_tokens / patches_per_tile); trailing empty tiles are dropped.
    """
    if num_tokens != num_tiles * patches_per_tile:
        num_tiles = -(-num_tokens // patches_per_tile)  # ceil
    out_rows = 0
    starts = []
    for t in range(num_tiles):
        start = t * patches_per_tile
        if start >= num_tokens:
            break
        starts.append(start)
        out_rows += 1
    w = np.zeros((out_rows, num_tokens), dtype=np.float32)
    for t, start in enumerate(starts):
        end = min(start + patches_per_tile, num_tokens)
        w[t, start:end] = 1.0 / (end - start)
    return w


@lru_cache(maxsize=4096)
def _adaptive_bin_weights(h: int, target_rows: int):
    """Evenly spaced bins over [0, h) with floor/ceil edges and clipping.

    Mirrors reference pooling.py:174-184 exactly (including the clipping rules
    start=max(0,min(start,h-1)), end=max(start+1,min(end,h))).
    """
    edges = np.linspace(0, h, target_rows + 1)
    w = np.zeros((target_rows, h), dtype=np.float32)
    for i in range(target_rows):
        start = int(np.floor(edges[i]))
        end = int(np.ceil(edges[i + 1]))
        start = max(0, min(start, h - 1))
        end = max(start + 1, min(end, h))
        w[i, start:end] = 1.0 / (end - start)
    return w


@lru_cache(maxsize=4096)
def _legacy_conv_weights(n: int, window_size: int):
    """Clipped-window "conv" producing n + 2r rows (reference pooling.py:272-286).

    center = i - r; window = rows[max(0, center-r) : min(n-1, center+r)+1].
    Special cases (reference pooling.py:269-279): window_size==1 or n==1 ->
    identity; window_size==3 and n==2 -> [row0, mean(row0,row1), row1].
    """
    if window_size == 1 or n == 1:
        return np.eye(n, dtype=np.float32)
    if window_size == 3 and n == 2:
        return np.array([[1.0, 0.0], [0.5, 0.5], [0.0, 1.0]], dtype=np.float32)
    r = window_size // 2
    out_n = n + 2 * r
    w = np.zeros((out_n, n), dtype=np.float32)
    for i in range(out_n):
        center = i - r
        lo = max(0, center - r)
        hi = min(n - 1, center + r)
        w[i, lo : hi + 1] = 1.0 / (hi + 1 - lo)
    return w


@lru_cache(maxsize=4096)
def _smoothing_weights(n: int, window_size: int, kernel: str, sigma: Optional[float]):
    """Same-length weighted smoothing W (n x n), edge-renormalized.

    Mirrors reference pooling.py:289-375: kernel weights over a window of k
    positions centered at (k-1)/2 (supports even k), normalized, then per-row
    renormalized over in-range positions; rows with no in-range weight fall
    back to identity.
    """
    k = window_size
    if k == 1 or n == 1:
        return np.eye(n, dtype=np.float32)
    center = (k - 1) / 2.0
    dist = np.abs(np.arange(k, dtype=np.float32) - center)
    if kernel == "uniform":
        base = np.ones((k,), dtype=np.float32)
    elif kernel == "triangular":
        base = np.clip((center + 1.0) - dist, 0.0, None).astype(np.float32)
    elif kernel == "gaussian":
        if sigma is None:
            sigma_eff = max(0.5, float(center) / 2.0)
        else:
            sigma_eff = float(sigma)
            if sigma_eff <= 0:
                raise ValueError("sigma must be > 0")
        base = np.exp(-0.5 * (dist / sigma_eff) ** 2).astype(np.float32)
    else:
        raise ValueError(f"Unknown kernel={kernel}. Choose uniform|triangular|gaussian.")
    s = float(base.sum())
    if s <= 0:
        return np.eye(n, dtype=np.float32)
    base = base / s
    left = k // 2
    w = np.zeros((n, n), dtype=np.float32)
    for i in range(n):
        start = i - left
        js = np.arange(start, start + k)
        valid = (js >= 0) & (js < n)
        total = float(base[valid].sum())
        if total > 0:
            w[i, js[valid]] = base[valid] / total
        else:
            w[i, i] = 1.0
    return w


@lru_cache(maxsize=4096)
def _tile_4n_weights(n_rows: int, n_cols: int, num_tiles: int, has_global: bool, include_self: bool):
    """2-D 4-neighborhood mean over the tile grid; global tile passes through.

    Mirrors reference pooling.py:378-436.
    """
    grid_n = n_rows * n_cols
    total = grid_n + (1 if (has_global and num_tiles > grid_n) else 0)
    w = np.zeros((total, num_tiles), dtype=np.float32)
    for r in range(n_rows):
        for c in range(n_cols):
            i = r * n_cols + c
            neigh = []
            if include_self:
                neigh.append(i)
            if r > 0:
                neigh.append((r - 1) * n_cols + c)
            if r + 1 < n_rows:
                neigh.append((r + 1) * n_cols + c)
            if c > 0:
                neigh.append(r * n_cols + (c - 1))
            if c + 1 < n_cols:
                neigh.append(r * n_cols + (c + 1))
            for j in neigh:
                w[i, j] = 1.0 / len(neigh)
    if has_global and num_tiles > grid_n:
        w[grid_n, grid_n] = 1.0
    return w


@lru_cache(maxsize=4096)
def _colsmol_experimental_weights(num_tokens: int, num_tiles: int, patches_per_tile: int):
    """Prefix tiles -> tile means; last tile -> raw patch passthrough.

    Mirrors reference pooling.py:188-232 including the tile-count fixup when
    the requested last tile start exceeds the token count.
    """
    last_tile_start = (num_tiles - 1) * patches_per_tile
    if last_tile_start >= num_tokens:
        num_tiles = -(-num_tokens // patches_per_tile)
        if num_tiles <= 0:
            raise ValueError("Not enough tokens for colsmol experimental pooling")
        last_tile_start = (num_tiles - 1) * patches_per_tile
    n_prefix = last_tile_start // patches_per_tile
    last_len = min(last_tile_start + patches_per_tile, num_tokens) - last_tile_start
    w = np.zeros((n_prefix + last_len, num_tokens), dtype=np.float32)
    for t in range(n_prefix):
        s = t * patches_per_tile
        w[t, s : s + patches_per_tile] = 1.0 / patches_per_tile
    for j in range(last_len):
        w[n_prefix + j, last_tile_start + j] = 1.0
    return w


# ---------------------------------------------------------------------------
# Public pooling ops
# ---------------------------------------------------------------------------


def tile_level_mean_pooling(
    embedding,
    num_tiles: int,
    patches_per_tile: int = 64,
    output_dtype=None,
) -> jnp.ndarray:
    """[num_tokens, dim] -> [num_tiles, dim] per-tile means (partial-last-tile OK).

    Reference: pooling.py:35-98.
    """
    out_dtype = infer_output_dtype(embedding, output_dtype)
    emb = _as_f32(embedding)
    w = _tile_mean_weights(int(emb.shape[0]), int(num_tiles), int(patches_per_tile))
    return _wmatmul(w, emb, out_dtype)


def colpali_row_mean_pooling(embedding, grid_size: int = 32, output_dtype=None) -> jnp.ndarray:
    """[g*g, dim] -> [g, dim] row means over a square grid (reference: pooling.py:101-124)."""
    out_dtype = infer_output_dtype(embedding, output_dtype)
    emb = _as_f32(embedding)
    g = int(grid_size)
    if int(emb.shape[0]) != g * g:
        raise ValueError(
            f"Expected {g * g} visual tokens for grid_size={g}, got {int(emb.shape[0])}"
        )
    return emb.reshape(g, g, emb.shape[1]).mean(axis=1).astype(out_dtype)


def adaptive_row_mean_pooling_from_grid(
    embedding,
    *,
    grid_h: int,
    grid_w: int,
    target_rows: int = 32,
    output_dtype=None,
) -> jnp.ndarray:
    """H x W grid -> row means -> adaptive bin means to target_rows.

    Reference: pooling.py:127-185 (H==1 repeats; H==target passthrough).
    """
    out_dtype = infer_output_dtype(embedding, output_dtype)
    emb = _as_f32(embedding)
    h, w_, dim = int(grid_h), int(grid_w), int(emb.shape[1])
    if int(emb.shape[0]) != h * w_:
        raise ValueError(
            f"Expected {h * w_} visual tokens for grid {grid_h}x{grid_w}, got {int(emb.shape[0])}"
        )
    target_rows = int(target_rows)
    if target_rows <= 0:
        raise ValueError("target_rows must be > 0")
    rows = emb.reshape(h, w_, dim).mean(axis=1)
    if h == target_rows:
        return rows.astype(out_dtype)
    if h == 1:
        return jnp.repeat(rows, target_rows, axis=0).astype(out_dtype)
    return _wmatmul(_adaptive_bin_weights(h, target_rows), rows, out_dtype)


def colsmol_experimental_pooling(
    embedding,
    num_tiles: int,
    patches_per_tile: int = 64,
    output_dtype=None,
) -> jnp.ndarray:
    """Tile means for all-but-last tile ++ raw last-tile patches.

    Reference: pooling.py:188-232.
    """
    out_dtype = infer_output_dtype(embedding, output_dtype)
    if int(num_tiles) <= 0:
        raise ValueError("num_tiles must be > 0")
    if int(patches_per_tile) <= 0:
        raise ValueError("patches_per_tile must be > 0")
    emb = _as_f32(embedding)
    w = _colsmol_experimental_weights(
        int(emb.shape[0]), int(num_tiles), int(patches_per_tile))
    return _wmatmul(w, emb, out_dtype)


def colpali_experimental_pooling_from_rows(
    row_vectors,
    *,
    window_size: int = 3,
    output_dtype=None,
) -> jnp.ndarray:
    """Legacy clipped-window conv pooling: N rows -> N + 2*(window//2) rows.

    Reference: pooling.py:235-286; behavioral spec in reference
    tests/test_pooling.py:71-157.
    """
    out_dtype = infer_output_dtype(row_vectors, output_dtype)
    rows = _as_f32(row_vectors)
    n = int(rows.shape[0])
    if n < 1:
        raise ValueError("row_vectors must be non-empty")
    window_size = int(window_size)
    if window_size < 1:
        raise ValueError("window_size must be >= 1")
    if window_size % 2 == 0:
        raise ValueError("window_size must be odd")
    return _wmatmul(_legacy_conv_weights(n, window_size), rows, out_dtype)


def weighted_row_smoothing_same_length(
    row_vectors,
    *,
    window_size: int = 3,
    kernel: str = "gaussian",
    sigma: Optional[float] = None,
    output_dtype=None,
) -> jnp.ndarray:
    """Weighted 1-D smoothing preserving row count (N -> N), even k supported.

    Reference: pooling.py:289-375.
    """
    out_dtype = infer_output_dtype(row_vectors, output_dtype)
    rows = _as_f32(row_vectors)
    n = int(rows.shape[0])
    if n < 1:
        raise ValueError("row_vectors must be non-empty")
    k = int(window_size)
    if k < 1:
        raise ValueError("window_size must be >= 1")
    kernel = str(kernel).lower().strip()
    if kernel not in ("uniform", "triangular", "gaussian"):
        raise ValueError(f"Unknown kernel={kernel}. Choose uniform|triangular|gaussian.")
    return _wmatmul(_smoothing_weights(n, k, kernel, sigma), rows, out_dtype)


def colsmol_tile_4n_pooling_from_tiles(
    tile_vectors,
    *,
    n_rows: int,
    n_cols: int,
    has_global: bool = True,
    include_self: bool = True,
    output_dtype=None,
) -> jnp.ndarray:
    """2-D 4-neighborhood mean over the tile grid; global tile unchanged.

    Reference: pooling.py:378-436.
    """
    out_dtype = infer_output_dtype(tile_vectors, output_dtype)
    tiles = _as_f32(tile_vectors)
    n_rows, n_cols = int(n_rows), int(n_cols)
    if n_rows <= 0 or n_cols <= 0:
        raise ValueError("n_rows and n_cols must be > 0")
    grid_n = n_rows * n_cols
    if int(tiles.shape[0]) < grid_n:
        raise ValueError(
            f"Expected at least {grid_n} tile vectors for {n_rows}x{n_cols}, got {int(tiles.shape[0])}"
        )
    w = _tile_4n_weights(
        n_rows, n_cols, int(tiles.shape[0]), bool(has_global), bool(include_self))
    return _wmatmul(w, tiles, out_dtype)


def global_mean_pooling(embedding, output_dtype=None) -> jnp.ndarray:
    """[num_tokens, dim] -> [dim] global mean (reference: pooling.py:439-465)."""
    out_dtype = infer_output_dtype(embedding, output_dtype)
    return _as_f32(embedding).mean(axis=0).astype(out_dtype)


def sequence_chunk_mean_pooling(embedding, target_rows: int = 32, output_dtype=None) -> jnp.ndarray:
    """Last-resort pooling: linspace-chunk the token sequence into target_rows bins.

    Reference: visual_embedder.py:824-835 (the fallback inside
    mean_pool_visual_embedding); same bin rule as adaptive row pooling.
    """
    out_dtype = infer_output_dtype(embedding, output_dtype)
    emb = _as_f32(embedding)
    w = _adaptive_bin_weights(int(emb.shape[0]), int(target_rows))
    return _wmatmul(w, emb, out_dtype)
