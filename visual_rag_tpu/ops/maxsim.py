"""MaxSim late-interaction scoring — the math Qdrant's Rust engine computed.

score(Q, D) = sum_q max_d <q_hat, d_hat>   (reference: pooling.py:468-552)

Besides the reference-parity scalar API, this module provides the padded,
masked, batched forms that the device index engine uses: all hot paths are
single einsums with fp32 accumulation so XLA maps them straight onto the MXU.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

__all__ = [
    "l2_normalize",
    "compute_maxsim_score",
    "compute_maxsim_batch",
    "maxsim_scores_padded",
    "maxsim_matrix_padded",
]

_EPS = 1e-8  # matches reference normalization epsilon (pooling.py:497-500)

NEG_INF = np.float32(-1e30)  # np scalar: a jnp scalar here would initialize the
# backend at import time (breaks jax.distributed.initialize-after-import and
# costs a tunnel round-trip on remote backends)


def _accept(x):
    """Accept jax/numpy/torch inputs (torch bf16 upcast host-side)."""
    from visual_rag_tpu.ops.pooling import _torch_to_numpy

    t = _torch_to_numpy(x)
    return x if t is None else t


def l2_normalize(x, axis: int = -1, eps: float = _EPS) -> jnp.ndarray:
    """L2-normalize along axis with the reference's additive epsilon."""
    x = jnp.asarray(_accept(x), dtype=jnp.float32)
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / (norm + eps)


def compute_maxsim_score(query_embedding, doc_embedding, normalize: bool = True) -> float:
    """ColBERT MaxSim score of one query against one document.

    Reference: pooling.py:468-514. Returns a Python float for API parity.
    """
    q = jnp.asarray(_accept(query_embedding), dtype=jnp.float32)
    d = jnp.asarray(_accept(doc_embedding), dtype=jnp.float32)
    if normalize:
        q = l2_normalize(q)
        d = l2_normalize(d)
    sims = jnp.matmul(q, d.T, preferred_element_type=jnp.float32)
    return float(jnp.sum(jnp.max(sims, axis=1)))


def compute_maxsim_batch(query_embedding, doc_embeddings: Sequence, normalize: bool = True):
    """MaxSim scores of one query against a list of (ragged) documents.

    Reference: pooling.py:517-552. Ragged python-list input, so this is the
    host-convenience path; the engine uses :func:`maxsim_scores_padded`.
    """
    q = jnp.asarray(_accept(query_embedding), dtype=jnp.float32)
    if normalize:
        q = l2_normalize(q)
    scores = []
    for doc in doc_embeddings:
        d = jnp.asarray(_accept(doc), dtype=jnp.float32)
        if normalize:
            d = l2_normalize(d)
        sims = jnp.matmul(q, d.T, preferred_element_type=jnp.float32)
        scores.append(float(jnp.sum(jnp.max(sims, axis=1))))
    return scores


def maxsim_scores_padded(
    query: jnp.ndarray,
    docs: jnp.ndarray,
    doc_mask: jnp.ndarray,
    query_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Batched masked MaxSim: one query vs a padded stack of documents.

    Args:
        query:     [nq, dim] (assumed already normalized if cosine is wanted)
        docs:      [n_docs, max_t, dim] padded document token matrices
        doc_mask:  [n_docs, max_t] True for valid tokens
        query_mask: optional [nq] True for valid query tokens

    Returns:
        [n_docs] fp32 MaxSim scores. Documents with zero valid tokens score 0.
    """
    q = jnp.asarray(query, dtype=jnp.float32)
    sims = jnp.einsum("qd,ntd->nqt", q, jnp.asarray(docs, jnp.float32),
                      preferred_element_type=jnp.float32)
    sims = jnp.where(doc_mask[:, None, :], sims, NEG_INF)
    per_q = jnp.max(sims, axis=2)  # [n_docs, nq]
    has_tokens = jnp.any(doc_mask, axis=1)  # [n_docs]
    per_q = jnp.where(has_tokens[:, None], per_q, 0.0)
    if query_mask is not None:
        per_q = per_q * jnp.asarray(query_mask, jnp.float32)[None, :]
    return jnp.sum(per_q, axis=1)


def maxsim_matrix_padded(
    queries: jnp.ndarray,
    query_mask: jnp.ndarray,
    docs: jnp.ndarray,
    doc_mask: jnp.ndarray,
) -> jnp.ndarray:
    """All-pairs MaxSim between padded query and doc stacks.

    Args:
        queries: [B, nq, dim], query_mask: [B, nq]
        docs:    [N, max_t, dim], doc_mask: [N, max_t]

    Returns:
        [B, N] fp32 score matrix (used by in-memory eval + training loss).
    """
    sims = jnp.einsum(
        "bqd,ntd->bnqt",
        jnp.asarray(queries, jnp.float32),
        jnp.asarray(docs, jnp.float32),
        preferred_element_type=jnp.float32,
    )
    sims = jnp.where(doc_mask[None, :, None, :], sims, NEG_INF)
    per_q = jnp.max(sims, axis=3)  # [B, N, nq]
    has_tokens = jnp.any(doc_mask, axis=1)  # [N]
    per_q = jnp.where(has_tokens[None, :, None], per_q, 0.0)
    per_q = per_q * jnp.asarray(query_mask, jnp.float32)[:, None, :]
    return jnp.sum(per_q, axis=2)


def pad_ragged(mats: Sequence, max_len: int | None = None, dim: int | None = None):
    """Host helper: stack ragged [n_i, dim] matrices to ([N, T, dim], [N, T] mask)."""
    import numpy as np

    mats = [np.asarray(m, dtype=np.float32) for m in mats]
    if dim is None:
        dim = mats[0].shape[1] if mats else 128
    if max_len is None:
        max_len = max((m.shape[0] for m in mats), default=1)
    out = np.zeros((len(mats), max_len, dim), dtype=np.float32)
    mask = np.zeros((len(mats), max_len), dtype=bool)
    for i, m in enumerate(mats):
        t = min(m.shape[0], max_len)
        out[i, :t] = m[:t]
        mask[i, :t] = True
    return jnp.asarray(out), jnp.asarray(mask)
