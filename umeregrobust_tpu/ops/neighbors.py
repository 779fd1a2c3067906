"""Fixed-shape neighbor search: padded ball query, kNN, and padded gather.

TPU-native replacement for the PyTorch3D C++/CUDA ops the reference uses
(pytorch3d.ops.ball_query / knn_points / knn_gather; see reference
utils/loc_utils.py:38,72,100,383,581,623 and evaluate.py:51,272).

Design: everything is brute-force-over-chunks on purpose. The pairwise
distance term -2 p.q^T is a (Mc, 3) x (3, N) matmul that rides the MXU, and
the radius/top-k selection is VPU work; for the reference's sizes
(M <= 10k keypoints, N <= 100k points, K <= 750) this is bandwidth-cheap and
compiles to a single fused loop under jit. Semantics match PyTorch3D:

- ball_query returns the FIRST K in-radius points in index order, padded
  with -1 (PyTorch3D ball_query contract, relied on by the reference's
  moment accumulation which zero-fills pads).
- knn returns the K nearest, sorted by distance.
- gather_padded maps -1 indices to a zero row (the reference's
  ball_query_gather / feat_pad idiom, utils/loc_utils.py:353-354).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["ball_query", "knn", "gather_padded", "pairwise_sqdist"]

_BIG = jnp.float32(1e30)


def pairwise_sqdist(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distances (M, N) between q (M, 3) and p (N, 3).

    Written as |q|^2 + |p|^2 - 2 q p^T so the cross term is one MXU matmul.
    Clamped at 0 to kill negative fp noise.
    """
    q = q.astype(jnp.float32)
    p = p.astype(jnp.float32)
    qq = jnp.sum(q * q, axis=-1)
    pp = jnp.sum(p * p, axis=-1)
    cross = jnp.matmul(q, p.T, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    return jnp.maximum(qq[:, None] + pp[None, :] - 2.0 * cross, 0.0)


def _first_k_in_radius(
    d2: jnp.ndarray, p_mask: Optional[jnp.ndarray], radius: float, K: int
) -> jnp.ndarray:
    """First-K-by-index selection of columns with d2 <= radius^2. Returns
    (M, K) int32 indices, -1 padded."""
    N = d2.shape[-1]
    ok = d2 <= jnp.float32(radius) ** 2
    if p_mask is not None:
        ok = ok & p_mask[None, :]
    # score: index where in-radius, else a large sentinel; the K smallest
    # scores are exactly the first K in-radius indices.
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    score = jnp.where(ok, col, jnp.int32(N + 1))
    # top_k on negated scores gives the K smallest.
    neg_topk, _ = jax.lax.top_k(-score, K)
    idx = -neg_topk
    return jnp.where(idx > N, jnp.int32(-1), idx.astype(jnp.int32))


@partial(jax.jit, static_argnames=("radius", "K", "chunk"))
def ball_query(
    query: jnp.ndarray,
    points: jnp.ndarray,
    radius: float,
    K: int,
    q_mask: Optional[jnp.ndarray] = None,
    p_mask: Optional[jnp.ndarray] = None,
    chunk: int = 256,
) -> jnp.ndarray:
    """Padded fixed-K ball query.

    Args:
      query:  (M, 3) query points.
      points: (N, 3) reference points.
      radius: inclusion radius.
      K:      max neighbors per query.
      q_mask: optional (M,) query validity; invalid queries get all -1.
      p_mask: optional (N,) point validity; invalid points never match.
      chunk:  queries processed per scan step (static).

    Returns:
      idx: (M, K) int32 neighbor indices into ``points``, -1 padded,
           in ascending index order (PyTorch3D first-K semantics).
    """
    M = query.shape[0]
    pad = (-M) % chunk
    qp = jnp.pad(query, ((0, pad), (0, 0)))
    n_chunks = qp.shape[0] // chunk
    qc = qp.reshape(n_chunks, chunk, 3)

    def step(_, qb):
        d2 = pairwise_sqdist(qb, points)
        return None, _first_k_in_radius(d2, p_mask, radius, K)

    _, idx = jax.lax.scan(step, None, qc)
    idx = idx.reshape(-1, K)[:M]
    if q_mask is not None:
        idx = jnp.where(q_mask[:, None], idx, jnp.int32(-1))
    return idx


@partial(jax.jit, static_argnames=("K", "chunk", "approx"))
def knn(
    query: jnp.ndarray,
    points: jnp.ndarray,
    K: int,
    q_mask: Optional[jnp.ndarray] = None,
    p_mask: Optional[jnp.ndarray] = None,
    chunk: int = 256,
    approx: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K nearest neighbors, sorted ascending by distance.

    Returns (dists (M, K) fp32 — Euclidean, not squared — and idx (M, K)
    int32). Invalid points (p_mask False) are pushed to +inf distance; their
    indices still appear if fewer than K valid points exist, so callers
    sharing masks should also mask downstream.

    approx=True selects with jax.lax.approx_max_k (TPU's PartialReduce
    top-k, recall_target=0.97) instead of the exact full-sort lax.top_k —
    measured ~4x faster at (4096 x 4096, K=50). A ~3% per-row chance of a
    slightly-farther substitute neighbor; use only where neighbor identity
    is statistical (e.g. the correlator's feature-variance weighting), not
    where exact sets matter (UME moment neighborhoods).
    """
    M = query.shape[0]
    pad = (-M) % chunk
    qp = jnp.pad(query, ((0, pad), (0, 0)))
    n_chunks = qp.shape[0] // chunk
    qc = qp.reshape(n_chunks, chunk, 3)

    def step(_, qb):
        d2 = pairwise_sqdist(qb, points)
        if p_mask is not None:
            d2 = jnp.where(p_mask[None, :], d2, _BIG)
        if approx:
            neg_d, idx = jax.lax.approx_max_k(-d2, K, recall_target=0.97)
        else:
            neg_d, idx = jax.lax.top_k(-d2, K)
        return None, (-neg_d, idx.astype(jnp.int32))

    _, (d2, idx) = jax.lax.scan(step, None, qc)
    d2 = d2.reshape(-1, K)[:M]
    idx = idx.reshape(-1, K)[:M]
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    if q_mask is not None:
        d = jnp.where(q_mask[:, None], d, _BIG)
    return d, idx


def gather_padded(
    x: jnp.ndarray, idx: jnp.ndarray, fill: float = 0.0
) -> jnp.ndarray:
    """Gather rows of x (N, C) by idx (..., K); idx == -1 yields fill rows.

    Mirrors the reference's zero-row-prepend gather for ball-query pads
    (utils/loc_utils.py:353-354 and the feat_pad idiom at :59-61).
    """
    N = x.shape[0]
    x_pad = jnp.concatenate(
        [x, jnp.full((1,) + x.shape[1:], fill, dtype=x.dtype)], axis=0
    )
    safe = jnp.where(idx < 0, jnp.int32(N), idx)
    return x_pad[safe]
