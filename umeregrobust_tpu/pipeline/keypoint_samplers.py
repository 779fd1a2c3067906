"""Standalone keypoint samplers (train-time alternatives).

Mask-native equivalents of the reference's sample_smart_keypoints
(utils/loc_utils.py:448-500: non-flat labels -> dense neighborhoods ->
minimum spacing via voxel-grid thinning) and sample_smart_keypoints2
(:503-558: grid-seeded variant — a coarse xy/z lattice snapped to the
nearest non-flat point, then density-filtered). The reference's training
loop does not call them (they are exposed API), and they are provided here
for the same API surface, fixed-shape.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from umeregrobust_tpu.ops.neighbors import ball_query

__all__ = ["sample_smart_keypoints", "sample_grid_keypoints"]


def _nonflat_top(pts, seg, mask, flat_labels, work):
    cand = mask
    for fl in flat_labels:
        cand = cand & (seg != fl)
    idx = jax.lax.broadcasted_iota(jnp.int32, (pts.shape[0], 1), 0)[:, 0]
    score = jnp.where(cand, idx, jnp.int32(-1))
    top, rows = jax.lax.top_k(score, work)  # descending index order
    return pts[rows], top >= 0


@partial(jax.jit, static_argnames=("num_samples", "max_nn", "min_nn", "nn_r",
                                   "flat_labels"))
def sample_smart_keypoints(
    pts: jnp.ndarray,
    seg: jnp.ndarray,
    mask: jnp.ndarray,
    num_samples: int = 1024,
    nn_r: float = 10.0,
    max_nn: int = 750,
    min_nn: int = 300,
    flat_labels: Tuple[int, ...] = (9,),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Non-flat, dense-neighborhood keypoints with >= nn_r spacing.

    Returns (kpts (num_samples, 3), kp_mask). Spacing uses voxel-grid
    thinning at cell nn_r (one keypoint per cell — the reference's
    ME.sparse_quantize trick, loc_utils.py:487-492).
    """
    work = min(8 * num_samples, pts.shape[0])
    kpts, kmask = _nonflat_top(pts, seg, mask, flat_labels, work)
    nbr = ball_query(kpts, pts, radius=nn_r, K=max_nn,
                     q_mask=kmask, p_mask=mask)
    dense = jnp.sum((nbr >= 0).astype(jnp.int32), -1) >= min_nn
    keep = kmask & dense
    # min-spacing: keep the first candidate per nn_r voxel cell
    coords = jnp.concatenate(
        [jnp.zeros((work, 1), jnp.int32),
         jnp.floor(kpts / nn_r).astype(jnp.int32)], axis=1)
    from umeregrobust_tpu.ops.sortmaps import pack_coords
    hi, lo = pack_coords(coords, keep, jnp.int32(0x7FFFFFF0))
    rows = jnp.arange(work, dtype=jnp.int32)
    hi_s, lo_s, row_s = jax.lax.sort((hi, lo, rows), num_keys=3)
    first = jnp.concatenate([
        jnp.ones((1,), bool),
        (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])]) & keep[row_s]
    rep = jnp.where(first, row_s, jnp.int32(work))
    rep = jnp.sort(rep)[:num_samples]
    kp_mask = rep < work
    out = kpts[jnp.where(kp_mask, rep, 0)]
    return out * kp_mask[:, None], kp_mask


@partial(jax.jit, static_argnames=("num_samples", "max_nn", "min_nn", "nn_r",
                                   "d_grid", "dz_grid", "grid_clip_thr",
                                   "flat_labels", "grid_extent"))
def sample_grid_keypoints(
    pts: jnp.ndarray,
    seg: jnp.ndarray,
    mask: jnp.ndarray,
    num_samples: int = 1024,
    nn_r: float = 10.0,
    max_nn: int = 750,
    min_nn: int = 300,
    d_grid: float = 4.0,
    dz_grid: float = 2.0,
    grid_clip_thr: float = 0.75,
    flat_labels: Tuple[int, ...] = (9,),
    grid_extent: float = 60.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grid-seeded keypoints (sample_smart_keypoints2 equivalent): a fixed
    xy/z lattice snapped to the nearest non-flat point within
    grid_clip_thr, then density-filtered. The lattice is static (fixed
    extent) rather than data-bounded, per the fixed-shape discipline."""
    nx = int(2 * grid_extent / d_grid)
    nz = max(int(8.0 / dz_grid), 1)
    xs = (jnp.arange(nx) - nx / 2) * d_grid + 0.5 * d_grid
    zs = (jnp.arange(nz) - nz / 2) * dz_grid + 0.5 * dz_grid
    gx, gy, gz = jnp.meshgrid(xs, xs, zs, indexing="ij")
    grid = jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)

    cand = mask
    for fl in flat_labels:
        cand = cand & (seg != fl)
    snap = ball_query(grid, pts, radius=grid_clip_thr, K=1, p_mask=cand)
    hit = snap[:, 0] >= 0
    kpts = pts[jnp.where(hit, snap[:, 0], 0)]

    nbr = ball_query(kpts, pts, radius=nn_r, K=max_nn,
                     q_mask=hit, p_mask=mask)
    dense = jnp.sum((nbr >= 0).astype(jnp.int32), -1) >= min_nn
    keep = hit & dense
    order = jnp.where(keep, jnp.arange(grid.shape[0], dtype=jnp.int32),
                      jnp.int32(grid.shape[0]))
    sel = jnp.sort(order)[:num_samples]
    kp_mask = sel < grid.shape[0]
    out = kpts[jnp.where(kp_mask, sel, 0)]
    return out * kp_mask[:, None], kp_mask
