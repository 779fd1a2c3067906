"""Voxel quantization and coordinate <-> metric mapping.

TPU-native replacement for MinkowskiEngine's sparse_quantize and the
reference's affine coords->grid-points mapping
(ME.utils.sparse_quantize: reference datasets/kitti/kitti_dataset.py:416,
evaluate.py:261; convert_coords_to_grid_pts: utils/general_utils.py:27-35).

Two flavors:
- numpy host versions for the data pipeline (dynamic sizes are fine there);
- fixed-capacity jax versions for on-device use (static shapes + masks).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "quantize_np",
    "quantize_jax",
    "coords_to_grid_pts",
    "coords_to_grid_pts_np",
]


def quantize_np(
    pts: np.ndarray, voxel_size: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side voxel quantization.

    Returns (coords (M,3) int32 — floor(pts/voxel) — and the index of one
    representative input point per voxel). Representative = first occurrence
    in input order, deterministic.
    """
    coords = np.floor(pts / voxel_size).astype(np.int64)
    # lexicographic unique with first-occurrence representatives
    view = np.ascontiguousarray(coords).view(
        np.dtype((np.void, coords.dtype.itemsize * 3))
    ).ravel()
    _, first_idx = np.unique(view, return_index=True)
    first_idx = np.sort(first_idx)
    return coords[first_idx].astype(np.int32), first_idx


def quantize_jax(
    pts: jnp.ndarray,
    voxel_size: float,
    mask: jnp.ndarray,
    max_voxels: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Device-side fixed-capacity voxel quantization.

    Packs voxel coords into a single int32 key (requires per-axis extents to
    fit: extent_x*extent_y*extent_z < 2^31, always true for LiDAR scans at
    >= 0.05 m voxels), then jnp.unique with a static size.

    Args:
      pts: (N, 3) points, padded rows allowed.
      voxel_size: metric voxel edge.
      mask: (N,) validity of input rows.
      max_voxels: static output capacity M.

    Returns:
      coords (M, 3) int32 (undefined where invalid), rep_idx (M,) int32
      index of the first input point of each voxel (-1 where invalid),
      out_mask (M,) bool.
    """
    N = pts.shape[0]
    coords = jnp.floor(pts / voxel_size).astype(jnp.int32)
    cmin = jnp.min(jnp.where(mask[:, None], coords, 2**30), axis=0)
    rel = coords - cmin
    extent = (
        jnp.max(jnp.where(mask[:, None], rel, -1), axis=0) + 2
    )  # +2: room for the invalid sentinel bucket
    key = (rel[:, 0] * extent[1] + rel[:, 1]) * extent[2] + rel[:, 2]
    key = jnp.where(mask, key, jnp.int32(2**31 - 1))  # invalid -> one bucket
    # unique keys, keeping first-occurrence input index per voxel
    order = jnp.argsort(key, stable=True)
    k_sorted = key[order]
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), k_sorted[1:] != k_sorted[:-1]]
    )
    # within equal keys, stable argsort keeps input order, so the first in
    # each run is the smallest input index
    firsts_rank = jnp.cumsum(is_first) - 1  # voxel id per sorted row
    # representative input index per voxel id
    rep = jnp.full((max_voxels,), jnp.int32(-1))
    take = is_first & (k_sorted != jnp.int32(2**31 - 1)) & (firsts_rank < max_voxels)
    rep = rep.at[jnp.where(take, firsts_rank, max_voxels)].set(
        order.astype(jnp.int32), mode="drop"
    )  # non-take rows scatter out of range and are dropped
    out_mask = rep >= 0
    safe_rep = jnp.where(out_mask, rep, 0)
    out_coords = coords[safe_rep]
    return out_coords, rep, out_mask


def coords_to_grid_pts(
    pts: jnp.ndarray,
    coords: jnp.ndarray,
    voxel_size: float,
    pts_mask: jnp.ndarray | None = None,
    coords_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Affine voxel-coord -> metric mapping, exactly the reference formula
    (utils/general_utils.py:27-35): per-axis linear map fitted so that the
    extreme coords land on the (half-voxel-inset) extreme point coords."""
    pts = pts.astype(jnp.float32)
    c = coords.astype(jnp.float32)
    if pts_mask is not None:
        big = jnp.float32(1e30)
        pmax = jnp.max(jnp.where(pts_mask[:, None], pts, -big), axis=0)
        pmin = jnp.min(jnp.where(pts_mask[:, None], pts, big), axis=0)
    else:
        pmax = jnp.max(pts, axis=0)
        pmin = jnp.min(pts, axis=0)
    if coords_mask is not None:
        big = jnp.float32(1e30)
        cmax = jnp.max(jnp.where(coords_mask[:, None], c, -big), axis=0)
        cmin = jnp.min(jnp.where(coords_mask[:, None], c, big), axis=0)
    else:
        cmax = jnp.max(c, axis=0)
        cmin = jnp.min(c, axis=0)
    a = pmax - 0.5 * voxel_size
    b = cmax
    cc = pmin + 0.5 * voxel_size
    d = cmin
    alpha = (a - cc) / (b - d)
    beta = (b * cc - a * d) / (b - d)
    return c * alpha + beta


def coords_to_grid_pts_np(
    pts: np.ndarray, coords: np.ndarray, voxel_size: float
) -> np.ndarray:
    """Host version of coords_to_grid_pts (same formula)."""
    pts = pts.astype(np.float32)
    c = coords.astype(np.float32)
    a = pts.max(0) - 0.5 * voxel_size
    b = c.max(0)
    cc = pts.min(0) + 0.5 * voxel_size
    d = c.min(0)
    alpha = (a - cc) / (b - d)
    beta = (b * cc - a * d) / (b - d)
    return (c * alpha + beta).astype(np.float32)
