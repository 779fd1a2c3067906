"""Grid-bucketed nearest-neighbor search with a bounded radius.

Replaces the KDTree / Open3D correspondence searches of the reference
(scipy.spatial.KDTree in utils/general_utils.py:38-44, Open3D ICP
correspondences in evaluate.py:93-96) with a TPU-native static-shape
structure: points are sorted by voxel cell (cell edge = search radius), a
hash table maps cell -> (start, count) into the sorted order, and a query
scans the 27 neighboring cells with a fixed per-cell candidate budget.

For radius-bounded 1-NN this is exact as long as no cell overflows the
budget; overflowing cells are truncated (LiDAR at ICP scales stays far
below the default budget) — check with `overflow_count(grid, budget)`.

Superseded in the ICP hot loop by ops/densegrid.py (O(1) dense-table
addressing, no hash-probe while_loop); kept as the unbounded-extent
fallback.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from umeregrobust_tpu.ops.hashing import HashTable, build_hash_table, lookup

__all__ = ["GridIndex", "build_grid", "nn_query", "overflow_count"]


class GridIndex(NamedTuple):
    points: jnp.ndarray  # (N, 3) original points
    mask: jnp.ndarray  # (N,) validity
    order: jnp.ndarray  # (N,) int32: sorted-by-cell permutation of rows
    cell_table: HashTable  # hash of unique cell coords (as (0,x,y,z))
    start: jnp.ndarray  # (C,) int32 start of each cell's run in `order`
    count: jnp.ndarray  # (C,) int32 run length
    cell: float  # static cell edge


def overflow_count(grid: "GridIndex", budget: int) -> jnp.ndarray:
    """Points beyond `budget` in their cell — the count of candidates a
    query with this budget can never see. 0 => queries are exact."""
    return jnp.sum(jnp.maximum(grid.count - budget, 0))


def _cell_coords(points: jnp.ndarray, cell: float) -> jnp.ndarray:
    c = jnp.floor(points / cell).astype(jnp.int32)
    return jnp.concatenate([jnp.zeros_like(c[:, :1]), c], axis=-1)


@partial(jax.jit, static_argnames=("cell", "max_cells"))
def _build(points, mask, cell, max_cells):
    N = points.shape[0]
    cc = _cell_coords(points, cell)
    table0 = build_hash_table(cc, mask)
    canon = lookup(table0, cc, mask)  # canonical row per cell (or -1)
    # sort rows by canonical cell row id (invalid rows -> end)
    sort_key = jnp.where(mask, canon, jnp.int32(N + 1))
    order = jnp.argsort(sort_key).astype(jnp.int32)
    k_sorted = sort_key[order]
    is_first = jnp.concatenate([jnp.ones((1,), bool), k_sorted[1:] != k_sorted[:-1]])
    is_first = is_first & (k_sorted <= N)
    cell_id = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # per sorted row
    n_cells = jnp.sum(is_first.astype(jnp.int32))
    # unique cell coords in sorted-run order
    pos = jnp.where(is_first & (cell_id < max_cells), cell_id, max_cells)
    ucoords = jnp.zeros((max_cells, 4), jnp.int32).at[pos].set(cc[order], mode="drop")
    umask = jnp.arange(max_cells) < jnp.minimum(n_cells, max_cells)
    start = jnp.zeros((max_cells,), jnp.int32).at[pos].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop")
    ends = jnp.zeros((max_cells,), jnp.int32).at[
        jnp.where((k_sorted <= N) & (cell_id < max_cells), cell_id, max_cells)
    ].max(jnp.arange(N, dtype=jnp.int32) + 1, mode="drop")
    count = jnp.maximum(ends - start, 0)
    return order, ucoords, umask, start, count


def build_grid(
    points: jnp.ndarray, mask: jnp.ndarray, cell: float, max_cells: int | None = None
) -> GridIndex:
    """Index `points` for radius-bounded NN with search radius <= cell."""
    if max_cells is None:
        max_cells = points.shape[0]
    order, ucoords, umask, start, count = _build(points, mask, cell, max_cells)
    table = build_hash_table(ucoords, umask)
    return GridIndex(points=points, mask=mask, order=order, cell_table=table,
                     start=start, count=count, cell=float(cell))


@partial(jax.jit, static_argnames=("radius", "budget", "cell", "chunk"))
def _query(points, mask, order, table, start, count, queries, q_mask,
           radius, budget, cell, chunk=4096):
    M = queries.shape[0]
    offs = np.asarray(
        [(0, dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
        dtype=np.int32,
    )
    n_off = offs.shape[0]
    r2 = jnp.float32(radius) ** 2
    N = order.shape[0]

    pad = (-M) % chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    qmp = jnp.pad(q_mask, (0, pad))
    n_chunks = qp.shape[0] // chunk
    offs_j = jnp.asarray(offs)

    def per_chunk(_, xs):
        q, qm = xs
        qc = _cell_coords(q, cell)
        # all 27 cell lookups for the chunk at once: (chunk*27,)
        probes = (qc[:, None, :] + offs_j[None, :, :]).reshape(-1, 4)
        cells = lookup(table, probes, jnp.repeat(qm, n_off))
        hit = cells >= 0
        safe = jnp.where(hit, cells, 0)
        s = start[safe].reshape(chunk, n_off)  # run start per (query, offset)
        n = jnp.where(hit, count[safe], 0).reshape(chunk, n_off)
        # candidate sorted-positions: (chunk, 27, budget)
        j = jnp.arange(budget, dtype=jnp.int32)[None, None, :]
        pos = jnp.clip(s[..., None] + j, 0, N - 1)
        valid = j < n[..., None]
        rows = order[pos.reshape(chunk, -1)]  # (chunk, 27*budget)
        cand = points[rows]  # (chunk, 27*budget, 3)
        d2 = jnp.sum((q[:, None, :] - cand) ** 2, axis=-1)
        ok = valid.reshape(chunk, -1) & mask[rows] & (d2 <= r2)
        d2 = jnp.where(ok, d2, jnp.float32(1e30))
        k = jnp.argmin(d2, axis=-1)
        bd2 = jnp.take_along_axis(d2, k[:, None], axis=-1)[:, 0]
        bidx = jnp.take_along_axis(rows, k[:, None], axis=-1)[:, 0]
        bidx = jnp.where((bd2 < 1e29) & qm, bidx, jnp.int32(-1))
        return None, (bd2, bidx)

    _, (best_d2, best_idx) = jax.lax.scan(
        per_chunk, None,
        (qp.reshape(n_chunks, chunk, 3), qmp.reshape(n_chunks, chunk)))
    best_d2 = best_d2.reshape(-1)[:M]
    best_idx = best_idx.reshape(-1)[:M]
    return jnp.sqrt(jnp.maximum(jnp.where(best_idx >= 0, best_d2, 0.0), 0.0)), best_idx


def nn_query(
    grid: GridIndex,
    queries: jnp.ndarray,
    radius: float,
    q_mask: jnp.ndarray | None = None,
    budget: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest neighbor within `radius` (must be <= grid.cell).

    Returns (dist (M,), idx (M,) int32 into grid.points; -1 when no neighbor
    within radius). `budget` caps candidates per cell (exactness holds while
    every cell holds <= budget points).
    """
    assert radius <= grid.cell + 1e-9, "search radius must fit the cell size"
    if q_mask is None:
        q_mask = jnp.ones((queries.shape[0],), bool)
    return _query(grid.points, grid.mask, grid.order, grid.cell_table,
                  grid.start, grid.count, queries, q_mask,
                  float(radius), int(budget), grid.cell)
