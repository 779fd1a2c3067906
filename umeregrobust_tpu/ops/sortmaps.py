"""Sort-based batch coordinate lookup (kernel-map construction).

Hash probing answers each voxel-coordinate query with a handful of
dependent gathers — fine for dynamic queries (ICP's per-iteration grid
search) but wasteful for the UNet's kernel maps, where ALL queries against
a level's key set are known up front (every offset of every conv touching
that level). This module resolves them with ONE multi-key sort per key set
(Minuet/TorchSparse-style merge join, re-derived for XLA):

  sort [keys ++ queries] by (packed coords, is_query);
  each query matches the nearest preceding element iff that element is a
  key with equal coordinates (a cummax over key positions finds it);
  scatter results back through the sort permutation.

Coordinates pack into two int32 words — (b, x) and (y, z) — which bounds
the domain to b < 127 batch clouds and |x| < 2^23, |y|, |z| < 2^15 voxel
units (at 0.3 m: ~2500 km / ~9.8 km), far beyond any LiDAR scene. Packing
halves the sort-key count and the equality-check gathers. Invalid keys and
invalid queries map to two DISTINCT sentinel words, so they sort to the
end and can never match anything.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["batched_sorted_lookup", "pack_coords"]

_KEY_SENTINEL = jnp.int32(0x7FFFFFF0)
_QUERY_SENTINEL = jnp.int32(0x7FFFFF00)


def pack_coords(c: jnp.ndarray, valid: jnp.ndarray,
                sentinel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(…,4) int32 -> (hi, lo) int32 words; invalid rows -> sentinel."""
    b = c[..., 0]
    x = c[..., 1] + jnp.int32(1 << 23)
    y = c[..., 2] + jnp.int32(1 << 15)
    z = c[..., 3] + jnp.int32(1 << 15)
    hi = (b << 24) | (x & jnp.int32(0xFFFFFF))
    lo = (y << 16) | (z & jnp.int32(0xFFFF))
    hi = jnp.where(valid, hi, sentinel)
    lo = jnp.where(valid, lo, sentinel)
    return hi, lo


def batched_sorted_lookup(
    key_coords: jnp.ndarray,  # (N, 4) int32
    key_mask: jnp.ndarray,  # (N,)
    query_coords: jnp.ndarray,  # (M, 4) int32
    query_mask: jnp.ndarray,  # (M,)
) -> jnp.ndarray:
    """Row index into key_coords for every query (-1 if absent/invalid)."""
    N = key_coords.shape[0]
    M = query_coords.shape[0]
    total = N + M

    k_hi, k_lo = pack_coords(key_coords, key_mask, _KEY_SENTINEL)
    q_hi, q_lo = pack_coords(query_coords, query_mask, _QUERY_SENTINEL)

    hi = jnp.concatenate([k_hi, q_hi])
    lo = jnp.concatenate([k_lo, q_lo])
    # is_query and the row id share one word (bit 30 = is_query): one less
    # array through the sort, same ordering (keys precede their queries;
    # relative order among tied queries is irrelevant).
    isq_row = jnp.concatenate(
        [jnp.arange(N, dtype=jnp.int32),
         jnp.arange(M, dtype=jnp.int32) | jnp.int32(1 << 30)])

    hi_s, lo_s, isqrow_s = jax.lax.sort((hi, lo, isq_row), num_keys=3)
    isq_s = isqrow_s >> 30
    row_s = isqrow_s & jnp.int32((1 << 30) - 1)

    pos = jnp.arange(total, dtype=jnp.int32)
    key_pos = jnp.where((isq_s == 0) & (hi_s < _QUERY_SENTINEL), pos,
                        jnp.int32(-1))
    last_key = jax.lax.cummax(key_pos)

    safe = jnp.maximum(last_key, 0)
    same = (last_key >= 0) & (hi_s[safe] == hi_s) & (lo_s[safe] == lo_s)
    nbr = jnp.where(same, row_s[safe], jnp.int32(-1))

    out = jnp.full((M,), jnp.int32(-1))
    dst = jnp.where(isq_s == 1, row_s, jnp.int32(M))
    out = out.at[dst].set(nbr, mode="drop")
    # invalid queries carry the sentinel and can only "match" nothing; the
    # sentinel groups guarantee nbr == -1 there already.
    return out
