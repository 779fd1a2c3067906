"""Static-shape open-addressing hash table for integer voxel coordinates.

This is the TPU-native replacement for MinkowskiEngine's C++ coordinate
manager (hashed coordinate maps + kernel maps; consumed by every sparse
conv in the reference's backbone, models.py:36,418,484). Everything is
int32, fixed-capacity, and runs under jit:

- build: iterative scatter-min linear probing. Each unplaced key proposes
  its next probe slot; jnp scatter-min elects a winner per slot; losers
  advance their probe offset. With load factor <= 0.5 this converges in a
  handful of rounds; we run a fixed number and tests assert full placement.
- lookup: probe a fixed window of slots, compare stored coords, take the
  first hit (vectorized over queries; no data-dependent control flow).

Keys are (b, x, y, z) int32 rows. Invalid rows (mask False) are never
inserted and always miss.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["HashTable", "build_hash_table", "lookup"]

_EMPTY = jnp.int32(-1)
# distinct odd 32-bit mixing constants per coordinate component
_M0 = jnp.uint32(0x9E3779B1)
_M1 = jnp.uint32(0x85EBCA77)
_M2 = jnp.uint32(0xC2B2AE3D)
_M3 = jnp.uint32(0x27D4EB2F)


class HashTable(NamedTuple):
    slots: jnp.ndarray  # (S,) int32: index into coords, or -1 if empty
    coords: jnp.ndarray  # (N, 4) int32 the inserted keys (by reference)
    mask: jnp.ndarray  # (N,) bool validity of coords rows


def _hash4(c: jnp.ndarray) -> jnp.ndarray:
    """Mix (…, 4) int32 coords into uint32 hashes."""
    u = c.astype(jnp.uint32)
    h = u[..., 0] * _M0 ^ u[..., 1] * _M1 ^ u[..., 2] * _M2 ^ u[..., 3] * _M3
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x2C1B3C6D)
    h = h ^ (h >> 12)
    return h


def _table_size(capacity: int) -> int:
    s = 1
    while s < 2 * capacity:
        s *= 2
    return max(s, 16)


@partial(jax.jit, static_argnames=("max_rounds",))
def _build(coords: jnp.ndarray, mask: jnp.ndarray, slots: jnp.ndarray,
           max_rounds: int) -> jnp.ndarray:
    N = coords.shape[0]
    S = slots.shape[0]
    h = _hash4(coords)
    idx = jnp.arange(N, dtype=jnp.int32)

    def round_fn(state):
        slots, probe, placed, r = state
        slot = ((h + probe.astype(jnp.uint32)) & jnp.uint32(S - 1)).astype(jnp.int32)
        active = mask & ~placed
        # propose: scatter-min of row index into each slot (only into empties)
        proposal = jnp.full((S,), jnp.int32(N))
        proposal = proposal.at[jnp.where(active, slot, S)].min(idx, mode="drop")
        taken = slots >= 0
        winner_row = jnp.where(~taken & (proposal < N), proposal, jnp.int32(-1))
        new_slots = jnp.where(winner_row >= 0, winner_row, slots)
        won = active & (new_slots[slot] == idx)
        placed2 = placed | won
        probe2 = jnp.where(active & ~won, probe + 1, probe)
        return new_slots, probe2, placed2, r + 1

    def cond_fn(state):
        _, _, placed, r = state
        return (r < max_rounds) & ~jnp.all(placed | ~mask)

    probe0 = jnp.zeros((N,), jnp.int32)
    placed0 = jnp.zeros((N,), bool)
    slots, _, placed, _ = jax.lax.while_loop(
        cond_fn, round_fn, (slots, probe0, placed0, jnp.int32(0))
    )
    return slots


def build_hash_table(
    coords: jnp.ndarray, mask: jnp.ndarray, max_rounds: int = 128
) -> HashTable:
    """Insert all valid coordinate rows. coords (N, 4) int32, mask (N,).

    Table size is the next power of two >= 2N (load <= 0.5). Duplicate keys
    should not occur (coords are the output of a unique/quantize pass); if
    they do, one of the duplicates simply stays unplaced and lookups resolve
    to the placed one.
    """
    S = _table_size(coords.shape[0])
    slots = jnp.full((S,), _EMPTY)
    slots = _build(coords, mask, slots, max_rounds)
    return HashTable(slots=slots, coords=coords, mask=mask)


@partial(jax.jit, static_argnames=("max_probes",))
def lookup(
    table: HashTable, queries: jnp.ndarray, q_mask: jnp.ndarray | None = None,
    max_probes: int = 128,
) -> jnp.ndarray:
    """Find the row index of each query key; -1 if absent.

    queries: (M, 4) int32. Probes a fixed window; an empty slot anywhere in
    the probed window short-circuits the remaining probes semantically
    (linear probing invariant: a key is always stored before the first
    empty slot on its probe path).
    """
    S = table.slots.shape[0]
    h = _hash4(queries)
    M = queries.shape[0]
    found = jnp.full((M,), jnp.int32(-1))
    if q_mask is None:
        dead = jnp.zeros((M,), bool)
    else:
        dead = ~q_mask  # invalid queries resolve immediately to -1
    # early-exit probing: with load <= 0.5 almost everything resolves within
    # a few rounds, so the while_loop exits long before max_probes.

    def body(state):
        found, dead, p = state
        slot = ((h + p.astype(jnp.uint32)) & jnp.uint32(S - 1)).astype(jnp.int32)
        row = table.slots[slot]
        empty = row < 0
        cand = jnp.where(row >= 0, row, 0)
        match = (row >= 0) & jnp.all(table.coords[cand] == queries, axis=-1)
        open_q = (found < 0) & ~dead
        found = jnp.where(open_q & match, row, found)
        dead = dead | (open_q & empty)
        return found, dead, p + 1

    def cond(state):
        found, dead, p = state
        return (p < max_probes) & jnp.any((found < 0) & ~dead)

    found, _, _ = jax.lax.while_loop(cond, body, (found, dead, jnp.int32(0)))
    if q_mask is not None:
        found = jnp.where(q_mask, found, jnp.int32(-1))
    return found
