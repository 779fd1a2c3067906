"""Static-shape open-addressing hash table for integer voxel coordinates.

This is the TPU-native replacement for MinkowskiEngine's C++ coordinate
manager (hashed coordinate maps + kernel maps; consumed by every sparse
conv in the reference's backbone, models.py:36,418,484). Everything is
int32, fixed-capacity, and runs under jit:

- build: iterative scatter-min linear probing. Each unplaced key proposes
  its next probe slot; jnp scatter-min elects a winner per slot; losers
  advance their probe offset. With load factor <= 0.25 this converges in a
  couple of rounds; we run until placed (bounded) and tests assert full
  placement.
- lookup: probe rounds compare a 32-bit key FINGERPRINT (a second
  independent hash stored per slot) instead of gathering 4-wide coords —
  one int32 gather per probe instead of five. The winning hit is verified
  once against the full coordinates; fingerprint false positives
  (~2^-32 per colliding probe) are therefore corrected, not silent.
- early exit: an empty slot on the probe path proves absence (linear
  probing invariant), and the whole while_loop stops as soon as every
  query lane has resolved.

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
_FNV_PRIME = jnp.uint32(16777619)


class HashTable(NamedTuple):
    slots: jnp.ndarray  # (S,) int32: index into coords, or -1 if empty
    fps: jnp.ndarray  # (S,) uint32: fingerprint of the stored key
    coords: jnp.ndarray  # (N, 4) int32 the inserted keys (by reference)
    mask: jnp.ndarray  # (N,) bool validity of coords rows


def _rotl(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return (x << r) | (x >> (32 - r))


def _murmur3(c: jnp.ndarray, seed: int) -> jnp.ndarray:
    """MurmurHash3 (32-bit) over the 4 int32 coordinate words.

    Voxel keys are tiny sign-extended integers with heavy symmetry
    (negations, axis swaps); weaker mixers (XOR-of-products, word-wise
    FNV-1a) produced mass collisions on exactly such inputs. Murmur3's
    per-word scramble + rotate/multiply chain is order-sensitive and
    avalanches properly.
    """
    u = c.astype(jnp.uint32)
    h = jnp.full(u.shape[:-1], jnp.uint32(seed))
    for i in range(4):
        k = u[..., i] * jnp.uint32(0xCC9E2D51)
        k = _rotl(k, 15)
        k = k * jnp.uint32(0x1B873593)
        h = h ^ k
        h = _rotl(h, 13)
        h = h * jnp.uint32(5) + jnp.uint32(0xE6546B64)
    h = h ^ jnp.uint32(16)  # length in bytes
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _hash4(c: jnp.ndarray) -> jnp.ndarray:
    """Probe-sequence hash."""
    return _murmur3(c, 0x811C9DC5)


def _fingerprint(c: jnp.ndarray) -> jnp.ndarray:
    """Independent second hash used as the per-slot key fingerprint."""
    return _murmur3(c, 0x7E3779B9)


def _table_size(capacity: int) -> int:
    s = 1
    while s < 4 * capacity:  # load <= 0.25: ~1-2 probe rounds typical
        s *= 2
    return max(s, 32)


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

    Table size is the next power of two >= 4N (load <= 0.25). Duplicate keys
    should not occur (coords are the output of a unique/quantize pass); if
    they do, one of the duplicates simply stays unplaced and lookups resolve
    to the placed one.
    """
    S = _table_size(coords.shape[0])
    slots = jnp.full((S,), _EMPTY)
    slots = _build(coords, mask, slots, max_rounds)
    safe = jnp.where(slots >= 0, slots, 0)
    fps = jnp.where(slots >= 0, _fingerprint(coords[safe]), jnp.uint32(0))
    return HashTable(slots=slots, fps=fps, coords=coords, mask=mask)


@partial(jax.jit, static_argnames=("max_probes",))
def lookup(
    table: HashTable, queries: jnp.ndarray, q_mask: jnp.ndarray | None = None,
    max_probes: int = 128,
) -> jnp.ndarray:
    """Find the row index of each query key; -1 if absent.

    queries: (M, 4) int32. Fingerprint-compare per probe; the final hit is
    verified against full coordinates (a fingerprint false positive becomes
    a miss rather than a wrong row).
    """
    S = table.slots.shape[0]
    h = _hash4(queries)
    fp_q = _fingerprint(queries)
    M = queries.shape[0]
    found = jnp.full((M,), jnp.int32(-1))
    if q_mask is None:
        dead = jnp.zeros((M,), bool)
    else:
        dead = ~q_mask  # invalid queries resolve immediately to -1

    def body(state):
        found, dead, p = state
        slot = ((h + p.astype(jnp.uint32)) & jnp.uint32(S - 1)).astype(jnp.int32)
        row = table.slots[slot]
        fp_s = table.fps[slot]
        empty = row < 0
        match = (row >= 0) & (fp_s == fp_q)
        open_q = (found < 0) & ~dead
        found = jnp.where(open_q & match, row, found)
        dead = dead | (open_q & empty)
        return found, dead, p + 1

    def cond(state):
        found, dead, p = state
        return (p < max_probes) & jnp.any((found < 0) & ~dead)

    found, _, _ = jax.lax.while_loop(cond, body, (found, dead, jnp.int32(0)))
    # verify fingerprint hits against the actual keys (collision safety)
    hit = found >= 0
    cand = jnp.where(hit, found, 0)
    ok = hit & jnp.all(table.coords[cand] == queries, axis=-1)
    found = jnp.where(ok, found, jnp.int32(-1))
    if q_mask is not None:
        found = jnp.where(q_mask, found, jnp.int32(-1))
    return found
