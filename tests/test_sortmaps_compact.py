"""Compact single-word sort codes (ops/sortmaps.pack_code /
sorted_join_code): equivalence with the generic two-word join on in-range
coordinates, and clamp-to-invalid semantics outside the documented bound."""
import jax.numpy as jnp
import numpy as np

from umeregrobust_tpu.ops.sortmaps import (
    COMPACT_BX, COMPACT_BZ, KEY_SENTINEL, QUERY_SENTINEL,
    batched_sorted_lookup, pack_code, sorted_join_code)


def _sorted_keys(coords, mask):
    code = np.asarray(pack_code(jnp.asarray(coords), jnp.asarray(mask),
                                KEY_SENTINEL))
    order = np.argsort(code, kind="stable")
    return coords[order], mask[order], code[order]


def test_join_matches_generic_lookup_in_range():
    rng = np.random.default_rng(0)
    N, M = 500, 800
    kc = np.concatenate([
        rng.integers(0, 2, (N, 1)), rng.integers(-400, 400, (N, 2)),
        rng.integers(-200, 200, (N, 1))], axis=1).astype(np.int32)
    kc = np.unique(kc, axis=0)
    N = len(kc)
    kmask = np.ones(N, bool)
    kmask[-3:] = False
    qc = np.concatenate([
        rng.integers(0, 2, (M, 1)), rng.integers(-400, 400, (M, 2)),
        rng.integers(-200, 200, (M, 1))], axis=1).astype(np.int32)
    # half the queries duplicate a key coordinate
    qc[: M // 2] = kc[rng.integers(0, N, M // 2)]
    qmask = rng.uniform(size=M) > 0.1

    ks, kms, kcode = _sorted_keys(kc, kmask)
    got = np.asarray(sorted_join_code(
        jnp.asarray(kcode),
        pack_code(jnp.asarray(qc), jnp.asarray(qmask), QUERY_SENTINEL)))
    ref = np.asarray(batched_sorted_lookup(
        jnp.asarray(ks), jnp.asarray(kms), jnp.asarray(qc),
        jnp.asarray(qmask)))
    np.testing.assert_array_equal(got, ref)


def test_out_of_range_clamps_to_invalid():
    # a key just inside and a key outside each bound
    kc = np.array([
        [0, COMPACT_BX - 1, 0, 0],
        [0, COMPACT_BX, 0, 0],        # x out of range
        [0, 0, -COMPACT_BX - 1, 0],   # y out of range
        [0, 0, 0, COMPACT_BZ],        # z out of range
        [3, 0, 0, 0],                 # b out of range
    ], np.int32)
    code = np.asarray(pack_code(jnp.asarray(kc), jnp.ones(5, bool),
                                KEY_SENTINEL))
    assert code[0] < int(QUERY_SENTINEL)
    assert (code[1:] == int(KEY_SENTINEL)).all()
    # out-of-range queries can never match
    ks, kms, kcode = _sorted_keys(kc[:1], np.ones(1, bool))
    got = np.asarray(sorted_join_code(
        jnp.asarray(kcode),
        pack_code(jnp.asarray(kc[1:]), jnp.ones(4, bool), QUERY_SENTINEL)))
    assert (got == -1).all()
