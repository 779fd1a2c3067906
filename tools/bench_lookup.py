"""Micro-benchmark: coordinate lookup strategies for kernel-map building.

Compares, at kernel-map scale (32k keys, ~1.5M queries):
  a) batched_sorted_lookup  (sort keys+queries together; round-1 design)
  b) hash table build + probe lookup (ops/hashing.py)
  c) sorted keys + vectorized binary search (fixed log2(N) gather steps)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    import jax.numpy as jnp

    from umeregrobust_tpu.ops.hashing import build_hash_table, lookup
    from umeregrobust_tpu.ops.sortmaps import batched_sorted_lookup, pack_coords

    N, Q = 32768, 27 * 57344
    rng = np.random.default_rng(0)
    keys = np.unique(
        np.concatenate([np.zeros((2 * N, 1), np.int32),
                        rng.integers(-120, 120, (2 * N, 3)).astype(np.int32)],
                       axis=1), axis=0)[:N]
    kmask = np.ones(N, bool)
    # queries: keys +- unit offsets (the real kernel-map query distribution)
    base = keys[rng.integers(0, N, Q)]
    offs = rng.integers(-1, 2, (Q, 4)).astype(np.int32)
    offs[:, 0] = 0
    queries = base + offs
    qmask = np.ones(Q, bool)

    keys_j = jnp.asarray(keys)
    kmask_j = jnp.asarray(kmask)
    q_j = jnp.asarray(queries)
    qmask_j = jnp.asarray(qmask)

    def timeit(name, fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.time()
            r = fn(*a)
            jax.block_until_ready(r)
            ts.append(time.time() - t0)
        print(f"{name:44s} {min(ts)*1000:9.1f} ms", flush=True)
        return out

    print(f"devices: {jax.devices()}  N={N} Q={Q}", flush=True)

    f_sort = jax.jit(batched_sorted_lookup)
    res_sort = timeit("batched_sorted_lookup (full sort)", f_sort,
                      keys_j, kmask_j, q_j, qmask_j)

    @jax.jit
    def f_hash(k, km, q, qm):
        t = build_hash_table(k, km)
        return lookup(t, q, qm)
    res_hash = timeit("hash build+lookup", f_hash, keys_j, kmask_j, q_j, qmask_j)

    @jax.jit
    def f_hash_lookup_only(t, q, qm):
        return lookup(t, q, qm)
    table = build_hash_table(keys_j, kmask_j)
    jax.block_until_ready(table.slots)
    timeit("hash lookup only", f_hash_lookup_only, table, q_j, qmask_j)

    @jax.jit
    def f_bsearch(k, km, q, qm):
        khi, klo = pack_coords(k, km, jnp.int32(0x7FFFFFF0))
        rows = jnp.arange(k.shape[0], dtype=jnp.int32)
        khi_s, klo_s, row_s = jax.lax.sort((khi, klo, rows), num_keys=2)
        qhi, qlo = pack_coords(q, qm, jnp.int32(0x7FFFFF00))
        n = k.shape[0]
        lo_b = jnp.zeros(q.shape[0], jnp.int32)
        hi_b = jnp.full(q.shape[0], n, jnp.int32)
        steps = int(np.ceil(np.log2(n))) + 1
        for _ in range(steps):
            mid = (lo_b + hi_b) >> 1
            mh = khi_s[jnp.minimum(mid, n - 1)]
            ml = klo_s[jnp.minimum(mid, n - 1)]
            less = (mh < qhi) | ((mh == qhi) & (ml < qlo))
            lo_b = jnp.where(less, mid + 1, lo_b)
            hi_b = jnp.where(less, hi_b, mid)
        pos = jnp.minimum(lo_b, n - 1)
        hit = (khi_s[pos] == qhi) & (klo_s[pos] == qlo)
        return jnp.where(hit & qm, row_s[pos], jnp.int32(-1))
    res_bs = timeit("sorted keys + binary search", f_bsearch,
                    keys_j, kmask_j, q_j, qmask_j)

    a, b, c = (np.asarray(res_sort), np.asarray(res_hash), np.asarray(res_bs))
    print("agree hash == sort:", np.array_equal(a, b))
    print("agree bsearch == sort:", np.array_equal(a, c))


if __name__ == "__main__":
    main()
