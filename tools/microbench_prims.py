"""Microbenchmarks of the primitive ops the geometry build is made of.

Times, at real pipeline sizes: multi-key sort (current design), one-key
sort, searchsorted-style binary search, random gather — to choose between
sort-join and sorted-key binary search for kernel-map construction.
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

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def timeit(name, fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.time()
            out = fn(*a)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        print(f"{name:52s} {min(ts)*1000:9.2f} ms", flush=True)
        return out

    # level-0 shape of the fused pair: 32k keys, 13 offsets -> 426k queries
    N, Q = 32768, 13 * 32768
    keys2 = [jnp.asarray(rng.integers(0, 2**30, (N + Q,), dtype=np.int32))
             for _ in range(2)]
    keys3 = keys2 + [jnp.asarray(rng.integers(0, 2**30, (N + Q,), dtype=np.int32))]

    timeit("sort 458k x 2 words (compact join)",
           jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2)), *keys2)
    timeit("sort 458k x 3 words (current join)",
           jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=3)), *keys3)
    timeit("sort 32k x 2 words (keys only)",
           jax.jit(lambda a, b: jax.lax.sort((a[:32768], b[:32768]), num_keys=2)),
           *keys2)
    # full-geometry total: ~1.65M rows across 5 levels; emulate as one sort
    big3 = [jnp.asarray(rng.integers(0, 2**30, (1650000,), dtype=np.int32))
            for _ in range(3)]
    timeit("sort 1.65M x 3 words (whole geometry est)",
           jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=3)), *big3)

    skeys = jnp.sort(jnp.asarray(rng.integers(0, 2**30, (N,), dtype=np.int32)))
    qs = jnp.asarray(rng.integers(0, 2**30, (Q,), dtype=np.int32))
    timeit("searchsorted 426k into 32k (int32)",
           jax.jit(lambda k, q: jnp.searchsorted(k, q)), skeys, qs)

    # manual 15-step binary search (what a 2-word lex search would cost x2)
    def bs(k, q):
        lo = jnp.zeros(q.shape, jnp.int32)
        hi = jnp.full(q.shape, k.shape[0], jnp.int32)
        def step(_, lh):
            lo, hi = lh
            mid = (lo + hi) >> 1
            v = k[mid]
            go = v < q
            return jnp.where(go, mid + 1, lo), jnp.where(go, hi, mid)
        lo, hi = jax.lax.fori_loop(0, 15, step, (lo, hi))
        return lo
    timeit("manual 15-step bsearch 426k into 32k",
           jax.jit(bs), skeys, qs)

    idx = jnp.asarray(rng.integers(0, N, (Q,), dtype=np.int32))
    timeit("gather 426k rows from (32k,) int32",
           jax.jit(lambda t, i: t[i]), skeys, idx)
    feat = jnp.asarray(rng.normal(size=(N, 32)).astype(np.float32))
    timeit("gather 426k rows from (32k,32) f32",
           jax.jit(lambda t, i: t[i]), feat, idx)

    # scatter (the map-assembly cost)
    vals = jnp.asarray(rng.integers(0, N, (Q,), dtype=np.int32))
    timeit("scatter 426k into (426k,) int32",
           jax.jit(lambda i, v: jnp.zeros((Q,), jnp.int32).at[i].set(v)),
           jnp.asarray(rng.permutation(Q).astype(np.int32)), vals)

    # cummax at join size (the merge step of the current design)
    c = jnp.asarray(rng.integers(0, N, (N + Q,), dtype=np.int32))
    timeit("cummax 458k int32", jax.jit(jax.lax.cummax), c)


if __name__ == "__main__":
    main()
