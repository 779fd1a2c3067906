"""Microbenchmark: where does the level rank-join actually spend time?

Times, at the L1 fused-bench size (N keys + M queries ~ 350k rows):
  sort2      — the 2-array lax.sort alone
  join_scat  — sort + cumsum rank + SCATTER readout (sorted_join_rank)
  join_sort2 — sort + cumsum rank + SECOND-SORT readout (scatter-free)
  scatter1m  — a bare 350k-element scatter (at[].set mode=drop)

Each variant runs 20x inside one jit (carry-dependent input so XLA can't
hoist), so the ~30 ms tunnel launch floor amortizes away.
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
    N, M = 24576, 327680 - 24576
    T = N + M
    rng = np.random.default_rng(0)
    key_code = np.sort(rng.choice(1 << 28, N, replace=False)).astype(np.int32)
    q_code = rng.integers(0, 1 << 28, M, dtype=np.int32)
    kc = jnp.asarray(key_code)
    qc = jnp.asarray(q_code)
    R = 20

    def timeit(name, step):
        def loop(kc, qc):
            def body(carry, _):
                out = step(kc ^ (carry & 1), qc ^ (carry & 1))
                return out.astype(jnp.int32)[0] + carry, None
            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=R)
            return c
        f = jax.jit(loop)
        t0 = time.time()
        s = int(np.asarray(f(kc, qc)))
        t1 = time.time()
        s = int(np.asarray(f(kc, qc)))
        dt = (time.time() - t1) / R * 1000
        print(f"{name:12s} {dt:8.3f} ms/iter (compile {t1-t0:.0f}s chk {s})",
              flush=True)

    def sort2(kc, qc):
        code = jnp.concatenate([kc, qc])
        payload = jnp.concatenate([
            jnp.zeros((N,), jnp.int32),
            jnp.arange(M, dtype=jnp.int32) | jnp.int32(1 << 30)])
        code_s, pay_s = jax.lax.sort((code, payload), num_keys=1)
        return code_s + pay_s

    def join_scat(kc, qc):
        from umeregrobust_tpu.ops.sortmaps import sorted_join_rank
        return sorted_join_rank(kc, qc)

    def join_sort2(kc, qc):
        code = jnp.concatenate([kc, qc])
        payload = jnp.concatenate([
            jnp.zeros((N,), jnp.int32),
            jnp.arange(M, dtype=jnp.int32) | jnp.int32(1 << 30)])
        _, pay_s = jax.lax.sort((code, payload), num_keys=1)
        is_key = pay_s < jnp.int32(1 << 30)
        rank = jnp.cumsum(is_key.astype(jnp.int32)) - 1
        _, rank_q = jax.lax.sort((pay_s, rank), num_keys=1)
        return rank_q[N:]

    def scatter1m(kc, qc):
        dst = qc & jnp.int32((1 << 18) - 1)
        return jnp.zeros((1 << 18,), jnp.int32).at[dst].set(
            jnp.arange(M, dtype=jnp.int32), mode="drop")

    timeit("sort2", sort2)
    timeit("join_scat", join_scat)
    timeit("join_sort2", join_sort2)
    timeit("scatter1m", scatter1m)


if __name__ == "__main__":
    main()
