"""Decompose polish_candidates cost: gather vs inner steps vs radii vs
candidate count (delta-timing, dispatch-free).

Usage: python tools/profile_polish.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    from umeregrobust_tpu.pipeline.consensus import polish_candidates

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    CORR, ROWS = 4096, 512
    cpts = jnp.asarray(rng.uniform(-25, 25, (CORR, 3)).astype(np.float32))
    cmask = jnp.ones((CORR,), bool)

    def t(fn):
        out = fn()
        jax.block_until_ready(out)
        ts = []
        for _ in range(8):
            t0 = time.time()
            out = fn()
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        return min(ts) * 1000

    def delta(name, mk):
        t1, t3 = t(mk(1)), t(mk(3))
        print(f"{name:52s} {(t3 - t1) / 2:8.2f} ms/call", flush=True)

    for V, radii, inner, budget, rows in (
        (33, (1.0, 0.6, 0.35), 4, 16, 512),   # current default
        (33, (1.0, 0.6, 0.35), 1, 16, 512),   # inner cost
        (33, (1.0,), 4, 16, 512),             # radii cost
        (9, (1.0, 0.6, 0.35), 4, 16, 512),    # candidate count
        (33, (1.0, 0.6, 0.35), 4, 8, 512),    # budget
        (33, (1.0, 0.6, 0.35), 4, 16, 256),   # rows
    ):
        cand0 = np.tile(np.eye(4, dtype=np.float32)[None], (V, 1, 1))
        cand0[:, :3, 3] = rng.normal(0, 1, (V, 3))
        cand0 = jnp.asarray(cand0)

        def mk(k, radii=radii, inner=inner, budget=budget, rows=rows,
               cand0=cand0):
            def f():
                c = cand0
                for _ in range(k):
                    c = polish_candidates(c, cpts[:rows], cmask[:rows],
                                          cpts, cmask, radii=radii,
                                          inner=inner, budget=budget)
                return c
            return jax.jit(f)

        delta(f"V={V} radii={len(radii)} inner={inner} budget={budget} "
              f"rows={rows}", mk)


if __name__ == "__main__":
    main()
