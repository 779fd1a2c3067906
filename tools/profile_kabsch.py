"""Cost of kabsch_rotation (Horn quaternion + cyclic Jacobi) vs sweeps
and batch — the Umeyama update runs inside every ICP sub-step and every
consensus polish step, so its fixed cost multiplies by ~100 per pair.

Usage: python tools/profile_kabsch.py
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
    from umeregrobust_tpu.core.so3 import kabsch_rotation

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def t(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        ts = []
        for _ in range(10):
            t0 = time.time()
            out = fn(*a)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        return min(ts) * 1000

    for B in (1, 33, 2048):
        H = jnp.asarray(rng.normal(0, 1, (B, 3, 3)).astype(np.float32))
        for sweeps in (6, 3, 2):
            def mk(k, sw):
                def f():
                    x = H
                    outs = []
                    for _ in range(k):
                        r = kabsch_rotation(x, sweeps=sw)
                        outs.append(r)
                        x = H + 1e-9 * jnp.sum(r)
                    return outs
                return jax.jit(f)
            t1, t9 = t(mk(1, sweeps)), t(mk(9, sweeps))
            print(f"B={B:5d} sweeps={sweeps}: {(t9 - t1) / 8:7.3f} ms/call",
                  flush=True)


if __name__ == "__main__":
    main()
