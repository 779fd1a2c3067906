"""Dispatch-free timing of build_unet_geometry at bench sizes (2x16k
fused): k stacked builds in one jit, per-call delta.

Usage: python tools/profile_geometry.py
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
    from umeregrobust_tpu.models.resunet import ARCHS, build_unet_geometry

    print("devices:", jax.devices(), flush=True)
    SEM_CAP = 16384
    arch = ARCHS["ResUNetSmall2"]
    caps2 = tuple(2 * c for c in (SEM_CAP, 12288, 6144, 3072, 1024))

    rng = np.random.default_rng(0)
    cc = np.unique(rng.integers(-120, 120, (4 * SEM_CAP, 3)).astype(np.int32),
                   axis=0)[: 2 * SEM_CAP]
    coords2 = jnp.asarray(np.concatenate(
        [np.where(np.arange(2 * SEM_CAP)[:, None] < SEM_CAP, 0,
                  1).astype(np.int32), cc], axis=1))
    mask2 = jnp.ones(2 * SEM_CAP, bool)

    def t(fn):
        out = fn(coords2, mask2)
        jax.block_until_ready(out)
        ts = []
        for _ in range(8):
            t0 = time.time()
            out = fn(coords2, mask2)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        return min(ts) * 1000

    def mk(k):
        def f(c, m):
            outs = []
            for i in range(k):
                g = build_unet_geometry(c, m, arch, caps2)
                outs.append(g["block_g"][0].center[0, 0])
                # runtime-zero, compile-opaque perturbation (center >= 0)
                c = c + jnp.minimum(jnp.max(g["block_g"][0].center), 0)
            return outs
        return jax.jit(f)

    t1, t3 = t(mk(1)), t(mk(3))
    print(f"geometry (2x16k fused): {(t3 - t1) / 2:8.2f} ms/call "
          f"(1x={t1:.1f} 3x={t3:.1f})", flush=True)


if __name__ == "__main__":
    main()
