"""Micro-breakdown of select_best_transform at bench sizes (TPU).

Which of prepare_weighted_features / coarse radius scoring / fine rescore
actually costs the ~48 ms the stage profiler attributes to hypothesis
selection?
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

    from umeregrobust_tpu.pipeline.correlator import (
        correlator_scores_radius_fused, feature_spatial_var,
        prepare_weighted_features, select_best_transform)

    print("devices:", jax.devices(), flush=True)
    N, H, C = 4096, 512, 32
    rng = np.random.default_rng(0)
    sp = jnp.asarray(rng.uniform(-25, 25, (N, 3)).astype(np.float32))
    tp = jnp.asarray(rng.uniform(-25, 25, (N, 3)).astype(np.float32))
    sf = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    tf = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    m = jnp.ones(N, bool)
    Ts = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (H, 1, 1))
    key = jax.random.PRNGKey(0)

    def timeit(name, fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.time()
            out = fn(*a)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        print(f"{name:46s} {min(ts)*1000:9.1f} ms", flush=True)
        return out

    timeit("feature_spatial_var (4k, knn50) x2",
           jax.jit(lambda: (feature_spatial_var(sp, sf, m),
                            feature_spatial_var(tp, tf, m))))
    timeit("feature_spatial_var approx (4k, knn50) x2",
           jax.jit(lambda: (feature_spatial_var(sp, sf, m, approx=True),
                            feature_spatial_var(tp, tf, m, approx=True))))
    fs, ft = timeit("prepare_weighted_features (4k) x2",
                    jax.jit(lambda: prepare_weighted_features(
                        sp, sf, m, tp, tf, m)))
    timeit("coarse fused radius (512h, 1024x4096)",
           jax.jit(lambda: correlator_scores_radius_fused(
               sp[:1024], fs[:1024], m[:1024], tp, ft, m, Ts, sigma=1.5)))
    timeit("fine fused radius (32h, 4096x4096)",
           jax.jit(lambda: correlator_scores_radius_fused(
               sp, fs, m, tp, ft, m, Ts[:32], sigma=1.5)))
    timeit("select_best_transform (full, radius)",
           jax.jit(lambda k: select_best_transform(
               sp, sf, m, tp, tf, m, Ts, sigma=1.5, coarse_src=1024,
               rescore_top=32, key=k, mode="radius")), key)
    timeit("select_best_transform (coarse_tgt=1024)",
           jax.jit(lambda k: select_best_transform(
               sp, sf, m, tp, tf, m, Ts, sigma=1.5, coarse_src=1024,
               coarse_tgt=1024, rescore_top=32, key=k, mode="radius")), key)


if __name__ == "__main__":
    main()
