"""TPU equivalence check: fused Pallas correlator vs the XLA radius scorer.

Run after any kernel change (e.g. the HB-hypothesis blocking). Checks max
abs score diff, argmax agreement, and top-8 set agreement at bench sizes,
including a non-multiple-of-HB hypothesis count to exercise the padding
path.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    from umeregrobust_tpu.pipeline.correlator import (
        correlator_scores_radius, correlator_scores_radius_fused)

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(7)
    for (H, S, T) in [(512, 1024, 4096), (32, 4096, 4096), (13, 512, 1024)]:
        sp = jnp.asarray(rng.uniform(-25, 25, (S, 3)).astype(np.float32))
        tp = jnp.asarray(
            np.concatenate([np.asarray(sp)[: S // 2] + rng.normal(
                scale=0.05, size=(S // 2, 3)).astype(np.float32),
                rng.uniform(-25, 25, (T - S // 2, 3)).astype(np.float32)]))
        sf = jnp.asarray(rng.normal(size=(S, 32)).astype(np.float32))
        tf = jnp.asarray(rng.normal(size=(T, 32)).astype(np.float32))
        sm = jnp.asarray(rng.uniform(size=S) > 0.1)
        tm = jnp.asarray(rng.uniform(size=T) > 0.1)
        angs = rng.uniform(-0.2, 0.2, (H, 3))
        Ts = []
        for a in angs:
            ca, sa = np.cos(a[0]), np.sin(a[0])
            R = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1]], np.float32)
            T4 = np.eye(4, dtype=np.float32)
            T4[:3, :3] = R
            T4[:3, 3] = rng.uniform(-1, 1, 3)
            Ts.append(T4)
        Ts = jnp.asarray(np.stack(Ts))

        ref = np.asarray(correlator_scores_radius(
            sp, sf, sm, tp, tf, tm, Ts, sigma=1.5))
        got = np.asarray(correlator_scores_radius_fused(
            sp, sf, sm, tp, tf, tm, Ts, sigma=1.5))
        scale = max(1e-9, np.abs(ref).max())
        top_ref = set(np.argsort(ref)[-8:].tolist())
        top_got = set(np.argsort(got)[-8:].tolist())
        print(f"H={H:4d} S={S:5d} T={T:5d}: max|d|={np.abs(ref-got).max():.2e}"
              f" (scale {scale:.3f}) argmax {ref.argmax()}=={got.argmax()}:"
              f" {ref.argmax() == got.argmax()} top8 overlap"
              f" {len(top_ref & top_got)}/8", flush=True)
        assert ref.argmax() == got.argmax()
        assert np.abs(ref - got).max() < 5e-3 * scale
    print("OK", flush=True)


if __name__ == "__main__":
    main()
