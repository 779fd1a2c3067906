"""Microbench: fused UME moment generation at bench shapes.

Delta-times k data-chained calls in one jit (XLA cannot CSE them) to
isolate the per-call device cost — the dispatch-free measurement pattern
from tools/profile_consensus2.py.

Usage: python tools/bench_ume.py [--n 16384] [--kpts 2048] [--reps 8]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--kpts", type=int, default=2048)
    ap.add_argument("--c", type=int, default=32)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--xla", action="store_true",
                    help="force the XLA chunk-loop path (pallas=False) "
                         "for A/B against the fused kernel")
    ap.add_argument("--check", action="store_true",
                    help="compare pallas vs XLA outputs on TPU")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    from umeregrobust_tpu.pipeline.ume_gen import ume_from_ball_query

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(args.n, 3)).astype(np.float32) * 10)
    feats = jnp.asarray(rng.normal(size=(args.n, args.c)).astype(np.float32))
    kpts = pts[: args.kpts]
    pm = jnp.asarray(rng.random(args.n) > 0.05)

    k = args.reps
    use_pallas = not args.xla

    if args.check:
        Fp = ume_from_ball_query(pts, feats, kpts, radius=5.0, max_nn=750,
                                 p_mask=pm, normalize=True, pallas=True)
        Fx = ume_from_ball_query(pts, feats, kpts, radius=5.0, max_nn=750,
                                 p_mask=pm, normalize=True, pallas=False)
        Fp, Fx = np.asarray(Fp), np.asarray(Fx)
        scale = np.abs(Fx).max()
        print(f"pallas vs xla: max_abs={np.abs(Fp-Fx).max():.3e} "
              f"rel={np.abs(Fp-Fx).max()/scale:.3e} (scale {scale:.3e})",
              flush=True)

    @jax.jit
    def chained(f0):
        f = f0
        acc = jnp.float32(0.0)
        for i in range(k):
            F = ume_from_ball_query(pts, f, kpts, radius=5.0, max_nn=750,
                                    p_mask=pm, normalize=True,
                                    pallas=use_pallas)
            acc = acc + jnp.sum(F)
            # data-chain: next call's features depend on this call's output
            f = f + jnp.float32(1e-12) * acc
        return acc, jnp.sum(F)

    out = chained(feats)
    jax.block_until_ready(out)

    @jax.jit
    def single(f0):
        F = ume_from_ball_query(pts, f0, kpts, radius=5.0, max_nn=750,
                                p_mask=pm, normalize=True,
                                pallas=use_pallas)
        return jnp.sum(F), jnp.sum(F * F)

    s = single(feats)
    jax.block_until_ready(s)

    t0 = time.time()
    for _ in range(3):
        jax.block_until_ready(chained(feats))
    tk = (time.time() - t0) / 3
    t0 = time.time()
    for _ in range(3):
        jax.block_until_ready(single(feats))
    t1 = (time.time() - t0) / 3
    per_call = (tk - t1) / (k - 1)
    print(f"chained x{k}: {tk*1e3:.1f} ms; single: {t1*1e3:.1f} ms "
          f"-> {per_call*1e3:.3f} ms/call (delta method)", flush=True)


if __name__ == "__main__":
    main()
