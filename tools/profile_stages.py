"""Per-stage steady-state timing of the registration pipeline on TPU.

Usage: python tools/profile_stages.py [--sem-cap 16384] [--reps 3]
Prints a table of stage times so optimization effort goes where the time is.
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
    ap.add_argument("--sem-cap", type=int, default=16384)
    ap.add_argument("--corr-cap", type=int, default=4096)
    ap.add_argument("--kpts", type=int, default=2048)
    ap.add_argument("--hyp", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    import jax.numpy as jnp

    from umeregrobust_tpu.core.ume import estimate_rigid_from_ume
    from umeregrobust_tpu.models.resunet import (
        ARCHS, build_unet_geometry, init_resunet, resunet_apply)
    from umeregrobust_tpu.pipeline.correlator import (
        correlator_scores, prepare_weighted_features)
    from umeregrobust_tpu.pipeline.icp import icp_point_to_point
    from umeregrobust_tpu.pipeline.matching import argmin_match
    from umeregrobust_tpu.pipeline.ume_gen import ume_from_ball_query
    from umeregrobust_tpu.ops.gridnn import build_grid

    print("devices:", jax.devices(), flush=True)
    N = args.sem_cap
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-30, 30, (N, 3)).astype(np.float32))
    mask = jnp.ones(N, bool)
    coords = jnp.asarray(np.concatenate(
        [np.zeros((N, 1), np.int32),
         np.unique(rng.integers(-200, 200, (2 * N, 3)).astype(np.int32), axis=0)[:N]],
        axis=1))
    arch = ARCHS["ResUNetSmall2"]
    caps = (N, int(N * 0.75), int(N * 0.4), int(N * 0.2), int(N * 0.08))
    caps = tuple(-(-c // 128) * 128 for c in caps)
    params, state = init_resunet(jax.random.PRNGKey(0), arch, 1, 32)

    def timeit(name, fn, *a, **kw):
        out = fn(*a, **kw)  # compile
        jax.block_until_ready(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            out = fn(*a, **kw)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        print(f"{name:34s} {min(ts)*1000:9.1f} ms", flush=True)
        return out

    geom_fn = jax.jit(lambda c, m: build_unet_geometry(c, m, arch, caps))
    geom = timeit("build_unet_geometry", geom_fn, coords, mask)

    fwd = jax.jit(lambda p, s, g, f: resunet_apply(
        p, s, g, f, arch, compute_dtype=jnp.bfloat16)[0])
    fin = jnp.ones((N, 1)) * mask[:, None]
    feat = timeit("resunet_forward (bf16)", fwd, params, state, geom, fin)

    kpts = pts[: args.kpts]
    ume = timeit("ume_from_ball_query (2048x16k)",
                 lambda: ume_from_ball_query(pts, feat, kpts, radius=5.0,
                                             max_nn=750, p_mask=mask))
    m_idx = timeit("argmin_match (2048x2048, d=32)",
                   lambda: argmin_match(ume, ume))
    hyp = timeit(f"estimator ({args.hyp} hyps)",
                 lambda: estimate_rigid_from_ume(ume[: args.hyp], ume[: args.hyp]))

    cp = pts[: args.corr_cap]
    cf = feat[: args.corr_cap]
    cm = mask[: args.corr_cap]
    fs, ft = prepare_weighted_features(cp, cf, cm, cp, cf, cm)
    jax.block_until_ready((fs, ft))
    timeit("prepare_weighted_features (4k)",
           lambda: prepare_weighted_features(cp, cf, cm, cp, cf, cm))
    Ts = jnp.tile(jnp.eye(4)[None], (args.hyp, 1, 1))
    timeit(f"correlator coarse ({args.hyp}x1024x{args.corr_cap})",
           lambda: correlator_scores(cp[:1024], fs[:1024], cm[:1024],
                                     cp, ft, cm, Ts, chunk=1024))
    timeit(f"correlator fine (32x{args.corr_cap}x{args.corr_cap})",
           lambda: correlator_scores(cp, fs, cm, cp, ft, cm, Ts[:32]))

    timeit("icp build_grid (16k)", lambda: build_grid(pts, mask, cell=0.4))
    timeit("icp 60 iters (16k)",
           lambda: icp_point_to_point(pts, pts + 0.05, jnp.eye(4),
                                      max_corr=0.4, max_iter=60))


if __name__ == "__main__":
    main()
