"""Stage breakdown of the FUSED e2e pipeline at exact bench.py sizes.

Each stage is wrapped in its own jax.jit so timings reflect compiled-program
cost (the old profile_stages.py timed some eager call chains, which mostly
measured per-launch dispatch latency through the remote tunnel).

Usage: python tools/profile_e2e_stages.py [--reps 5]
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
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    import jax.numpy as jnp
    from functools import partial

    from umeregrobust_tpu.core.ume import estimate_rigid_from_ume
    from umeregrobust_tpu.models.resunet import (
        ARCHS, build_unet_geometry, init_resunet, resunet_apply)
    from umeregrobust_tpu.ops.densegrid import DEFAULT_DIMS, build_dense_grid
    from umeregrobust_tpu.pipeline.correlator import select_best_transform
    from umeregrobust_tpu.pipeline.icp import _icp_loop
    from umeregrobust_tpu.pipeline.matching import (
        argmin_match, probabilistic_match_filter)
    from umeregrobust_tpu.pipeline.registration import copy_features_to_raw
    from umeregrobust_tpu.pipeline.ume_gen import ume_from_ball_query

    print("devices:", jax.devices(), flush=True)
    SEM_CAP, CORR_CAP = 16384, 4096
    N_KP, N_HYP = 2048, 2048
    arch = ARCHS["ResUNetSmall2"]
    caps = (SEM_CAP, 12288, 6144, 3072, 1024)
    caps2 = tuple(2 * c for c in caps)

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-25, 25, (SEM_CAP, 3)).astype(np.float32))
    mask = jnp.ones(SEM_CAP, bool)
    cc = np.unique(rng.integers(-120, 120, (4 * SEM_CAP, 3)).astype(np.int32),
                   axis=0)[: 2 * SEM_CAP]
    coords2 = jnp.asarray(np.concatenate(
        [np.where(np.arange(2 * SEM_CAP)[:, None] < SEM_CAP, 0, 1).astype(np.int32),
         cc], axis=1))
    mask2 = jnp.ones(2 * SEM_CAP, bool)
    params, state = init_resunet(jax.random.PRNGKey(0), arch, 1, 32)
    cpts = pts[:CORR_CAP]
    cmask = mask[:CORR_CAP]
    key = jax.random.PRNGKey(1)

    def timeit(name, fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            out = fn(*a)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        print(f"{name:44s} {min(ts)*1000:9.1f} ms", flush=True)
        return out

    geom_fn = jax.jit(lambda c, m: build_unet_geometry(c, m, arch, caps2))
    geom = timeit("geometry (2x16k fused)", geom_fn, coords2, mask2)

    fwd = jax.jit(lambda p, s, g, f: resunet_apply(
        p, s, g, f, arch, train=False, compute_dtype=jnp.bfloat16)[0])
    fin = jnp.ones((2 * SEM_CAP, 1)) * mask2[:, None]
    both = timeit("forward (2x16k, bf16)", fwd, params, state, geom, fin)
    feat = both[:SEM_CAP]
    cfeat = feat[:CORR_CAP]

    copy_fn = jax.jit(copy_features_to_raw)
    timeit("copy_features_to_raw (4k<-16k) x2",
           jax.jit(lambda: (copy_features_to_raw(cpts, cmask, pts, feat, mask),
                            copy_features_to_raw(cpts, cmask, pts, feat, mask))))

    from umeregrobust_tpu.pipeline.registration import _sample_keypoints
    kp_fn = jax.jit(lambda k: _sample_keypoints(k, pts, mask, N_KP))
    kp, kp_ok = timeit("sample_keypoints (2048)", kp_fn, key)

    ume_fn = jax.jit(lambda: (
        ume_from_ball_query(pts, feat, kp, radius=5.0, max_nn=750,
                            p_mask=mask, k_mask=kp_ok, normalize=True),
        ume_from_ball_query(pts, feat, kp, radius=5.0, max_nn=750,
                            p_mask=mask, k_mask=kp_ok, normalize=True)))
    ume_s, ume_t = timeit("ume_from_ball_query (2048x16k) x2", ume_fn)

    match_fn = jax.jit(lambda: argmin_match(ume_s, ume_t, src_mask=kp_ok,
                                            tgt_mask=kp_ok))
    m, d = timeit("argmin_match (2048x2048)", match_fn)

    filt_fn = jax.jit(lambda k: probabilistic_match_filter(k, d, N_HYP, 0.05))
    keep = timeit("prob_match_filter (2048 of 2048)", filt_fn, key)

    est_fn = jax.jit(lambda: estimate_rigid_from_ume(
        ume_s[keep], ume_t[m[keep]], compute_distance=False)[0])
    Ts = timeit("estimator (2048 hyps)", est_fn)

    sel_fn = jax.jit(lambda k: select_best_transform(
        cpts, cfeat, cmask, cpts, cfeat, cmask, Ts,
        sigma=1.5, knn_k=20, var_knn=50, coarse_src=1024, coarse_tgt=1024,
        rescore_top=32, key=k, mode="radius",
        triage_src=256, triage_tgt=512, triage_top=512))
    timeit("select_best (2048 hyps, triage cascade)", sel_fn, key)

    grid_fn = jax.jit(lambda: build_dense_grid(cpts, cmask, cell=0.4,
                                               dims=DEFAULT_DIMS))
    grid = timeit("icp build_dense_grid (4k)", grid_fn)
    arrays = (grid.points, grid.points_sorted, grid.order, grid.runs,
              grid.origin, grid.overflow, grid.wstart)
    icp_fn = jax.jit(lambda T: _icp_loop(cpts, cmask, arrays, T, 0.4, 60, 8,
                                         DEFAULT_DIMS)[0])
    timeit("icp 60 iters (4k, budget 8)", icp_fn, jnp.eye(4))
    icp32_fn = jax.jit(lambda T: _icp_loop(cpts, cmask, arrays, T, 0.4, 60, 32,
                                           DEFAULT_DIMS)[0])
    timeit("icp 60 iters (4k, budget 32)", icp32_fn, jnp.eye(4))
    icp_in4 = jax.jit(lambda T: _icp_loop(cpts, cmask, arrays, T, 0.4, 60, 32,
                                          DEFAULT_DIMS, inner=4)[0])
    timeit("icp 60 iters (4k, budget 32, inner=4)", icp_in4, jnp.eye(4))


if __name__ == "__main__":
    main()
