"""Minimal in-situ A/B: forward (grouped vs scan) + ICP from a realistic
start, at exact bench shapes. Two-compile budget per variant — built for
congested-tunnel sessions where the full stage profiler can't finish.
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

    from umeregrobust_tpu.data.sem import SEMConfig, equalize_sampling
    from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
    from umeregrobust_tpu.models.resunet import (
        ARCHS, build_unet_geometry, init_resunet, resunet_apply)
    from umeregrobust_tpu.ops.densegrid import build_dense_grid
    from umeregrobust_tpu.ops.voxel import coords_to_grid_pts_np, quantize_np
    from umeregrobust_tpu.pipeline.icp import _icp_loop

    print("devices:", jax.devices(), flush=True)
    SEM_CAP, CORR_CAP = 16384, 4096
    arch = ARCHS["ResUNetSmall2"]
    caps2 = tuple(2 * c for c in (SEM_CAP, 12288, 6144, 3072, 1024))
    seed = 100
    pair = make_pair(SceneConfig(extent=25.0, ground_points=12000,
                                 structure_points=24000, seed=seed,
                                 observe_mode="lidar", baseline=8.0),
                     max_rotation_deg=120, max_translation=8.0, seed=seed)
    prepped = {}
    for tag, pts, seg in [("src", pair["src_pts"], pair["src_seg"]),
                          ("tgt", pair["tgt_pts"], pair["tgt_seg"])]:
        ep, es = equalize_sampling(pts, seg, SEMConfig(num_points=50000,
                                                       seed=seed))
        ep = ep[es != 0]
        coords, _ = quantize_np(ep, 0.3)
        n = min(len(coords), SEM_CAP)
        c4 = np.full((SEM_CAP, 4), 2**20, np.int32)
        c4[:n, 0] = 0
        c4[:n, 1:] = coords[:n]
        m = np.arange(SEM_CAP) < n
        ci = np.random.default_rng(seed).choice(
            len(pts), min(len(pts), CORR_CAP), replace=False)
        cp = np.zeros((CORR_CAP, 3), np.float32)
        cp[: len(ci)] = pts[ci]
        cm = np.arange(CORR_CAP) < len(ci)
        prepped[tag] = (c4, m, cp, cm)

    (sc, sm, scp, scm) = prepped["src"]
    (tc, tm, tcp, tcm) = prepped["tgt"]
    tgt_b = jnp.asarray(tc).at[:, 0].add(jnp.where(jnp.asarray(tm), 1, 0))
    coords2 = jnp.concatenate([jnp.asarray(sc), tgt_b], axis=0)
    mask2 = jnp.concatenate([jnp.asarray(sm), jnp.asarray(tm)])
    params, state = init_resunet(jax.random.PRNGKey(0), arch, 1, 32)

    R = 20

    def timeit(name, fn, *a):
        t0 = time.time()
        s = float(np.asarray(jax.jit(fn)(*a)))
        t1 = time.time()
        for _ in range(R):
            s = float(np.asarray(jax.jit(fn)(*a)))
        dt = (time.time() - t1) / R * 1000
        print(f"{name:36s} {dt:8.2f} ms (compile {t1-t0:.0f}s, chk {s:.3f})",
              flush=True)

    def f_geom(coords2, mask2):
        g = build_unet_geometry(coords2, mask2, arch, caps2)
        acc = jnp.int32(0)
        for lv in range(len(g["block_maps"])):
            acc += jnp.sum(g["block_maps"][lv]) + jnp.sum(g["enc_maps"][lv])
            bg = g["block_g"][lv]
            acc += jnp.sum(bg.center) + jnp.sum(bg.masks) + jnp.sum(bg.patho)
        for d in range(len(g["dec_maps"])):
            acc += jnp.sum(g["dec_maps"][d]) + jnp.sum(g["dec_g"][d].center)
        return acc

    timeit("geometry (maps + grouped)", f_geom, coords2, mask2)

    geom = build_unet_geometry(coords2, mask2, arch, caps2)
    jax.block_until_ready(geom["levels"][0].coords)

    def f_fwd(impl):
        def f(params, state, geom, mask2):
            fin = jnp.ones((2 * SEM_CAP, 1), jnp.float32) * mask2[:, None]
            out, _ = resunet_apply(params, state, geom, fin, arch,
                                   train=False, compute_dtype=jnp.bfloat16,
                                   conv_impl=impl)
            return jnp.sum(out)
        return f

    timeit("forward grouped", f_fwd("grouped"), params, state, geom, mask2)
    timeit("forward scan   ", f_fwd("scan"), params, state, geom, mask2)

    # ICP from a realistic ~0.3 m / 2 deg-off start, 60 iters @ 0.4
    gt = pair["gt_tform"]
    th = np.radians(2.0)
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    T0 = gt.copy()
    T0[:3, :3] = Rz @ T0[:3, :3]
    T0[:3, 3] += np.asarray([0.25, -0.15, 0.05], np.float32)

    grid = build_dense_grid(jnp.asarray(tcp), jnp.asarray(tcm), cell=0.4,
                            dims=(384, 384, 96))
    arrays = (grid.points, grid.points_sorted, grid.order, grid.runs,
              grid.origin, grid.overflow, grid.wstart)

    def f_icp(src, smask, T0):
        T, rmse, fit, it = _icp_loop(src, smask, arrays, T0, 0.4, 60, 32,
                                     (384, 384, 96))
        return jnp.sum(T) + it.astype(jnp.float32)

    def f_icp_iters(src, smask, T0):
        _, _, _, it = _icp_loop(src, smask, arrays, T0, 0.4, 60, 32,
                                (384, 384, 96))
        return it

    timeit("ICP 60@0.4 realistic start", f_icp, jnp.asarray(scp),
           jnp.asarray(scm), jnp.asarray(T0))
    iters = int(np.asarray(jax.jit(f_icp_iters)(
        jnp.asarray(scp), jnp.asarray(scm), jnp.asarray(T0))))
    print(f"ICP iterations actually run: {iters}", flush=True)


if __name__ == "__main__":
    main()
