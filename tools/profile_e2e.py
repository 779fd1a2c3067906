"""In-situ per-stage timing of the fused registration pipeline.

Times each stage of register_pair_e2e at the exact bench.py shapes by
jitting cumulative stage functions and fetching a scalar (fetch-honest
through the remote tunnel). Differences between rows are the stage costs
(modulo cross-stage fusion, which the fully-fused program exploits).

Usage: python tools/profile_e2e.py [--reps 3]
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
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    import jax.numpy as jnp

    from umeregrobust_tpu.core.ume import estimate_rigid_from_ume
    from umeregrobust_tpu.data.sem import SEMConfig, equalize_sampling
    from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
    from umeregrobust_tpu.models.resunet import (
        ARCHS, build_unet_geometry, init_resunet, resunet_apply)
    from umeregrobust_tpu.ops.densegrid import DEFAULT_DIMS, build_dense_grid
    from umeregrobust_tpu.ops.voxel import coords_to_grid_pts_np, quantize_np
    from umeregrobust_tpu.pipeline.correlator import (
        correlator_scores_radius, prepare_weighted_features)
    from umeregrobust_tpu.pipeline.icp import _icp_loop
    from umeregrobust_tpu.pipeline.matching import (
        argmin_match, probabilistic_match_filter)
    from umeregrobust_tpu.pipeline.registration import (
        RegistrationConfig, _sample_keypoints, copy_features_to_raw)
    from umeregrobust_tpu.pipeline.ume_gen import ume_from_ball_query

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    SEM_CAP, CORR_CAP = 16384, 4096
    arch = ARCHS["ResUNetSmall2"]
    caps = (SEM_CAP, 12288, 6144, 3072, 1024)
    caps2 = tuple(2 * c for c in caps)
    cfg = RegistrationConfig(
        num_init_keypoints=2048, ume_n_samples=512,
        corr_coarse_src=1024, corr_rescore_top=32,
        icp_max_corr=0.4, icp_max_iter=60, icp_coarse_corr=None)

    # --- bench-identical input prep ---------------------------------------
    seed = 100
    pair = make_pair(SceneConfig(extent=25.0, ground_points=12000,
                                 structure_points=24000, seed=seed,
                                 observe_mode="lidar", baseline=8.0),
                     max_rotation_deg=120, max_translation=8.0, seed=seed)
    data = {}
    for tag, pts, seg in [("src", pair["src_pts"], pair["src_seg"]),
                          ("tgt", pair["tgt_pts"], pair["tgt_seg"])]:
        ep, es = equalize_sampling(pts, seg, SEMConfig(num_points=50000,
                                                       seed=seed))
        keep = es != 0
        ep = ep[keep]
        coords, _ = quantize_np(ep, 0.3)
        grid = coords_to_grid_pts_np(ep, coords, 0.3)
        n = min(len(grid), SEM_CAP)
        c4 = np.full((SEM_CAP, 4), 2**20, np.int32)
        c4[:n, 0] = 0
        c4[:n, 1:] = coords[:n]
        g = np.zeros((SEM_CAP, 3), np.float32)
        g[:n] = grid[:n]
        m = np.arange(SEM_CAP) < n
        ci = np.random.default_rng(seed).choice(
            len(pts), min(len(pts), CORR_CAP), replace=False)
        cp = np.zeros((CORR_CAP, 3), np.float32)
        cp[: len(ci)] = pts[ci]
        cm = np.arange(CORR_CAP) < len(ci)
        data[tag] = dict(coords=jnp.asarray(c4), grid=jnp.asarray(g),
                         mask=jnp.asarray(m), corr_pts=jnp.asarray(cp),
                         corr_mask=jnp.asarray(cm))

    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "weights", "synthetic_pretrain.pkl")
    if os.path.exists(ckpt):
        from umeregrobust_tpu.train.checkpoint import load_checkpoint
        blob = load_checkpoint(ckpt)
        params, state = blob["params"], blob["bn_state"]
    else:
        params, state = init_resunet(jax.random.PRNGKey(0), arch, 1, 32)

    key = jax.random.PRNGKey(0)
    rows = []

    def timeit(name, fn, *a):
        out = jax.jit(fn)(*a)
        jax.block_until_ready(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            np.asarray(jax.jit(fn)(*a))
            ts.append(time.time() - t0)
        ms = min(ts) * 1000
        rows.append((name, ms))
        print(f"{name:38s} {ms:9.1f} ms", file=sys.stderr, flush=True)
        return jax.jit(fn)(*a)

    src, tgt = data["src"], data["tgt"]
    tgt_b = tgt["coords"].at[:, 0].add(jnp.where(tgt["mask"], 1, 0))
    coords2 = jnp.concatenate([src["coords"], tgt_b], axis=0)
    mask2 = jnp.concatenate([src["mask"], tgt["mask"]])

    # stage 1: geometry
    def f_geom(coords2, mask2):
        g = build_unet_geometry(coords2, mask2, arch, caps2)
        return sum(jnp.sum(m) for m in g["enc_maps"]) + sum(
            jnp.sum(m) for m in g["dec_maps"])
    timeit("geometry (2x16k fused)", f_geom, coords2, mask2)

    geom = build_unet_geometry(coords2, mask2, arch, caps2)
    geom = jax.tree.map(lambda x: x, geom)  # materialize

    # stage 2: forward
    def f_fwd(params, state, coords2, mask2):
        g = build_unet_geometry(coords2, mask2, arch, caps2)
        fin = jnp.ones((2 * SEM_CAP, 1), jnp.float32) * mask2[:, None]
        out, _ = resunet_apply(params, state, g, fin, arch, train=False,
                               compute_dtype=jnp.bfloat16)
        return jnp.sum(out)
    timeit("+ forward (cum)", f_fwd, params, state, coords2, mask2)

    def f_fwd_only(params, state, geom, mask2):
        fin = jnp.ones((2 * SEM_CAP, 1), jnp.float32) * mask2[:, None]
        out, _ = resunet_apply(params, state, geom, fin, arch, train=False,
                               compute_dtype=jnp.bfloat16)
        return jnp.sum(out)
    timeit("forward alone (grouped conv)", f_fwd_only, params, state, geom,
           mask2)

    def f_fwd_scan(params, state, geom, mask2):
        fin = jnp.ones((2 * SEM_CAP, 1), jnp.float32) * mask2[:, None]
        out, _ = resunet_apply(params, state, geom, fin, arch, train=False,
                               compute_dtype=jnp.bfloat16, conv_impl="scan")
        return jnp.sum(out)
    timeit("forward alone (per-tap scan)", f_fwd_scan, params, state, geom,
           mask2)

    fin = jnp.ones((2 * SEM_CAP, 1), jnp.float32) * mask2[:, None]
    both, _ = jax.jit(lambda p, s, g, f: resunet_apply(
        p, s, g, f, arch, train=False, compute_dtype=jnp.bfloat16))(
        params, state, geom, fin)
    feats = {"src": both[:SEM_CAP], "tgt": both[SEM_CAP:]}

    def f_copy(cp, cm, g, f, m):
        return jnp.sum(copy_features_to_raw(cp, cm, g, f, m))
    timeit("copy_features_to_raw (x1)", f_copy, src["corr_pts"],
           src["corr_mask"], src["grid"], feats["src"], src["mask"])

    def f_kp_ume(key, g, f, m):
        kp, ok = _sample_keypoints(key, g, m, cfg.num_init_keypoints)
        u = ume_from_ball_query(g, f, kp, radius=cfg.ume_r_nn,
                                max_nn=cfg.ume_max_nn, p_mask=m, k_mask=ok,
                                normalize=True)
        return jnp.sum(u)
    timeit("ume_from_ball_query (x1, 2048 kp)", f_kp_ume, key, src["grid"],
           feats["src"], src["mask"])

    k1, k2, k3, k4 = jax.random.split(key, 4)
    skp, sok = jax.jit(lambda k: _sample_keypoints(
        k, src["grid"], src["mask"], cfg.num_init_keypoints))(k1)
    tkp, tok = jax.jit(lambda k: _sample_keypoints(
        k, tgt["grid"], tgt["mask"], cfg.num_init_keypoints))(k2)
    ume_s = ume_from_ball_query(src["grid"], feats["src"], skp,
                                radius=cfg.ume_r_nn, max_nn=cfg.ume_max_nn,
                                p_mask=src["mask"], k_mask=sok, normalize=True)
    ume_t = ume_from_ball_query(tgt["grid"], feats["tgt"], tkp,
                                radius=cfg.ume_r_nn, max_nn=cfg.ume_max_nn,
                                p_mask=tgt["mask"], k_mask=tok, normalize=True)

    def f_match(us, ut, sok, tok):
        m, d = argmin_match(us, ut, src_mask=sok, tgt_mask=tok)
        return jnp.sum(m) + jnp.sum(d)
    timeit("argmin_match (2048x2048 QR+cross)", f_match, ume_s, ume_t, sok,
           tok)

    m_idx, d = argmin_match(ume_s, ume_t, src_mask=sok, tgt_mask=tok)

    def f_est(us, ut, m_idx, d, k):
        keep = probabilistic_match_filter(k, d, cfg.ume_n_samples, cfg.tau)
        Ts, _ = estimate_rigid_from_ume(us[keep], ut[m_idx[keep]],
                                        compute_distance=False)
        return jnp.sum(Ts)
    timeit("filter + estimator (512 hyps)", f_est, ume_s, ume_t, m_idx, d, k3)

    keep = probabilistic_match_filter(k3, d, cfg.ume_n_samples, cfg.tau)
    Ts, _ = estimate_rigid_from_ume(ume_s[keep], ume_t[m_idx[keep]],
                                    compute_distance=False)

    cs_f = copy_features_to_raw(src["corr_pts"], src["corr_mask"], src["grid"],
                                feats["src"], src["mask"])
    ct_f = copy_features_to_raw(tgt["corr_pts"], tgt["corr_mask"], tgt["grid"],
                                feats["tgt"], tgt["mask"])

    def f_prep(a, b, c, d_, e, f):
        fs, ft = prepare_weighted_features(a, b, c, d_, e, f)
        return jnp.sum(fs) + jnp.sum(ft)
    timeit("prepare_weighted_features (4k)", f_prep, src["corr_pts"], cs_f,
           src["corr_mask"], tgt["corr_pts"], ct_f, tgt["corr_mask"])

    fs, ft = prepare_weighted_features(src["corr_pts"], cs_f, src["corr_mask"],
                                       tgt["corr_pts"], ct_f, tgt["corr_mask"])

    def f_coarse(sel_pts, sel_f, sel_m, tp, tf, tm, Ts):
        return jnp.sum(correlator_scores_radius(
            sel_pts, sel_f, sel_m, tp, tf, tm, Ts, chunk=1024))
    sel = jax.random.choice(k4, CORR_CAP, (1024,), replace=False)
    timeit("correlator coarse radius (512x1024x4k)", f_coarse,
           src["corr_pts"][sel], fs[sel], src["corr_mask"][sel],
           tgt["corr_pts"], ft, tgt["corr_mask"], Ts)

    def f_fine(sp, sf, sm, tp, tf, tm, Ts32):
        return jnp.sum(correlator_scores_radius(sp, sf, sm, tp, tf, tm, Ts32))
    timeit("correlator fine radius (32x4kx4k)", f_fine, src["corr_pts"], fs,
           src["corr_mask"], tgt["corr_pts"], ft, tgt["corr_mask"], Ts[:32])

    def f_grid(tp, tm):
        g = build_dense_grid(tp, tm, cell=cfg.icp_max_corr, dims=DEFAULT_DIMS)
        return jnp.sum(g.order) + g.overflow
    timeit("icp build_dense_grid (4k)", f_grid, tgt["corr_pts"],
           tgt["corr_mask"])

    grid = build_dense_grid(tgt["corr_pts"], tgt["corr_mask"],
                            cell=cfg.icp_max_corr, dims=DEFAULT_DIMS)
    arrays = (grid.points, grid.points_sorted, grid.order, grid.runs,
              grid.origin, grid.overflow, grid.wstart)
    T0 = jnp.asarray(pair["gt_tform"], jnp.float32)  # converges fast: lower bound
    Tfar = T0.at[:3, 3].add(0.3)

    def f_icp(sp, sm, T):
        T_out, rmse, fit, it = _icp_loop(sp, sm, arrays, T, cfg.icp_max_corr,
                                         cfg.icp_max_iter, 8, DEFAULT_DIMS)
        return jnp.sum(T_out) + rmse + fit + it
    timeit("icp from gt (converged, 4k)", f_icp, src["corr_pts"],
           src["corr_mask"], T0)
    timeit("icp from gt+0.3m (4k)", f_icp, src["corr_pts"],
           src["corr_mask"], Tfar)

    def f_icp_iters(sp, sm, T):
        _, _, _, it = _icp_loop(sp, sm, arrays, T, cfg.icp_max_corr,
                                cfg.icp_max_iter, 8, DEFAULT_DIMS)
        return it
    n_it = int(np.asarray(jax.jit(f_icp_iters)(
        src["corr_pts"], src["corr_mask"], Tfar)))
    print(f"(icp from gt+0.3m ran {n_it} iters)", file=sys.stderr)

    total = sum(ms for _, ms in rows)
    print("\nstage table (min over reps, ms):")
    for name, ms in rows:
        print(f"  {name:38s} {ms:9.1f}")
    print(f"  note: rows overlap (cumulative variants); see names")


if __name__ == "__main__":
    main()
