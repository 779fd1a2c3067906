"""Per-pair match-inlier ratio of the cascade winner over the bench suite.

Calibrates RegistrationConfig.consensus_gate_inliers / sr_gate_inliers:
prints, for every reduced-point suite pair, the fraction of valid matched
keypoint pairs that agree with the (consensus-on) winner within
consensus_gate_radius — the exact quantity the adaptive gates branch on.

Usage: python tools/gate_probe.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REGIMES = {
    "nominal": dict(baseline=8.0, max_rotation_deg=120, max_translation=8.0),
    "rotheavy": dict(baseline=8.0, max_rotation_deg=180,
                     min_rotation_deg=150, max_translation=8.0),
    "lowoverlap": dict(baseline=22.0, max_rotation_deg=120,
                       max_translation=12.0),
    "verylow": dict(baseline=30.0, max_rotation_deg=180,
                    min_rotation_deg=150, max_translation=14.0),
}


def main():
    import jax
    import jax.numpy as jnp

    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    from umeregrobust_tpu.core.ume import estimate_rigid_from_ume
    from umeregrobust_tpu.data.sem import SEMConfig, equalize_sampling
    from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
    from umeregrobust_tpu.models.resunet import (
        ARCHS, build_unet_geometry, init_resunet, resunet_apply)
    from umeregrobust_tpu.ops.voxel import coords_to_grid_pts_np, quantize_np
    from umeregrobust_tpu.pipeline.matching import argmin_match, \
        probabilistic_match_filter
    from umeregrobust_tpu.pipeline.registration import (
        RegistrationConfig, _sample_keypoints, copy_features_to_raw,
        prepare_weighted_features)
    from umeregrobust_tpu.pipeline.correlator import select_best_transform
    from umeregrobust_tpu.pipeline.ume_gen import ume_from_ball_query
    from umeregrobust_tpu.train.checkpoint import load_checkpoint

    print("devices:", jax.devices(), flush=True)
    SEM_CAP, CORR_CAP = 16384, 4096
    arch = ARCHS["ResUNetSmall2"]
    caps2 = tuple(2 * c for c in (SEM_CAP, 10240, 4096, 1280, 256))
    cfg = RegistrationConfig(
        num_init_keypoints=2048, ume_n_samples=2048,
        corr_coarse_src=512, corr_coarse_tgt=1024, corr_rescore_top=4,
        icp_max_corr=0.4, icp_coarse_corr=None)
    scene_kw = dict(extent=25.0, ground_points=12000,
                    structure_points=24000)

    def prep(seed, baseline, **regime):
        pair = make_pair(SceneConfig(observe_mode="lidar", baseline=baseline,
                                     seed=seed, **scene_kw),
                         seed=seed, **regime)
        d = {"gt": pair["gt_tform"]}
        for tag, pts, seg in [("src", pair["src_pts"], pair["src_seg"]),
                              ("tgt", pair["tgt_pts"], pair["tgt_seg"])]:
            ep, es = equalize_sampling(pts, seg, SEMConfig(num_points=50000,
                                                           seed=seed))
            ep = ep[es != 0]
            coords, _ = quantize_np(ep, 0.3)
            grid = coords_to_grid_pts_np(ep, coords, 0.3)
            n = min(len(coords), SEM_CAP)
            pick = (np.random.default_rng(seed).choice(len(grid), n,
                                                       replace=False)
                    if len(grid) > SEM_CAP else np.arange(n))
            c4 = np.full((SEM_CAP, 4), 2**20, np.int32)
            c4[:n, 0] = 0
            c4[:n, 1:] = coords[pick]
            g = np.zeros((SEM_CAP, 3), np.float32)
            g[:n] = grid[pick]
            m = np.arange(SEM_CAP) < n
            ci = np.random.default_rng(seed + 1).choice(
                len(pts), min(len(pts), CORR_CAP), replace=False)
            cp = np.zeros((CORR_CAP, 3), np.float32)
            cp[: len(ci)] = pts[ci]
            cm = np.arange(CORR_CAP) < len(ci)
            d[tag] = dict(coords=c4, grid=g, mask=m, cp=cp, cm=cm)
        return d

    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "weights", "synthetic_pretrain.pkl")
    blob = load_checkpoint(ckpt)
    params, state = blob["params"], blob["bn_state"]

    @jax.jit
    def run(key, sc, sg, sm, scp, scm, tc, tg, tm, tcp, tcm):
        tgt_b = tc.at[:, 0].add(jnp.where(tm, 1, 0))
        coords2 = jnp.concatenate([sc, tgt_b], axis=0)
        mask2 = jnp.concatenate([sm, tm])
        g = build_unet_geometry(coords2, mask2, arch, caps2)
        fin = jnp.ones((2 * SEM_CAP, 1), jnp.float32) * mask2[:, None]
        both, _ = resunet_apply(params, state, g, fin, arch, train=False,
                                compute_dtype=jnp.bfloat16)
        fs, ft = both[:SEM_CAP], both[SEM_CAP:]
        csf = copy_features_to_raw(scp, scm, sg, fs, sm)
        ctf = copy_features_to_raw(tcp, tcm, tg, ft, tm)
        # replicate _hypotheses_and_select's first half (keypoints ->
        # matches -> filter -> hypotheses -> cascade winner) and return
        # the gate quantity alongside
        k_src, k_tgt, k_filt, k_corr = jax.random.split(key, 4)
        src_kp, src_ok = _sample_keypoints(k_src, sg, sm,
                                           cfg.num_init_keypoints)
        tgt_kp, tgt_ok = _sample_keypoints(k_tgt, tg, tm,
                                           cfg.num_init_keypoints)
        u_s = ume_from_ball_query(sg, fs, src_kp, radius=cfg.ume_r_nn,
                                  max_nn=cfg.ume_max_nn, p_mask=sm,
                                  k_mask=src_ok, normalize=True)
        u_t = ume_from_ball_query(tg, ft, tgt_kp, radius=cfg.ume_r_nn,
                                  max_nn=cfg.ume_max_nn, p_mask=tm,
                                  k_mask=tgt_ok, normalize=True)
        m, dist = argmin_match(u_s, u_t, src_mask=src_ok, tgt_mask=tgt_ok)
        keep = probabilistic_match_filter(k_filt, dist, cfg.ume_n_samples,
                                          cfg.tau)
        G = u_s[keep]
        H = u_t[jnp.maximum(m[keep], 0)]
        Ts, _ = estimate_rigid_from_ume(G, H, compute_distance=False,
                                        sweeps=cfg.estimator_sweeps)
        fs_w, ft_w = prepare_weighted_features(
            scp, csf, scm, tcp, ctf, tcm, var_knn=cfg.corr_var_knn,
            approx_var=True, var_anchors=cfg.corr_var_anchors)
        best_T, scores = select_best_transform(
            scp, fs_w, scm, tcp, ft_w, tcm, Ts,
            sigma=cfg.corr_kernel_sigma, knn_k=cfg.corr_knn,
            var_knn=cfg.corr_var_knn, coarse_src=cfg.corr_coarse_src,
            coarse_tgt=cfg.corr_coarse_tgt,
            rescore_top=cfg.corr_rescore_top, key=k_corr, mode=cfg.corr_mode,
            triage_src=cfg.corr_triage_src, triage_tgt=cfg.corr_triage_tgt,
            triage_top=cfg.corr_triage_top, prepared=True,
            var_anchors=cfg.corr_var_anchors)
        kp_s = src_kp[keep]
        kp_t = tgt_kp[jnp.maximum(m[keep], 0)]
        pair_ok = src_ok[keep] & (dist[keep] < jnp.float32(1e5))
        mapped = kp_s @ best_T[:3, :3].T + best_T[:3, 3]
        err2 = jnp.sum((mapped - kp_t) ** 2, axis=-1)
        r2 = jnp.float32(cfg.consensus_gate_radius ** 2)
        n_ok = jnp.maximum(jnp.sum(pair_ok.astype(jnp.float32)), 1.0)
        inl = jnp.sum((pair_ok & (err2 < r2)).astype(jnp.float32)) / n_ok
        # top-k hypothesis agreement: fraction of the top-8 scored
        # hypotheses within (5 deg, 1 m) of the winner
        topi = jax.lax.top_k(scores, 8)[1]
        Tt = Ts[topi]
        Rrel = jnp.einsum('kij,lj->kil', Tt[:, :3, :3], best_T[:3, :3])
        tr = jnp.clip(jnp.trace(Rrel, axis1=1, axis2=2), -1.0, 3.0)
        ang = jnp.degrees(jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)))
        dt = jnp.linalg.norm(Tt[:, :3, 3] - best_T[:3, 3], axis=-1)
        agree = jnp.mean(((ang < 5.0) & (dt < 1.0)).astype(jnp.float32))
        return best_T, inl, agree

    key0 = jax.random.PRNGKey(0)
    for r_i, (rname, rkw) in enumerate(REGIMES.items()):
        for base, suite in ((100 + 37 * r_i, "tuning"),
                            (5000 + 41 * r_i, "holdout")):
            for i in range(3):
                seed = base + i
                p = prep(seed, **rkw)
                T, inl, agree = run(
                    jax.random.fold_in(key0, seed),
                    *[jnp.asarray(p[t][f]) for t in ("src", "tgt")
                      for f in ("coords", "grid", "mask", "cp", "cm")])
                gt = p["gt"]
                T = np.asarray(T)
                tr = np.clip(np.trace(T[:3, :3] @ gt[:3, :3].T), -1, 3)
                rre = float(np.degrees(np.arccos((tr - 1) / 2)))
                print(f"{rname:10s} {suite:7s} seed={seed}: "
                      f"inl={float(inl):.3f} top8_agree={float(agree):.2f} "
                      f"cascade_RRE={rre:7.2f}", flush=True)


if __name__ == "__main__":
    main()
