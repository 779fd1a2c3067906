"""Arbiter probe for the 2 remaining verylow bench failures (pairs 21/27).

Reproduces bench.py's reduced operating point EXACTLY (same seeds
211..217, same per-pair keys split(PRNGKey(0), 28)[21..27], same cfg),
then instruments the consensus stage: for every polished candidate it
reports RRE/RTE vs GT, the structure-only arbiter score, and the
post-polish match-vote counts (tight < 0.5 m, loose < 2 m). Goal: decide
whether the failures are candidate-GENERATION misses (no near-GT mode in
the polished set) or ARBITRATION misses (a near-GT mode exists but the
structure score prefers a wrong basin) — and, for the latter, which
auxiliary signal separates them.

Usage: python tools/diag_arbiter.py [--pairs 7]
"""
import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=7)
    ap.add_argument("--only", type=int, nargs="*", default=None,
                    help="local pair indices (0..6) to run; default all")
    cli = ap.parse_args()

    import jax
    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    import jax.numpy as jnp
    from functools import partial

    from umeregrobust_tpu.core.ume import estimate_rigid_from_ume
    from umeregrobust_tpu.data.sem import SEMConfig, equalize_sampling
    from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
    from umeregrobust_tpu.models.resunet import ARCHS
    from umeregrobust_tpu.ops.voxel import coords_to_grid_pts_np, quantize_np
    from umeregrobust_tpu.pipeline.consensus import (
        _pair_distances, compact_structure, consensus_refit,
        polish_candidates)
    from umeregrobust_tpu.pipeline.correlator import (
        _score, prepare_weighted_features, select_best_transform)
    from umeregrobust_tpu.pipeline.e2e import pair_features_e2e
    from umeregrobust_tpu.pipeline.matching import (
        argmin_match, probabilistic_match_filter)
    from umeregrobust_tpu.pipeline.registration import (
        RegistrationConfig, _sample_keypoints)
    from umeregrobust_tpu.pipeline.ume_gen import ume_from_ball_query
    from umeregrobust_tpu.train.checkpoint import load_checkpoint

    print("devices:", jax.devices(), flush=True)
    arch = ARCHS["ResUNetSmall2"]
    SEM_CAP, CORR_CAP = 16384, 4096
    caps = (SEM_CAP, 10240, 4096, 1280, 256)
    # bench.py's reduced operating point (keep in sync with bench.py cfg;
    # the r3 probe ran at the pre-change corr_rescore_top=16 — noted in
    # BENCH_NOTES_r3; it is 4 since)
    cfg = RegistrationConfig(
        num_init_keypoints=2048, ume_n_samples=2048,
        corr_coarse_src=512, corr_coarse_tgt=1024, corr_rescore_top=4,
        icp_max_corr=0.4, icp_max_iter=60, icp_coarse_corr=None)
    scene_kw = dict(extent=25.0, ground_points=12000, structure_points=24000)
    rkw = dict(baseline=30.0, max_rotation_deg=180, min_rotation_deg=150,
               max_translation=14.0)

    blob = load_checkpoint(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "weights", "synthetic_pretrain.pkl"))
    params, state = blob["params"], blob["bn_state"]

    def prep_pair(seed):
        pair = make_pair(SceneConfig(observe_mode="lidar",
                                     baseline=rkw["baseline"], seed=seed,
                                     **scene_kw),
                         seed=seed,
                         **{k: v for k, v in rkw.items() if k != "baseline"})
        out = {"gt": pair["gt_tform"]}
        for tag, pts, seg in [("src", pair["src_pts"], pair["src_seg"]),
                              ("tgt", pair["tgt_pts"], pair["tgt_seg"])]:
            ep, es = equalize_sampling(pts, seg,
                                       SEMConfig(num_points=50000, seed=seed))
            keep = es != 0
            ep, es = ep[keep], es[keep]
            coords, sel = quantize_np(ep, 0.3)
            grid = coords_to_grid_pts_np(ep, coords, 0.3)
            n = min(len(grid), SEM_CAP)
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
            out[tag] = dict(coords=c4, grid=g, mask=m, corr_pts=cp,
                            corr_mask=cm)
        return out

    @partial(jax.jit, static_argnames=())
    def probe(key, sc, sg, sm, tc, tg, tm, csp, csm, ctp, ctm):
        # features exactly as register_pair_e2e (fused two-cloud forward)
        sf, tf, csf, ctf = pair_features_e2e(
            params, state, arch, caps, sc, sg, sm, tc, tg, tm,
            csp, csm, ctp, ctm)
        # _hypotheses_and_select body, instrumented
        k_src, k_tgt, k_filt, k_corr = jax.random.split(key, 4)
        n_init = cfg.num_init_keypoints
        src_kp, src_ok = _sample_keypoints(k_src, sg, sm, n_init)
        tgt_kp, tgt_ok = _sample_keypoints(k_tgt, tg, tm, n_init)
        ume_src = ume_from_ball_query(
            sg, sf, src_kp, radius=cfg.ume_r_nn, max_nn=cfg.ume_max_nn,
            p_mask=sm, k_mask=src_ok, normalize=True)
        ume_tgt = ume_from_ball_query(
            tg, tf, tgt_kp, radius=cfg.ume_r_nn, max_nn=cfg.ume_max_nn,
            p_mask=tm, k_mask=tgt_ok, normalize=True)
        m, d = argmin_match(ume_src, ume_tgt,
                            src_mask=src_ok, tgt_mask=tgt_ok)
        keep = probabilistic_match_filter(k_filt, d, cfg.ume_n_samples,
                                          cfg.tau)
        G = ume_src[keep]
        Hm = ume_tgt[jnp.maximum(m[keep], 0)]
        Ts, _ = estimate_rigid_from_ume(G, Hm, compute_distance=False,
                                        sweeps=cfg.estimator_sweeps)
        s_kp = src_kp[keep]
        t_kp = tgt_kp[jnp.maximum(m[keep], 0)]
        pair_ok = src_ok[keep] & (d[keep] < jnp.float32(1e5))

        fs_w, ft_w = prepare_weighted_features(
            csp, csf, csm, ctp, ctf, ctm,
            var_knn=cfg.corr_var_knn, approx_var=True,
            var_anchors=cfg.corr_var_anchors)
        best_T, _ = select_best_transform(
            csp, fs_w, csm, ctp, ft_w, ctm, Ts,
            sigma=cfg.corr_kernel_sigma, knn_k=cfg.corr_knn,
            var_knn=cfg.corr_var_knn, coarse_src=cfg.corr_coarse_src,
            coarse_tgt=cfg.corr_coarse_tgt,
            rescore_top=cfg.corr_rescore_top, key=k_corr, mode=cfg.corr_mode,
            triage_src=cfg.corr_triage_src, triage_tgt=cfg.corr_triage_tgt,
            triage_top=cfg.corr_triage_top, prepared=True,
            var_anchors=cfg.corr_var_anchors)

        cand = consensus_refit(
            Ts, s_kp, t_kp, pair_ok,
            tau=cfg.consensus_tau, n_cand=cfg.consensus_cands,
            nms_rot_deg=cfg.consensus_nms_rot_deg,
            nms_trans=cfg.consensus_nms_trans)
        cand = jnp.concatenate([cand, best_T[None]], axis=0)
        rows = cfg.consensus_polish_rows
        pol = polish_candidates(cand, csp[:rows], csm[:rows], ctp, ctm,
                                radii=cfg.consensus_polish_radii,
                                inner=cfg.consensus_polish_inner)
        cap = min(cfg.consensus_struct_cap, csp.shape[0])
        sp_c, sf_c, sm_c = compact_structure(csp, fs_w, csm, cap)
        tp_c, tf_c, tm_c = compact_structure(
            ctp, ft_w, ctm, min(cfg.consensus_struct_cap, ctp.shape[0]))
        s_struct = _score(cfg.corr_mode, sp_c, sf_c, sm_c, tp_c, tf_c, tm_c,
                          pol, knn_k=cfg.corr_knn,
                          sigma=cfg.corr_kernel_sigma)
        pd = _pair_distances(pol, s_kp, t_kp)
        p_tight = jnp.sum((pd < 0.5) & pair_ok[None], axis=1)
        p_loose = jnp.sum((pd < 2.0) & pair_ok[None], axis=1)
        # symmetric (reverse-direction) structure score: tgt -> src under
        # T^-1; wrong basins rarely explain both directions
        Rs = pol[:, :3, :3]
        ts = pol[:, :3, 3]
        inv = jnp.zeros_like(pol)
        inv = inv.at[:, :3, :3].set(jnp.swapaxes(Rs, 1, 2))
        inv = inv.at[:, :3, 3].set(
            -jnp.einsum("vji,vj->vi", Rs, ts))
        inv = inv.at[:, 3, 3].set(1.0)
        s_rev = _score(cfg.corr_mode, tp_c, tf_c, tm_c, sp_c, sf_c, sm_c,
                       inv, knn_k=cfg.corr_knn, sigma=cfg.corr_kernel_sigma)
        return pol, s_struct, s_rev, p_tight, p_loose, best_T

    def rre_rte(T, gt):
        Rrel = T[:3, :3] @ gt[:3, :3].T
        c = np.clip((np.trace(Rrel) - 1) / 2, -1, 1)
        return np.degrees(np.arccos(c)), np.linalg.norm(T[:3, 3] - gt[:3, 3])

    keys = jax.random.split(jax.random.PRNGKey(0), 28)
    idxs = cli.only if cli.only is not None else range(cli.pairs)
    for i in idxs:
        seed = 100 + 37 * 3 + i  # verylow = regime index 3 in bench.py
        p = prep_pair(seed)
        out = probe(
            keys[21 + i],
            jnp.asarray(p["src"]["coords"]), jnp.asarray(p["src"]["grid"]),
            jnp.asarray(p["src"]["mask"]),
            jnp.asarray(p["tgt"]["coords"]), jnp.asarray(p["tgt"]["grid"]),
            jnp.asarray(p["tgt"]["mask"]),
            jnp.asarray(p["src"]["corr_pts"]),
            jnp.asarray(p["src"]["corr_mask"]),
            jnp.asarray(p["tgt"]["corr_pts"]),
            jnp.asarray(p["tgt"]["corr_mask"]))
        pol, s_struct, s_rev, p_tight, p_loose, best_T = map(np.asarray, out)
        gt = p["gt"]
        bre, bte = rre_rte(best_T, gt)
        win = int(np.argmax(s_struct))
        print(f"\n== pair {21 + i} (seed {seed}) cascade winner: "
              f"RRE={bre:.2f} RTE={bte:.2f}  struct-argmax={win}")
        print("  cand |   RRE    RTE | struct    rev     sum | tight loose")
        for v in range(pol.shape[0]):
            r, t = rre_rte(pol[v], gt)
            tag = " <= WINNER" if v == win else ""
            near = " NEAR-GT" if (r < 5 and t < 1.0) else ""
            print(f"   {v:3d} | {r:6.1f} {t:6.2f} | {s_struct[v]:7.4f} "
                  f"{s_rev[v]:7.4f} {s_struct[v] + s_rev[v]:7.4f} | "
                  f"{p_tight[v]:5d} {p_loose[v]:5d}{tag}{near}")


if __name__ == "__main__":
    main()
