"""Consensus-vote diagnostic for the verylow-regime scoring failures.

diag_verylow.py showed near-GT hypotheses EXIST in the 2048-hypothesis
set but rank ~1300-1700 under the kernel-correlation score at 30 m
baseline (wrong-basin transforms overlap the self-similar ground plane
and outscore them). This tool tests a RANSAC-style alternative signal:
each hypothesis T_h is born from ONE match; score it by how many OTHER
matched keypoint pairs (s_i, t_i) it explains: ||T_h s_i - t_i|| < tau.
Correct matches all vote for near-GT transforms; wrong matches vote for
scattered transforms that rarely agree.

Reports per pair: vote-rank of the best-RRE hypothesis, RRE/RTE of the
top-voted hypothesis, vote counts (top-voted vs best-RRE vs median).

Usage: python tools/diag_consensus.py [--regime verylow] [--tau 2.0]
"""
import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from diag_verylow import REGIMES  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hyps", type=int, default=2048)
    ap.add_argument("--regime", default="verylow")
    ap.add_argument("--pairs", type=int, default=7)
    ap.add_argument("--tau", type=float, default=2.0)
    ap.add_argument("--n-cand", type=int, default=16)
    cli = ap.parse_args()

    import jax
    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    import jax.numpy as jnp
    from functools import partial

    from umeregrobust_tpu.data.sem import SEMConfig, equalize_sampling
    from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
    from umeregrobust_tpu.models.resunet import ARCHS
    from umeregrobust_tpu.core.ume import estimate_rigid_from_ume
    from umeregrobust_tpu.ops.voxel import coords_to_grid_pts_np, quantize_np
    from umeregrobust_tpu.pipeline.matching import (
        argmin_match, probabilistic_match_filter)
    from umeregrobust_tpu.pipeline.registration import (
        RegistrationConfig, _sample_keypoints)
    from umeregrobust_tpu.pipeline.ume_gen import ume_from_ball_query
    from umeregrobust_tpu.pipeline.e2e import pair_features_e2e
    from umeregrobust_tpu.train.checkpoint import load_checkpoint

    print("devices:", jax.devices(), flush=True)
    arch = ARCHS["ResUNetSmall2"]
    SEM_CAP, CORR_CAP = 16384, 4096
    caps = (SEM_CAP, 12288, 6144, 3072, 1024)
    cfg = RegistrationConfig(
        num_init_keypoints=2048, ume_n_samples=cli.hyps,
        corr_coarse_src=512, corr_coarse_tgt=1024, corr_rescore_top=16,
        icp_max_corr=0.4, icp_max_iter=60, icp_coarse_corr=None)
    scene_kw = dict(extent=25.0, ground_points=12000, structure_points=24000)

    blob = load_checkpoint(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "weights", "synthetic_pretrain.pkl"))
    params, state = blob["params"], blob["bn_state"]

    r_i = list(REGIMES).index(cli.regime)
    rkw = REGIMES[cli.regime]

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
    def hyp_stage(key, sc, sg, sm, tc, tg, tm, csp, csm, ctp, ctm):
        """Reproduces _hypotheses_and_select's hypothesis generation (same
        key-split order and filter), returning the matched keypoint pairs
        alongside the transforms, plus the NMS+refit candidates and their
        exact correlation scores."""
        sf, tf, csf, ctf = pair_features_e2e(
            params, state, arch, caps, sc, sg, sm, tc, tg, tm,
            csp, csm, ctp, ctm)
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
        H = ume_tgt[jnp.maximum(m[keep], 0)]
        Ts, _ = estimate_rigid_from_ume(G, H, compute_distance=False)
        s_kp = src_kp[keep]
        t_kp = tgt_kp[jnp.maximum(m[keep], 0)]

        from umeregrobust_tpu.pipeline.consensus import (_pair_distances,
                                                         consensus_refit,
                                                         polish_candidates)
        from umeregrobust_tpu.pipeline.correlator import (
            prepare_weighted_features, _score)
        pair_ok = src_ok[keep] & (d[keep] < jnp.float32(1e5))
        cand = consensus_refit(Ts, s_kp, t_kp, pair_ok, n_cand=cli.n_cand)
        dists = _pair_distances(cand, s_kp, t_kp)
        tight = jnp.sum((dists < 0.5) & pair_ok[None], axis=1)
        # post-polish signals: mini-ICP on 512-row src subsample
        pol = polish_candidates(cand, csp[:512], csm[:512], ctp, ctm)
        pd = _pair_distances(pol, s_kp, t_kp)
        p_tight = jnp.sum((pd < 0.5) & pair_ok[None], axis=1)
        p_loose = jnp.sum((pd < 2.0) & pair_ok[None], axis=1)
        fs2, ft2 = prepare_weighted_features(
            csp, csf, csm, ctp, ctf, ctm, var_knn=cfg.corr_var_knn,
            approx_var=True)
        cscore = _score("radius", csp, fs2, csm, ctp, ft2, ctm, cand,
                        sigma=cfg.corr_kernel_sigma)
        rscore = _score("radius", csp, fs2, csm, ctp, ft2, ctm, pol,
                        sigma=cfg.corr_kernel_sigma)  # post-polish exact

        # structure-only post-polish score: drop likely-ground points
        # (z within 0.35 m of their 2 m-cell min-z), label-free
        def ground_mask(pts, msk, cell=2.0, dz=0.35):
            cc = jnp.floor(pts[:, :2] / cell).astype(jnp.int32)
            cc = cc - jnp.min(jnp.where(msk[:, None], cc, 1 << 20), axis=0)
            cc = jnp.clip(cc, 0, 63)
            flat = cc[:, 0] * 64 + cc[:, 1]
            minz = jnp.full((64 * 64,), jnp.float32(1e9)).at[flat].min(
                jnp.where(msk, pts[:, 2], 1e9))
            return msk & (pts[:, 2] - minz[flat] > dz)

        sm_s = ground_mask(csp, csm)
        tm_s = ground_mask(ctp, ctm)
        sscore = _score("radius", csp, fs2, sm_s, ctp, ft2, tm_s, pol,
                        sigma=cfg.corr_kernel_sigma)
        loose = jnp.sum((dists < 2.0) & pair_ok[None], axis=1)
        return (Ts, s_kp, t_kp, cand, tight, cscore, rscore, loose,
                d[keep], pol, p_tight, p_loose, sscore)

    for i in range(cli.pairs):
        seed = 100 + 37 * r_i + i
        p = prep_pair(seed)
        key = jax.random.fold_in(jax.random.PRNGKey(0), i)
        (Ts, s_kp, t_kp, cand, tight, cscore, rscore, loose,
         d_match, pol, p_tight, p_loose, sscore) = hyp_stage(
            key,
            jnp.asarray(p["src"]["coords"]), jnp.asarray(p["src"]["grid"]),
            jnp.asarray(p["src"]["mask"]),
            jnp.asarray(p["tgt"]["coords"]), jnp.asarray(p["tgt"]["grid"]),
            jnp.asarray(p["tgt"]["mask"]),
            jnp.asarray(p["src"]["corr_pts"]),
            jnp.asarray(p["src"]["corr_mask"]),
            jnp.asarray(p["tgt"]["corr_pts"]),
            jnp.asarray(p["tgt"]["corr_mask"]))
        Ts = np.asarray(Ts)
        s_kp = np.asarray(s_kp)
        t_kp = np.asarray(t_kp)
        gt = p["gt"]

        def rre_rte(T):
            Rrel = T[:3, :3] @ gt[:3, :3].T
            c = np.clip((np.trace(Rrel) - 1) / 2, -1, 1)
            return (np.degrees(np.arccos(c)),
                    np.linalg.norm(T[:3, 3] - gt[:3, 3]))

        rres = np.array([rre_rte(T)[0] for T in Ts])
        rtes = np.array([rre_rte(T)[1] for T in Ts])
        j_best = int(np.argmin(rres + rtes))

        # consensus votes, chunked over hypotheses
        H = Ts.shape[0]
        votes = np.zeros(H, np.int32)
        for a in range(0, H, 256):
            b = min(a + 256, H)
            tr = np.einsum("hij,nj->hni", Ts[a:b, :3, :3], s_kp) \
                + Ts[a:b, None, :3, 3]
            dist = np.linalg.norm(tr - t_kp[None], axis=-1)
            votes[a:b] = (dist < cli.tau).sum(axis=1)
        order = np.argsort(-votes, kind="stable")
        vrank_best = int(np.where(order == j_best)[0][0])
        j_top = int(order[0])
        # how many matches are "correct" under GT (within tau)
        tr_gt = s_kp @ gt[:3, :3].T + gt[:3, 3]
        n_correct = int((np.linalg.norm(tr_gt - t_kp, axis=-1)
                         < cli.tau).sum())
        print(
            f"pair {i} (seed {seed}): best-in-set RRE={rres[j_best]:7.2f} "
            f"RTE={rtes[j_best]:5.2f} vote-rank {vrank_best}/{H} "
            f"(votes {votes[j_best]}) | top-voted RRE={rres[j_top]:7.2f} "
            f"RTE={rtes[j_top]:5.2f} (votes {votes[j_top]}) | "
            f"median votes {int(np.median(votes))} | "
            f"correct matches (GT, tau={cli.tau}) = {n_correct}/{H}",
            flush=True)

        # NMS+refit candidate table
        cand = np.asarray(cand)
        tight = np.asarray(tight)
        loose = np.asarray(loose)
        cscore = np.asarray(cscore)
        rscore = np.asarray(rscore)
        c_rre = np.array([rre_rte(T)[0] for T in cand])
        c_rte = np.array([rre_rte(T)[1] for T in cand])
        j_gt = int(np.argmin(c_rre + c_rte))

        pol = np.asarray(pol)
        p_tight = np.asarray(p_tight)
        p_loose = np.asarray(p_loose)
        p_rre = np.array([rre_rte(T)[0] for T in pol])
        p_rte = np.array([rre_rte(T)[1] for T in pol])

        sscore = np.asarray(sscore)

        def row(tag, j):
            print(f"    cand {tag}: #{j} RRE={c_rre[j]:6.2f} "
                  f"RTE={c_rte[j]:5.2f} fwd={cscore[j]:.4f} | post-polish "
                  f"RRE={p_rre[j]:6.2f} RTE={p_rte[j]:5.2f} "
                  f"ptight={p_tight[j]} ploose={p_loose[j]} "
                  f"pfwd={rscore[j]:.4f} pSTRUCT={sscore[j]:.4f}", flush=True)

        row("best-by-err    ", j_gt)
        row("best-by-fwd    ", int(np.argmax(cscore)))
        row("best-by-PFWD   ", int(np.argmax(rscore)))
        row("best-by-PSTRUCT", int(np.argmax(sscore)))
        row("best-by-perr   ", int(np.argmin(p_rre + p_rte)))

        # voter-quality stats: do match confidence (UME distance) or
        # keypoint height separate correct voters from coincidental ones?
        d_match = np.asarray(d_match)
        corr_mask = np.linalg.norm(tr_gt - t_kp, axis=-1) < cli.tau
        zg_src = np.median(s_kp[:, 2])
        stats = (
            f"    voters: d(correct) med={np.median(d_match[corr_mask]):.4f}"
            f" vs d(wrong) med={np.median(d_match[~corr_mask]):.4f} | "
            f"z-above-med (correct) {np.mean(s_kp[corr_mask, 2] > zg_src):.2f}"
            f" vs (wrong) {np.mean(s_kp[~corr_mask, 2] > zg_src):.2f}")
        print(stats, flush=True)
        # GT-mode voters vs strongest wrong-mode voters, height profile
        d_gt = np.linalg.norm(
            s_kp @ cand[j_gt, :3, :3].T + cand[j_gt, :3, 3] - t_kp, axis=-1)
        j_w = int(np.argmax(np.where(c_rre > 20, loose, -1)))
        d_w = np.linalg.norm(
            s_kp @ cand[j_w, :3, :3].T + cand[j_w, :3, 3] - t_kp, axis=-1)
        v_gt = d_gt < 2.0
        v_w = d_w < 2.0
        print(f"    gt-mode voters {v_gt.sum()} "
              f"(med z {np.median(s_kp[v_gt, 2]) if v_gt.any() else 0:.2f}, "
              f"med d {np.median(d_match[v_gt]) if v_gt.any() else 0:.4f}) | "
              f"wrong-mode #{j_w} voters {v_w.sum()} "
              f"(med z {np.median(s_kp[v_w, 2]) if v_w.any() else 0:.2f}, "
              f"med d {np.median(d_match[v_w]) if v_w.any() else 0:.4f})",
              flush=True)


if __name__ == "__main__":
    main()
