"""Diagnose the verylow-regime failures: sampling vs scoring.

For each verylow bench pair, compute the full hypothesis set (exactly as
bench.py's reduced operating point does), then report per pair:

  - min RRE/RTE over ALL hypotheses vs GT  (is a good hypothesis even
    PRESENT in the sampled set? if not -> sampling/matching limit)
  - RRE/RTE of the correlator's chosen hypothesis (pre-ICP)
  - the score RANK of the best-RRE hypothesis (if a good hypothesis
    exists but ranks poorly -> scoring limit)

Usage: python tools/diag_verylow.py [--hyps N] [--regime verylow]
"""
import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--hyps", type=int, default=0)
    ap.add_argument("--regime", default="verylow")
    ap.add_argument("--pairs", type=int, default=7)
    ap.add_argument("--corr-mode", choices=("radius", "knn"), default="")
    cli = ap.parse_args()

    import jax
    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    import jax.numpy as jnp
    from functools import partial

    from umeregrobust_tpu.data.sem import SEMConfig, equalize_sampling
    from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
    from umeregrobust_tpu.models.resunet import ARCHS
    from umeregrobust_tpu.ops.voxel import coords_to_grid_pts_np, quantize_np
    from umeregrobust_tpu.pipeline.registration import (
        RegistrationConfig, _hypotheses_and_select)
    from umeregrobust_tpu.pipeline.e2e import pair_features_e2e
    from umeregrobust_tpu.train.checkpoint import load_checkpoint

    print("devices:", jax.devices(), flush=True)
    arch = ARCHS["ResUNetSmall2"]
    SEM_CAP, CORR_CAP = 16384, 4096
    caps = (SEM_CAP, 12288, 6144, 3072, 1024)
    cfg = RegistrationConfig(
        num_init_keypoints=2048, ume_n_samples=cli.hyps or 2048,
        corr_coarse_src=512, corr_coarse_tgt=1024, corr_rescore_top=16,
        icp_max_corr=0.4, icp_max_iter=60, icp_coarse_corr=None,
        **(dict(corr_mode=cli.corr_mode) if cli.corr_mode else {}))
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
        sf, tf, csf, ctf = pair_features_e2e(
            params, state, arch, caps, sc, sg, sm, tc, tg, tm,
            csp, csm, ctp, ctm)
        best_T, Ts, scores = _hypotheses_and_select(
            cfg, key, sg, sf, sm, tg, tf, tm, csp, csf, csm, ctp, ctf, ctm)
        return best_T, Ts, scores

    for i in range(cli.pairs):
        seed = 100 + 37 * r_i + i
        p = prep_pair(seed)
        key = jax.random.fold_in(jax.random.PRNGKey(0), i)
        best_T, Ts, scores = hyp_stage(
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
        scores = np.asarray(scores)
        best_T = np.asarray(best_T)
        gt = p["gt"]

        def rre_rte(T):
            Rrel = T[:3, :3] @ gt[:3, :3].T
            c = np.clip((np.trace(Rrel) - 1) / 2, -1, 1)
            return np.degrees(np.arccos(c)), np.linalg.norm(T[:3, 3] - gt[:3, 3])

        rres = np.array([rre_rte(T)[0] for T in Ts])
        rtes = np.array([rre_rte(T)[1] for T in Ts])
        good = (rres < 5.0) & (rtes < 1.0)
        j_best = int(np.argmin(rres + rtes))
        order = np.argsort(-scores)
        rank_of_best = int(np.where(order == j_best)[0][0])
        c_rre, c_rte = rre_rte(best_T)
        print(f"pair {i} (seed {seed}): chosen RRE={c_rre:7.2f} RTE={c_rte:6.2f} | "
              f"best-in-set RRE={rres[j_best]:7.2f} RTE={rtes[j_best]:6.2f} "
              f"(rank {rank_of_best}/{len(Ts)}) | "
              f"#good(<5deg,<1m)={int(good.sum())}", flush=True)


if __name__ == "__main__":
    main()
