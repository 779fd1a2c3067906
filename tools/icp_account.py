"""ICP iteration accounting over the reduced-point bench suite.

VERDICT r4 #2b: publish how many sub-iterations the displacement exit
actually runs per ICP stage, then right-size icp_multires_iter /
icp_max_iter / budgets from data instead of conservative guesses.

Runs the same 28-pair suite as bench.py's reduced regime (tuning +
holdout) through features -> hypothesis select -> refine_with_icp
(return_iters=True) and prints per-stage iteration stats per regime.

Usage: python tools/icp_account.py [--pairs-per-regime N]
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
    ap.add_argument("--pairs-per-regime", type=int, default=3)
    ap.add_argument("--mr-iter", type=int, default=0,
                    help="override icp_multires_iter")
    ap.add_argument("--icp-iter", type=int, default=0,
                    help="override icp_max_iter")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    from umeregrobust_tpu.data.sem import SEMConfig, equalize_sampling
    from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
    from umeregrobust_tpu.models.resunet import (
        ARCHS, build_unet_geometry, init_resunet, resunet_apply)
    from umeregrobust_tpu.ops.voxel import coords_to_grid_pts_np, quantize_np
    from umeregrobust_tpu.pipeline.registration import (
        RegistrationConfig, _hypotheses_and_select, copy_features_to_raw,
        refine_with_icp)
    from umeregrobust_tpu.train.checkpoint import load_checkpoint

    print("devices:", jax.devices(), flush=True)
    SEM_CAP, CORR_CAP = 16384, 4096
    arch = ARCHS["ResUNetSmall2"]
    caps2 = tuple(2 * c for c in (SEM_CAP, 10240, 4096, 1280, 256))
    # the bench's reduced-point RegistrationConfig (bench.py run_regime)
    cfg = RegistrationConfig(
        num_init_keypoints=2048, ume_n_samples=2048,
        corr_coarse_src=512, corr_coarse_tgt=1024, corr_rescore_top=4,
        icp_max_corr=0.4, icp_max_iter=args.icp_iter or 60,
        icp_multires_iter=args.mr_iter or 40,
        icp_coarse_corr=None)
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

    import functools

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
        best_T, _, _ = _hypotheses_and_select(
            cfg, key, sg, fs, sm, tg, ft, tm,
            scp, csf, scm, tcp, ctf, tcm)
        T, rmse, fit, iters = refine_with_icp(
            cfg, best_T, scp, scm, tcp, tcm, return_iters=True)
        return T, iters

    key0 = jax.random.PRNGKey(0)
    N = args.pairs_per_regime
    print(f"stages: [multires(iter<={cfg.icp_multires_iter}), "
          f"exact(iter<={cfg.icp_max_iter})]")
    all_it = {}
    for r_i, (rname, rkw) in enumerate(REGIMES.items()):
        its = []
        for base in (100 + 37 * r_i, 5000 + 41 * r_i):
            for i in range(N):
                seed = base + i
                p = prep(seed, **rkw)
                _, iters = run(
                    jax.random.fold_in(key0, seed),
                    *[jnp.asarray(p[t][f]) for t in ("src", "tgt")
                      for f in ("coords", "grid", "mask", "cp", "cm")][0:10])
                its.append(np.asarray(iters))
        its = np.stack(its)
        all_it[rname] = its
        print(f"{rname:10s}: per-stage iters max={its.max(axis=0)} "
              f"mean={its.mean(axis=0).round(1)} "
              f"(n={len(its)})", flush=True)
    cat = np.concatenate(list(all_it.values()))
    print(f"\nALL       : max={cat.max(axis=0)} mean={cat.mean(axis=0).round(1)}")
    print("right-size rule: a stage whose max sits well below its cap can "
          "have the cap lowered to max+inner; a stage pinned AT its cap "
          "is iteration-limited (raise or leave).")


if __name__ == "__main__":
    main()
