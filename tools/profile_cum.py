"""Coarse cumulative profile of register_pair_e2e: 4 jits, 4 buckets.

  A geometry only
  B + forward + feature copy
  C + UME + match + filter + estimator + correlator select
  D full (+ ICP schedule)

Differences give bucket costs with only 4 tunnel compiles (the full
stage profiler needs ~12 and cannot finish when the tunnel is
congested). Timings are fetch-honest scalars, best of --reps.
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
    caps2 = tuple(2 * c for c in (SEM_CAP, 12288, 6144, 3072, 1024))
    cfg = RegistrationConfig(
        num_init_keypoints=2048, ume_n_samples=512,
        corr_coarse_src=1024, corr_coarse_tgt=1024, corr_rescore_top=32,
        icp_max_corr=0.4, icp_max_iter=60, icp_coarse_corr=None,
        icp_budget=32)

    seed = 100
    pair = make_pair(SceneConfig(extent=25.0, ground_points=12000,
                                 structure_points=24000, seed=seed,
                                 observe_mode="lidar", baseline=8.0),
                     max_rotation_deg=120, max_translation=8.0, seed=seed)
    d = {}
    for tag, pts, seg in [("src", pair["src_pts"], pair["src_seg"]),
                          ("tgt", pair["tgt_pts"], pair["tgt_seg"])]:
        ep, es = equalize_sampling(pts, seg, SEMConfig(num_points=50000,
                                                       seed=seed))
        ep = ep[es != 0]
        coords, _ = quantize_np(ep, 0.3)
        grid = coords_to_grid_pts_np(ep, coords, 0.3)
        n = min(len(coords), SEM_CAP)
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
        d[tag] = dict(coords=jnp.asarray(c4), grid=jnp.asarray(g),
                      mask=jnp.asarray(m), cp=jnp.asarray(cp),
                      cm=jnp.asarray(cm))

    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "weights", "synthetic_pretrain.pkl")
    blob = load_checkpoint(ckpt)
    params, state = blob["params"], blob["bn_state"]
    key = jax.random.PRNGKey(0)

    src, tgt = d["src"], d["tgt"]
    tgt_b = tgt["coords"].at[:, 0].add(jnp.where(tgt["mask"], 1, 0))
    coords2 = jnp.concatenate([src["coords"], tgt_b], axis=0)
    mask2 = jnp.concatenate([src["mask"], tgt["mask"]])

    def stage_a(coords2, mask2):
        g = build_unet_geometry(coords2, mask2, arch, caps2)
        s = sum(jnp.sum(x.center) for x in g["enc_g"])
        return s + sum(jnp.sum(x.center) for x in g["dec_g"])

    def _features(coords2, mask2):
        g = build_unet_geometry(coords2, mask2, arch, caps2)
        fin = jnp.ones((2 * SEM_CAP, 1), jnp.float32) * mask2[:, None]
        both, _ = resunet_apply(params, state, g, fin, arch, train=False,
                                compute_dtype=jnp.bfloat16)
        fs, ft = both[:SEM_CAP], both[SEM_CAP:]
        csf = copy_features_to_raw(src["cp"], src["cm"], src["grid"], fs,
                                   src["mask"])
        ctf = copy_features_to_raw(tgt["cp"], tgt["cm"], tgt["grid"], ft,
                                   tgt["mask"])
        return fs, ft, csf, ctf

    def stage_b(coords2, mask2):
        fs, ft, csf, ctf = _features(coords2, mask2)
        return jnp.sum(fs) + jnp.sum(ft) + jnp.sum(csf) + jnp.sum(ctf)

    def _select(coords2, mask2, key):
        fs, ft, csf, ctf = _features(coords2, mask2)
        best_T, _, _ = _hypotheses_and_select(
            cfg, key, src["grid"], fs, src["mask"], tgt["grid"], ft,
            tgt["mask"], src["cp"], csf, src["cm"], tgt["cp"], ctf,
            tgt["cm"])
        return best_T

    def stage_c(coords2, mask2, key):
        return jnp.sum(_select(coords2, mask2, key))

    def stage_d(coords2, mask2, key):
        T = _select(coords2, mask2, key)
        T2, _, _ = refine_with_icp(cfg, T, src["cp"], src["cm"], tgt["cp"],
                                   tgt["cm"])
        return jnp.sum(T2)

    rows = []
    for name, fn, a in [
        ("A geometry", stage_a, (coords2, mask2)),
        ("B +forward+copy", stage_b, (coords2, mask2)),
        ("C +select", stage_c, (coords2, mask2, key)),
        ("D full (+ICP)", stage_d, (coords2, mask2, key)),
    ]:
        f = jax.jit(fn)
        t0 = time.time()
        float(np.asarray(f(*a)))
        tc = time.time() - t0
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            float(np.asarray(f(*a)))
            ts.append(time.time() - t0)
        ms = min(ts) * 1000
        rows.append((name, ms))
        print(f"{name:18s} {ms:8.1f} ms wall (compile {tc:.0f}s)", flush=True)
    for i in range(1, len(rows)):
        print(f"delta {rows[i][0]:18s} {rows[i][1]-rows[i-1][1]:8.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
