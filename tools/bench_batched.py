"""Measure register_pairs_batched vs sequential register_pair_e2e on TPU
at bench sizes. Round-1 found vmapped batching slower; re-check after the
sorted-join geometry + fused correlator + approx-knn rework.

Usage: python tools/bench_batched.py [--batch 4]
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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--skip-seq", action="store_true")
    args = ap.parse_args()

    import jax

    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    import jax.numpy as jnp

    from umeregrobust_tpu.data.sem import SEMConfig, equalize_sampling
    from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
    from umeregrobust_tpu.models.resunet import ARCHS, init_resunet
    from umeregrobust_tpu.ops.voxel import coords_to_grid_pts_np, quantize_np
    from umeregrobust_tpu.pipeline.e2e import (register_pair_e2e,
                                               register_pairs_batched)
    from umeregrobust_tpu.pipeline.registration import RegistrationConfig
    from umeregrobust_tpu.train.checkpoint import load_checkpoint

    print("devices:", jax.devices(), flush=True)
    SEM_CAP, CORR_CAP, B = 16384, 4096, args.batch
    arch = ARCHS["ResUNetSmall2"]
    caps = (SEM_CAP, 12288, 6144, 3072, 1024)
    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "weights", "synthetic_pretrain.pkl")
    blob = load_checkpoint(ckpt)
    params, state = blob["params"], blob["bn_state"]
    cfg = RegistrationConfig(
        num_init_keypoints=2048, ume_n_samples=512,
        corr_coarse_src=1024, corr_coarse_tgt=1024, corr_rescore_top=32,
        icp_max_corr=0.4, icp_max_iter=60, icp_coarse_corr=None,
        icp_budget=32)

    def prep_pair(seed):
        pair = make_pair(SceneConfig(extent=25.0, ground_points=12000,
                                     structure_points=24000, seed=seed),
                         max_rotation_deg=120, max_translation=8.0, seed=seed)
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

    pairs = [prep_pair(100 + i) for i in range(B)]
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    def stack(tag, field):
        return jnp.asarray(np.stack([p[tag][field] for p in pairs]))

    batched_args = (keys,
                    stack("src", "coords"), stack("src", "grid"),
                    stack("src", "mask"),
                    stack("tgt", "coords"), stack("tgt", "grid"),
                    stack("tgt", "mask"),
                    stack("src", "corr_pts"), stack("src", "corr_mask"),
                    stack("tgt", "corr_pts"), stack("tgt", "corr_mask"))

    single_args = [
        (keys[i],
         jnp.asarray(pairs[i]["src"]["coords"]),
         jnp.asarray(pairs[i]["src"]["grid"]),
         jnp.asarray(pairs[i]["src"]["mask"]),
         jnp.asarray(pairs[i]["tgt"]["coords"]),
         jnp.asarray(pairs[i]["tgt"]["grid"]),
         jnp.asarray(pairs[i]["tgt"]["mask"]),
         jnp.asarray(pairs[i]["src"]["corr_pts"]),
         jnp.asarray(pairs[i]["src"]["corr_mask"]),
         jnp.asarray(pairs[i]["tgt"]["corr_pts"]),
         jnp.asarray(pairs[i]["tgt"]["corr_mask"]))
        for i in range(B)]

    # sequential
    Ts_seq = None
    if not args.skip_seq:
        t0 = time.time()
        outs = [register_pair_e2e(params, state, arch, caps, cfg, *a)
                for a in single_args]
        jax.block_until_ready(outs)
        print(f"sequential compile+first: {time.time()-t0:.1f}s", flush=True)
        for _ in range(2):
            t0 = time.time()
            outs = [register_pair_e2e(params, state, arch, caps, cfg, *a)
                    for a in single_args]
            Ts_seq = [np.asarray(o[1]) for o in outs]
            dt = time.time() - t0
            print(f"sequential: {dt:.2f}s = {B/dt:.2f} pairs/s", flush=True)

    # batched
    t0 = time.time()
    out = register_pairs_batched(params, state, arch, caps, cfg,
                                 *batched_args)
    jax.block_until_ready(out)
    print(f"batched compile+first: {time.time()-t0:.1f}s", flush=True)
    for _ in range(2):
        t0 = time.time()
        out = register_pairs_batched(params, state, arch, caps, cfg,
                                     *batched_args)
        Ts_b = np.asarray(out[1])
        dt = time.time() - t0
        print(f"batched:    {dt:.2f}s = {B/dt:.2f} pairs/s", flush=True)

    if Ts_seq is not None:
        err = max(np.abs(Ts_b[i] - Ts_seq[i]).max() for i in range(B))
        print(f"max |batched - sequential| over transforms: {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
