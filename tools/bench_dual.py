"""Measure K-pairs-traced-in-one-jit (NO vmap) vs sequential dispatch.

vmap batching loses badly (EXPERIMENTS.md E3: XLA's batching rules for
the level sorts / Pallas kernel / ICP while_loop serialize). This probes
the other way to amortize the ~30 ms/pair dispatch gap: trace the
single-pair program K times inside one jit. The K subgraphs are
independent, so XLA's scheduler may also overlap stages with different
bottlenecks (gather-bound backbone vs MXU-bound correlator).

Usage: python tools/bench_dual.py [--k 2]
"""
import argparse
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--skip-seq", action="store_true")
    args = ap.parse_args()

    import jax

    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    import jax.numpy as jnp

    from umeregrobust_tpu.data.sem import SEMConfig, equalize_sampling
    from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
    from umeregrobust_tpu.models.resunet import ARCHS
    from umeregrobust_tpu.ops.voxel import coords_to_grid_pts_np, quantize_np
    from umeregrobust_tpu.pipeline.e2e import register_pair_e2e
    from umeregrobust_tpu.pipeline.registration import RegistrationConfig
    from umeregrobust_tpu.train.checkpoint import load_checkpoint

    print("devices:", jax.devices(), flush=True)
    SEM_CAP, CORR_CAP, K = 16384, 4096, args.k
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
        out = []
        for tag, pts in [("src", pair["src_pts"]), ("tgt", pair["tgt_pts"])]:
            seg = pair[f"{tag}_seg"]
            ep, es = equalize_sampling(pts, seg,
                                       SEMConfig(num_points=50000, seed=seed))
            keep = es != 0
            ep = ep[keep]
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
            out += [jnp.asarray(c4), jnp.asarray(g), jnp.asarray(m)]
            out += [jnp.asarray(cp), jnp.asarray(cm)]
        # reorder to register_pair_e2e arg order:
        # sc, sg, sm, tc, tg, tm, csp, csm, ctp, ctm
        (sc, sg, sm, csp, csm, tc, tg, tm, ctp, ctm) = out
        return (sc, sg, sm, tc, tg, tm, csp, csm, ctp, ctm)

    n_pairs = args.pairs
    pairs = [prep_pair(100 + i) for i in range(n_pairs)]
    keys = jax.random.split(jax.random.PRNGKey(0), n_pairs)

    @partial(jax.jit, static_argnames=())
    def run_k(params, state, ks, flat_args):
        outs = []
        for i in range(K):
            outs.append(register_pair_e2e(
                params, state, arch, caps, cfg, ks[i], *flat_args[i])[1])
        return tuple(outs)

    if not args.skip_seq:
        t0 = time.time()
        o = register_pair_e2e(params, state, arch, caps, cfg, keys[0],
                              *pairs[0])
        jax.block_until_ready(o)
        print(f"sequential compile+first: {time.time()-t0:.1f}s", flush=True)
        for _ in range(2):
            t0 = time.time()
            outs = [register_pair_e2e(params, state, arch, caps, cfg,
                                      keys[i], *pairs[i])[1]
                    for i in range(n_pairs)]
            _ = [np.asarray(x) for x in outs]
            dt = time.time() - t0
            print(f"sequential: {dt:.2f}s = {n_pairs/dt:.2f} pairs/s",
                  flush=True)

    t0 = time.time()
    out = run_k(params, state, keys[:K], pairs[:K])
    jax.block_until_ready(out)
    print(f"K={K} compile+first: {time.time()-t0:.1f}s", flush=True)
    for _ in range(2):
        t0 = time.time()
        res = []
        for base in range(0, n_pairs - K + 1, K):
            res.append(run_k(params, state, keys[base:base + K],
                             pairs[base:base + K]))
        _ = [np.asarray(x) for r in res for x in r]
        dt = time.time() - t0
        done = (n_pairs // K) * K
        print(f"K={K} fused:  {dt:.2f}s = {done/dt:.2f} pairs/s", flush=True)


if __name__ == "__main__":
    main()
