"""Adversarial stress test: radius-capped vs kNN-20 correlator scoring.

VERDICT r1 #4: the radius-mode correlator (the TPU default,
pipeline/correlator.py:correlator_scores_radius) had only been shown to
agree with the reference's kNN-20 cap (utils/loc_utils.py:592-637) on easy
synthetic hypothesis sets. This experiment measures the winner-flip rate
on NEAR-TIE hypothesis sets in hard regimes:

- hypotheses: GT composed with small perturbations (0-8 deg, 0-1 m) so
  scores are nearly tied, plus 180-degree yaw decoys (the rotkitti failure
  mode for rotation-symmetric scenes);
- scenes: low-overlap (sector-cropped) and rotation-heavy pairs;
- features: smooth world-frame random-Fourier descriptors + noise, so
  feature correlation carries signal like a trained backbone's output.

For each trial we score the identical hypothesis set with both modes and
compare argmax winners and the rotation error of the selected hypothesis.
Results are summarized at the end and recorded in EXPERIMENTS.md.

Usage: python tools/stress_correlator.py [--trials 200] [--n 2048]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def rot_z(deg):
    r = np.radians(deg)
    c, s = np.cos(r), np.sin(r)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def small_rotation(rng, deg):
    """Rotation of `deg` degrees around a random near-vertical axis."""
    ax = rng.normal(size=3).astype(np.float64)
    ax[2] += 3.0  # mostly yaw, like vehicle motion
    ax /= np.linalg.norm(ax)
    a = np.radians(deg)
    K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
    return (np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * K @ K).astype(
        np.float32)


def rre_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=200)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--hyp", type=int, default=48)
    ap.add_argument("--feat_dim", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--weights", action="store_true",
                    help="compare approx vs exact var-knn weights (both "
                         "radius-scored) instead of radius vs knn caps")
    args = ap.parse_args()

    import jax

    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    import jax.numpy as jnp

    from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
    from umeregrobust_tpu.pipeline.correlator import (
        correlator_scores, correlator_scores_radius,
        prepare_weighted_features)

    log(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    rng = np.random.default_rng(args.seed)
    N, H, C = args.n, args.hyp, args.feat_dim

    # world-frame random Fourier feature field (shared across the pair)
    W = rng.normal(scale=0.35, size=(3, C)).astype(np.float32)
    phase = rng.uniform(0, 2 * np.pi, size=C).astype(np.float32)

    def featurize(world_pts, noise_rng):
        f = np.sin(world_pts @ W + phase)
        return (f + noise_rng.normal(scale=0.25, size=f.shape)).astype(
            np.float32)

    regimes = [
        ("lowoverlap", dict(max_rotation_deg=120, max_translation=10.0,
                            sector_deg=220.0)),
        ("rotheavy", dict(max_rotation_deg=180, min_rotation_deg=150,
                          max_translation=8.0)),
    ]

    flips = 0
    flip_drre = []  # RRE(radius pick) - RRE(knn pick) when they differ
    sel_rre_knn, sel_rre_rad = [], []
    t_knn = t_rad = 0.0
    n_done = 0

    for trial in range(args.trials):
        rname, rkw = regimes[trial % len(regimes)]
        seed = 10_000 + trial
        pair = make_pair(
            SceneConfig(extent=20.0, ground_points=6000,
                        structure_points=12000, seed=seed),
            seed=seed, **rkw)
        gt = pair["gt_tform"]
        trng = np.random.default_rng(seed)

        def cap(pts, seg, m=N):
            idx = trng.choice(len(pts), min(len(pts), m), replace=False)
            out = np.zeros((m, 3), np.float32)
            out[: len(idx)] = pts[idx]
            mask = np.arange(m) < len(idx)
            return out, mask, idx

        sp, smask, sidx = cap(pair["src_pts"], pair["src_seg"])
        tp, tmask, tidx = cap(pair["tgt_pts"], pair["tgt_seg"])
        # features from WORLD coordinates: src is in world frame; tgt was
        # moved by gt, so its world coords are gt^-1 applied to tgt_pts.
        gti = np.linalg.inv(gt)
        tw = tp @ gti[:3, :3].T + gti[:3, 3]
        sf = featurize(sp, trng) * smask[:, None]
        tf = featurize(tw, trng) * tmask[:, None]

        # near-tie hypothesis set around GT + 180-degree decoys
        Ts = np.tile(np.eye(4, dtype=np.float32), (H, 1, 1))
        mags = trng.choice([0.0, 0.25, 0.5, 1.0, 2.0, 4.0, 8.0], size=H)
        tmags = trng.choice([0.0, 0.05, 0.15, 0.4, 1.0], size=H)
        for h in range(H):
            if h >= H - 4:  # decoys: 180-deg yaw flip, jittered
                R = rot_z(180.0 + trng.uniform(-3, 3)) @ gt[:3, :3]
                t = gt[:3, 3] + trng.normal(scale=0.3, size=3)
            else:
                R = small_rotation(trng, mags[h]) @ gt[:3, :3]
                dt = trng.normal(size=3)
                dt /= max(np.linalg.norm(dt), 1e-9)
                t = gt[:3, 3] + dt.astype(np.float32) * tmags[h]
            Ts[h, :3, :3] = R
            Ts[h, :3, 3] = t

        a = (jnp.asarray(sp), jnp.asarray(sf), jnp.asarray(smask),
             jnp.asarray(tp), jnp.asarray(tf), jnp.asarray(tmask))
        sw, tw_ = prepare_weighted_features(*a[:3], *a[3:], var_knn=50)
        args6 = (a[0], sw, a[2], a[3], tw_, a[5], jnp.asarray(Ts))

        if args.weights:
            # "knn" arm = exact weights, "radius" arm = approx weights;
            # both scored with the radius cap, isolating the weight effect
            t0 = time.time()
            s_knn = np.asarray(correlator_scores_radius(*args6, sigma=1.5))
            t_knn += time.time() - t0
            swa, twa = prepare_weighted_features(*a[:3], *a[3:], var_knn=50,
                                                 approx_var=True)
            args6a = (a[0], swa, a[2], a[3], twa, a[5], jnp.asarray(Ts))
            t0 = time.time()
            s_rad = np.asarray(correlator_scores_radius(*args6a, sigma=1.5))
            t_rad += time.time() - t0
        else:
            t0 = time.time()
            s_knn = np.asarray(correlator_scores(*args6, knn_k=20, sigma=1.5))
            t_knn += time.time() - t0
            t0 = time.time()
            s_rad = np.asarray(correlator_scores_radius(*args6, sigma=1.5))
            t_rad += time.time() - t0

        wk, wr = int(np.argmax(s_knn)), int(np.argmax(s_rad))
        rk = rre_deg(gt[:3, :3], Ts[wk, :3, :3])
        rr = rre_deg(gt[:3, :3], Ts[wr, :3, :3])
        sel_rre_knn.append(rk)
        sel_rre_rad.append(rr)
        if wk != wr:
            flips += 1
            flip_drre.append(rr - rk)
            log(f"trial {trial} [{rname}]: FLIP knn->{wk} (rre {rk:.2f}) "
                f"radius->{wr} (rre {rr:.2f})")
        n_done += 1
        if (trial + 1) % 20 == 0:
            log(f"{trial+1}/{args.trials} trials, {flips} flips so far "
                f"(knn {t_knn:.1f}s, radius {t_rad:.1f}s)")

    sel_rre_knn = np.asarray(sel_rre_knn)
    sel_rre_rad = np.asarray(sel_rre_rad)
    log("=" * 60)
    log(f"trials: {n_done}   winner flips: {flips} "
        f"({100.0 * flips / max(n_done, 1):.1f}%)")
    if flip_drre:
        log(f"RRE delta on flips (radius - knn): "
            f"mean {np.mean(flip_drre):+.3f} deg, "
            f"worst {np.max(flip_drre):+.3f} deg")
    log(f"selected-hypothesis RRE: knn median {np.median(sel_rre_knn):.3f} "
        f"/ mean {np.mean(sel_rre_knn):.3f} deg | radius median "
        f"{np.median(sel_rre_rad):.3f} / mean {np.mean(sel_rre_rad):.3f} deg")
    log(f"timing: knn {t_knn:.1f}s, radius {t_rad:.1f}s "
        f"({t_knn / max(t_rad, 1e-9):.1f}x)")
    # machine-readable one-liner
    import json
    print(json.dumps({
        "trials": n_done, "flips": flips,
        "flip_rate": round(flips / max(n_done, 1), 4),
        "rre_knn_mean": round(float(np.mean(sel_rre_knn)), 4),
        "rre_radius_mean": round(float(np.mean(sel_rre_rad)), 4),
        "knn_s": round(t_knn, 1), "radius_s": round(t_rad, 1),
    }))


if __name__ == "__main__":
    main()
