"""SEM — Sampling Equalizer Module (offline preprocessing).

The reference equalizes LiDAR sampling density by reconstructing a surface
with NKSR (neural-kernel surface reconstruction, CUDA), extracting a dual
mesh, and uniformly sampling 125k points from it, then copying labels back
from the raw scan with a <= 3 m KDTree rule
(datasets/kitti/kitti_dataset.py:511-542).

NKSR is an external CUDA library; this TPU-host replacement reproduces the
property the pipeline depends on — an approximately uniform surface
sampling that removes the 1/r^2 LiDAR density falloff — with a
voxel-equalized resampler:

  1. quantize the scan at a fine voxel (default 0.1 m) — occupied voxels
     approximate the visible surface at uniform areal density;
  2. distribute the sample budget uniformly over occupied voxels;
  3. within a voxel, synthesize samples on the local tangent plane (PCA of
     the voxel's 1-neighborhood) with jitter, which smooths the stripe
     pattern of sparse rings the way NKSR's mesh sampling does;
  4. copy labels from the nearest raw point (<= label_copy_dist, else 0 =
     unlabeled), exactly the reference's copy-back rule.

The output feeds the same 0.3 m quantization downstream, so residual
differences inside a 0.1 m cell are immaterial to the voxel grid.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from scipy.spatial import cKDTree

__all__ = ["SEMConfig", "equalize_sampling"]


@dataclass
class SEMConfig:
    num_points: int = 125000  # NKSR_NUM_SAMPLED_POINTS (kitti_dataset.py:328)
    fine_voxel: float = 0.1
    label_copy_dist: float = 3.0  # LABEL_COPY_DIST_THR (kitti_dataset.py:327)
    tangent_jitter: bool = True
    knn_normal: int = 16
    seed: int = 0
    # mode="patch" adds the property the fine-voxel scheme cannot
    # provide: NKSR samples the RECONSTRUCTED surface, so it fills the
    # unobserved strips BETWEEN LiDAR rings. Patch mode fits a plane per
    # coarse patch (from neighboring patch centroids, which span ring
    # gaps) and samples uniformly over the whole patch area when the
    # neighborhood is planar (see tools/sweep_sem.py for the fidelity
    # comparison). Non-planar patches (poles, box edges) fall back to
    # jitter around observed points only.
    #
    # Recall A/B (r4, lidar-mode bench, `bench.py --sem-mode patch` vs
    # default, 28 tuning + 28 holdout pairs): voxel NP=96.4% aggregate,
    # patch NP=76.8% — patch LOSES 39 recall points in the low-overlap
    # regimes (lowoverlap 100->57.1 tuning / 100->57.1 holdout, verylow
    # 71.4->57.1 / 100->42.9). The r5 oracle probe (below) showed the
    # failure is NOT completion per se: PER-SCAN plane fill synthesizes
    # geometry the other scan's completion does not reproduce (the fill
    # is viewpoint-dependent), which corrupts UME moment sets exactly
    # where overlap is scarce — whereas SHARED-surface completion
    # (mode="oracle", what real NKSR approximates) reaches NP/SP 100% on
    # every regime and suite (BENCH_NOTES_r5). Default stays "voxel" by
    # measurement; the negative closes this patch implementation, not
    # NKSR's property.
    mode: str = "voxel"
    patch: float = 0.6
    # planarity gate: smallest/middle PCA eigenvalue ratio of the
    # neighborhood below this => treat as a surface and fill the patch
    planarity_max: float = 0.15
    # mode="oracle" (r5, VERDICT r4 #4): completion-fidelity probe, only
    # meaningful on synthetic scenes where the GT surface is known. The
    # scan is augmented with SHARED scene-surface points within
    # oracle_radius of any observed point before the voxel equalization —
    # the property real NKSR has on real data (it reconstructs the same
    # physical surface from both scans, so the two completions AGREE in
    # the overlap region), which mode="patch" lacks (its per-scan plane
    # fill is viewpoint-dependent: synthesized geometry is unshared
    # between the pair). A/B'ing oracle vs voxel bounds what NKSR could
    # buy; patch vs voxel only measured the patch implementation.
    oracle_radius: float = 1.5


def _patch_resample(pts: np.ndarray, cfg: SEMConfig,
                    rng: np.random.Generator) -> np.ndarray:
    """Uniform-areal resampling at patch scale: budget spread uniformly
    over occupied patches; planar patches are filled across their whole
    (t1, t2) extent — bridging inter-ring gaps the way mesh sampling
    does — while non-planar ones jitter around observed points."""
    P = cfg.patch
    coords = np.floor(pts / P).astype(np.int64)
    view = np.ascontiguousarray(coords).view(
        np.dtype((np.void, coords.dtype.itemsize * 3))).ravel()
    _, first_idx, inv = np.unique(view, return_index=True,
                                  return_inverse=True)
    n_pat = len(first_idx)
    # centroid of each patch's own points (not the cell center: keeps thin
    # structures anchored on the observed surface)
    cent = np.zeros((n_pat, 3), np.float64)
    np.add.at(cent, inv, pts)
    cnt = np.bincount(inv, minlength=n_pat).astype(np.float64)
    cent /= cnt[:, None]

    # plane per patch from neighboring patch centroids: neighbors span the
    # gaps between rings, so the plane is reliable where the surface is
    k = min(cfg.knn_normal, n_pat)
    tree = cKDTree(cent)
    _, nbr = tree.query(cent, k=k)
    nb = cent[nbr]
    mu = nb.mean(axis=1, keepdims=True)
    X = nb - mu
    cov = np.einsum("vki,vkj->vij", X, X) / X.shape[1]
    w, V = np.linalg.eigh(cov)
    planar = w[:, 0] <= cfg.planarity_max * np.maximum(w[:, 1], 1e-12)
    t1 = V[:, :, 2]
    t2 = V[:, :, 1]

    per = np.full(n_pat, cfg.num_points // n_pat, np.int64)
    extra = cfg.num_points - per.sum()
    if extra > 0:
        per[rng.choice(n_pat, extra, replace=False)] += 1
    reps = np.repeat(np.arange(n_pat), per)

    u = rng.uniform(-0.5, 0.5, size=len(reps))
    s = rng.uniform(-0.5, 0.5, size=len(reps))
    filled = (cent[reps]
              + (u * P)[:, None] * t1[reps]
              + (s * P)[:, None] * t2[reps])
    # fallback: jitter around a random observed point of the patch
    order = np.argsort(inv, kind="stable")
    starts = np.zeros(n_pat + 1, np.int64)
    np.cumsum(np.bincount(inv, minlength=n_pat), out=starts[1:])
    pick = (starts[reps]
            + rng.integers(0, np.maximum(cnt[reps].astype(np.int64), 1)))
    anchored = (pts[order[pick]]
                + rng.uniform(-0.5, 0.5, size=(len(reps), 3))
                * cfg.fine_voxel)
    return np.where(planar[reps, None], filled, anchored).astype(np.float32)


def equalize_sampling(
    pts: np.ndarray, seg: np.ndarray, cfg: SEMConfig | None = None,
    scene_pts: np.ndarray | None = None,
    scene_seg: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (new_pts (num_points, 3) float32, new_seg (num_points,) int32).

    scene_pts/scene_seg: GT surface samples in THIS scan's frame, required
    by mode="oracle" (see SEMConfig.oracle_radius), ignored otherwise.
    """
    cfg = cfg or SEMConfig()
    rng = np.random.default_rng(cfg.seed)
    if cfg.mode == "oracle":
        if scene_pts is None:
            raise ValueError("mode='oracle' needs scene_pts/scene_seg")
        from umeregrobust_tpu import native

        idx, _ = native.nn_radius(scene_pts.astype(np.float32),
                                  pts.astype(np.float32), cfg.oracle_radius)
        keep = idx >= 0
        pts = np.concatenate([np.asarray(pts, np.float32),
                              scene_pts[keep].astype(np.float32)], axis=0)
        seg = np.concatenate([np.asarray(seg, np.int32),
                              scene_seg[keep].astype(np.int32)])
        # fall through to the voxel equalization on the augmented cloud
    if cfg.mode == "patch":
        new_pts = _patch_resample(np.asarray(pts, np.float64), cfg, rng)
        from umeregrobust_tpu import native

        idx, dist = native.nn_radius(new_pts, pts.astype(np.float32),
                                     cfg.label_copy_dist)
        new_seg = np.zeros(len(new_pts), np.int32)
        ok = idx >= 0
        new_seg[ok] = seg[idx[ok]]
        return new_pts, new_seg
    v = cfg.fine_voxel

    coords = np.floor(pts / v).astype(np.int64)
    # unique occupied voxels + a representative point per voxel
    view = np.ascontiguousarray(coords).view(
        np.dtype((np.void, coords.dtype.itemsize * 3))).ravel()
    _, first_idx, inv = np.unique(view, return_index=True, return_inverse=True)
    n_vox = len(first_idx)
    centers = (coords[first_idx] + 0.5) * v

    # uniform budget over voxels
    per = np.full(n_vox, cfg.num_points // n_vox, np.int64)
    extra = cfg.num_points - per.sum()
    if extra > 0:
        per[rng.choice(n_vox, extra, replace=False)] += 1

    reps = np.repeat(np.arange(n_vox), per)
    base = centers[reps]

    if cfg.tangent_jitter and n_vox > cfg.knn_normal:
        # local tangent plane per voxel from neighboring voxel centers
        tree = cKDTree(centers)
        _, nbr = tree.query(centers, k=min(cfg.knn_normal, n_vox))
        nb = centers[nbr]  # (n_vox, k, 3)
        mu = nb.mean(axis=1, keepdims=True)
        X = nb - mu
        cov = np.einsum("vki,vkj->vij", X, X) / X.shape[1]
        # smallest eigvec = normal; two largest span the tangent plane
        w, V = np.linalg.eigh(cov)
        t1 = V[:, :, 2]
        t2 = V[:, :, 1]
        u = rng.uniform(-0.5, 0.5, size=len(base)).astype(np.float32)
        s = rng.uniform(-0.5, 0.5, size=len(base)).astype(np.float32)
        new_pts = (
            base
            + u[:, None] * t1[reps] * v
            + s[:, None] * t2[reps] * v
        ).astype(np.float32)
    else:
        new_pts = (base + rng.uniform(-0.5, 0.5, size=base.shape) * v).astype(
            np.float32)

    # label copy-back (kitti_dataset.py:536-541), native grid NN
    from umeregrobust_tpu import native

    idx, dist = native.nn_radius(new_pts, pts.astype(np.float32),
                                 cfg.label_copy_dist)
    new_seg = np.zeros(len(new_pts), np.int32)
    ok = idx >= 0
    new_seg[ok] = seg[idx[ok]]
    return new_pts, new_seg
