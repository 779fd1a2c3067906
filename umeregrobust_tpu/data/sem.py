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


def equalize_sampling(
    pts: np.ndarray, seg: np.ndarray, cfg: SEMConfig | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (new_pts (num_points, 3) float32, new_seg (num_points,) int32)."""
    cfg = cfg or SEMConfig()
    rng = np.random.default_rng(cfg.seed)
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
