"""SEM resampler knob sweep (VERDICT r2 weak #8): quantify, on synthetic
lidar-mode scans, the properties the NKSR stage exists to provide
(reference datasets/kitti/kitti_dataset.py:511-542 — uniform surface
resampling + label copy-back) as a function of the two free knobs of the
TPU-host replacement (data/sem.py): fine_voxel and knn_normal.

Host-only metrics per setting (no TPU needed):
  density_cv   — coefficient of variation of point counts over occupied
                 2 m ground cells. The raw LiDAR scan has strong 1/r^2
                 falloff (high CV); NKSR's uniform mesh sampling and any
                 faithful proxy should push CV down.
  surf_p50/p95 — distance from resampled points to the raw scan (mm):
                 surface adherence; tangent-plane jitter should stay
                 well inside the 0.3 m downstream voxel.
  label_acc    — fraction of resampled points whose copied label matches
                 the label of their nearest raw point (the copy-back rule
                 itself uses <=3 m; this checks the 1-NN consistency).

Usage: python tools/sweep_sem.py [--scans 4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.spatial import cKDTree

from umeregrobust_tpu.data.sem import SEMConfig, equalize_sampling
from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair


def density_cv(pts, cell=2.0):
    c = np.floor(pts[:, :2] / cell).astype(np.int64)
    view = np.ascontiguousarray(c).view(
        np.dtype((np.void, c.dtype.itemsize * 2))).ravel()
    _, counts = np.unique(view, return_counts=True)
    return float(counts.std() / counts.mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=4)
    ap.add_argument("--points", type=int, default=125000)
    args = ap.parse_args()

    scans = []
    for s in range(args.scans):
        pair = make_pair(
            SceneConfig(observe_mode="lidar", extent=40.0,
                        ground_points=60000, structure_points=24000),
            max_rotation_deg=30, max_translation=8.0, seed=100 + s)
        scans.append((pair["src_pts"].astype(np.float32),
                      pair["src_seg"].astype(np.int32)))
    print(f"{args.scans} lidar-mode scans, "
          f"{np.mean([len(p) for p, _ in scans]):.0f} pts avg", flush=True)

    grid = ([("voxel", dict(fine_voxel=fv, knn_normal=kn))
             for fv in (0.05, 0.1, 0.2, 0.4) for kn in (8, 16, 32)]
            + [("patch", dict(patch=p, planarity_max=pm))
               for p in (0.4, 0.6, 0.8, 1.2) for pm in (0.08, 0.15, 0.3)])
    rows = []
    for mode, kw in grid:
            m = dict(mode=mode, kw=kw,
                     cv_raw=[], cv_sem=[], p50=[], p95=[], acc=[], sec=[])
            for pts, seg in scans:
                cfg = SEMConfig(num_points=args.points, mode=mode, **kw)
                t0 = time.time()
                new_pts, new_seg = equalize_sampling(pts, seg, cfg)
                m["sec"].append(time.time() - t0)
                m["cv_raw"].append(density_cv(pts))
                m["cv_sem"].append(density_cv(new_pts))
                d, idx = cKDTree(pts).query(new_pts, k=1)
                m["p50"].append(float(np.percentile(d, 50)))
                m["p95"].append(float(np.percentile(d, 95)))
                m["acc"].append(float((new_seg == seg[idx]).mean()))
            rows.append({k: (np.mean(v) if isinstance(v, list) else v)
                         for k, v in m.items()})
            r = rows[-1]
            tag = " ".join(f"{k}={v}" for k, v in kw.items())
            print(f"{mode:5s} {tag:30s}: "
                  f"density CV {r['cv_raw']:.2f}->{r['cv_sem']:.2f}  "
                  f"surf p50/p95 {1e3*r['p50']:.0f}/{1e3*r['p95']:.0f} mm  "
                  f"label_acc {100*r['acc']:.1f}%  {r['sec']:.1f}s/scan",
                  flush=True)


if __name__ == "__main__":
    main()
