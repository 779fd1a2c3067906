"""Per-level voxel occupancy vs static caps at the reference operating
point (VERDICT r4 #1 groundwork).

The conv stack's cost scales with level CAPACITY, not content (every
gather row is paid whether the mask is set or not), so oversized caps
directly inflate the gather floor. The reduced point's caps were sized
1.15-1.9x measured occupancy (bench.py); this probe makes the same
measurement for the reference point's caps (50176, 37632, 18816, 9408,
3200) over the full 24-pair bench suite.

Usage: python tools/occupancy_probe.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from umeregrobust_tpu.data.sem import SEMConfig, equalize_sampling
from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
from umeregrobust_tpu.ops.voxel import quantize_np

REGIMES = {
    "nominal": dict(baseline=8.0, max_rotation_deg=120, max_translation=8.0),
    "rotheavy": dict(baseline=8.0, max_rotation_deg=180,
                     min_rotation_deg=150, max_translation=8.0),
    "lowoverlap": dict(baseline=22.0, max_rotation_deg=120,
                       max_translation=12.0),
    "verylow": dict(baseline=30.0, max_rotation_deg=180,
                    min_rotation_deg=150, max_translation=14.0),
}
SCENE_KW = dict(extent=50.0, ground_points=30000, structure_points=60000)
SEM_POINTS = 125000
SEM_CAP = 50176
CAPS = (SEM_CAP, 37632, 18816, 9408, 3200)
STRIDES = (1, 2, 4, 8, 24)  # ResUNetSmall2 tensor strides


def level_counts(coords: np.ndarray) -> list:
    out = []
    for s in STRIDES:
        q = (coords // s) * s
        out.append(len(np.unique(q, axis=0)))
    return out


def main():
    counts = []
    for r_i, (rname, rkw) in enumerate(REGIMES.items()):
        for suite_base, n in ((100 + 37 * r_i, 3), (5000 + 41 * r_i, 3)):
            for i in range(n):
                seed = suite_base + i
                pair = make_pair(
                    SceneConfig(observe_mode="lidar",
                                baseline=rkw["baseline"], seed=seed,
                                **SCENE_KW),
                    seed=seed,
                    **{k: v for k, v in rkw.items() if k != "baseline"})
                for pts, seg in ((pair["src_pts"], pair["src_seg"]),
                                 (pair["tgt_pts"], pair["tgt_seg"])):
                    ep, es = equalize_sampling(
                        pts, seg, SEMConfig(num_points=SEM_POINTS, seed=seed))
                    ep = ep[es != 0]
                    coords, _ = quantize_np(ep, 0.3)
                    n0 = len(coords)
                    if n0 > SEM_CAP:
                        pick = np.random.default_rng(seed).choice(
                            n0, SEM_CAP, replace=False)
                        coords = coords[pick]
                    counts.append(level_counts(coords))
                print(f"{rname:10s} seed={seed}: {counts[-2]} / {counts[-1]}",
                      flush=True)
    counts = np.asarray(counts)
    print("\nlevel |   cap  |   max  |  mean  | cap/max")
    for lv in range(5):
        mx, mean = counts[:, lv].max(), counts[:, lv].mean()
        print(f"  L{lv}  | {CAPS[lv]:6d} | {mx:6d} | {mean:7.0f} |"
              f" {CAPS[lv] / mx:5.2f}")


if __name__ == "__main__":
    main()
