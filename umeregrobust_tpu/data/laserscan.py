"""Minimal LiDAR scan readers for semantic-KITTI-format data.

Replaces the reference's LaserScan/SemLaserScan classes
(datasets/kitti/kitti_dataset.py:21-294) with the two things the pipeline
actually consumes: xyz points from .bin scans and semantic labels from
.label files (low 16 bits; the reference asserts the high bits are
instance ids, kitti_dataset.py:253-270). Range-image projection code in
the reference is dead weight for registration and is intentionally absent.
"""
from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

__all__ = [
    "read_kitti_scan",
    "read_kitti_label",
    "load_semantic_kitti_pair_frame",
    "SEMANTIC_KITTI_LEARNING_MAP",
    "apply_learning_map",
]

# Standard semantic-KITTI label -> train-id learning map (34 raw classes ->
# 20; same mapping shipped in the reference's datasets/kitti/
# kitti_config.yaml:30-71). 9 is "road"-like flat ground in train-id space
# only insofar as the reference treats train-id 9 as the flat label for
# keypoint exclusion (utils/loc_utils.py:19 flat_labels=[9]).
SEMANTIC_KITTI_LEARNING_MAP: Dict[int, int] = {
    0: 0, 1: 0, 10: 1, 11: 2, 13: 5, 15: 3, 16: 5, 18: 4, 20: 5, 30: 6,
    31: 7, 32: 8, 40: 9, 44: 10, 48: 11, 49: 12, 50: 13, 51: 14, 52: 0,
    60: 9, 70: 15, 71: 16, 72: 17, 80: 18, 81: 19, 99: 0, 252: 1, 253: 7,
    254: 6, 255: 8, 256: 5, 257: 5, 258: 4, 259: 5,
}

_LUT = np.zeros(260, dtype=np.int32)
for k, v in SEMANTIC_KITTI_LEARNING_MAP.items():
    _LUT[k] = v


def apply_learning_map(raw_labels: np.ndarray) -> np.ndarray:
    """Map raw semantic-KITTI labels to the 20-class train-id space."""
    return _LUT[np.clip(raw_labels, 0, len(_LUT) - 1)]


def read_kitti_scan(path: str) -> np.ndarray:
    """Read a KITTI velodyne .bin -> (N, 3) float32 xyz (drops remission)."""
    raw = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    return raw[:, :3].copy()


def read_kitti_label(path: str) -> np.ndarray:
    """Read a .label file -> (N,) int32 raw semantic labels (low 16 bits)."""
    raw = np.fromfile(path, dtype=np.uint32)
    return (raw & 0xFFFF).astype(np.int32)


def load_semantic_kitti_pair_frame(
    base_path: str, seq_id: int, frame_id: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Points + learning-mapped labels for one frame (reference
    load_semantic_kitti_point_cloud, kitti_dataset.py:300-314)."""
    velo = os.path.join(base_path, f"{seq_id:02d}", "velodyne", f"{frame_id:06d}.bin")
    label = os.path.join(base_path, f"{seq_id:02d}", "labels", f"{frame_id:06d}.label")
    pts = read_kitti_scan(velo)
    seg = apply_learning_map(read_kitti_label(label))
    return pts, seg
