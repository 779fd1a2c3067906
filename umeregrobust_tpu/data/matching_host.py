"""Host-side correspondence generation for dataset preprocessing.

Equivalents of the reference's KDTree match utilities
(utils/general_utils.py:38-59): one-sided and mutual nearest-neighbor
matches under the GT transform, used to label training pairs. These run in
the input pipeline on CPU through the native grid-hash NN
(umeregrobust_tpu/native, C++), with a scipy fallback inside it.
"""
from __future__ import annotations

import numpy as np

from umeregrobust_tpu import native

__all__ = ["one_side_matches", "mutual_matches"]


def one_side_matches(
    src_pts: np.ndarray,
    tgt_pts: np.ndarray,
    tform: np.ndarray,
    radius: float,
) -> np.ndarray:
    """(K, 2) [src_idx, tgt_idx] where the transformed source point's 1-NN
    in the target is within `radius` (utils/general_utils.py:38-44)."""
    src_tf = (src_pts @ tform[:3, :3].T + tform[:3, 3]).astype(np.float32)
    idx, dist = native.nn_radius(src_tf, tgt_pts, radius)
    # reference uses a strict < comparison (general_utils.py:42)
    ok = (idx >= 0) & (dist < radius)
    return np.stack([np.nonzero(ok)[0], idx[ok]], axis=1).astype(np.int64)


def mutual_matches(
    src_pts: np.ndarray,
    tgt_pts: np.ndarray,
    tform: np.ndarray,
    radius: float,
) -> np.ndarray:
    """Mutually-nearest matches (utils/general_utils.py:47-59): a pair
    (i, j) survives iff j is i's forward match and i is j's backward match.
    Vectorized (the reference loops in Python)."""
    fwd = one_side_matches(src_pts, tgt_pts, tform, radius)
    inv = np.linalg.inv(tform)
    bwd = one_side_matches(tgt_pts, src_pts, inv, radius)
    back = np.full(len(tgt_pts), -1, dtype=np.int64)
    back[bwd[:, 0]] = bwd[:, 1]
    ok = back[fwd[:, 1]] == fwd[:, 0]
    return fwd[ok]
