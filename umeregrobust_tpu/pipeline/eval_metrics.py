"""Validation-time inlier-ratio metric.

Equivalent of reference utils/eval_utils.py:8-57 (calc_inliear_ratio):
select training keypoints, build UME matrices on both sides, drop
rank-deficient ones, Hungarian-match by subspace distance, and report the
fraction of matches whose GT reprojection error is <= inlier_thr.
The Hungarian step runs host-side (as in the reference, which is the one
place the assignment solver IS used — eval_utils.py:44).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from umeregrobust_tpu.core.transforms import apply_transform
from umeregrobust_tpu.core.ume import ume_pairwise_distance, ume_validity_mask
from umeregrobust_tpu.pipeline.matching import hungarian_match
from umeregrobust_tpu.pipeline.train_keypoints import generate_training_umes

__all__ = ["calc_inlier_ratio"]


def calc_inlier_ratio(
    src_pts, src_seg, src_feat, src_mask,
    tgt_pts, tgt_feat, tgt_mask,
    gt_tform,
    ume_r_nn: float = 5.0,
    ume_max_nn: int = 750,
    ume_min_nn: int = 300,
    eval_num_kpts: int = 1000,
    inlier_thr: float = 0.6,
    nn_inter_thr: float = 0.6,
    svd_thr: float = 1e-5,
) -> float:
    kp = generate_training_umes(
        src_pts, src_seg, src_feat, src_mask, tgt_pts, tgt_feat, tgt_mask,
        gt_tform, num_samples=eval_num_kpts, max_nn=ume_max_nn,
        min_nn=ume_min_nn, nn_r=ume_r_nn, nn_intersection_r=nn_inter_thr,
        flat_labels=(), normalize=False)
    valid = (
        kp.kp_mask
        & ume_validity_mask(kp.src_ume, svd_thr)
        & ume_validity_mask(kp.tgt_ume, svd_thr)
    )
    v = np.asarray(valid)
    if v.sum() < 2:
        return 0.0
    su = np.asarray(kp.src_ume)[v]
    tu = np.asarray(kp.tgt_ume)[v]
    D = np.asarray(ume_pairwise_distance(jnp.asarray(su), jnp.asarray(tu)))
    m = hungarian_match(D)
    src_kp = np.asarray(kp.src_kpts)[v][m[:, 0]]
    tgt_kp = np.asarray(kp.tgt_kpts)[v][m[:, 1]]
    src_tf = np.asarray(apply_transform(gt_tform, jnp.asarray(src_kp)))
    reproj = np.linalg.norm(tgt_kp - src_tf, axis=-1)
    return float((reproj <= inlier_thr).mean())
