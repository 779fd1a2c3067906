"""Train-time keypoint selection + paired UME generation.

Mask-native equivalent of the reference's generate_ume_from_keypoints2
(utils/loc_utils.py:86-188), the routine behind both the UME-contrastive
loss and the inlier-ratio eval. Selection filters, in order:

  1. non-flat semantic label (flat_labels, default [9]),
  2. PC-intersection: the GT-transformed point has a target point within
     nn_intersection_r (0.6 m) (loc_utils.py:97-102),
  3. dense neighborhood: >= min_nn in-radius source neighbors
     (loc_utils.py:119-120),

then the first num_samples survivors in DESCENDING point-index order (the
reference's descending sort of masked indices, loc_utils.py:107,124 —
deterministic, preserved exactly). Source-side UME matrices use capped
ball-query neighborhoods; target-side UMEs are built around the
GT-transformed keypoints on the target cloud. Neighborhoods are NOT
re-centered (the commented-out subtraction at loc_utils.py:151,168 — the
used variant relies on the estimator's translation handling).

Also returns matched_nn_intersection_ratio: per keypoint, the fraction of
its max_nn source-neighbor slots whose transformed position lies within
nn_intersection_r of one of the keypoint's target neighbors
(loc_utils.py:180-186; pad slots count against the ratio, as in the
reference where zero-padded rows rarely intersect).

Everything is fixed-shape: invalid keypoints carry a False mask instead of
being dropped, and downstream losses consume the mask.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from umeregrobust_tpu.core.transforms import apply_transform
from umeregrobust_tpu.core.ume import moment_matrix
from umeregrobust_tpu.ops.neighbors import ball_query, gather_padded

__all__ = ["TrainKeypoints", "generate_training_umes"]


class TrainKeypoints(NamedTuple):
    src_ume: jnp.ndarray  # (K, C, 4)
    tgt_ume: jnp.ndarray  # (K, C, 4)
    src_kpts: jnp.ndarray  # (K, 3)
    tgt_kpts: jnp.ndarray  # (K, 3) = GT-transformed src keypoints
    kp_mask: jnp.ndarray  # (K,) valid keypoint
    nn_intersection_ratio: jnp.ndarray  # (K,)
    # () bool: the 2x working-set truncation MAY have dropped selectable
    # candidates (working set full AND < num_samples survived density) —
    # the only regime where this differs from the reference's
    # evaluate-density-on-all-candidates selection. Logged as
    # `kp_truncated` by the trainer; 0 across an epoch == exact.
    approx_truncated: jnp.ndarray


@partial(
    jax.jit,
    static_argnames=("num_samples", "max_nn", "min_nn", "nn_r",
                     "nn_intersection_r", "flat_labels", "normalize"),
)
def generate_training_umes(
    src_pts: jnp.ndarray,
    src_seg: jnp.ndarray,
    src_feat: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_pts: jnp.ndarray,
    tgt_feat: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    gt_tform: jnp.ndarray,
    num_samples: int = 256,
    max_nn: int = 750,
    min_nn: int = 300,
    nn_r: float = 5.0,
    nn_intersection_r: float = 0.6,
    flat_labels: Tuple[int, ...] = (9,),
    normalize: bool = True,
) -> TrainKeypoints:
    """Single-pair version; vmap over the batch dimension for training."""
    N = src_pts.shape[0]

    # --- filters -----------------------------------------------------------
    non_flat = src_mask
    for fl in flat_labels:
        non_flat = non_flat & (src_seg != fl)

    src_tf = apply_transform(gt_tform, src_pts)
    inter_idx = ball_query(src_tf, tgt_pts, radius=nn_intersection_r, K=1,
                           q_mask=src_mask, p_mask=tgt_mask)
    intersects = inter_idx[:, 0] >= 0

    cand = non_flat & intersects

    # descending-index order, first num_samples candidates that also pass
    # the density filter. To know density we need neighbor counts for the
    # top candidates only; take the num_samples*2 highest-index candidates
    # as a working set (the reference evaluates density on every candidate
    # but then keeps only the first num_samples; a 2x working set makes the
    # truncation exact whenever <= half the working set fails density).
    work = min(2 * num_samples, N)
    idx_desc = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]
    score = jnp.where(cand, idx_desc, jnp.int32(-1))
    top_scores, top_idx = jax.lax.top_k(score, work)  # descending index
    work_valid = top_scores >= 0
    kpts = src_pts[top_idx]

    nbr_idx = ball_query(kpts, src_pts, radius=nn_r, K=max_nn,
                         q_mask=work_valid, p_mask=src_mask)
    nbr_count = jnp.sum((nbr_idx >= 0).astype(jnp.int32), axis=-1)
    dense = nbr_count >= min_nn
    keep = work_valid & dense

    # first num_samples kept, preserving descending-index order
    order_score = jnp.where(keep, jnp.arange(work, dtype=jnp.int32), work + 1)
    neg_top, sel = jax.lax.top_k(-order_score, num_samples)
    kp_mask = (-neg_top) <= work
    sel = jnp.where(kp_mask, sel, 0)

    kpts = kpts[sel]
    nbr_idx = jnp.where(kp_mask[:, None], nbr_idx[sel], -1)

    # --- source-side UME ----------------------------------------------------
    nn_pts = gather_padded(src_pts, nbr_idx)  # (K, max_nn, 3), pads zero
    nn_feat = gather_padded(src_feat, nbr_idx)
    src_ume = moment_matrix(nn_pts, nn_feat, normalize=normalize)

    # --- target-side UME around transformed keypoints -----------------------
    tgt_kpts = apply_transform(gt_tform, kpts)
    tnbr_idx = ball_query(tgt_kpts, tgt_pts, radius=nn_r, K=max_nn,
                          q_mask=kp_mask, p_mask=tgt_mask)
    tnn_pts = gather_padded(tgt_pts, tnbr_idx)
    tnn_feat = gather_padded(tgt_feat, tnbr_idx)
    tgt_ume = moment_matrix(tnn_pts, tnn_feat, normalize=normalize)

    # --- matched-NN intersection ratio --------------------------------------
    nn_pts_tf = apply_transform(gt_tform, nn_pts.reshape(-1, 3)).reshape(nn_pts.shape)

    def per_kp(a, b):
        # a: (max_nn, 3) transformed src nbrs; b: (max_nn, 3) tgt nbrs
        d2 = (
            jnp.sum(a * a, axis=-1)[:, None]
            + jnp.sum(b * b, axis=-1)[None, :]
            - 2.0 * jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
        )
        return jnp.mean((jnp.min(d2, axis=-1) <= nn_intersection_r ** 2)
                        .astype(jnp.float32))

    ratio = jax.lax.map(lambda ab: per_kp(*ab), (nn_pts_tf, tnn_pts))
    ratio = ratio * kp_mask

    src_ume = src_ume * kp_mask[:, None, None]
    tgt_ume = tgt_ume * kp_mask[:, None, None]
    # approximation signal: candidates beyond the working set existed AND
    # density rejections left fewer than num_samples survivors — only then
    # can the reference's full-candidate selection differ
    truncated = (jnp.sum(cand.astype(jnp.int32)) > work) & (
        jnp.sum(keep.astype(jnp.int32)) < num_samples)
    return TrainKeypoints(
        src_ume=src_ume, tgt_ume=tgt_ume,
        src_kpts=kpts * kp_mask[:, None], tgt_kpts=tgt_kpts * kp_mask[:, None],
        kp_mask=kp_mask, nn_intersection_ratio=ratio,
        approx_truncated=truncated)
