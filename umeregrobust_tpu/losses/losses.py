"""Training losses: pointwise InfoNCE, UME-contrastive, cube-registration.

Mask-native re-derivations of reference loss.py:
- pointwise_infonce      <- MyInfoNCELossNoSeg (loss.py:10-46)
- ume_contrastive_loss   <- UMEContrastiveLoss (loss.py:49-118)
- cube_registration_loss <- CubeRegistrationLoss (loss.py:121-190)

All are pure functions over a single pair (vmap over the batch) and return
scalars plus any side outputs the training loop logs. The fixed-shape
discipline replaces the reference's boolean indexing: invalid keypoints
(deficient-rank UME, loss.py:83-97) are excluded by masks rather than
dropped, with identical normalization semantics.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from umeregrobust_tpu.core.transforms import relative_rotation_error
from umeregrobust_tpu.core.ume import (
    estimate_rigid_from_ume,
    subspace_projection,
    ume_validity_mask,
)

__all__ = [
    "pointwise_infonce",
    "ume_contrastive_loss",
    "cube_registration_loss",
    "CUBE_CORNERS",
]


def pointwise_infonce(
    src_feat: jnp.ndarray,
    src_pts: jnp.ndarray,
    tgt_feat: jnp.ndarray,
    matches: jnp.ndarray,
    match_mask: jnp.ndarray,
    tau: float = 0.1,
    neg_euclid_dist: float = 5.0,
) -> jnp.ndarray:
    """InfoNCE over GT matches.

    Anchors = matched source features; positives = their matched target
    features; negatives = other positives whose anchor lies > 5 m away
    (loss.py:33-36, the spatial negative mask). matches: (M, 2) int32
    [src_idx, tgt_idx], match_mask: (M,).
    """
    anchor = src_feat[matches[:, 0]]  # (M, C)
    anchor_pts = src_pts[matches[:, 0]]
    pos = tgt_feat[matches[:, 1]]

    def _norm(x):
        # rsqrt(sum^2 + eps) rather than /(norm + eps): linalg.norm's jax
        # gradient is NaN at an exactly-zero row (padded gathers produce
        # those); F.normalize in the reference (loss.py:23) is finite there
        return x * jax.lax.rsqrt(
            jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)

    d_pos = jnp.sum(_norm(anchor) * _norm(pos), axis=-1, keepdims=True)  # (M,1)
    D = jnp.matmul(anchor, pos.T, preferred_element_type=jnp.float32)  # (M,M)
    D_cat = jnp.concatenate([d_pos, D], axis=1)  # (M, M+1)

    d_euc2 = (
        jnp.sum(anchor_pts**2, -1)[:, None]
        + jnp.sum(anchor_pts**2, -1)[None, :]
        - 2 * jnp.matmul(anchor_pts, anchor_pts.T,
                         precision=jax.lax.Precision.HIGHEST)
    )
    far = d_euc2 > neg_euclid_dist**2
    valid_col = match_mask[None, :]
    neg_mask = jnp.concatenate(
        [jnp.ones_like(match_mask[:, None]), far & valid_col], axis=1
    ).astype(jnp.float32)

    denom = jnp.sum(jnp.exp(D_cat / tau) * neg_mask, axis=-1)
    loss = -jnp.log(jnp.exp(d_pos[:, 0] / tau) / (denom + 1e-12) + 1e-12)
    m = match_mask.astype(jnp.float32)
    return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m), 1.0)


def ume_contrastive_loss(
    src_ume: jnp.ndarray,
    tgt_ume: jnp.ndarray,
    kp_mask: jnp.ndarray,
    tau: float = 0.1,
    tau_neg: float = 0.1,
    svd_thr: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Contrastive CE over UME subspace similarities.

    sim = (sqrt(r) - 2 D) / sqrt(r) with r = 4 (loss.py:99-101); positives
    on the diagonal get temperature tau, negatives tau_neg (loss.py:104-110);
    keypoints whose UME (either side) is rank-deficient are masked out
    (loss.py:83-97). Returns (scalar loss, effective keypoint mask).
    """
    valid = (
        kp_mask
        & ume_validity_mask(src_ume, svd_thr)
        & ume_validity_mask(tgt_ume, svd_thr)
    )
    P1 = subspace_projection(src_ume).reshape(src_ume.shape[0], -1)
    P2 = subspace_projection(tgt_ume).reshape(tgt_ume.shape[0], -1)
    d2 = jnp.maximum(
        jnp.sum(P1 * P1, -1)[:, None]
        + jnp.sum(P2 * P2, -1)[None, :]
        - 2 * jnp.matmul(P1, P2.T, precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32),
        0.0,
    )
    # +eps under the sqrt: jnp's sqrt has an infinite gradient at 0 and
    # positives approach d2 == 0 as training converges; torch.norm (the
    # reference, loss.py:99) defines the 0-gradient as 0, so the guard IS
    # the parity behavior (values shift by < 1e-6)
    D = jnp.sqrt(d2 + 1e-12) / jnp.sqrt(2.0)
    r = jnp.sqrt(jnp.float32(src_ume.shape[-1]))
    sim = (r - 2.0 * D) / r

    K = sim.shape[0]
    eye = jnp.eye(K, dtype=bool)
    tau_mat = jnp.where(eye, tau, tau_neg)
    logits = sim / tau_mat
    col_ok = valid[None, :]
    logits = jnp.where(col_ok, logits, -jnp.inf)
    logZ = jax.nn.logsumexp(logits, axis=-1)
    diag = jnp.diagonal(logits)
    ce = -(diag - logZ)
    m = valid.astype(jnp.float32)
    loss = jnp.sum(jnp.where(valid, ce, 0.0)) / jnp.maximum(jnp.sum(m), 1.0)
    return loss, valid


CUBE_CORNERS = np.array(
    [
        [-1, 1, 1], [1, 1, 1], [-1, -1, 1], [1, -1, 1],
        [-1, 1, -1], [1, 1, -1], [-1, -1, -1], [1, -1, -1],
    ],
    dtype=np.float32,
)


def cube_registration_loss(
    src_ume: jnp.ndarray,
    tgt_ume: jnp.ndarray,
    kp_mask: jnp.ndarray,
    gt_tform: jnp.ndarray,
    nn_intersection_ratio: jnp.ndarray,
    cube_scale: float = 30.0,
    nn_inter_ratio_thr: float = 0.75,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closed-form transform per keypoint, L2 of the transformed cube
    corners vs GT, averaged over keypoints with intersection ratio >= thr
    (median fallback when none qualify, loss.py:171-178).

    Returns (loss, rre (K,), rte (K,)).
    """
    K = src_ume.shape[0]
    T, _ = estimate_rigid_from_ume(src_ume, tgt_ume)  # (K,4,4)
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    R_gt = gt_tform[:3, :3]
    t_gt = gt_tform[:3, 3]

    cube = jnp.asarray(CUBE_CORNERS) * cube_scale  # (8,3)
    est = cube[None] @ jnp.swapaxes(R, -1, -2) + t[:, None, :]  # (K,8,3)
    gt = cube @ R_gt.T + t_gt  # (8,3)
    # sqrt(.. + eps) instead of linalg.norm: the norm's jax gradient is
    # NaN at 0 and est -> gt exactly as the model improves (torch.norm
    # returns a 0 gradient there — reference train_coloring.py loss path)
    per_kp = jnp.mean(jnp.sqrt(
        jnp.sum((gt[None] - est) ** 2, axis=-1) + 1e-12), axis=-1)  # (K,)

    ratio = jnp.where(kp_mask, nn_intersection_ratio, -1.0)
    cond = (ratio >= nn_inter_ratio_thr) & kp_mask
    # median fallback over valid keypoints
    med = jnp.nanmedian(jnp.where(kp_mask, ratio, jnp.nan))
    med = jnp.nan_to_num(med, nan=0.0)
    fallback = (ratio >= med) & kp_mask
    use = jnp.where(jnp.any(cond), cond, fallback)
    w = use.astype(jnp.float32)
    loss = jnp.sum(per_kp * w) / jnp.maximum(jnp.sum(w), 1.0)

    rre = relative_rotation_error(
        jnp.broadcast_to(R_gt, R.shape), R)
    rte = jnp.linalg.norm(t - t_gt[None], axis=-1)
    return loss, rre, rte
