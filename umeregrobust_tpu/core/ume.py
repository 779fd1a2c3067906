"""Universal Manifold Embedding (UME) core.

Per-keypoint d x 4 moment matrices F = [m0 | F^T X] whose column space is
invariant to rigid transforms; matching by subspace distance; closed-form
recovery of the rigid transform from a matched pair of UME matrices.

Functional parity targets (math re-derived, not translated):
- moment matrix construction: reference utils/loc_utils.py:18-83 (variant 1),
  :86-188 (variant 2, the one used in training), evaluate.py:50-60 (eval
  variant), utils/loc_utils.py:365-372 (ume_kp_layer.ume_mat).
- subspace distance: reference utils/loc_utils.py:8-15 (ume_cdist).
- closed-form estimator: reference utils/loc_utils.py:292-350
  (batch_estimate_transform_ume_old), including the sign-corrected SVD and
  the 0.707 * Frobenius projection distance.

TPU notes: the pairwise subspace distance is written as
|P1|^2 + |P2|^2 - 2 <P1, P2> so the cross term is a single (M, d^2) x
(d^2, N) matmul on the MXU instead of an O(M*N*d^2) broadcast subtraction.
QR/SVD run on small (d,4) / (3,3) blocks under vmap in fp32.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from umeregrobust_tpu.core.so3 import gram_schmidt, kabsch_rotation

__all__ = [
    "moment_matrix",
    "orthonormalize",
    "subspace_projection",
    "projection_packed",
    "ume_pairwise_distance",
    "ume_distance",
    "estimate_rigid_from_ume",
    "ume_validity_mask",
]


def moment_matrix(
    nn_pts: jnp.ndarray,
    nn_feat: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    normalize: bool = False,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Build UME moment matrices F = [F0 | F1] from padded neighborhoods.

    Args:
      nn_pts:  (..., K, 3) neighbor coordinates (zero rows where padded).
      nn_feat: (..., K, C) neighbor features (zero rows where padded).
      mask:    optional (..., K) validity mask; if given, padded rows of both
               inputs are zeroed before accumulation (equivalent to the
               reference's zero-row gather for -1 ball-query pads,
               utils/loc_utils.py:59-61, evaluate.py:52-55).
      normalize: divide by the total feature mass sum(F0) + eps — the scalar
               per-keypoint normalization shared by evaluate.py:59 and
               ume_kp_layer (utils/loc_utils.py:370).

    Returns:
      (..., C, 4) moment matrices, fp32.
    """
    nn_pts = nn_pts.astype(jnp.float32)
    nn_feat = nn_feat.astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)[..., None]
        nn_pts = nn_pts * m
        nn_feat = nn_feat * m
    ftr = jnp.swapaxes(nn_feat, -1, -2)  # (..., C, K)
    F1 = jnp.matmul(ftr, nn_pts, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)  # (..., C, 3)
    F0 = jnp.sum(ftr, axis=-1, keepdims=True)  # (..., C, 1)
    F = jnp.concatenate([F0, F1], axis=-1)  # (..., C, 4)
    if normalize:
        total = jnp.sum(F0, axis=-2, keepdims=True)  # (..., 1, 1)
        F = F / (total + eps)
    return F


def orthonormalize(F: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal basis of (..., d, 4) UME matrix columns.

    Modified Gram-Schmidt (core/so3.py) instead of batched jnp.linalg.qr:
    only the column SPACE feeds the projection/distance math, and
    LAPACK-shaped QR lowers to scalar loops on TPU (~30 ms for 2048
    matrices where MGS costs ~1 ms)."""
    return gram_schmidt(F.astype(jnp.float32))


def subspace_projection(F: jnp.ndarray) -> jnp.ndarray:
    """Projection matrix P = Q Q^T onto the column space of F. (..., d, d)."""
    Q = orthonormalize(F)
    return jnp.matmul(Q, jnp.swapaxes(Q, -1, -2),
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


def projection_packed(F: jnp.ndarray) -> jnp.ndarray:
    """Symmetric-packed projection vector with EXACT inner products.

    P = Q Q^T is symmetric, so the d^2 flattening used for the pairwise-
    distance cross matmul carries every off-diagonal entry twice. Packing
    p = [diag(P) | sqrt(2) * offdiag(P)] keeps <p_i, p_j> == <P_i, P_j>
    bit-for-bit up to fp rounding while shrinking the contraction dim
    d^2 -> d(d+1)/2 (1024 -> 528 at d=32) — the matching cross matmul
    (pipeline/matching.argmin_match) does ~half the MXU work for the
    same distances.
    """
    P = subspace_projection(F)
    d = P.shape[-1]
    iu0, iu1 = jnp.triu_indices(d, k=1)
    ar = jnp.arange(d)
    diag = P[..., ar, ar]
    off = P[..., iu0, iu1] * jnp.sqrt(jnp.float32(2.0))
    return jnp.concatenate([diag, off], axis=-1)


def ume_pairwise_distance(
    ume1: jnp.ndarray, ume2: jnp.ndarray
) -> jnp.ndarray:
    """Pairwise subspace distance D[i, j] = |P1_i - P2_j|_F / sqrt(2).

    Parity: reference utils/loc_utils.py:8-15 (ume_cdist), minus the batch
    dim (vmap for batching). ume1: (M, d, 4), ume2: (N, d, 4) -> (M, N).
    """
    P1 = projection_packed(ume1)  # (M, d(d+1)/2), exact inner products
    P2 = projection_packed(ume2)
    sq1 = jnp.sum(P1 * P1, axis=-1)  # (M,)
    sq2 = jnp.sum(P2 * P2, axis=-1)  # (N,)
    cross = jnp.matmul(P1, P2.T, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)  # (M, N)
    d2 = jnp.maximum(sq1[:, None] + sq2[None, :] - 2.0 * cross, 0.0)
    return jnp.sqrt(d2) / jnp.sqrt(2.0)


def ume_distance(ume1: jnp.ndarray, ume2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise (matched-pair) subspace distance over leading batch dims."""
    P1 = subspace_projection(ume1)
    P2 = subspace_projection(ume2)
    diff = P1 - P2
    return jnp.sqrt(jnp.sum(diff * diff, axis=(-2, -1))) / jnp.sqrt(2.0)


def estimate_rigid_from_ume(
    G: jnp.ndarray, H: jnp.ndarray, compute_distance: bool = True,
    sweeps: int = 6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form rigid transform from matched UME pairs.

    Call convention mirrors the reference exactly
    (utils/loc_utils.py:292-350): the eval pipeline passes
    G = UME(source), H = UME(target) and interprets the returned T as the
    source -> target transform (evaluate.py:247-257).

    Args:
      G, H: (B, d, 4) matched UME matrices.

    Returns:
      T: (B, 4, 4) rigid transforms.
      D: (B,) matched subspace distances (0.707 * |P_H - P_G|_F).

    sweeps: Jacobi sweeps of the quaternion eigensolver. 6 is exact to
    fp32; 3 deviates <= 0.13 deg even on adversarial covariances
    (tools/profile_kabsch.py validation) at ~half the cost — the
    hypothesis path (2048-batch, ~7.6 ms at 6 sweeps on v5e) uses 3, the
    training losses keep 6.
    """
    G = G.astype(jnp.float32)
    H = H.astype(jnp.float32)
    mg = G[..., :, 0:1]  # (B, d, 1) weight vector of G
    mh = H[..., :, 0:1]
    g = G[..., :, 1:]  # (B, d, 3) first-order moments
    h = H[..., :, 1:]

    mg_sq = jnp.sum(mg * mg, axis=-2, keepdims=True) + 1e-16  # (B,1,1)
    mg_mh = jnp.sum(mg * mh, axis=-2, keepdims=True)
    gmg = jnp.sum(g * mg, axis=-2, keepdims=True)  # (B,1,3)
    hmg = jnp.sum(h * mg, axis=-2, keepdims=True)

    wlc = gmg / (mg_sq + 1e-16)  # (B,1,3)
    wrc = hmg / (mg_mh + 1e-16)

    left = g - wlc * mg  # (B,d,3) centered first moments
    right = h - wrc * mh

    # H = sum_d left_d right_d^T: the proper rotation min |R g - h| is the
    # reference's sign-corrected SVD solution (utils/loc_utils.py:321-330),
    # computed by the quaternion method (core/so3.py) — batched jnp.linalg.svd
    # lowers to scalar loops on TPU.
    Hcov = jnp.matmul(jnp.swapaxes(left, -1, -2), right,
                      precision=jax.lax.Precision.HIGHEST)  # (B,3,3)
    R = kabsch_rotation(Hcov, sweeps=sweeps)  # (B,3,3), src->tgt moments
    with jax.default_matmul_precision("highest"):
        b2 = wrc - wlc @ jnp.swapaxes(R, -1, -2)  # (B,1,3) translation row

    if compute_distance:
        D = ume_distance(H, G)  # 0.707 * |P_H - P_G|_F (sqrt(2)/2 == 0.707)
    else:
        # the eval pipeline never reads D (matching already filtered by it);
        # skipping saves two batched QRs + projection products per call
        D = jnp.zeros(G.shape[:-2], jnp.float32)

    T = jnp.zeros(G.shape[:-2] + (4, 4), dtype=jnp.float32)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(b2[..., 0, :])
    T = T.at[..., 3, 3].set(1.0)
    return T, D


def ume_validity_mask(F: jnp.ndarray, svd_thr: float = 1e-5) -> jnp.ndarray:
    """Full-rank check: all 4 singular values above threshold.

    Parity: reference loss.py:83-97 / utils/eval_utils.py:30-38
    (torch.linalg.svdvals(F) > svd_thr summed == 4).
    """
    s = jnp.linalg.svd(F.astype(jnp.float32), compute_uv=False)
    return jnp.sum(s > svd_thr, axis=-1) == 4
