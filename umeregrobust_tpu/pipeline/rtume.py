"""RTUME keypoint layer: batched closed-form transforms around keypoints.

Functional equivalent of the reference's ume_kp_layer
(utils/loc_utils.py:357-431): ball-query neighborhoods around given
keypoints on both clouds, build m0-normalized UME matrices
(loc_utils.py:365-372), pair them diagonally or as a full n_kp x n_kp
grid, optionally aggregate random triplets (loc_utils.py:406-410), and run
the closed-form estimator per pair.

Uses the fused moment kernel (no neighbor materialization) instead of
ball_query + gather.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from umeregrobust_tpu.core.ume import estimate_rigid_from_ume
from umeregrobust_tpu.pipeline.ume_gen import ume_from_ball_query

__all__ = ["rtume_estimate"]


@partial(jax.jit,
         static_argnames=("ume_knn", "ume_desc_rad", "diag_only", "n_rand"))
def rtume_estimate(
    src_pts: jnp.ndarray,
    src_feat: jnp.ndarray,
    src_kp: jnp.ndarray,
    tgt_pts: jnp.ndarray,
    tgt_feat: jnp.ndarray,
    tgt_kp: jnp.ndarray,
    ume_knn: int = 750,
    ume_desc_rad: float = 5.0,
    diag_only: bool = True,
    n_rand: Optional[int] = None,
    key: Optional[jax.Array] = None,
    src_mask: Optional[jnp.ndarray] = None,
    tgt_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Estimate transforms from paired keypoint UMEs.

    Returns (T, D, G_kp, H_kp): diag_only -> T (n_kp, 4, 4), D (n_kp,);
    full grid -> T (n_kp, n_kp, 4, 4), D (n_kp, n_kp). With n_rand set
    (diag mode), G/H become sums over random keypoint triplets
    (loc_utils.py:406-410) and T/D have leading dim n_rand.
    """
    G_kp = ume_from_ball_query(src_pts, src_feat, src_kp,
                               radius=ume_desc_rad, max_nn=ume_knn,
                               p_mask=src_mask, normalize=True)
    H_kp = ume_from_ball_query(tgt_pts, tgt_feat, tgt_kp,
                               radius=ume_desc_rad, max_nn=ume_knn,
                               p_mask=tgt_mask, normalize=True)
    n_kp = G_kp.shape[0]

    if diag_only:
        G, H = G_kp, H_kp
        if n_rand is not None:
            if key is None:
                key = jax.random.PRNGKey(0)
            trip = jax.random.randint(key, (n_rand, 3), 0, n_kp)
            G = G_kp[trip[:, 0]] + G_kp[trip[:, 1]] + G_kp[trip[:, 2]]
            H = H_kp[trip[:, 0]] + H_kp[trip[:, 1]] + H_kp[trip[:, 2]]
        T, D = estimate_rigid_from_ume(G, H)
        return T, D, G_kp, H_kp

    # full grid: every source keypoint against every target keypoint
    d = G_kp.shape[1]
    G = jnp.broadcast_to(G_kp[:, None], (n_kp, n_kp, d, 4)).reshape(-1, d, 4)
    H = jnp.broadcast_to(H_kp[None, :], (n_kp, n_kp, d, 4)).reshape(-1, d, 4)
    T, D = estimate_rigid_from_ume(G, H)
    return (T.reshape(n_kp, n_kp, 4, 4), D.reshape(n_kp, n_kp), G_kp, H_kp)
