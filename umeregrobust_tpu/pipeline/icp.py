"""Jittable point-to-point ICP refinement.

TPU-native replacement for the reference's Open3D refinement stage
(evaluate.py:63-109: registration_icp with max_correspondence_distance=0.2,
TransformationEstimationPointToPoint, max_iteration=200). Correspondences
come from the grid-bucketed NN index (exact within the radius), the update
is the closed-form Umeyama/SVD solution, and the loop is a
``lax.while_loop`` with Open3D's convergence criteria (relative fitness and
relative rmse below 1e-6, same defaults as ICPConvergenceCriteria).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from umeregrobust_tpu.core.so3 import kabsch_rotation
from umeregrobust_tpu.core.transforms import make_transform
from umeregrobust_tpu.ops.densegrid import (
    DenseGrid, build_dense_grid, dense_nn_query)

__all__ = ["umeyama", "icp_point_to_point"]


def umeyama(
    p: jnp.ndarray, q: jnp.ndarray, w: jnp.ndarray
) -> jnp.ndarray:
    """Weighted closed-form rigid alignment: argmin_T sum w |T(p) - q|^2.

    p, q: (N, 3); w: (N,) nonnegative weights (0 for non-correspondences).
    Returns (4, 4).
    """
    return _umeyama_hp(p, q, w)


def _umeyama_hp(p, q, w):
    with jax.default_matmul_precision("highest"):
        wsum = jnp.maximum(jnp.sum(w), 1e-9)
        wn = (w / wsum)[:, None]
        cp = jnp.sum(p * wn, axis=0)
        cq = jnp.sum(q * wn, axis=0)
        pc = (p - cp) * wn
        qc = q - cq
        H = pc.T @ qc  # (3,3) = sum_i w_i p_i q_i^T
        # proper rotation min sum w |R p - q|^2; quaternion method instead
        # of jnp.linalg.svd (a single unbatched TPU SVD costs ~10 ms *per
        # ICP iteration*; the Jacobi solve is a few fused microkernels).
        # 3 sweeps: <= 0.13 deg deviation on ADVERSARIAL covariances
        # (tools/profile_kabsch.py validation) and effectively exact on
        # ICP's well-conditioned thousands-of-correspondences fits; the
        # update re-solves every iteration anyway.
        R = kabsch_rotation(H, sweeps=3)
        t = cq - R @ cp
        return make_transform(R, t)


@partial(jax.jit,
         static_argnames=("max_corr", "max_iter", "budget", "dims", "inner",
                          "cell", "disp_exit"))
def _icp_loop(src, src_mask, grid_arrays, init_T, max_corr, max_iter, budget,
              dims, inner=1, cell=None, disp_exit=1e-4):
    """inner > 1 enables candidate-set reuse: the per-iteration cost is the
    RANDOM candidate gather (9 windows x budget rows x #queries, ~3
    cycles/row on v5e — ~4 ms at 4096 queries / budget 32), while re-
    reading the same candidates densely is ~100x cheaper. Each outer step
    gathers once and runs `inner` Umeyama updates against the frozen
    candidate set (distances and the in-window argmin ARE recomputed from
    the moved source each sub-iteration, so correspondences still switch
    within the gathered windows; only candidates that MOVED INTO a window
    mid-block arrive one block late — immaterial at the millimetre motions
    of the stages this is used on). max_iter counts sub-iterations; exits
    land on block boundaries, so up to inner-1 extra cheap sub-iterations
    may run."""
    # cell: the grid's actual cell size — may exceed max_corr when the
    # caller indexed at a scaled cell (registration icp_grid_scale);
    # queries stay radius-bounded at max_corr either way.
    grid = DenseGrid(*grid_arrays, cell=max_corr if cell is None else cell,
                     dims=dims)
    r2 = jnp.float32(max_corr) ** 2

    def corr_and_update(T):
        src_t = jnp.matmul(src, T[:3, :3].T,
                           precision=jax.lax.Precision.HIGHEST) + T[:3, 3]
        dist, idx = dense_nn_query(grid, src_t, radius=max_corr,
                                   q_mask=src_mask, budget=budget)
        ok = (idx >= 0) & src_mask
        w = ok.astype(jnp.float32)
        q = grid.points[jnp.where(ok, idx, 0)]
        dT = umeyama(src_t, jnp.where(ok[:, None], q, src_t), w)
        n_ok = jnp.maximum(jnp.sum(w), 1.0)
        rmse = jnp.sqrt(jnp.sum(jnp.where(ok, dist * dist, 0.0)) / n_ok)
        fitness = jnp.sum(w) / jnp.maximum(jnp.sum(src_mask.astype(jnp.float32)), 1.0)
        return dT, rmse, fitness

    def corr_and_update_block(T):
        # one candidate gather, `inner` update steps against it
        from umeregrobust_tpu.ops.densegrid import dense_candidates

        src_t0 = jnp.matmul(src, T[:3, :3].T,
                            precision=jax.lax.Precision.HIGHEST) + T[:3, 3]
        cand = dense_candidates(grid, src_t0, budget=budget)  # (M, 9B, 3)

        def step(T_c, _):
            src_t = jnp.matmul(src, T_c[:3, :3].T,
                               precision=jax.lax.Precision.HIGHEST) + T_c[:3, 3]
            d2 = jnp.sum((src_t[:, None, :] - cand) ** 2, axis=-1)
            d2 = jnp.where(d2 <= r2, d2, jnp.float32(1e30))
            k = jnp.argmin(d2, axis=-1)
            bd2 = jnp.take_along_axis(d2, k[:, None], axis=-1)[:, 0]
            ok = (bd2 < 1e29) & src_mask
            q = jnp.take_along_axis(cand, k[:, None, None], axis=1)[:, 0, :]
            w = ok.astype(jnp.float32)
            dT = umeyama(src_t, jnp.where(ok[:, None], q, src_t), w)
            T_n = jnp.matmul(dT, T_c, precision=jax.lax.Precision.HIGHEST)
            return T_n, (bd2, ok)

        T_new, (bd2s, oks) = jax.lax.scan(step, T, None, length=inner)
        bd2, ok = bd2s[-1], oks[-1]
        w = ok.astype(jnp.float32)
        n_ok = jnp.maximum(jnp.sum(w), 1.0)
        rmse = jnp.sqrt(jnp.sum(jnp.where(ok, bd2, 0.0)) / n_ok)
        fitness = jnp.sum(w) / jnp.maximum(
            jnp.sum(src_mask.astype(jnp.float32)), 1.0)
        return T_new, rmse, fitness

    def body(state):
        T, prev_rmse, prev_fit, it, _ = state
        if inner == 1:
            dT, rmse, fit = corr_and_update(T)
            T_new = jnp.matmul(dT, T,
                               precision=jax.lax.Precision.HIGHEST)
        else:
            T_new, rmse, fit = corr_and_update_block(T)
        # Open3D's criteria are 1e-6 relative in fp64; in fp32 the rmse
        # jitters around ~1e-6 relative, so a literal port never fires and
        # the loop always burns max_iter. 1e-5 relative + a tiny absolute
        # floor matches Open3D's stopping behavior in practice.
        converged = (
            (jnp.abs(prev_fit - fit) <= 1e-5 * jnp.maximum(prev_fit, 1e-12))
            & (jnp.abs(prev_rmse - rmse)
               <= jnp.maximum(1e-5 * prev_rmse, 1e-5 * max_corr))
        )
        # Displacement-based exit: when this iteration moved the cloud by
        # <0.1 mm RMS the remaining motion is geometrically negligible
        # (deltas contract; the tail sums to well under the 1°/0.1 m strict
        # threshold). The rmse/fitness chatter criterion above misses this
        # fixed point when correspondences limit-cycle between equivalent
        # sets — measured 60 full iterations from realistic starts
        # (round-2 PROFILE: 25-30 ms of the ~157 ms pair budget).
        src_new = jnp.matmul(src, T_new[:3, :3].T,
                             precision=jax.lax.Precision.HIGHEST) + T_new[:3, 3]
        src_old = jnp.matmul(src, T[:3, :3].T,
                             precision=jax.lax.Precision.HIGHEST) + T[:3, 3]
        m = src_mask.astype(jnp.float32)
        n_m = jnp.maximum(jnp.sum(m), 1.0)
        disp2 = jnp.sum(jnp.sum((src_new - src_old) ** 2, axis=-1) * m) / n_m
        # disp_exit: RMS block displacement below which the remaining
        # motion is geometrically negligible (RegistrationConfig.
        # icp_disp_exit; iteration-accounting A/B in BENCH_NOTES_r5)
        converged = converged | (disp2 <= jnp.float32(disp_exit) ** 2)
        return T_new, rmse, fit, it + inner, converged

    def cond(state):
        _, _, _, it, converged = state
        return (it < max_iter) & ~converged

    T0 = init_T.astype(jnp.float32)
    state = (T0, jnp.float32(1e30), jnp.float32(0.0), jnp.int32(0), jnp.bool_(False))
    T, rmse, fit, it, _ = jax.lax.while_loop(cond, body, state)
    return T, rmse, fit, it


def icp_point_to_point(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    init_T: jnp.ndarray,
    max_corr: float = 0.2,
    max_iter: int = 200,
    src_mask: jnp.ndarray | None = None,
    tgt_mask: jnp.ndarray | None = None,
    budget: int = 8,
    dims: Tuple[int, int, int] | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Refine init_T with point-to-point ICP. Returns (T, rmse, fitness).

    budget caps candidates per grid cell; at ICP scales (<= 0.4 m cells on
    >= 0.3 m-voxelized clouds) cells hold a handful of points, so 8 is
    lossless in practice and 4x cheaper than a conservative 32.
    """
    from umeregrobust_tpu.ops.densegrid import DEFAULT_DIMS

    if src_mask is None:
        src_mask = jnp.ones((src.shape[0],), bool)
    if tgt_mask is None:
        tgt_mask = jnp.ones((tgt.shape[0],), bool)
    if dims is None:
        dims = DEFAULT_DIMS
    grid = build_dense_grid(tgt, tgt_mask, cell=max_corr, dims=dims)
    arrays = (grid.points, grid.points_sorted, grid.order, grid.runs,
              grid.origin, grid.overflow, grid.wstart)
    T, rmse, fit, _ = _icp_loop(src, src_mask, arrays, init_T,
                                float(max_corr), int(max_iter), int(budget),
                                tuple(dims))
    return T, rmse, fit
