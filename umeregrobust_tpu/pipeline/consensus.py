"""Match-consensus hypothesis rescue (RANSAC-style voting + inlier refit).

Each closed-form hypothesis T_h is estimated from ONE matched UME pair
(reference evaluate.py:247-257), so its translation error is bounded by
that single neighborhood's moment noise — diagnosed at 0.5-1.6 m on the
hardened verylow regime, outside the SP threshold and at the edge of
ICP's basin. But the MATCH SET itself holds more information: on every
diagnosed verylow pair, 33-80 of 2048 matches are correct (within 2 m of
GT), and they all vote for the same SE(3) mode. This module exploits
that:

  1. vote: votes[h] = #{matched pairs (s_i, t_i): |T_h s_i - t_i| < tau}
     — one (H, n) distance matrix off a batched matmul, MXU-friendly;
  2. NMS-select the top-V vote modes (suppressing hypotheses whose
     rotation AND translation are near an already-selected one, so the
     V candidates are distinct basins, not V copies of the strongest);
  3. IRLS-refit each candidate over its voters (Cauchy-weighted Umeyama
     with a shrinking sigma schedule) — a ~50-inlier least-squares fit
     is several times tighter than any single-match UME estimate.

The refit candidates are handed to the exact correlator stage as EXTRA
rows (pipeline/correlator.select_best_transform extra_Ts), where the
kernel-correlation score arbitrates between the cascade winner and the
consensus modes: a correctly-refit mode aligns tightly and outscores
wrong-basin modes at full resolution (kernel correlation is sharp near
the optimum — its verylow failures are a TRIAGE-band problem, not an
exact-score one).

Voting/NMS/refit diagnostics: tools/diag_consensus.py.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from umeregrobust_tpu.core.so3 import kabsch_rotation

__all__ = ["consensus_refit", "polish_candidates", "compact_structure"]


def _pair_distances(Ts: jnp.ndarray, s_kp: jnp.ndarray,
                    t_kp: jnp.ndarray) -> jnp.ndarray:
    """(V, n) Euclidean distances |T_v s_i - t_i|.

    One (V, 17) @ (17, n) MXU matmul instead of materializing the
    (V, n, 3) transformed-point tensor (50 MB at 2048x2048 — the einsum
    form was bandwidth-bound, ~3.2 ms vs sub-ms for the matmul):

      |R s + t - q|^2 = (|s|^2 + |q|^2) + |t|^2 + 2 s.(R^T t)
                        - 2 vec(R).vec(q s^T) - 2 t.q

    grouped as A_v . B_i with A from (R_v, t_v) and B from (s_i, q_i).
    fp32 cancellation headroom: terms are O(|s||q|) ~ 2.5e3 in bench
    scenes, so d^2 carries ~3e-4 absolute error — negligible against the
    vote threshold (tau = 2.0) and the IRLS sigmas (>= 0.25).
    """
    R = Ts[:, :3, :3].astype(jnp.float32)
    t = Ts[:, :3, 3].astype(jnp.float32)
    u = jnp.einsum("vji,vj->vi", R, t)  # R^T t, (V, 3)
    A = jnp.concatenate([
        jnp.sum(t * t, axis=-1, keepdims=True),  # |t|^2
        2.0 * u,
        -2.0 * R.reshape(-1, 9),
        -2.0 * t,
        jnp.ones((Ts.shape[0], 1), jnp.float32),
    ], axis=1)  # (V, 17)
    outer = t_kp[:, :, None] * s_kp[:, None, :]  # (n, 3, 3) = q s^T
    B = jnp.concatenate([
        jnp.ones((s_kp.shape[0], 1), jnp.float32),
        s_kp,
        outer.reshape(-1, 9),
        t_kp,
        (jnp.sum(s_kp * s_kp, axis=-1)
         + jnp.sum(t_kp * t_kp, axis=-1))[:, None],
    ], axis=1)  # (n, 17)
    d2 = jnp.matmul(A, B.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def consensus_refit(
    Ts: jnp.ndarray,  # (H, 4, 4) hypotheses (one per match)
    s_kp: jnp.ndarray,  # (H, 3) source keypoint of match h
    t_kp: jnp.ndarray,  # (H, 3) matched target keypoint
    pair_ok: jnp.ndarray,  # (H,) valid-match flag
    tau: float = 2.0,
    n_cand: int = 16,
    nms_rot_deg: float = 15.0,
    nms_trans: float = 5.0,
    refit_sigmas: Tuple[float, ...] = (1.0, 0.5, 0.25),
) -> jnp.ndarray:
    """Top-`n_cand` vote modes, inlier-refit. Returns (n_cand, 4, 4).

    Degenerate modes (vote mass ~0 — e.g. every pair invalid) return the
    unrefit originals; callers feed the output through exact correlator
    scoring, which is total on any rigid transform.
    """
    H = Ts.shape[0]
    okf = pair_ok.astype(jnp.float32)

    dist = _pair_distances(Ts, s_kp, t_kp)  # (H, n)
    votes = jnp.sum((dist < tau) & pair_ok[None], axis=1).astype(jnp.int32)

    # --- NMS over vote modes -------------------------------------------
    R = Ts[:, :3, :3]
    t = Ts[:, :3, 3]
    cos_lim = jnp.cos(jnp.deg2rad(jnp.float32(nms_rot_deg)))

    def pick(carry, _):
        v = carry
        j = jnp.argmax(v)
        Rj = R[j]
        tj = t[j]
        # trace(R_h R_j^T) via elementwise product (no (H,3,3) matmul)
        tr_rel = jnp.sum(R * Rj[None], axis=(-2, -1))
        cos_a = (tr_rel - 1.0) * 0.5
        near = (cos_a > cos_lim) & (
            jnp.linalg.norm(t - tj[None], axis=-1) < nms_trans)
        return jnp.where(near, jnp.int32(-1), v), j

    votes_live = jnp.where(votes >= 0, votes, 0)  # int32, -1 = suppressed
    _, sel = jax.lax.scan(pick, votes_live, None, length=n_cand)
    cand = Ts[sel]  # (V, 4, 4)

    # --- IRLS refit over voters -----------------------------------------
    for sigma in refit_sigmas:
        d = _pair_distances(cand, s_kp, t_kp)  # (V, n)
        w = okf[None] / (1.0 + (d / jnp.float32(sigma)) ** 2)
        w = jnp.where(d < 2.0 * tau, w, 0.0)
        wsum = jnp.sum(w, axis=1, keepdims=True)  # (V, 1)
        wn = w / jnp.maximum(wsum, 1e-6)
        mu_s = wn @ s_kp  # (V, 3)
        mu_t = wn @ t_kp
        cs = s_kp[None] - mu_s[:, None, :]  # (V, n, 3)
        ct = t_kp[None] - mu_t[:, None, :]
        cov = jnp.einsum("vn,vni,vnj->vij", wn, cs, ct,
                         precision=jax.lax.Precision.HIGHEST)
        R_new = kabsch_rotation(cov)
        t_new = mu_t - jnp.einsum("vij,vj->vi", R_new, mu_s)
        T_new = jnp.zeros_like(cand)
        T_new = T_new.at[:, :3, :3].set(R_new)
        T_new = T_new.at[:, :3, 3].set(t_new)
        T_new = T_new.at[:, 3, 3].set(1.0)
        # a mode with no vote mass keeps its original transform
        keep_old = (wsum[:, 0] < 1e-3)[:, None, None]
        cand = jnp.where(keep_old, cand, T_new)
    return cand


def polish_candidates(
    cand: jnp.ndarray,  # (V, 4, 4) candidate transforms
    src_pts: jnp.ndarray,  # (S, 3) subsampled source cloud
    src_mask: jnp.ndarray,  # (S,)
    tgt_pts: jnp.ndarray,  # (N, 3) target cloud
    tgt_mask: jnp.ndarray,  # (N,)
    cell: float = 1.0,
    radii: Tuple[float, ...] = (1.0, 0.6, 0.35),
    inner: int = 4,
    budget: int = 16,
    dims: Tuple[int, int, int] = (128, 128, 32),
) -> jnp.ndarray:
    """Mini-ICP polish of every candidate, vmapped. Returns (V, 4, 4).

    The IRLS refit converges to ~0.5-1.3 m translation error because the
    keypoint MATCH SET is its resolution floor; a few ICP iterations on
    the correlator clouds break that floor (near-GT candidates snap to
    ~cm, wrong basins stay wrong), which is what makes post-polish
    consensus votes a sharp arbiter (tools/diag_consensus.py).

    Structure mirrors pipeline/icp._icp_loop's candidate-reuse block: per
    radius stage, ONE wide-window gather from a shared dense grid of the
    target (ops/densegrid), then `inner` Umeyama updates against the
    frozen candidate set with the stage's shrinking radius filter
    (radii[k] <= cell keeps the 27-cell exactness argument intact).
    """
    from umeregrobust_tpu.ops.densegrid import (build_dense_grid,
                                                dense_candidates)

    grid = build_dense_grid(tgt_pts, tgt_mask, cell=cell, dims=dims)
    okq = src_mask
    radii_arr = jnp.asarray(radii, jnp.float32)

    def one(T0):
        def outer_step(T, r):
            src_t0 = jnp.matmul(src_pts, T[:3, :3].T,
                                precision=jax.lax.Precision.HIGHEST) \
                + T[:3, 3]
            windows = dense_candidates(grid, src_t0, budget=budget)

            def step(T_c, _):
                src_t = jnp.matmul(src_pts, T_c[:3, :3].T,
                                   precision=jax.lax.Precision.HIGHEST) \
                    + T_c[:3, 3]
                d2 = jnp.sum((src_t[:, None, :] - windows) ** 2, axis=-1)
                d2 = jnp.where(d2 <= r * r, d2, jnp.float32(1e30))
                k = jnp.argmin(d2, axis=-1)
                bd2 = jnp.take_along_axis(d2, k[:, None], axis=-1)[:, 0]
                ok = (bd2 < 1e29) & okq
                q = jnp.take_along_axis(windows, k[:, None, None],
                                        axis=1)[:, 0, :]
                w = ok.astype(jnp.float32)
                # inline weighted Umeyama (core shape as pipeline/icp)
                wsum = jnp.maximum(jnp.sum(w), 1e-6)
                wn = (w / wsum)[:, None]
                cp = jnp.sum(src_t * wn, axis=0)
                cq = jnp.sum(q * w[:, None], axis=0) / wsum
                Hm = ((src_t - cp) * wn).T @ jnp.where(
                    ok[:, None], q - cq, 0.0)
                Rd = kabsch_rotation(Hm[None], sweeps=3)[0]
                td = cq - Rd @ cp
                dT = jnp.eye(4, dtype=jnp.float32)
                dT = dT.at[:3, :3].set(Rd).at[:3, 3].set(td)
                # no correspondences at all -> identity update
                dT = jnp.where(jnp.sum(w) < 3.0, jnp.eye(4), dT)
                return jnp.matmul(dT, T_c,
                                  precision=jax.lax.Precision.HIGHEST), None

            T_new, _ = jax.lax.scan(step, T, None, length=inner)
            return T_new, None

        T_fin, _ = jax.lax.scan(outer_step, T0.astype(jnp.float32),
                                radii_arr)
        return T_fin

    return jax.vmap(one)(cand)


def compact_structure(
    pts: jnp.ndarray,  # (N, 3)
    feat: jnp.ndarray,  # (N, C)
    mask: jnp.ndarray,  # (N,)
    cap: int,
    cell: float = 2.0,
    dz: float = 0.35,
    grid_dim: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-`cap` STRUCTURE points (highest above their 2D cell's min z).

    Ground points are the arbitration poison at low overlap: under any
    plane-preserving wrong transform they are "aligned" by every local
    metric, and with 1/r^2 lidar density a wrong mode that overlays the
    two scans' dense near-sensor cores collects more raw correlation mass
    than the true alignment (tools/diag_consensus.py, pairs 0/3). Scoring
    on structure only — label-free, via per-cell min-z — restores the
    discrimination, and compacting to `cap` rows makes the (cap x cap)
    exact rescore ~4x cheaper than masking in place.

    Returns (pts[cap], feat[cap], struct_mask[cap]).
    """
    cc = jnp.floor(pts[:, :2] / cell).astype(jnp.int32)
    cc = cc - jnp.min(jnp.where(mask[:, None], cc, jnp.int32(1 << 20)),
                      axis=0)
    cc = jnp.clip(cc, 0, grid_dim - 1)
    flat = cc[:, 0] * grid_dim + cc[:, 1]
    minz = jnp.full((grid_dim * grid_dim,), jnp.float32(1e9)).at[flat].min(
        jnp.where(mask, pts[:, 2], jnp.float32(1e9)))
    height = pts[:, 2] - minz[flat]
    score = jnp.where(mask & (height > dz), height, -jnp.inf)
    _, idx = jax.lax.top_k(score, cap)
    return pts[idx], feat[idx], jnp.isfinite(score[idx])
