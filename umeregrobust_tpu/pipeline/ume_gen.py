"""Fused UME descriptor generation: capped ball-query moment accumulation.

The reference builds UME matrices by materializing padded ball-query
neighborhoods — (n_kpts, 750) indices, then gathered (n_kpts, 750, 32)
features — and contracting (evaluate.py:50-60, utils/loc_utils.py:18-83).
On TPU that intermediate is ~1 GB per cloud. This module fuses the whole
thing into one masked matmul per keypoint chunk:

  F[k] = sum_n w[k, n] * [f_n | f_n * x_n | f_n * y_n | f_n * z_n]

where w[k, n] = 1 iff point n is within the radius of keypoint k AND among
the first `max_nn` such points in index order (PyTorch3D ball_query's
first-K capping, reproduced with a cumulative-count mask). The contraction
is a (chunk, N) x (N, 4C) matmul on the MXU; no neighbor lists ever exist.

Output layout matches the reference column order [m0 | m1] so all
downstream math (subspace distance, closed-form estimator) is unchanged.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["ume_from_ball_query"]


@partial(jax.jit, static_argnames=("radius", "max_nn", "normalize", "chunk",
                                   "pallas"))
def ume_from_ball_query(
    pts: jnp.ndarray,
    feats: jnp.ndarray,
    kpts: jnp.ndarray,
    radius: float,
    max_nn: int,
    p_mask: Optional[jnp.ndarray] = None,
    k_mask: Optional[jnp.ndarray] = None,
    normalize: bool = True,
    center: bool = False,
    eps: float = 1e-6,
    chunk: int = 512,
    pallas: bool = True,
) -> jnp.ndarray:
    """UME moment matrices for every keypoint.

    Args:
      pts:    (N, 3) cloud points (zero/garbage at invalid rows is fine).
      feats:  (N, C) per-point features, invalid rows must be zero.
      kpts:   (M, 3) keypoint positions.
      radius: neighborhood radius (reference ume_r_nn = 5).
      max_nn: neighbor cap, first-by-index (reference ume_max_nn = 750).
      normalize: divide by total mass sum(m0) + eps (reference
        evaluate.py:59 / loc_utils.py:370 normalization).
      center: subtract the keypoint from neighbor coords before the first
        moment (variant 1 semantics, loc_utils.py:58; the used variant 2 and
        the eval path do NOT re-center — keep False for parity with them).

    Returns:
      (M, C, 4) fp32 moment matrices [m0 | m1].
    """
    N, C = feats.shape
    M = kpts.shape[0]
    pts = pts.astype(jnp.float32)
    f = feats.astype(jnp.float32)
    if p_mask is not None:
        f = f * p_mask[:, None]

    # Z = [f | f*x | f*y | f*z]  (N, 4C); column-major per moment so the
    # output reshape lands on [m0 | m1] directly.
    Z = jnp.concatenate([f, f * pts[:, 0:1], f * pts[:, 1:2], f * pts[:, 2:3]], axis=1)

    if (pallas and not center and jax.default_backend() == "tpu"
            and (4 * C) % 128 == 0):
        # fused Pallas path: zero HBM intermediates (the XLA chunk loop
        # below round-trips ~6 (chunk, N) passes per chunk — ~25 ms/pair
        # at the 10000-kpt/50k-pt reference point); cap semantics and
        # accumulation precision identical (ops/pallas_ume.py)
        from umeregrobust_tpu.ops.pallas_ume import ume_moments_fused

        pm = (p_mask if p_mask is not None
              else jnp.ones((N,), bool))
        F = ume_moments_fused(kpts.astype(jnp.float32), pts, Z, pm,
                              radius=float(radius), max_nn=int(max_nn))
        F = F.reshape(M, 4, C).transpose(0, 2, 1)
        if normalize:
            total = jnp.sum(F[:, :, 0], axis=-1, keepdims=True)[..., None]
            F = F / (total + eps)
        if k_mask is not None:
            F = F * k_mask[:, None, None]
        return F

    pad = (-M) % chunk
    kp = jnp.pad(kpts.astype(jnp.float32), ((0, pad), (0, 0)))
    n_chunks = kp.shape[0] // chunk

    pp = jnp.sum(pts * pts, axis=-1)
    p_valid = None if p_mask is None else p_mask

    r2 = jnp.float32(radius) ** 2

    # block size for the cumulative-count matmul: largest power of two
    # <= 512 dividing N (every shipped capacity is a multiple of 256)
    bs = 512
    while N % bs:
        bs //= 2
    nb = N // bs
    # upper-triangular ones: okb @ TRI = within-block inclusive cumsum.
    # bf16 operands are EXACT here (0/1 values) and the f32 accumulation
    # is exact for counts <= 2^24 — so this is bitwise the old cumsum.
    TRI = jnp.triu(jnp.ones((bs, bs), jnp.bfloat16))

    def step(_, kb):
        d2 = (
            jnp.sum(kb * kb, axis=-1)[:, None]
            + pp[None, :]
            - 2.0 * jnp.matmul(kb, pts.T, precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
        )
        ok = d2 <= r2
        if p_valid is not None:
            ok = ok & p_valid[None, :]
        # first-max_nn-by-index cap (PyTorch3D ball_query semantics).
        # jnp.cumsum over the 16k point axis lowers to ~log2(N) reduce-
        # window passes over the (chunk, N) matrix — measured ~2.4 ms of
        # the 3.9 ms UME stage. One within-block triangular MXU matmul +
        # a tiny cross-block scan computes the same counts exactly.
        if bs >= 64:
            okb = ok.astype(jnp.bfloat16).reshape(chunk * nb, bs)
            cum_in = jnp.matmul(okb, TRI,
                                preferred_element_type=jnp.float32)
            cum_in = cum_in.reshape(chunk, nb, bs)
            tot = cum_in[..., -1]  # (chunk, nb) block totals
            excl = jnp.cumsum(tot, axis=-1) - tot
            cum = (cum_in + excl[..., None]).reshape(chunk, N)
        else:  # tiny/odd capacities: the direct cumsum is cheap anyway
            cum = jnp.cumsum(ok.astype(jnp.int32), axis=1)
        w = (ok & (cum <= max_nn)).astype(jnp.float32)
        Fk = jnp.matmul(w, Z, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)  # (chunk, 4C)
        if center:
            m0 = Fk[:, :C]
            Fk = Fk.at[:, C:].add(
                -(kb[:, :, None] * m0[:, None, :]).reshape(chunk, 3 * C))
        return None, Fk

    _, F = jax.lax.scan(step, None, kp.reshape(n_chunks, chunk, 3))
    F = F.reshape(-1, 4 * C)[:M]
    F = F.reshape(M, 4, C).transpose(0, 2, 1)  # (M, C, 4): [m0|m1x|m1y|m1z]
    if normalize:
        total = jnp.sum(F[:, :, 0], axis=-1, keepdims=True)[..., None]
        F = F / (total + eps)
    if k_mask is not None:
        F = F * k_mask[:, None, None]
    return F
