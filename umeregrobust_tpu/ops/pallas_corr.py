"""Fused kernel-correlation scoring (Pallas TPU kernel).

The hypothesis-scoring hot loop (reference utils/loc_utils.py:592-681,
radius-capped variant) computes, per candidate transform T_h,

    score_h = sum_ij  cauchy(|T_h p_i - q_j|, sigma) * 1[d <= R] * <f_i, g_j>

The XLA formulation materializes the (S, T) distance and weight matrices in
HBM for every hypothesis block (~8 GB of traffic per pair at benchmark
sizes) and is bandwidth-bound. This kernel keeps every intermediate in
VMEM: per (i, j) source/target tile it computes the feature-correlation
tile G = F Gt^T ONCE (on the first hypothesis), then for each hypothesis
only the rank-4 distance cross-term (MXU), the Cauchy weight, and the
weighted reduction (VPU) — zero HBM intermediates.

Grid: (S/Ts, T/Tt, H), hypothesis innermost so the G tile and both feature
tiles stay resident across all hypotheses. Scores accumulate into a single
(H, 1) VMEM-resident output block.

Masking: invalid source rows must carry zero features (standard invariant
of this package) so their contribution vanishes through G; same for
invalid target rows. Transformed points of padded rows are finite, so no
NaNs propagate.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["corr_scores_fused"]


def _kernel(pt_ref, f_ref, q_ref, g_ref, out_ref, *, inv_s2, r2):
    # grid = (H, S/Ts, T/Tt): the (1, 1) output block at position h stays
    # resident across its consecutive (i, j) sweep — the canonical Pallas
    # accumulation pattern. The feature tile G = F Gt^T is recomputed per
    # step on the MXU (~256 cycles), far cheaper than staging the (S, T)
    # matrix through HBM like the XLA path does.
    i = pl.program_id(1)
    j = pl.program_id(2)

    p = pt_ref[0]  # (Ts, 4) transformed source tile for hypothesis h
    q = q_ref[:]  # (Tt, 4)
    gt = jax.lax.dot_general(
        f_ref[:], g_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Ts, Tt)
    # HIGHEST: default TPU matmul precision rounds f32 inputs to bf16 —
    # with |coords| ~ 30 that puts O(10) error on the squared distances and
    # flips radius membership wholesale. The distance cross-term must be
    # full f32 (K=4, so the extra MXU passes are free next to the VPU work).
    pq = jax.lax.dot_general(
        p, q, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # (Ts, Tt)
    pp = jnp.sum(p * p, axis=1, keepdims=True)  # (Ts, 1)
    qq = jnp.sum(q * q, axis=1).reshape(1, -1)  # (1, Tt)
    d2 = pp + qq - 2.0 * pq
    w = jnp.where(d2 <= r2, 1.0 / (1.0 + d2 * inv_s2), 0.0)
    # (1, 128) lane-aligned partial (summed to a scalar by the wrapper);
    # fold Tt lanes down to 128 with static slices (Mosaic rejects the
    # equivalent vector reshape)
    row = jnp.sum(w * gt, axis=0, keepdims=True)  # (1, Tt)
    partial_sum = row[:, :128]
    for m in range(1, row.shape[1] // 128):
        partial_sum = partial_sum + row[:, m * 128:(m + 1) * 128]

    # out block covers 8 consecutive hypotheses ((8, 128) sublane-aligned);
    # it stays VMEM-resident across their (i, j) sweeps. Row h % 8 belongs
    # to this step's hypothesis.
    hm = pl.program_id(0) % 8

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[pl.ds(hm, 1), :] = partial_sum

    @pl.when((i > 0) | (j > 0))
    def _():
        out_ref[pl.ds(hm, 1), :] += partial_sum


@partial(jax.jit, static_argnames=("sigma", "radius_factor", "ts", "tt"))
def corr_scores_fused(
    pts_t: jnp.ndarray,  # (H, S, 4) transformed source points (4th col 0)
    src_featw: jnp.ndarray,  # (S, C) weighted src features (invalid rows 0)
    tgt_pts4: jnp.ndarray,  # (T, 4) target points (4th col 0)
    tgt_featw: jnp.ndarray,  # (T, C) weighted tgt features (invalid rows 0)
    sigma: float = 1.5,
    radius_factor: float = 2.0,
    ts: int = 256,
    tt: int = 512,
) -> jnp.ndarray:
    """Radius-capped Cauchy correlation scores (H,). S % ts == T % tt == 0
    required (callers pad; padded rows must carry zero features)."""
    H, S, _ = pts_t.shape
    T = tgt_pts4.shape[0]
    assert S % ts == 0 and T % tt == 0, (S, ts, T, tt)
    hpad = (-H) % 8  # out blocks span 8 hypotheses (sublane alignment)
    if hpad:
        pts_t = jnp.concatenate(
            [pts_t, jnp.zeros((hpad, S, 4), pts_t.dtype)], axis=0)
    Hp = H + hpad
    kern = partial(
        _kernel,
        inv_s2=1.0 / float(sigma) ** 2,
        r2=float(radius_factor * sigma) ** 2,
    )
    out = pl.pallas_call(
        kern,
        grid=(Hp, S // ts, T // tt),
        in_specs=[
            pl.BlockSpec((1, ts, 4), lambda h, i, j: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, src_featw.shape[1]), lambda h, i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, 4), lambda h, i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, tgt_featw.shape[1]), lambda h, i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda h, i, j: (h // 8, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, 128), jnp.float32),
    )(pts_t, src_featw, tgt_pts4, tgt_featw)
    return jnp.sum(out[:H], axis=1)  # fold the per-lane partials
