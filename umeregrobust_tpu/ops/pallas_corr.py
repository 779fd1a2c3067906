"""Fused kernel-correlation scoring (Pallas TPU kernel).

The hypothesis-scoring hot loop (reference utils/loc_utils.py:592-681,
radius-capped variant) computes, per candidate transform T_h,

    score_h = sum_ij  cauchy(|T_h p_i - q_j|, sigma) * 1[d <= R] * <f_i, g_j>

The XLA formulation materializes the (S, T) distance and weight matrices in
HBM for every hypothesis block (~8 GB of traffic per pair at benchmark
sizes) and is bandwidth-bound. This kernel keeps every intermediate in
VMEM, and blocks HB = 8 hypotheses per grid step: the feature-correlation
tile G = F Gt^T is computed ONCE per (i, j) step and shared by all 8
hypotheses, and the per-step Mosaic dispatch overhead (the dominant cost
at one-hypothesis granularity: the cascade ran ~5600 tiny steps per pair,
~1.5 us each) is amortized 8x. Per hypothesis only the rank-4 distance
cross-term (MXU), the Cauchy weight, and the weighted reduction (VPU)
remain — zero HBM intermediates.

Grid: (H/HB, S/Ts, T/Tt), hypothesis block outermost so its (HB, 128)
output block stays VMEM-resident across its consecutive (i, j) sweep —
the canonical Pallas accumulation pattern.

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

HB = 8  # hypotheses per grid step (= out-block sublane count)


def _kernel(pt_ref, f_ref, q_ref, g_ref, out_ref, *, inv_s2, r2):
    i = pl.program_id(1)
    j = pl.program_id(2)

    q = q_ref[:]  # (Tt, 4)
    gt = jax.lax.dot_general(
        f_ref[:], g_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Ts, Tt), shared by HB hyps
    qq = jnp.sum(q * q, axis=1).reshape(1, -1)  # (1, Tt)

    rows = []
    for h in range(HB):
        p = pt_ref[h]  # (Ts, 4) transformed source tile for hypothesis h
        # HIGHEST: default TPU matmul precision rounds f32 inputs to bf16 —
        # with |coords| ~ 30 that puts O(10) error on the squared distances
        # and flips radius membership wholesale. The distance cross-term
        # must be full f32 (K=4, so the extra MXU passes are free next to
        # the VPU work). Mosaic supports only DEFAULT/HIGHEST in-kernel
        # (Precision.HIGH raises NotImplementedError in lowering).
        pq = jax.lax.dot_general(
            p, q, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # (Ts, Tt)
        pp = jnp.sum(p * p, axis=1, keepdims=True)  # (Ts, 1)
        d2 = pp + qq - 2.0 * pq
        # NOTE: pl.reciprocal(approx=True) for the Cauchy weight was
        # measured perf-NEUTRAL e2e at the reference point (4.94 -> 4.91
        # pairs/s, noise) — the divide is not this kernel's bottleneck —
        # so the exact divide stays for tighter score parity.
        w = jnp.where(d2 <= r2, 1.0 / (1.0 + d2 * inv_s2), 0.0)
        rows.append(jnp.sum(w * gt, axis=0, keepdims=True))  # (1, Tt)
    block = jnp.concatenate(rows, axis=0)  # (HB, Tt)
    # (HB, 128) lane-aligned partials (summed to scalars by the wrapper);
    # fold Tt lanes down to 128 with static slices (Mosaic rejects the
    # equivalent vector reshape)
    partial_sum = block[:, :128]
    for m in range(1, block.shape[1] // 128):
        partial_sum = partial_sum + block[:, m * 128:(m + 1) * 128]

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[:] = partial_sum

    @pl.when((i > 0) | (j > 0))
    def _():
        out_ref[:] += partial_sum


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
    hpad = (-H) % HB  # grid steps cover HB hypotheses each
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
        grid=(Hp // HB, S // ts, T // tt),
        in_specs=[
            pl.BlockSpec((HB, ts, 4), lambda h, i, j: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, src_featw.shape[1]), lambda h, i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, 4), lambda h, i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, tgt_featw.shape[1]), lambda h, i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((HB, 128), lambda h, i, j: (h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, 128), jnp.float32),
    )(pts_t, src_featw, tgt_pts4, tgt_featw)
    return jnp.sum(out[:H], axis=1)  # fold the per-lane partials
