"""Fused capped ball-query UME moment accumulation (Pallas TPU kernel).

The XLA formulation (pipeline/ume_gen.ume_from_ball_query) materializes a
(chunk, N) f32 distance matrix per keypoint chunk plus the mask / cumcount
/ weight intermediates derived from it — at the reference operating point
(10000 keypoints x 50176 points) that is ~6 HBM passes over ~100 MB per
chunk, ~25-30 ms/pair of pure bandwidth for ~3 ms of MXU work. This kernel
keeps every intermediate in VMEM: for each (keypoint block, point slice)
tile it computes the distance tile on the MXU, applies the radius test and
the first-`max_nn`-by-index cap (running per-keypoint count carried across
point slices in VMEM scratch), and accumulates the moment matmul into the
output block. HBM traffic is just the inputs once per keypoint block.

Cap semantics are identical to the XLA path (PyTorch3D ball_query's
first-K-in-index-order, reproduced with a within-slice triangular-matmul
inclusive count + the carried slice-total prefix): masked points are
parked FAR by the wrapper so they fail the radius test and never count.

Moment matmul precision: the weight operand is EXACTLY representable in
bf16 (0/1), so instead of a 6-pass f32 HIGHEST matmul the kernel runs a
manual 2-term split — acc = w_bf16 @ hi(Z) + w_bf16 @ lo(Z) with
hi = bf16(Z), lo = bf16(Z - hi) and f32 MXU accumulation. Error is
O(2^-16) relative (the lo-rounding term), the same order as HIGHEST's
3-term decomposition which drops lo*lo, at 1/3 of the MXU passes. The
triangular count matmul is exact at any precision (0/1 products, f32
accumulation) and dominates at large `sub`; sub=128 quarters its MACs
vs the original 512 with identical counts. Measured (reference point,
10240 kpts x 51200 pts): 11.15 -> ~4 ms/cloud.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ume_moments_fused"]


def _kernel(kp_ref, pT_ref, z_ref, out_ref, cnt_ref, w_ref, *,
            r2, max_nn, bm, bn, sub, n_slices):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    dn = (((1,), (0,)), ((), ()))
    k = kp_ref[:]  # (bm, 4) keypoint block (xyz0)
    p = pT_ref[:]  # (4, bn), masked rows FAR
    # direct squared-difference distance test: the K=4 HIGHEST matmul
    # form costs 6 MXU passes at 4/128 systolic-depth utilization; three
    # broadcast (k - p)^2 FMAs on the VPU are cheaper AND more accurate
    # (no |k||p| ~ 1e4 m^2 cancellation). FAR-parked rows (kpt pad +1e9,
    # point pad/mask -1e9) give diff^2 >= 1e18 >> r2, so they still fail.
    d2 = jnp.zeros((bm, bn), jnp.float32)
    for c in range(3):
        diff = k[:, c:c + 1] - p[c:c + 1, :]
        d2 += diff * diff
    ok = (d2 <= r2).astype(jnp.bfloat16)

    # within-sub-slice inclusive count via upper-triangular matmul
    # (exact: 0/1 products, f32 accumulation) + the carried prefix; only
    # this chain is sequential — the capped weights land in a (bm, bn)
    # VMEM scratch so the moment matmul below runs at full tile width
    row = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 1)
    tri = (row <= col).astype(jnp.bfloat16)
    prev = cnt_ref[:, 0:1]  # (bm, 1) points seen so far
    for s in range(bn // sub):
        ok_s = ok[:, s * sub:(s + 1) * sub]
        cum_in = jax.lax.dot_general(
            ok_s, tri, dimension_numbers=dn,
            preferred_element_type=jnp.float32)  # (bm, sub)
        w_ref[:, s * sub:(s + 1) * sub] = jnp.where(
            cum_in + prev <= jnp.float32(max_nn), ok_s, jnp.bfloat16(0.0))
        prev = prev + cum_in[:, sub - 1:sub]
    cnt_ref[:] = jnp.broadcast_to(prev, cnt_ref.shape)

    # 0/1 weights are EXACT in bf16; Z splits into hi + lo bf16 halves
    # (see module docstring) so two 1-pass K=bn matmuls replace the
    # 6-pass HIGHEST one at the same error order
    z = z_ref[:]
    z_hi = z.astype(jnp.bfloat16)
    z_lo = (z - z_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    w = w_ref[:]
    acc = jax.lax.dot_general(
        w, z_hi, dimension_numbers=dn,
        preferred_element_type=jnp.float32)  # (bm, 4C)
    acc += jax.lax.dot_general(
        w, z_lo, dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    out_ref[:] += acc


@partial(jax.jit, static_argnames=("radius", "max_nn", "bm", "bn", "sub",
                                   "interpret"))
def ume_moments_fused(
    kpts: jnp.ndarray,  # (M, 3) keypoints
    pts: jnp.ndarray,  # (N, 3) cloud points
    Z: jnp.ndarray,  # (N, 4C) moment payload [f | f*x | f*y | f*z]
    p_mask: jnp.ndarray,  # (N,) validity (invalid rows never count)
    radius: float,
    max_nn: int,
    bm: int = 512,
    bn: int = 2048,
    sub: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused UME moment matrices: (M, 4C) f32.

    out[k] = sum_n w[k, n] * Z[n] with w = 1 iff |pts_n - kpts_k| <= radius
    AND n is among the first max_nn such points in index order.
    """
    M, N = kpts.shape[0], pts.shape[0]
    C4 = Z.shape[1]
    mpad = (-M) % bm
    k4 = jnp.concatenate(
        [kpts.astype(jnp.float32),
         jnp.zeros((M, 1), jnp.float32)], axis=1)
    if mpad:
        # padded keypoints at +FAR so they accumulate nothing
        k4 = jnp.concatenate(
            [k4, jnp.full((mpad, 4), jnp.float32(1e9)).at[:, 3].set(0.0)],
            axis=0)
    npad = (-N) % bn
    p3 = jnp.where(p_mask[:, None], pts.astype(jnp.float32),
                   jnp.float32(-1e9))  # FAR (opposite sign of kpt pad)
    p4 = jnp.concatenate([p3, jnp.zeros((N, 1), jnp.float32)], axis=1)
    if npad:
        far = jnp.full((npad, 4), jnp.float32(-1e9)).at[:, 3].set(0.0)
        p4 = jnp.concatenate([p4, far], axis=0)
    Zp = Z.astype(jnp.float32)
    if npad:
        Zp = jnp.concatenate([Zp, jnp.zeros((npad, C4), jnp.float32)],
                             axis=0)
    Np = N + npad
    assert bn % sub == 0, (bn, sub)
    kern = partial(_kernel, r2=float(radius) ** 2, max_nn=max_nn,
                   bm=bm, bn=bn, sub=sub, n_slices=Np // bn)
    out = pl.pallas_call(
        kern,
        grid=((M + mpad) // bm, Np // bn),
        in_specs=[
            pl.BlockSpec((bm, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, C4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, C4), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M + mpad, C4), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, 128), jnp.float32),
                        pltpu.VMEM((bm, bn), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(k4, p4.T, Zp)
    return out[:M]
