"""Small-matrix SO(3) solvers, hand-vectorized for TPU.

LAPACK-shaped linear algebra (jnp.linalg.svd / qr / eigh) lowers to long
scalar loops on TPU — a single unbatched 3x3 SVD costs ~10 ms, which is
catastrophic inside an ICP iteration loop. This module replaces the two
patterns the registration stack needs with fixed-step, fully vectorized
arithmetic:

- kabsch_rotation: the orthogonal-Procrustes rotation argmin_R |R p - q|
  from the 3x3 cross-covariance, via Horn's quaternion method (Horn 1987):
  the optimal R corresponds to the max-eigenvector of a symmetric 4x4
  built from H, found with a fixed number of cyclic Jacobi sweeps. Always
  returns a PROPER rotation (the reflection case is handled by the method
  itself, equivalent to the reference's sign-corrected SVD,
  utils/loc_utils.py:292-350).
- gram_schmidt: column-orthonormal basis of (..., d, 4) UME matrices by
  modified Gram-Schmidt with one reorthogonalization pass — replaces
  batched jnp.linalg.qr for subspace projections (only the column SPACE is
  consumed downstream, so any orthonormal basis is equivalent).

Everything is batched elementwise math + tiny matmuls: no data-dependent
control flow, O(sweeps) unrolled steps, compiles to a handful of fused
kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["kabsch_rotation", "quat_to_rot", "gram_schmidt"]


def _jacobi_rotate(A, V, p, r):
    """One batched Jacobi rotation zeroing A[..., p, r] (A symmetric 4x4).

    G = I with (p,p)=(r,r)=c, (p,r)=s, (r,p)=-s; A' = G^T A G, V' = V G.
    Only rows/columns p and r change, so the update is 8 width-4 fused
    axpys instead of three batched 4x4 matmuls (batched tiny matmuls pad
    4 -> 8x128 vector lanes on TPU and were ~4 ms/pair across the
    estimator + ICP + consensus call sites, trace_e2e so3.py lines)."""
    app = A[..., p, p]
    arr = A[..., r, r]
    apr = A[..., p, r]
    # zero A'[p,r] = cs (app - arr) + (c^2 - s^2) apr:
    # tan(2 theta) = 2 apr / (arr - app)
    theta = 0.5 * jnp.arctan2(2.0 * apr, arr - app)
    c = jnp.cos(theta)[..., None]
    s = jnp.sin(theta)[..., None]
    # G^T A: rows p, r
    rowp = A[..., p, :]
    rowr = A[..., r, :]
    A = A.at[..., p, :].set(c * rowp - s * rowr)
    A = A.at[..., r, :].set(s * rowp + c * rowr)
    # (G^T A) G: columns p, r
    colp = A[..., :, p]
    colr = A[..., :, r]
    A = A.at[..., :, p].set(c * colp - s * colr)
    A = A.at[..., :, r].set(s * colp + c * colr)
    vp = V[..., :, p]
    vr = V[..., :, r]
    V = V.at[..., :, p].set(c * vp - s * vr)
    V = V.at[..., :, r].set(s * vp + c * vr)
    return A, V


def _jacobi_eigh4(K, sweeps: int = 6):
    """Batched symmetric 4x4 eigendecomposition by cyclic Jacobi.

    Returns (w (..., 4), V (..., 4, 4)) with K V = V diag(w) to fp32
    precision after `sweeps` cyclic sweeps (quadratic convergence; 4x4
    needs ~4 sweeps, 6 adds margin)."""
    A = K.astype(jnp.float32)
    V = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), A.shape)
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    for _ in range(sweeps):
        for p, r in pairs:
            A, V = _jacobi_rotate(A, V, p, r)
    return jnp.diagonal(A, axis1=-2, axis2=-1), V


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) unit quaternion (w, x, y, z) -> (..., 3, 3) rotation."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], axis=-1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], axis=-1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=-2)
    return r


def kabsch_rotation(H: jnp.ndarray, sweeps: int = 6) -> jnp.ndarray:
    """Optimal proper rotation R = argmin_{R in SO(3)} sum_i |R p_i - q_i|^2
    given the cross-covariance H = sum_i p_i q_i^T, batched over leading dims.

    Equivalent to the sign-corrected-SVD Kabsch solution (the reference's
    batch_estimate_transform_ume_old, utils/loc_utils.py:292-350), computed
    by Horn's quaternion method with a fixed-sweep Jacobi eigensolver.
    """
    H = H.astype(jnp.float32)
    # scale-normalize for numerical headroom (R is scale-invariant)
    scale = jnp.sqrt(jnp.sum(H * H, axis=(-2, -1), keepdims=True)) + 1e-30
    S = H / scale
    sxx, sxy, sxz = S[..., 0, 0], S[..., 0, 1], S[..., 0, 2]
    syx, syy, syz = S[..., 1, 0], S[..., 1, 1], S[..., 1, 2]
    szx, szy, szz = S[..., 2, 0], S[..., 2, 1], S[..., 2, 2]
    K = jnp.stack([
        jnp.stack([sxx + syy + szz, syz - szy, szx - sxz, sxy - syx], axis=-1),
        jnp.stack([syz - szy, sxx - syy - szz, sxy + syx, szx + sxz], axis=-1),
        jnp.stack([szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy], axis=-1),
        jnp.stack([sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz], axis=-1),
    ], axis=-2)
    w, V = _jacobi_eigh4(K, sweeps=sweeps)
    best = jnp.argmax(w, axis=-1)
    q = jnp.take_along_axis(V, best[..., None, None].repeat(4, axis=-2),
                            axis=-1)[..., 0]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-30)
    return quat_to_rot(q)


def gram_schmidt(F: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Column-orthonormal basis of (..., d, k) via modified Gram-Schmidt
    with one reorthogonalization pass (fp32).

    Rank-deficient columns come out as zero vectors (the projection matrix
    Q Q^T then projects onto the lower-dimensional span — exactly what the
    subspace distance needs; jnp.linalg.qr would instead return an
    arbitrary orthonormal completion whose extra directions corrupt P)."""
    F = F.astype(jnp.float32)
    k = F.shape[-1]
    cols = []
    for i in range(k):
        v = F[..., i]
        for _ in range(2):  # MGS + reorthogonalization
            for qj in cols:
                v = v - jnp.sum(qj * v, axis=-1, keepdims=True) * qj
        n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
        ref = jnp.sqrt(jnp.sum(F[..., i] ** 2, axis=-1, keepdims=True))
        ok = n > jnp.maximum(eps * ref, 1e-30)
        cols.append(jnp.where(ok, v / jnp.where(ok, n, 1.0), 0.0))
    return jnp.stack(cols, axis=-1)
