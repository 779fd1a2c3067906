"""Rigid-transform utilities and registration error metrics.

TPU-first equivalents of the reference's scattered transform math
(reference: evaluate.py, utils/eval_utils.py:60-76). Everything is pure
jnp, batched, and safe to call under ``jax.jit`` / ``vmap``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "make_transform",
    "apply_transform",
    "invert_rigid",
    "compose",
    "random_rotation",
    "random_rigid_transform",
    "rotation_z",
    "relative_rotation_error",
    "relative_translation_error",
]


def make_transform(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble (..., 4, 4) homogeneous transforms from (...,3,3) R and (...,3) t."""
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def apply_transform(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (...,4,4) rigid transform to (...,N,3) points: R @ p + t.

    Full-precision matmul: bf16 MXU passes would inject cm-scale noise into
    coordinates (see ops/precision.py).
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return (
        jnp.matmul(pts, jnp.swapaxes(R, -1, -2),
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
        + t[..., None, :]
    )


def invert_rigid(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid (...,4,4) transform."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_transform(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def compose(T1: jnp.ndarray, T2: jnp.ndarray) -> jnp.ndarray:
    """T1 after T2 (matrix product)."""
    return T1 @ T2


def rotation_z(angle_rad: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) rotation about the z axis (used by the train-time augmentation,
    reference: datasets/kitti/kitti_dataset.py:470-475)."""
    c, s = jnp.cos(angle_rad), jnp.sin(angle_rad)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zeros], axis=-1),
            jnp.stack([s, c, zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )


def random_rotation(key: jax.Array, batch: tuple = ()) -> jnp.ndarray:
    """Uniform random rotation(s) via QR of a Gaussian matrix, det corrected."""
    A = jax.random.normal(key, batch + (3, 3))
    Q, R = jnp.linalg.qr(A)
    # make it a proper rotation with a deterministic convention
    d = jnp.sign(jnp.diagonal(R, axis1=-2, axis2=-1))
    Q = Q * d[..., None, :]
    det = jnp.linalg.det(Q)
    Q = Q.at[..., :, 2].multiply(jnp.sign(det)[..., None])
    return Q


def random_rigid_transform(
    key: jax.Array,
    batch: tuple = (),
    max_translation: float = 10.0,
    max_angle_rad: float = jnp.pi,
) -> jnp.ndarray:
    """Random rigid transform with bounded rotation angle and translation norm."""
    k_axis, k_ang, k_t = jax.random.split(key, 3)
    axis = jax.random.normal(k_axis, batch + (3,))
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-12)
    ang = jax.random.uniform(k_ang, batch, minval=-max_angle_rad, maxval=max_angle_rad)
    K = jnp.zeros(batch + (3, 3))
    ax, ay, az = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(ax)
    K = jnp.stack(
        [
            jnp.stack([zeros, -az, ay], axis=-1),
            jnp.stack([az, zeros, -ax], axis=-1),
            jnp.stack([-ay, ax, zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3), batch + (3, 3))
    s = jnp.sin(ang)[..., None, None]
    c = jnp.cos(ang)[..., None, None]
    R = eye + s * K + (1.0 - c) * (K @ K)
    t = jax.random.uniform(k_t, batch + (3,), minval=-1.0, maxval=1.0) * max_translation
    return make_transform(R, t)


def relative_rotation_error(R: jnp.ndarray, R_hat: jnp.ndarray) -> jnp.ndarray:
    """RRE in degrees via the trace formula with clamping.

    Mirrors reference utils/eval_utils.py:60-76 (trace clamped to [-1, 3]
    before acos to avoid NaNs from numerical noise).
    """
    # full-precision product: a bf16 MXU pass puts ~0.4% noise on the
    # trace, which acos near trace=3 turns into a 2-6 degree error FLOOR —
    # the metric itself would dominate sub-degree recall thresholds.
    delta = jnp.matmul(R_hat, jnp.swapaxes(R, -1, -2),
                       precision=jax.lax.Precision.HIGHEST)
    tr = jnp.trace(delta, axis1=-2, axis2=-1)
    tr = jnp.clip(tr, -1.0, 3.0)
    return jnp.degrees(jnp.arccos((tr - 1.0) / 2.0))


def relative_translation_error(t: jnp.ndarray, t_hat: jnp.ndarray) -> jnp.ndarray:
    """RTE: Euclidean norm of the translation residual."""
    return jnp.linalg.norm(t_hat - t, axis=-1)
