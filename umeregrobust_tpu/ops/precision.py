"""Matmul precision policy.

On TPU, fp32-input matmuls default to bf16 MXU passes (~0.4% relative
error). That is fine for learned-feature contractions but catastrophic for
geometry: transforming coordinates at +-50 m through a bf16 matmul injects
centimeter-to-decimeter noise, which breaks sub-voxel correspondence
search, moment accumulation, and closed-form transform estimation (found
the hard way: ICP on identical clouds "converged" to rmse 0.05 m).

``hp_matmul`` pins the full-fp32 algorithm (HIGHEST = 6-pass bf16) for all
geometry-critical contractions. The backbone's feature convs deliberately
stay bf16 via their explicit compute_dtype cast.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["HIGHEST", "hp_matmul", "hp_transform_pts"]

HIGHEST = jax.lax.Precision.HIGHEST


def hp_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """fp32 matmul with full-precision MXU algorithm."""
    return jnp.matmul(
        a.astype(jnp.float32), b.astype(jnp.float32),
        precision=HIGHEST, preferred_element_type=jnp.float32)


def hp_transform_pts(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Rigid-transform points at full precision: R @ p + t."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return (
        jnp.matmul(pts.astype(jnp.float32), jnp.swapaxes(R, -1, -2).astype(jnp.float32),
                   precision=HIGHEST, preferred_element_type=jnp.float32)
        + t[..., None, :]
    )
