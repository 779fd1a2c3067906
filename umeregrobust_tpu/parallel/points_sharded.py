"""Points-axis ('sp') sharded UME moment accumulation.

The "sequence parallel" analog for point clouds: for clouds too large for
one chip's HBM, the fused ball-query moment contraction
(pipeline/ume_gen.py) shards cleanly over the points axis — each device
holds a contiguous block of points, computes partial moments for every
keypoint against its block, and a single psum over 'sp' produces the exact
full-cloud moments.

The one cross-shard dependency is the first-`max_nn`-by-index neighbor cap
(PyTorch3D ball_query semantics, reproduced in ume_gen.py with a cumsum):
the cap counts neighbors in *global* index order. shard_map splits the
points axis into contiguous blocks in order, so each device only needs the
total in-radius counts of the devices before it — one all_gather of a
(chunk,)-sized count vector per keypoint chunk — to turn the global cap
into a local one.

No reference analog (the reference is single-GPU and materializes
(n_kpts, 750) neighbor lists, evaluate.py:50-60); this is the TPU-first
scale-out path promised in parallel/mesh.py.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ume_from_ball_query_sp"]


def _local_moments(pts, feats, p_mask, kpts, radius, max_nn, chunk):
    """Partial moments of the local points block vs. all keypoints.

    Runs inside shard_map: pts (Nl, 3), feats (Nl, C) are this device's
    contiguous block; kpts (M, 3) is replicated. Returns the psum'd exact
    (M, 4C) moments.
    """
    Nl, C = feats.shape
    M = kpts.shape[0]
    f = feats.astype(jnp.float32) * p_mask[:, None]
    pts = pts.astype(jnp.float32)
    Z = jnp.concatenate(
        [f, f * pts[:, 0:1], f * pts[:, 1:2], f * pts[:, 2:3]], axis=1)

    pad = (-M) % chunk
    kp = jnp.pad(kpts.astype(jnp.float32), ((0, pad), (0, 0)))
    n_chunks = kp.shape[0] // chunk
    pp = jnp.sum(pts * pts, axis=-1)
    r2 = jnp.float32(radius) ** 2
    shard = jax.lax.axis_index("sp")

    def step(_, kb):
        d2 = (jnp.sum(kb * kb, axis=-1)[:, None] + pp[None, :]
              - 2.0 * jnp.matmul(kb, pts.T,
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32))
        ok = (d2 <= r2) & p_mask[None, :]
        # global first-max_nn cap: neighbors on earlier shards come first
        # in index order, so the local cap is max_nn minus their count.
        cnt = jnp.sum(ok.astype(jnp.int32), axis=1)  # (chunk,)
        all_cnt = jax.lax.all_gather(cnt, "sp")  # (S, chunk)
        before = jnp.sum(
            jnp.where(jnp.arange(all_cnt.shape[0])[:, None] < shard,
                      all_cnt, 0), axis=0)
        cap = jnp.maximum(max_nn - before, 0)
        cum = jnp.cumsum(ok.astype(jnp.int32), axis=1)
        w = (ok & (cum <= cap[:, None])).astype(jnp.float32)
        Fk = jnp.matmul(w, Z, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        return None, Fk

    _, F = jax.lax.scan(step, None, kp.reshape(n_chunks, chunk, 3))
    F = F.reshape(-1, 4 * C)[:M]
    return jax.lax.psum(F, "sp")


def ume_from_ball_query_sp(
    mesh: Mesh,
    pts: jnp.ndarray,
    feats: jnp.ndarray,
    kpts: jnp.ndarray,
    radius: float,
    max_nn: int,
    p_mask: Optional[jnp.ndarray] = None,
    k_mask: Optional[jnp.ndarray] = None,
    normalize: bool = True,
    eps: float = 1e-6,
    chunk: int = 512,
) -> jnp.ndarray:
    """Points-axis-sharded twin of pipeline/ume_gen.ume_from_ball_query.

    pts/feats/p_mask are sharded over the mesh's 'sp' axis (N must divide
    by the axis size); kpts is replicated. Returns replicated (M, C, 4)
    fp32 moments, bitwise-comparable to the single-device path up to fp32
    summation order.
    """
    N, C = feats.shape
    M = kpts.shape[0]
    if p_mask is None:
        p_mask = jnp.ones((N,), bool)

    fn = shard_map(
        partial(_local_moments, radius=float(radius), max_nn=int(max_nn),
                chunk=int(chunk)),
        mesh=mesh,
        in_specs=(P("sp"), P("sp"), P("sp"), P()),
        out_specs=P(),
    )
    pts = jax.device_put(pts, NamedSharding(mesh, P("sp")))
    feats = jax.device_put(feats, NamedSharding(mesh, P("sp")))
    p_mask = jax.device_put(p_mask, NamedSharding(mesh, P("sp")))
    F = fn(pts, feats, p_mask, kpts)
    F = F.reshape(M, 4, C).transpose(0, 2, 1)
    if normalize:
        total = jnp.sum(F[:, :, 0], axis=-1, keepdims=True)[..., None]
        F = F / (total + eps)
    if k_mask is not None:
        F = F * k_mask[:, None, None]
    return F
