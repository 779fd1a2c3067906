"""Device mesh and sharding helpers (ICI-first data parallelism).

The reference is single-GPU (SURVEY.md 2c: no distributed code at all);
here parallelism is first-class. Registration pairs are embarrassingly
parallel, and the model is tiny (~1 M params), so the layout is:

- params/optimizer state: replicated,
- batch (pairs): sharded over the 'dp' mesh axis,
- gradient reduction: psum over 'dp' (XLA inserts it under jit from the
  shardings; rides ICI within a slice).

The "sequence parallel" analog for point clouds — sharding the points axis
— is the 'sp' axis: parallel/points_sharded.py shard_maps the fused UME
moment accumulation over it (partial moments per contiguous points block,
one psum) for clouds too large for a single chip's HBM.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "P"]


def make_mesh(
    n_dp: Optional[int] = None, n_sp: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Mesh with ('dp', 'sp') axes. Defaults to all devices on 'dp'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_dp is None:
        n_dp = len(devices) // n_sp
    dev = np.asarray(devices[: n_dp * n_sp]).reshape(n_dp, n_sp)
    return Mesh(dev, axis_names=("dp", "sp"))


def shard_batch(mesh: Mesh, tree):
    """Place a host batch with leading batch dim sharded over 'dp'."""
    def put(x):
        spec = P("dp", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, optimizer state) across the mesh."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, tree)
