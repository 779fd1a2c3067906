"""UME subspace-distance matching: streaming argmin and Hungarian fallback.

Default path (all shipped reference benchmark configs set
hungarian_matching_flag=false, e.g. configs/benchmarks/
test_kitti_config.yaml:15): per-source argmin over the target distance row
(reference evaluate.py:224-225). We stream it in chunks so the full
(M x M) distance matrix never materializes: projections are flattened to
(M, d^2) and the cross term is a chunked MXU matmul with a running argmin.

Hungarian assignment (used by the reference only inside the inlier-ratio
eval, utils/eval_utils.py:44) is provided host-side via scipy.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from umeregrobust_tpu.core.ume import projection_packed

__all__ = ["argmin_match", "probabilistic_match_filter", "hungarian_match"]


@partial(jax.jit, static_argnames=("chunk",))
def argmin_match(
    ume_src: jnp.ndarray,
    ume_tgt: jnp.ndarray,
    src_mask: jnp.ndarray | None = None,
    tgt_mask: jnp.ndarray | None = None,
    chunk: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each source keypoint, the target index minimizing the UME
    subspace distance, plus that distance.

    ume_src: (M, d, 4), ume_tgt: (N, d, 4) -> (m (M,) int32, d (M,) fp32).

    The cross term uses the symmetric-packed projection (core/ume.
    projection_packed: contraction dim d(d+1)/2 instead of d^2, exact)
    at Precision.HIGH — 3 bf16 passes instead of HIGHEST's 6, absolute
    error ~1e-6 on inner products in [0, 4], far below any real distance
    gap; together ~4x less MXU work than the d^2/HIGHEST formulation at
    the 10000-keypoint reference operating point.
    """
    A = projection_packed(ume_src)  # (M, d(d+1)/2)
    B = projection_packed(ume_tgt)
    M = A.shape[0]
    sq1 = jnp.sum(A * A, axis=-1)
    sq2 = jnp.sum(B * B, axis=-1)
    if tgt_mask is not None:
        sq2 = jnp.where(tgt_mask, sq2, jnp.float32(1e30))

    pad = (-M) % chunk
    Ap = jnp.pad(A, ((0, pad), (0, 0)))
    s1p = jnp.pad(sq1, (0, pad))
    n_chunks = Ap.shape[0] // chunk

    def step(_, xs):
        a, s1 = xs
        cross = jnp.matmul(a, B.T, precision=jax.lax.Precision.HIGH,
                           preferred_element_type=jnp.float32)
        dist2 = s1[:, None] + sq2[None, :] - 2.0 * cross
        j = jnp.argmin(dist2, axis=-1).astype(jnp.int32)
        dmin = jnp.take_along_axis(dist2, j[:, None], axis=-1)[:, 0]
        return None, (j, dmin)

    _, (m, dmin) = jax.lax.scan(
        step, None, (Ap.reshape(n_chunks, chunk, -1), s1p.reshape(n_chunks, chunk)))
    m = m.reshape(-1)[:M]
    dmin = dmin.reshape(-1)[:M]
    d = jnp.sqrt(jnp.maximum(dmin, 0.0)) / jnp.sqrt(2.0)
    if src_mask is not None:
        m = jnp.where(src_mask, m, jnp.int32(-1))
        d = jnp.where(src_mask, d, jnp.float32(1e6))
    return m, d


def probabilistic_match_filter(
    key: jax.Array,
    match_dist: jnp.ndarray,
    num_keep: int,
    tau: float,
) -> jnp.ndarray:
    """Sample match indices ~ softmax((1 - d)/tau) without replacement
    (reference evaluate.py:233-245). Returns (num_keep,) int32 indices."""
    logits = (1.0 - match_dist) / jnp.float32(tau)
    logits = logits - jnp.max(logits)
    a = jnp.exp(logits)
    p = a / jnp.sum(a)
    return jax.random.choice(
        key, match_dist.shape[0], (num_keep,), replace=False, p=p
    ).astype(jnp.int32)


def hungarian_match(D: np.ndarray) -> np.ndarray:
    """Host-side Hungarian assignment over a distance matrix (native C++
    Jonker-Volgenant, scipy fallback), returning (K, 2) [src, tgt] pairs —
    the reference's optional matcher (evaluate.py:216-222) and inlier-ratio
    matcher (eval_utils.py:40-47)."""
    from umeregrobust_tpu.native import hungarian

    r, c = hungarian(np.asarray(D))
    return np.stack([r, c], axis=1).astype(np.int64)
