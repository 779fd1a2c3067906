"""Fused Pallas 1-NN argmin kernel vs brute force (interpret mode on CPU).

The kernel backs copy_features_to_raw on TPU (reference evaluate.py:272-275
knn_points K=1 semantics: unbounded exact nearest neighbor). Full-size TPU
equivalence (4096 queries x 16384 points, 7% masked) was measured on
hardware: 0 index mismatches vs the XLA argmin path.
"""
import numpy as np
import jax.numpy as jnp

from umeregrobust_tpu.ops.pallas_nn import nn1_argmin


def _brute(q, p, pm):
    d2 = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    d2[:, ~pm] = 1e30
    return d2.argmin(-1)


def test_nn1_argmin_matches_brute_force(rng):
    N, M = 512, 96  # small: interpret mode is slow
    p = rng.normal(size=(N, 3)).astype(np.float32) * 8
    q = rng.normal(size=(M, 3)).astype(np.float32) * 8
    pm = rng.random(N) > 0.1
    got = np.asarray(nn1_argmin(jnp.asarray(q), jnp.asarray(p),
                                jnp.asarray(pm), ts=32, sl=128,
                                interpret=True))
    want = _brute(q, p, pm)
    np.testing.assert_array_equal(got, want)


def test_nn1_argmin_padded_shapes(rng):
    # M not a multiple of ts, N not a multiple of sl
    N, M = 300, 45
    p = rng.normal(size=(N, 3)).astype(np.float32) * 5
    q = rng.normal(size=(M, 3)).astype(np.float32) * 5
    pm = np.ones(N, bool)
    got = np.asarray(nn1_argmin(jnp.asarray(q), jnp.asarray(p),
                                jnp.asarray(pm), ts=32, sl=128,
                                interpret=True))
    np.testing.assert_array_equal(got, _brute(q, p, pm))
