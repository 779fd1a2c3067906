"""ops/pallas_ume.ume_moments_fused vs the XLA chunk-loop formulation
(pipeline/ume_gen) — cap semantics (first-max_nn-by-index), radius test,
mask exclusion, and moment values must match."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umeregrobust_tpu.ops.pallas_ume import ume_moments_fused


def _brute(kpts, pts, Z, mask, radius, max_nn):
    M = len(kpts)
    out = np.zeros((M, Z.shape[1]), np.float32)
    for k in range(M):
        d2 = ((pts - kpts[k]) ** 2).sum(1)
        ok = (d2 <= radius * radius) & mask
        idx = np.flatnonzero(ok)[:max_nn]
        out[k] = Z[idx].sum(0)
    return out


@pytest.mark.parametrize("seed,n,m,max_nn", [(0, 1024, 64, 50),
                                             (1, 1536, 300, 7)])
def test_fused_moments_match_brute_force(seed, n, m, max_nn):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 5
    kpts = pts[rng.choice(n, m, replace=False)] + 0.1
    Z = rng.normal(size=(n, 128)).astype(np.float32)
    mask = rng.random(n) < 0.85
    got = np.asarray(ume_moments_fused(
        jnp.asarray(kpts), jnp.asarray(pts), jnp.asarray(Z),
        jnp.asarray(mask), radius=3.0, max_nn=max_nn, interpret=True))
    want = _brute(kpts, pts, Z * mask[:, None].astype(np.float32),
                  mask, 3.0, max_nn)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_cap_binds_exactly_at_slice_boundaries():
    """max_nn smaller than the in-radius count, neighbors spanning point-
    slice boundaries: the carried count must cap at exactly max_nn in
    index order."""
    n, m = 2048, 8
    pts = np.zeros((n, 3), np.float32)  # ALL points in radius of origin
    kpts = np.zeros((m, 3), np.float32)
    Z = np.zeros((n, 128), np.float32)
    Z[:, 0] = np.arange(n)  # payload identifies the index
    Z[:, 1] = 1.0  # counts contributors
    mask = np.ones(n, bool)
    mask[10:20] = False  # masked rows must not consume cap slots
    got = np.asarray(ume_moments_fused(
        jnp.asarray(kpts), jnp.asarray(pts), jnp.asarray(Z),
        jnp.asarray(mask), radius=1.0, max_nn=600, interpret=True))
    # first 600 VALID indices: 0..9, 20..609
    valid_idx = np.concatenate([np.arange(10), np.arange(20, 610)])
    assert np.allclose(got[:, 1], 600)
    assert np.allclose(got[:, 0], valid_idx.sum())
