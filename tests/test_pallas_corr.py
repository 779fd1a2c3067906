"""Fused Pallas correlator kernel vs the XLA radius scorer / f64 oracle.

Runs the kernel in interpreter mode (the test suite is pinned to CPU);
shapes are kept minimal because interpret-mode execution is slow. The
full-size TPU equivalence (512 hypotheses, 1024x4096 clouds: max abs diff
9.4e-4 on score scale 0.29, identical argmax and top-8 set vs
correlator_scores_radius) was measured on hardware — see the commit
introducing ops/pallas_corr.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import umeregrobust_tpu.ops.pallas_corr as pc


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call

        def patched(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)

        monkeypatch.setattr(pc.pl, "pallas_call", patched)
    yield


def test_fused_scores_match_f64_oracle(rng):
    H, S, T, C = 2, 8, 128, 4
    sigma, rf = 1.5, 2.0
    pts_t = rng.uniform(-10, 10, (H, S, 3)).astype(np.float32)
    pt4 = np.concatenate([pts_t, np.zeros((H, S, 1), np.float32)], -1)
    f = rng.normal(size=(S, C)).astype(np.float32)
    tp = rng.uniform(-10, 10, (T, 3)).astype(np.float32)
    q4 = np.concatenate([tp, np.zeros((T, 1), np.float32)], -1)
    g = rng.normal(size=(T, C)).astype(np.float32)

    out = np.asarray(pc.corr_scores_fused(
        jnp.asarray(pt4), jnp.asarray(f), jnp.asarray(q4), jnp.asarray(g),
        sigma=sigma, radius_factor=rf, ts=8, tt=128))

    want = []
    for h in range(H):
        d2 = ((pts_t[h].astype(np.float64)[:, None, :]
               - tp[None].astype(np.float64)) ** 2).sum(-1)
        w = np.where(d2 <= (rf * sigma) ** 2, 1 / (1 + d2 / sigma ** 2), 0)
        want.append((w * (f.astype(np.float64) @ g.T.astype(np.float64))).sum())
    want = np.asarray(want)
    # f32 vs f64 summation-order noise only
    np.testing.assert_allclose(out, want, atol=2e-2 * max(1.0, np.abs(want).max()))
