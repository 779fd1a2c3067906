"""'sp' points-axis sharding: the shard_map'd UME moment accumulation must
match the single-device fused path exactly (incl. the cross-shard
first-max_nn neighbor cap)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umeregrobust_tpu.parallel import make_mesh, ume_from_ball_query_sp
from umeregrobust_tpu.pipeline.ume_gen import ume_from_ball_query

pytestmark = pytest.mark.slow  # heavy tier; fast gate runs -m 'not slow'


@pytest.mark.parametrize("max_nn", [1000, 37])  # uncapped + cap straddles shards
def test_sp_sharded_matches_single_device(max_nn):
    assert jax.device_count() == 8
    rng = np.random.default_rng(0)
    N, C, M = 2048, 8, 96
    pts = rng.uniform(-10, 10, (N, 3)).astype(np.float32)
    feats = rng.normal(size=(N, C)).astype(np.float32)
    kpts = pts[rng.choice(N, M, replace=False)]
    p_mask = rng.uniform(size=N) > 0.1
    feats[~p_mask] = 0.0
    k_mask = rng.uniform(size=M) > 0.2

    ref = ume_from_ball_query(
        jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(kpts),
        radius=4.0, max_nn=max_nn, p_mask=jnp.asarray(p_mask),
        k_mask=jnp.asarray(k_mask), chunk=32)

    mesh = make_mesh(n_dp=1, n_sp=8)
    got = ume_from_ball_query_sp(
        mesh, jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(kpts),
        radius=4.0, max_nn=max_nn, p_mask=jnp.asarray(p_mask),
        k_mask=jnp.asarray(k_mask), chunk=32)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sp_cap_counts_global_index_order():
    """With a tiny cap, kept neighbors must be the FIRST max_nn in global
    index order — i.e. all on the earliest shards."""
    assert jax.device_count() == 8
    N, C = 512, 4
    pts = np.zeros((N, 3), np.float32)  # every point in radius of the kpt
    feats = np.ones((N, C), np.float32)
    kpts = np.zeros((1, 3), np.float32)
    mesh = make_mesh(n_dp=1, n_sp=8)
    got = ume_from_ball_query_sp(
        mesh, jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(kpts),
        radius=1.0, max_nn=100, normalize=False, chunk=8)
    # m0 = sum of kept features = exactly max_nn per channel
    np.testing.assert_allclose(np.asarray(got)[0, :, 0], 100.0)
