"""Brute-force oracle tests for ball query / kNN / padded gather."""
import jax
import jax.numpy as jnp
import numpy as np

from umeregrobust_tpu.ops.neighbors import ball_query, gather_padded, knn, pairwise_sqdist


def _clouds(rng, m=37, n=211):
    q = rng.normal(size=(m, 3)).astype(np.float32) * 2
    p = rng.normal(size=(n, 3)).astype(np.float32) * 2
    return q, p


class TestBallQuery:
    def test_matches_bruteforce_first_k(self, rng):
        q, p = _clouds(rng)
        r, K = 1.5, 8
        idx = np.asarray(ball_query(jnp.array(q), jnp.array(p), radius=r, K=K))
        d = np.linalg.norm(q[:, None] - p[None], axis=-1)
        for i in range(q.shape[0]):
            want = np.where(d[i] <= r)[0][:K]
            got = idx[i][idx[i] >= 0]
            np.testing.assert_array_equal(got, want)
            assert np.all(idx[i][len(want):] == -1)

    def test_point_mask_excludes(self, rng):
        q, p = _clouds(rng, m=16, n=64)
        pm = np.zeros(64, bool)
        pm[: 32] = True
        idx = np.asarray(
            ball_query(jnp.array(q), jnp.array(p), radius=2.0, K=10, p_mask=jnp.array(pm))
        )
        assert np.all(idx < 32)

    def test_query_mask(self, rng):
        q, p = _clouds(rng, m=8, n=64)
        qm = jnp.array([True, False] * 4)
        idx = np.asarray(ball_query(jnp.array(q), jnp.array(p), radius=5.0, K=4, q_mask=qm))
        assert np.all(idx[1::2] == -1)

    def test_nonmultiple_chunk(self, rng):
        q, p = _clouds(rng, m=300, n=100)
        idx = ball_query(jnp.array(q), jnp.array(p), radius=2.0, K=5, chunk=128)
        assert idx.shape == (300, 5)


class TestKNN:
    def test_matches_bruteforce(self, rng):
        q, p = _clouds(rng)
        K = 5
        d, idx = knn(jnp.array(q), jnp.array(p), K=K)
        d, idx = np.asarray(d), np.asarray(idx)
        dd = np.linalg.norm(q[:, None] - p[None], axis=-1)
        want_idx = np.argsort(dd, axis=1)[:, :K]
        want_d = np.take_along_axis(dd, want_idx, axis=1)
        np.testing.assert_allclose(d, want_d, atol=1e-4)
        # indices may tie-swap; compare distances per slot instead
        got_d = np.take_along_axis(dd, idx, axis=1)
        np.testing.assert_allclose(got_d, want_d, atol=1e-4)

    def test_p_mask(self, rng):
        q, p = _clouds(rng, m=10, n=50)
        pm = np.zeros(50, bool)
        pm[:10] = True
        _, idx = knn(jnp.array(q), jnp.array(p), K=3, p_mask=jnp.array(pm))
        assert np.all(np.asarray(idx) < 10)


class TestGatherPadded:
    def test_pad_rows_zero(self, rng):
        x = rng.normal(size=(10, 4)).astype(np.float32)
        idx = jnp.array([[0, -1, 3], [9, 2, -1]])
        out = np.asarray(gather_padded(jnp.array(x), idx))
        np.testing.assert_allclose(out[0, 0], x[0])
        np.testing.assert_allclose(out[0, 1], 0.0)
        np.testing.assert_allclose(out[1, 2], 0.0)
        np.testing.assert_allclose(out[1, 0], x[9])


def test_pairwise_sqdist_oracle(rng):
    q, p = _clouds(rng, m=20, n=30)
    d2 = np.asarray(pairwise_sqdist(jnp.array(q), jnp.array(p)))
    want = ((q[:, None] - p[None]) ** 2).sum(-1)
    np.testing.assert_allclose(d2, want, atol=1e-4)
