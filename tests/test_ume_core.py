"""Exact-oracle tests for the UME core (moment matrices, subspace distance,
closed-form estimator) against synthetic rigid transforms."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umeregrobust_tpu.core import (
    apply_transform,
    estimate_rigid_from_ume,
    invert_rigid,
    make_transform,
    moment_matrix,
    random_rigid_transform,
    relative_rotation_error,
    relative_translation_error,
    subspace_projection,
    ume_distance,
    ume_pairwise_distance,
    ume_validity_mask,
)


def _neighborhood(key, n=200, c=8):
    kp, kf = jax.random.split(key)
    pts = jax.random.normal(kp, (n, 3)) * 2.0
    feat = jax.random.uniform(kf, (n, c)) + 0.1
    return pts, feat


class TestTransforms:
    def test_invert(self, key):
        T = random_rigid_transform(key, (5,))
        eye = T @ invert_rigid(T)
        np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(4), (5, 1, 1)), atol=1e-5)

    def test_rre_zero_for_same(self, key):
        T = random_rigid_transform(key, (4,))
        R = T[:, :3, :3]
        err = relative_rotation_error(R, R)
        # acos near trace=3 is ill-conditioned in fp32; ~0.05 deg of noise is expected
        assert np.all(np.asarray(err) < 0.1)

    def test_rre_known_angle(self):
        ang = np.radians(30.0)
        R = jnp.array(
            [[np.cos(ang), -np.sin(ang), 0.0], [np.sin(ang), np.cos(ang), 0.0], [0, 0, 1.0]]
        )[None]
        err = relative_rotation_error(jnp.eye(3)[None], R)
        np.testing.assert_allclose(np.asarray(err), [30.0], atol=1e-3)


class TestMomentMatrix:
    def test_shapes_and_mask(self, key):
        pts, feat = _neighborhood(key)
        mask = jnp.arange(200) < 150
        F = moment_matrix(pts, feat, mask)
        assert F.shape == (8, 4)
        # masked rows must not contribute
        F2 = moment_matrix(pts[:150], feat[:150])
        np.testing.assert_allclose(np.asarray(F), np.asarray(F2), rtol=1e-6)

    def test_normalization_matches_reference_formula(self, key):
        pts, feat = _neighborhood(key)
        F = moment_matrix(pts, feat, normalize=True)
        Fu = moment_matrix(pts, feat, normalize=False)
        total = float(jnp.sum(Fu[:, 0]))
        np.testing.assert_allclose(np.asarray(F), np.asarray(Fu) / (total + 1e-6), rtol=1e-6)

    def test_subspace_invariance_under_rigid_transform(self, key):
        """Column space of F is invariant to rigid transforms of the points
        (the core UME property the whole method rests on)."""
        k1, k2 = jax.random.split(key)
        pts, feat = _neighborhood(k1)
        T = random_rigid_transform(k2)
        pts_t = apply_transform(T, pts)
        F1 = moment_matrix(pts, feat)
        F2 = moment_matrix(pts_t, feat)
        d = ume_distance(F1, F2)
        assert float(d) < 1e-4


class TestPairwiseDistance:
    def test_matches_bruteforce(self, key):
        keys = jax.random.split(key, 12)
        F1 = jnp.stack([moment_matrix(*_neighborhood(k)) for k in keys[:6]])
        F2 = jnp.stack([moment_matrix(*_neighborhood(k)) for k in keys[6:]])
        D = ume_pairwise_distance(F1, F2)
        P1 = subspace_projection(F1)
        P2 = subspace_projection(F2)
        brute = np.linalg.norm(
            np.asarray(P1)[:, None] - np.asarray(P2)[None], axis=(-2, -1)
        ) / np.sqrt(2.0)
        np.testing.assert_allclose(np.asarray(D), brute, atol=1e-5)

    def test_projection_packed_inner_products_exact(self, key):
        """<pack(P1), pack(P2)> must equal <P1, P2> (the sqrt(2) off-
        diagonal scaling makes the d(d+1)/2 packing exact — the matching
        cross matmul relies on it, pipeline/matching.argmin_match)."""
        from umeregrobust_tpu.core.ume import projection_packed

        keys = jax.random.split(key, 8)
        F1 = jnp.stack([moment_matrix(*_neighborhood(k)) for k in keys[:4]])
        F2 = jnp.stack([moment_matrix(*_neighborhood(k)) for k in keys[4:]])
        p1 = np.asarray(projection_packed(F1))
        p2 = np.asarray(projection_packed(F2))
        P1 = np.asarray(subspace_projection(F1)).reshape(4, -1)
        P2 = np.asarray(subspace_projection(F2)).reshape(4, -1)
        np.testing.assert_allclose(p1 @ p2.T, P1 @ P2.T, atol=1e-5)
        d = F1.shape[1]
        assert p1.shape[-1] == d * (d + 1) // 2

    def test_diag_small_for_transformed_copies(self, key):
        k1, k2 = jax.random.split(key)
        T = random_rigid_transform(k2)
        F1, F2 = [], []
        for k in jax.random.split(k1, 8):
            pts, feat = _neighborhood(k)
            F1.append(moment_matrix(pts, feat))
            F2.append(moment_matrix(apply_transform(T, pts), feat))
        D = np.asarray(ume_pairwise_distance(jnp.stack(F1), jnp.stack(F2)))
        assert np.all(np.diag(D) < 1e-3)
        off = D + np.eye(8) * 10
        assert np.all(np.diag(D) < off.min(axis=1))


class TestEstimator:
    def test_recovers_exact_transform(self, key):
        """Synthetic oracle: UME of source and UME of rigidly transformed
        source (same features) must yield T == gt in the reference's call
        convention (G=UME(src), H=UME(tgt) -> T: src->tgt,
        evaluate.py:247-257)."""
        k1, k2 = jax.random.split(key)
        T_gt = random_rigid_transform(k2, max_translation=20.0)
        Gs, Hs = [], []
        for k in jax.random.split(k1, 16):
            pts, feat = _neighborhood(k, n=400, c=16)
            Gs.append(moment_matrix(pts, feat, normalize=True))
            Hs.append(moment_matrix(apply_transform(T_gt, pts), feat, normalize=True))
        T_est, D = estimate_rigid_from_ume(jnp.stack(Gs), jnp.stack(Hs))
        rre = relative_rotation_error(T_gt[None, :3, :3], T_est[:, :3, :3])
        rte = relative_translation_error(T_gt[None, :3, 3], T_est[:, :3, 3])
        # acos near trace=3 is fp32-ill-conditioned: ~0.05 deg noise floor
        assert np.all(np.asarray(rre) < 0.1), np.asarray(rre)
        assert np.all(np.asarray(rte) < 1e-3), np.asarray(rte)
        assert np.all(np.asarray(D) < 1e-3)

    def test_distance_large_for_unrelated(self, key):
        ks = jax.random.split(key, 8)
        G = jnp.stack([moment_matrix(*_neighborhood(k, n=300)) for k in ks[:4]])
        H = jnp.stack([moment_matrix(*_neighborhood(k, n=300)) for k in ks[4:]])
        _, D = estimate_rigid_from_ume(G, H)
        assert np.all(np.asarray(D) > 0.1)

    def test_validity_mask(self, key):
        pts, feat = _neighborhood(key)
        F_good = moment_matrix(pts, feat)
        F_bad = jnp.zeros_like(F_good)
        m = ume_validity_mask(jnp.stack([F_good, F_bad]))
        assert bool(m[0]) and not bool(m[1])

    def test_jit_and_vmap(self, key):
        pts, feat = _neighborhood(key)
        f = jax.jit(lambda p, ft: estimate_rigid_from_ume(
            moment_matrix(p, ft)[None], moment_matrix(p, ft)[None]))
        T, D = f(pts, feat)
        assert T.shape == (1, 4, 4)
        np.testing.assert_allclose(np.asarray(T[0, :3, 3]), 0.0, atol=1e-4)
