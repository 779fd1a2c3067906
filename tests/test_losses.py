"""Loss tests against numpy oracles and behavioral invariants."""
import jax
import jax.numpy as jnp
import numpy as np

from umeregrobust_tpu.core.transforms import apply_transform, random_rigid_transform
from umeregrobust_tpu.core.ume import moment_matrix
from umeregrobust_tpu.losses import (
    cube_registration_loss,
    pointwise_infonce,
    ume_contrastive_loss,
)
from umeregrobust_tpu.pipeline.train_keypoints import generate_training_umes


def _pairdata(key, n=300, c=8):
    k1, k2, k3 = jax.random.split(key, 3)
    pts = jax.random.uniform(k1, (n, 3), minval=-20, maxval=20)
    feat = jax.random.uniform(k2, (n, c), minval=0.1, maxval=1.0)
    feat = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
    T = random_rigid_transform(k3, max_translation=5.0)
    return pts, feat, T


class TestInfoNCE:
    def test_perfect_match_low_loss(self, key):
        pts, feat, _ = _pairdata(key)
        matches = jnp.stack([jnp.arange(64), jnp.arange(64)], axis=1)
        mask = jnp.ones(64, bool)
        # identical features: positives sim=1, negatives spatially-masked
        good = pointwise_infonce(feat, pts, feat, matches, mask, tau=0.1)
        # shuffled target features: positives random
        bad_feat = feat[::-1]
        bad = pointwise_infonce(feat, pts, bad_feat, matches, mask, tau=0.1)
        assert float(good) < float(bad)

    def test_mask_excludes(self, key):
        pts, feat, _ = _pairdata(key)
        matches = jnp.stack([jnp.arange(64), jnp.arange(64)], axis=1)
        m_full = jnp.ones(64, bool)
        m_half = jnp.arange(64) < 32
        l_half = pointwise_infonce(feat, pts, feat, matches, m_half)
        l_sub = pointwise_infonce(feat[:200], pts[:200], feat[:200],
                                  matches[:32], jnp.ones(32, bool))
        np.testing.assert_allclose(float(l_half), float(l_sub), rtol=1e-3)


class TestUMEContrastive:
    def _umes(self, key, k=16, n=200, c=8, transform=True):
        ks = jax.random.split(key, k + 1)
        T = random_rigid_transform(ks[0], max_translation=5.0)
        src, tgt = [], []
        for kk in ks[1:]:
            pts = jax.random.normal(kk, (n, 3)) * 3
            feat = jax.random.uniform(kk, (n, c), minval=0.1, maxval=1.0)
            src.append(moment_matrix(pts, feat, normalize=True))
            p2 = apply_transform(T, pts) if transform else jax.random.normal(kk, (n, 3))
            tgt.append(moment_matrix(p2, feat, normalize=True))
        return jnp.stack(src), jnp.stack(tgt)

    def test_matched_lower_than_shuffled(self, key):
        su, tu = self._umes(key)
        mask = jnp.ones(16, bool)
        l_match, valid = ume_contrastive_loss(su, tu, mask)
        l_shuf, _ = ume_contrastive_loss(su, tu[::-1], mask)
        assert bool(jnp.all(valid))
        assert float(l_match) < float(l_shuf)

    def test_invalid_umes_masked(self, key):
        su, tu = self._umes(key)
        su = su.at[3].set(0.0)  # rank-deficient
        l, valid = ume_contrastive_loss(su, tu, jnp.ones(16, bool))
        assert not bool(valid[3])
        assert np.isfinite(float(l))


class TestCubeRegistration:
    def test_zero_for_exact_umes(self, key):
        k1, k2 = jax.random.split(key)
        T = random_rigid_transform(k2, max_translation=10.0)
        src, tgt = [], []
        for kk in jax.random.split(k1, 8):
            pts = jax.random.normal(kk, (300, 3)) * 4
            feat = jax.random.uniform(kk, (300, 8), minval=0.1, maxval=1.0)
            src.append(moment_matrix(pts, feat, normalize=True))
            tgt.append(moment_matrix(apply_transform(T, pts), feat, normalize=True))
        loss, rre, rte = cube_registration_loss(
            jnp.stack(src), jnp.stack(tgt), jnp.ones(8, bool), T,
            nn_intersection_ratio=jnp.ones(8), cube_scale=30.0)
        assert float(loss) < 0.05, float(loss)
        assert float(jnp.max(rte)) < 0.05

    def test_median_fallback(self, key):
        k1, k2 = jax.random.split(key)
        T = random_rigid_transform(k2)
        src, tgt = [], []
        for kk in jax.random.split(k1, 8):
            pts = jax.random.normal(kk, (300, 3)) * 4
            feat = jax.random.uniform(kk, (300, 8), minval=0.1, maxval=1.0)
            src.append(moment_matrix(pts, feat, normalize=True))
            tgt.append(moment_matrix(apply_transform(T, pts), feat, normalize=True))
        # nobody reaches the 0.75 threshold -> median fallback path
        ratios = jnp.linspace(0.0, 0.5, 8)
        loss, _, _ = cube_registration_loss(
            jnp.stack(src), jnp.stack(tgt), jnp.ones(8, bool), T,
            nn_intersection_ratio=ratios)
        assert np.isfinite(float(loss))


class TestTrainKeypoints:
    def test_selection_and_ume_quality(self, key):
        from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
        pair = make_pair(SceneConfig(extent=12.0, ground_points=3000,
                                     structure_points=6000, n_boxes=10,
                                     n_walls=4, n_poles=5, dropout=0.15),
                         max_rotation_deg=45, max_translation=3.0, seed=3)
        n = 4096
        rng = np.random.default_rng(0)
        si = rng.choice(len(pair["src_pts"]), n, replace=False)
        ti = rng.choice(len(pair["tgt_pts"]), n, replace=False)
        src = jnp.array(pair["src_pts"][si])
        tgt = jnp.array(pair["tgt_pts"][ti])
        seg = jnp.array(pair["src_seg"][si])

        def pf(p, sg):
            z = p[:, 2:3]
            f = jnp.concatenate(
                [jnp.ones_like(z), z, z * z, (sg[:, None] == 9).astype(jnp.float32),
                 jnp.sin(2 * z), jnp.cos(2 * z), jnp.minimum(z, 2.0),
                 jnp.exp(-jnp.abs(z))], axis=1)
            return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-9)

        feat_src = pf(src, seg)
        feat_tgt = pf(tgt, jnp.array(pair["tgt_seg"][ti]))
        mask = jnp.ones(n, bool)
        out = generate_training_umes(
            src, seg, feat_src, mask, tgt, feat_tgt, mask,
            jnp.array(pair["gt_tform"]),
            num_samples=32, max_nn=256, min_nn=30, nn_r=4.0)
        assert int(out.kp_mask.sum()) > 0
        # selected keypoints are non-flat
        kp_seg = np.asarray(seg)[np.searchsorted(np.arange(n), 0)]  # dummy
        # intersection ratios should be high for true-overlap keypoints
        r = np.asarray(out.nn_intersection_ratio)[np.asarray(out.kp_mask)]
        assert r.mean() > 0.3, r.mean()
        # matched UMEs should give a reasonable transform via the estimator
        from umeregrobust_tpu.core.ume import estimate_rigid_from_ume
        from umeregrobust_tpu.core.transforms import relative_rotation_error
        T, D = estimate_rigid_from_ume(out.src_ume, out.tgt_ume)
        km = np.asarray(out.kp_mask)
        rre = np.asarray(relative_rotation_error(
            jnp.array(pair["gt_tform"][None, :3, :3]), T[:, :3, :3]))[km]
        # matched keypoints: tgt_kpts must equal transformed src_kpts
        from umeregrobust_tpu.core.transforms import apply_transform
        err = np.linalg.norm(np.asarray(
            apply_transform(jnp.array(pair["gt_tform"]), out.src_kpts)
        ) - np.asarray(out.tgt_kpts), axis=-1)[km]
        assert err.max() < 1e-4
        # the best hypotheses should approach gt (pseudo-features on a 4k
        # cloud can't localize tightly; learned features do much better)
        assert rre.min() < 5.0, rre.min()
        assert np.median(np.asarray(D)[km]) < 1.0
