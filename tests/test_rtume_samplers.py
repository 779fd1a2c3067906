"""Tests for the RTUME keypoint layer and standalone keypoint samplers."""
import jax
import jax.numpy as jnp
import numpy as np

from umeregrobust_tpu.core.transforms import (
    apply_transform,
    random_rigid_transform,
    relative_rotation_error,
)
from umeregrobust_tpu.pipeline.keypoint_samplers import (
    sample_grid_keypoints,
    sample_smart_keypoints,
)
from umeregrobust_tpu.pipeline.rtume import rtume_estimate


def _scene(rng, n=3000):
    from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
    pair = make_pair(SceneConfig(extent=12.0, ground_points=1500,
                                 structure_points=3000, n_boxes=8,
                                 n_walls=3, n_poles=4, dropout=0.1),
                     max_rotation_deg=40, max_translation=3.0, seed=21)
    si = rng.choice(len(pair["src_pts"]), n, replace=False)
    return pair, si


class TestRTUME:
    def test_diag_recovers_transform(self, rng, key):
        pair, si = _scene(rng)
        src = jnp.array(pair["src_pts"][si])
        T_gt = jnp.array(pair["gt_tform"])
        tgt = apply_transform(T_gt, src)  # exact correspondence clouds
        z = src[:, 2:3]
        feat = jnp.concatenate(
            [jnp.ones_like(z), z, z * z, jnp.sin(z), jnp.cos(z),
             jnp.exp(-jnp.abs(z)), jnp.minimum(z, 1.0), z ** 3], axis=1)
        kp_idx = rng.choice(len(si), 16, replace=False)
        src_kp = src[kp_idx]
        tgt_kp = apply_transform(T_gt, src_kp)
        T, D, G, H = rtume_estimate(src, feat, src_kp, tgt, feat, tgt_kp,
                                    ume_knn=256, ume_desc_rad=4.0)
        rre = np.asarray(relative_rotation_error(
            jnp.broadcast_to(T_gt[:3, :3], (16, 3, 3)), T[:, :3, :3]))
        assert np.median(rre) < 1.0, np.median(rre)
        assert np.median(np.asarray(D)) < 0.05

    def test_full_grid_shapes(self, rng, key):
        pts = jnp.array(rng.normal(size=(500, 3)).astype(np.float32) * 5)
        feat = jnp.array(rng.uniform(0.1, 1, size=(500, 8)).astype(np.float32))
        kp = pts[:6]
        T, D, G, H = rtume_estimate(pts, feat, kp, pts, feat, kp,
                                    ume_knn=64, ume_desc_rad=3.0,
                                    diag_only=False)
        assert T.shape == (6, 6, 4, 4) and D.shape == (6, 6)
        # diagonal of the full grid = identity pairs -> D ~ 0
        assert float(jnp.max(jnp.diagonal(D))) < 1e-3

    def test_random_triplets(self, rng, key):
        pts = jnp.array(rng.normal(size=(500, 3)).astype(np.float32) * 5)
        feat = jnp.array(rng.uniform(0.1, 1, size=(500, 8)).astype(np.float32))
        kp = pts[:8]
        T, D, _, _ = rtume_estimate(pts, feat, kp, pts, feat, kp,
                                    ume_knn=64, ume_desc_rad=3.0,
                                    n_rand=12, key=key)
        assert T.shape == (12, 4, 4)


class TestSamplers:
    def test_smart_keypoints_properties(self, rng):
        pair, si = _scene(rng)
        pts = jnp.array(pair["src_pts"][si])
        seg = jnp.array(pair["src_seg"][si])
        mask = jnp.ones(len(si), bool)
        kpts, km = sample_smart_keypoints(pts, seg, mask, num_samples=64,
                                          nn_r=3.0, max_nn=128, min_nn=10)
        km = np.asarray(km)
        assert km.sum() > 0
        k = np.asarray(kpts)[km]
        # spacing: no two keypoints share a 3 m voxel cell
        cells = np.floor(k / 3.0).astype(int)
        assert len(np.unique(cells, axis=0)) == len(cells)

    def test_grid_keypoints(self, rng):
        pair, si = _scene(rng)
        pts = jnp.array(pair["src_pts"][si])
        seg = jnp.array(pair["src_seg"][si])
        mask = jnp.ones(len(si), bool)
        kpts, km = sample_grid_keypoints(pts, seg, mask, num_samples=64,
                                         nn_r=3.0, max_nn=128, min_nn=10,
                                         grid_extent=14.0)
        assert int(np.asarray(km).sum()) > 0
