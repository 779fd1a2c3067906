"""Inlier-ratio eval metric (Hungarian-matched UME keypoints)."""
import jax.numpy as jnp
import numpy as np

from umeregrobust_tpu.core.transforms import apply_transform
from umeregrobust_tpu.pipeline.eval_metrics import calc_inlier_ratio


def test_inlier_ratio_high_for_exact_pair(rng):
    from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
    pair = make_pair(SceneConfig(extent=10.0, ground_points=2000,
                                 structure_points=4000, n_boxes=8,
                                 n_walls=3, n_poles=4, dropout=0.0,
                                 noise_std=0.0),
                     max_rotation_deg=30, max_translation=2.0, seed=13)
    n = 3000
    si = rng.choice(len(pair["src_pts"]), n, replace=False)
    src = jnp.array(pair["src_pts"][si])
    seg = jnp.array(pair["src_seg"][si])
    gt = jnp.array(pair["gt_tform"])
    tgt = apply_transform(gt, src)  # exact correspondences
    z = src[:, 2:3]
    feat = jnp.concatenate(
        [jnp.ones_like(z), z, z * z, jnp.sin(z), jnp.cos(z),
         jnp.exp(-jnp.abs(z)), jnp.minimum(z, 1.0), z ** 3], axis=1)
    mask = jnp.ones(n, bool)
    r = calc_inlier_ratio(src, seg, feat, mask, tgt, feat, mask, gt,
                          ume_r_nn=4.0, ume_max_nn=256, ume_min_nn=20,
                          eval_num_kpts=32, inlier_thr=0.6)
    assert r > 0.5, r


def test_inlier_ratio_low_for_shuffled_features(rng):
    from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
    pair = make_pair(SceneConfig(extent=10.0, ground_points=2000,
                                 structure_points=4000, n_boxes=8,
                                 n_walls=3, n_poles=4, dropout=0.0,
                                 noise_std=0.0),
                     max_rotation_deg=30, max_translation=2.0, seed=14)
    n = 3000
    si = rng.choice(len(pair["src_pts"]), n, replace=False)
    src = jnp.array(pair["src_pts"][si])
    seg = jnp.array(pair["src_seg"][si])
    gt = jnp.array(pair["gt_tform"])
    tgt = apply_transform(gt, src)
    feat_src = jnp.array(rng.uniform(0.1, 1, size=(n, 8)).astype(np.float32))
    feat_tgt = jnp.array(rng.uniform(0.1, 1, size=(n, 8)).astype(np.float32))
    mask = jnp.ones(n, bool)
    r_rand = calc_inlier_ratio(src, seg, feat_src, mask, tgt, feat_tgt, mask,
                               gt, ume_r_nn=4.0, ume_max_nn=256,
                               ume_min_nn=20, eval_num_kpts=32,
                               inlier_thr=0.6)
    # random features should match worse than transform-invariant ones
    assert 0.0 <= r_rand <= 1.0
