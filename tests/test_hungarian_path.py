"""Hungarian parity mode (reference evaluate.py:216-222,
hungarian_matching_flag): the two-phase host/device split must produce a
rigid transform, and with transform-invariant features it must recover a
synthetic rigid motion like the argmin path does."""
import jax
import jax.numpy as jnp
import numpy as np

from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
from umeregrobust_tpu.pipeline.registration import (
    RegistrationConfig, register_pair_features, register_pair_hungarian)

import pytest

pytestmark = pytest.mark.slow  # heavy tier; fast gate runs -m 'not slow'

CFG = RegistrationConfig(num_init_keypoints=192, ume_n_samples=48,
                         ume_max_nn=128, corr_coarse_src=None,
                         corr_rescore_top=16, icp_max_corr=0.5,
                         icp_max_iter=15)


def _pair_with_invariant_features(seed, n=1500, c=8):
    pair = make_pair(SceneConfig(extent=10.0, ground_points=2500,
                                 structure_points=5000, n_boxes=8,
                                 n_walls=3, n_poles=4, dropout=0.2),
                     max_rotation_deg=60, max_translation=4.0, seed=seed)
    rng = np.random.default_rng(seed)
    gt = pair["gt_tform"]

    def cap(pts):
        idx = rng.choice(len(pts), min(len(pts), n), replace=False)
        out = np.zeros((n, 3), np.float32)
        out[: len(idx)] = pts[idx]
        return out, np.arange(n) < len(idx)

    sp, sm = cap(pair["src_pts"])
    tp, tm = cap(pair["tgt_pts"])
    # transform-invariant features: random Fourier functions of the full
    # 3D WORLD position (z-only features are yaw-ambiguous)
    gti = np.linalg.inv(gt)
    tw = tp @ gti[:3, :3].T + gti[:3, 3]
    W = rng.normal(scale=0.4, size=(3, c)).astype(np.float32)
    ph = rng.uniform(0, 2 * np.pi, size=c).astype(np.float32)

    def feat(world):
        return np.sin(world @ W + ph).astype(np.float32)

    sf = feat(sp) * sm[:, None]
    tf = feat(tw) * tm[:, None]
    return (gt, jnp.asarray(sp), jnp.asarray(sf), jnp.asarray(sm),
            jnp.asarray(tp), jnp.asarray(tf), jnp.asarray(tm))


def _rre(Ra, Rb):
    tr = np.clip(np.trace(Ra.T @ Rb), -1.0, 3.0)
    return float(np.degrees(np.arccos((tr - 1.0) / 2.0)))


def test_hungarian_recovers_rigid_transform():
    gt, sp, sf, sm, tp, tf, tm = _pair_with_invariant_features(3)
    res = register_pair_hungarian(
        CFG, jax.random.PRNGKey(0),
        sp, sf, sm, tp, tf, tm,
        sp, sf, sm, tp, tf, tm,
        rng=np.random.default_rng(0))
    T = np.asarray(res.T_refined)
    assert np.isfinite(T).all()
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    assert _rre(gt[:3, :3], R) < 2.0
    assert np.linalg.norm(T[:3, 3] - gt[:3, 3]) < 0.3


def test_hungarian_close_to_argmin_path():
    gt, sp, sf, sm, tp, tf, tm = _pair_with_invariant_features(7)
    res_h = register_pair_hungarian(
        CFG, jax.random.PRNGKey(1),
        sp, sf, sm, tp, tf, tm, sp, sf, sm, tp, tf, tm,
        rng=np.random.default_rng(1))
    res_a = register_pair_features(
        CFG, jax.random.PRNGKey(1),
        sp, sf, sm, tp, tf, tm, sp, sf, sm, tp, tf, tm)
    Th = np.asarray(res_h.T_refined)
    Ta = np.asarray(res_a.T_refined)
    # both land on the same GT basin after ICP
    assert _rre(Th[:3, :3], Ta[:3, :3]) < 2.0
    assert np.linalg.norm(Th[:3, 3] - Ta[:3, 3]) < 0.3
