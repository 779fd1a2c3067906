"""Match-consensus voting/NMS/IRLS-refit (pipeline/consensus.py) and its
extra_Ts hook into the correlator cascade."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umeregrobust_tpu.core.transforms import (apply_transform,
                                              random_rigid_transform)
from umeregrobust_tpu.pipeline.consensus import consensus_refit


def _mock_matches(rng, gt, n=512, n_inlier=60, noise=0.35, extent=25.0):
    """n matched pairs: n_inlier correct (GT correspondence + noise), the
    rest random garbage. Returns (s_kp, t_kp, inlier_mask)."""
    s = rng.uniform(-extent, extent, size=(n, 3)).astype(np.float32)
    t = rng.uniform(-extent, extent, size=(n, 3)).astype(np.float32)
    t[:n_inlier] = (s[:n_inlier] @ np.asarray(gt)[:3, :3].T
                    + np.asarray(gt)[:3, 3]
                    + rng.normal(0, noise, (n_inlier, 3)))
    inl = np.zeros(n, bool)
    inl[:n_inlier] = True
    return s.astype(np.float32), t.astype(np.float32), inl


def _hyps_from_matches(key, s_kp, t_kp, inlier, gt, rot_noise=0.15):
    """One hypothesis per match, mimicking the single-match UME estimator:
    inlier hypotheses are GT + noise; outlier hypotheses are random."""
    n = len(s_kp)
    rand = random_rigid_transform(key, (n,), max_translation=20.0)
    Ts = np.array(rand)  # writable copy
    g = np.asarray(gt)
    rng = np.random.default_rng(7)
    for i in np.where(inlier)[0]:
        # perturb GT: small rotation about a random axis + translation noise
        ax = rng.normal(size=3)
        ax /= np.linalg.norm(ax)
        a = rng.normal(0, rot_noise)
        K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                      [-ax[1], ax[0], 0]])
        dR = (np.eye(3) + np.sin(a) * K
              + (1 - np.cos(a)) * (K @ K)).astype(np.float32)
        Ts[i, :3, :3] = dR @ g[:3, :3]
        Ts[i, :3, 3] = g[:3, 3] + rng.normal(0, 0.8, 3)
        Ts[i, 3] = [0, 0, 0, 1]
    return jnp.asarray(Ts)


class TestConsensusRefit:
    def test_recovers_gt_from_noisy_inliers(self, rng, key):
        """With ~12% correct matches, one NMS candidate must refit to within
        a few cm / a fraction of a degree of GT — far tighter than any
        single inlier hypothesis (0.8 m translation noise)."""
        gt = np.asarray(random_rigid_transform(key, (1,),
                                               max_translation=12.0))[0]
        s_kp, t_kp, inl = _mock_matches(rng, gt)
        Ts = _hyps_from_matches(jax.random.fold_in(key, 1), s_kp, t_kp, inl,
                                gt)
        cand = consensus_refit(Ts, jnp.asarray(s_kp), jnp.asarray(t_kp),
                               jnp.ones(len(s_kp), bool), n_cand=8)
        cand = np.asarray(cand)
        rre = []
        rte = []
        for T in cand:
            Rrel = T[:3, :3] @ gt[:3, :3].T
            c = np.clip((np.trace(Rrel) - 1) / 2, -1, 1)
            rre.append(np.degrees(np.arccos(c)))
            rte.append(np.linalg.norm(T[:3, 3] - gt[:3, 3]))
        j = int(np.argmin(np.asarray(rre) + np.asarray(rte)))
        assert rre[j] < 0.5, (rre, rte)
        assert rte[j] < 0.15, (rre, rte)

    def test_nms_yields_distinct_modes(self, rng, key):
        """Two planted consensus modes -> both must appear among the
        candidates (NMS may not spend every slot on the stronger one)."""
        gt1 = np.asarray(random_rigid_transform(key, (1,),
                                                max_translation=10.0))[0]
        gt2 = np.asarray(random_rigid_transform(
            jax.random.fold_in(key, 5), (1,), max_translation=10.0))[0]
        s1, t1, _ = _mock_matches(rng, gt1, n=256, n_inlier=50)
        s2, t2, _ = _mock_matches(rng, gt2, n=256, n_inlier=30)
        s = np.concatenate([s1, s2])
        t = np.concatenate([t1, t2])
        inl = np.zeros(512, bool)
        inl[:50] = True
        inl[256:286] = True
        Ts1 = _hyps_from_matches(jax.random.fold_in(key, 2), s1, t1,
                                 inl[:256], gt1)
        Ts2 = _hyps_from_matches(jax.random.fold_in(key, 3), s2, t2,
                                 inl[256:], gt2)
        Ts = jnp.concatenate([Ts1, Ts2])
        cand = np.asarray(consensus_refit(
            Ts, jnp.asarray(s), jnp.asarray(t), jnp.ones(512, bool),
            n_cand=8))

        def best_err(gt):
            errs = []
            for T in cand:
                Rrel = T[:3, :3] @ gt[:3, :3].T
                c = np.clip((np.trace(Rrel) - 1) / 2, -1, 1)
                errs.append(np.degrees(np.arccos(c))
                            + np.linalg.norm(T[:3, 3] - gt[:3, 3]))
            return min(errs)

        assert best_err(gt1) < 1.0
        assert best_err(gt2) < 1.0

    def test_invalid_pairs_cannot_vote(self, key):
        """With every pair invalid, the refit must return the (unrefit)
        originals instead of NaNs."""
        Ts = random_rigid_transform(key, (64,), max_translation=5.0)
        s = jnp.zeros((64, 3), jnp.float32)
        t = jnp.zeros((64, 3), jnp.float32)
        cand = consensus_refit(Ts, s, t, jnp.zeros(64, bool), n_cand=4)
        assert bool(jnp.all(jnp.isfinite(cand)))
        # every candidate is one of the originals, untouched
        d = jnp.min(jnp.sum((cand[:, None] - Ts[None]) ** 2, axis=(-2, -1)),
                    axis=1)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-12)


class TestExtraTs:
    def test_extra_candidate_can_win(self, rng, key):
        """GT only present as an extra_Ts row -> it must be returned, and
        the scores vector must keep the main-set indexing."""
        from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
        from umeregrobust_tpu.pipeline.correlator import select_best_transform
        pair = make_pair(SceneConfig(extent=12.0, ground_points=2500,
                                     structure_points=5000, n_boxes=10,
                                     n_walls=4, n_poles=5, dropout=0.2),
                         max_rotation_deg=60, max_translation=4.0, seed=23)
        n = 1500
        si = rng.choice(len(pair["src_pts"]), n, replace=False)
        ti = rng.choice(len(pair["tgt_pts"]), n, replace=False)
        src = jnp.array(pair["src_pts"][si])
        tgt = jnp.array(pair["tgt_pts"][ti])
        fs = jnp.stack([src[:, 2],
                        jnp.array(pair["src_seg"][si], jnp.float32)], -1)
        ft = jnp.stack([tgt[:, 2],
                        jnp.array(pair["tgt_seg"][ti], jnp.float32)], -1)
        mask = jnp.ones(n, bool)
        bad = random_rigid_transform(key, (128,), max_translation=8.0)
        extra = jnp.concatenate(
            [random_rigid_transform(jax.random.fold_in(key, 9), (3,),
                                    max_translation=8.0),
             jnp.array(pair["gt_tform"])[None]], axis=0)
        for kwargs in (dict(),  # single-stage
                       dict(coarse_src=512, rescore_top=8),  # cascade
                       dict(coarse_src=512, rescore_top=8, triage_src=256,
                            triage_tgt=512, triage_top=32)):  # + triage
            best_T, scores = select_best_transform(
                src, fs, mask, tgt, ft, mask, bad, sigma=1.5, key=key,
                extra_Ts=extra, **kwargs)
            np.testing.assert_allclose(np.asarray(best_T),
                                       pair["gt_tform"], atol=1e-5)
            assert scores.shape == (128,)
