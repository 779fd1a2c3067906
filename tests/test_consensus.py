"""Match-consensus voting/NMS/IRLS-refit (pipeline/consensus.py) and its
extra_Ts hook into the correlator cascade."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umeregrobust_tpu.core.transforms import (apply_transform,
                                              random_rigid_transform,
                                              relative_rotation_error)
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


@pytest.mark.slow
class TestAdaptiveGate:
    """consensus_gate_inliers (r5, VERDICT r4 #2a): the lax.cond-gated
    rescue stack must (a) reproduce the always-on result exactly when the
    gate fires (inlier ratio below threshold), and (b) return the pure
    cascade winner when support is unimodal and the stack is skipped.

    slow-marked: each case runs full register_pair_features twice
    (~30-45 s of CPU compile) — together ~2.5 min of the commit tier."""

    def _inputs(self, rng, key, n=512, n_feat=16):
        from umeregrobust_tpu.core.transforms import apply_transform
        gt = np.asarray(random_rigid_transform(key, (), max_translation=4.0))
        pts_s = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
        pts_t = (pts_s @ gt[:3, :3].T + gt[:3, 3]).astype(np.float32)
        f = rng.normal(size=(n, n_feat)).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        mask = np.ones(n, bool)
        return gt, (jnp.asarray(pts_s), jnp.asarray(f), jnp.asarray(mask),
                    jnp.asarray(pts_t), jnp.asarray(f), jnp.asarray(mask))

    def _run(self, cfg, key, arrs):
        from umeregrobust_tpu.pipeline.registration import (
            _hypotheses_and_select)
        ps, fs, ms, pt, ft, mt = arrs
        best_T, _, _ = _hypotheses_and_select(
            cfg, key, ps, fs, ms, pt, ft, mt,
            ps, fs, ms, pt, ft, mt)
        return np.asarray(best_T)

    def test_gate_fires_equals_always_on(self, rng, key):
        from umeregrobust_tpu.pipeline.registration import RegistrationConfig
        gt, arrs = self._inputs(rng, key)
        base = dict(num_init_keypoints=128, ume_n_samples=64,
                    ume_max_nn=64, corr_coarse_src=None, corr_rescore_top=8,
                    corr_triage_src=None, consensus_cands=4,
                    consensus_struct_cap=256, consensus_polish_rows=128)
        # gate=2.0: the inlier ratio is always < 2, so the cond-true branch
        # runs on every pair — must equal the static always-on program
        T_static = self._run(RegistrationConfig(**base), key, arrs)
        T_gated = self._run(
            RegistrationConfig(consensus_gate_inliers=2.0, **base), key, arrs)
        np.testing.assert_array_equal(T_static, T_gated)

    def test_gate_skip_returns_cascade_winner(self, rng, key):
        from umeregrobust_tpu.pipeline.registration import RegistrationConfig
        gt, arrs = self._inputs(rng, key)
        base = dict(num_init_keypoints=128, ume_n_samples=64,
                    ume_max_nn=64, corr_coarse_src=None, corr_rescore_top=8,
                    corr_triage_src=None, consensus_struct_cap=256,
                    consensus_polish_rows=128)
        # identical clouds (same feature rows) -> matching is perfect, the
        # cascade winner has inlier ratio ~1, and a small gate SKIPS the
        # rescue stack: the result must be the pure cascade winner (the
        # consensus-off program's output)
        T_off = self._run(RegistrationConfig(consensus_cands=0, **base),
                          key, arrs)
        T_skip = self._run(
            RegistrationConfig(consensus_cands=4,
                               consensus_gate_inliers=0.2, **base),
            key, arrs)
        np.testing.assert_allclose(T_off, T_skip, atol=1e-5)
        # and the winner is actually correct (sanity: perfect matches)
        rre = relative_rotation_error(jnp.asarray(T_skip[:3, :3]),
                                      jnp.asarray(gt[:3, :3]))
        assert float(rre) < 5.0


@pytest.mark.slow
class TestSecondRound:
    """Overlap-aware second-round resampling (r5, VERDICT r4 #3).
    slow-marked: see TestAdaptiveGate."""

    def _setup(self, rng, key):
        gate = TestAdaptiveGate()
        return gate._inputs(rng, key), gate._run

    def test_sr_skipped_on_strong_support(self, rng, key):
        """Perfect matches -> inlier ratio ~1 -> the second round must not
        fire: result identical to sr off."""
        from umeregrobust_tpu.pipeline.registration import RegistrationConfig
        (gt, arrs), run = self._setup(rng, key)
        base = dict(num_init_keypoints=128, ume_n_samples=64,
                    ume_max_nn=64, corr_coarse_src=None, corr_rescore_top=8,
                    corr_triage_src=None, consensus_cands=4,
                    consensus_struct_cap=256, consensus_polish_rows=128)
        T_off = run(RegistrationConfig(**base), key, arrs)
        T_sr = run(RegistrationConfig(sr_kpts=64, sr_hyps=32,
                                      sr_gate_inliers=0.2, **base),
                   key, arrs)
        np.testing.assert_array_equal(T_off, T_sr)

    def test_sr_forced_is_rigid_and_accurate(self, rng, key):
        """sr_gate_inliers=2.0 forces the second round on a well-posed
        pair: the arbiter must not lose the (correct) round-1 winner —
        T0 competes in the polished candidate set."""
        from umeregrobust_tpu.pipeline.registration import RegistrationConfig
        (gt, arrs), run = self._setup(rng, key)
        base = dict(num_init_keypoints=128, ume_n_samples=64,
                    ume_max_nn=64, corr_coarse_src=None, corr_rescore_top=8,
                    corr_triage_src=None, consensus_cands=4,
                    consensus_struct_cap=256, consensus_polish_rows=128)
        T = run(RegistrationConfig(sr_kpts=64, sr_hyps=32,
                                   sr_gate_inliers=2.0, **base), key, arrs)
        assert np.isfinite(T).all()
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
        rre = relative_rotation_error(jnp.asarray(T[:3, :3]),
                                      jnp.asarray(gt[:3, :3]))
        assert float(rre) < 5.0

    def test_overlap_weight_marks_coobserved(self, rng):
        """_overlap_weight flags q points with a k point within ~radius and
        not isolated ones."""
        from umeregrobust_tpu.pipeline.registration import _overlap_weight
        k_pts = rng.uniform(0, 10, size=(500, 3)).astype(np.float32)
        q_near = k_pts[:100] + rng.normal(0, 0.2, (100, 3)).astype(np.float32)
        q_far = q_near + np.float32([50.0, 0, 0])
        q = jnp.asarray(np.concatenate([q_near, q_far]))
        m = jnp.ones(200, bool)
        km = jnp.ones(500, bool)
        w = np.asarray(_overlap_weight(q, m, jnp.asarray(k_pts), km,
                                       2.0, (40, 40, 40)))
        assert w[:100].all()
        assert not w[100:].any()
