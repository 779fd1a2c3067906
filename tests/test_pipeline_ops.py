"""Pipeline-stage tests: fused UME generation vs explicit-gather oracle,
streaming argmin matching, correlator hypothesis selection, grid-NN + ICP."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umeregrobust_tpu.core.transforms import apply_transform, make_transform
from umeregrobust_tpu.core.ume import moment_matrix, ume_pairwise_distance
from umeregrobust_tpu.ops.gridnn import build_grid, nn_query
from umeregrobust_tpu.ops.neighbors import ball_query, gather_padded
from umeregrobust_tpu.pipeline.correlator import select_best_transform
from umeregrobust_tpu.pipeline.icp import icp_point_to_point, umeyama
from umeregrobust_tpu.pipeline.matching import argmin_match, probabilistic_match_filter
from umeregrobust_tpu.pipeline.ume_gen import ume_from_ball_query


def _cloud(rng, n=800, c=8, scale=10.0):
    pts = rng.uniform(-scale, scale, size=(n, 3)).astype(np.float32)
    feat = rng.uniform(0.1, 1.0, size=(n, c)).astype(np.float32)
    return jnp.array(pts), jnp.array(feat)


class TestFusedUME:
    def test_matches_gather_oracle(self, rng):
        pts, feat = _cloud(rng)
        kpts = pts[:32]
        r, K = 3.0, 40
        F = ume_from_ball_query(pts, feat, kpts, radius=r, max_nn=K,
                                normalize=False, chunk=16)
        idx = ball_query(kpts, pts, radius=r, K=K)
        nn_p = gather_padded(pts, idx)
        nn_f = gather_padded(feat, idx)
        want = moment_matrix(nn_p, nn_f, normalize=False)
        np.testing.assert_allclose(np.asarray(F), np.asarray(want), rtol=2e-5, atol=1e-4)

    def test_cap_semantics(self, rng):
        """With max_nn smaller than the true neighbor count, the first-K by
        index are used (PyTorch3D semantics)."""
        pts, feat = _cloud(rng, n=300, scale=2.0)  # dense -> caps bind
        kpts = pts[:8]
        r, K = 3.0, 10
        F = ume_from_ball_query(pts, feat, kpts, radius=r, max_nn=K,
                                normalize=False, chunk=8)
        idx = ball_query(kpts, pts, radius=r, K=K)
        want = moment_matrix(gather_padded(pts, idx), gather_padded(feat, idx))
        np.testing.assert_allclose(np.asarray(F), np.asarray(want), rtol=2e-5, atol=1e-4)

    def test_normalize_and_mask(self, rng):
        pts, feat = _cloud(rng)
        mask = jnp.array(np.arange(800) < 600)
        kpts = pts[:16]
        F = ume_from_ball_query(pts, feat, kpts, radius=4.0, max_nn=100,
                                p_mask=mask, normalize=True, chunk=16)
        idx = ball_query(kpts, pts, radius=4.0, K=100, p_mask=mask)
        want = moment_matrix(gather_padded(pts, idx), gather_padded(feat, idx),
                             normalize=True)
        np.testing.assert_allclose(np.asarray(F), np.asarray(want), rtol=2e-5, atol=1e-4)


class TestMatching:
    def test_argmin_matches_dense(self, rng, key):
        pts, feat = _cloud(rng, n=500)
        kp1, kp2 = pts[:40], pts[40:100]
        u1 = ume_from_ball_query(pts, feat, kp1, radius=4.0, max_nn=64)
        u2 = ume_from_ball_query(pts, feat, kp2, radius=4.0, max_nn=64)
        m, d = argmin_match(u1, u2, chunk=16)
        D = np.asarray(ume_pairwise_distance(u1, u2))
        np.testing.assert_array_equal(np.asarray(m), D.argmin(axis=1))
        np.testing.assert_allclose(np.asarray(d), D.min(axis=1), atol=1e-4)

    def test_prob_filter_prefers_small_distance(self, key):
        d = jnp.concatenate([jnp.full((50,), 0.01), jnp.full((950,), 0.9)])
        keep = probabilistic_match_filter(key, d, 40, tau=0.05)
        frac_good = float(jnp.mean((keep < 50).astype(jnp.float32)))
        assert frac_good > 0.8


class TestGridNN:
    def test_exact_within_radius(self, rng):
        p = rng.uniform(-5, 5, size=(700, 3)).astype(np.float32)
        q = rng.uniform(-5, 5, size=(200, 3)).astype(np.float32)
        r = 0.5
        grid = build_grid(jnp.array(p), jnp.ones(700, bool), cell=r)
        dist, idx = nn_query(grid, jnp.array(q), radius=r, budget=64)
        dist, idx = np.asarray(dist), np.asarray(idx)
        dd = np.linalg.norm(q[:, None] - p[None], axis=-1)
        best = dd.argmin(axis=1)
        for i in range(200):
            if dd[i, best[i]] <= r:
                assert idx[i] >= 0
                np.testing.assert_allclose(dist[i], dd[i, best[i]], atol=1e-5)
                assert np.isclose(dd[i, idx[i]], dd[i, best[i]], atol=1e-5)
            else:
                assert idx[i] == -1


class TestUmeyamaICP:
    def test_umeyama_exact(self, rng, key):
        p = jnp.array(rng.normal(size=(100, 3)).astype(np.float32))
        from umeregrobust_tpu.core.transforms import random_rigid_transform
        T = random_rigid_transform(key, max_translation=5.0)
        q = apply_transform(T, p)
        T_est = umeyama(p, q, jnp.ones(100))
        np.testing.assert_allclose(np.asarray(T_est), np.asarray(T), atol=1e-4)

    def test_icp_converges_from_perturbed_init(self, rng):
        from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
        pair = make_pair(SceneConfig(extent=15.0, ground_points=4000,
                                     structure_points=8000, n_boxes=12,
                                     n_walls=4, n_poles=6, dropout=0.2),
                         max_rotation_deg=30, max_translation=3.0, seed=5)
        src = jnp.array(pair["src_pts"])
        tgt = jnp.array(pair["tgt_pts"])
        gt = pair["gt_tform"]
        # perturb gt by a small rotation + translation
        ang = np.radians(2.0)
        dR = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        init = gt.copy()
        init[:3, :3] = dR @ gt[:3, :3]
        init[:3, 3] += np.array([0.15, -0.1, 0.05], np.float32)
        T, rmse, fit = icp_point_to_point(src, tgt, jnp.array(init),
                                          max_corr=0.4, max_iter=60)
        T = np.asarray(T)
        from umeregrobust_tpu.core.transforms import relative_rotation_error
        rre = float(relative_rotation_error(jnp.array(gt[None, :3, :3]),
                                            jnp.array(T[None, :3, :3]))[0])
        rte = float(np.linalg.norm(T[:3, 3] - gt[:3, 3]))
        assert rre < 0.5, rre
        assert rte < 0.1, rte


class TestRefineSchedule:
    def test_multires_matches_single_stage(self, rng):
        """The multi-resolution ICP schedule (coarse subsampled stage +
        exact full-res stage, registration.refine_with_icp) must land on
        the same transform as single-stage full-resolution ICP."""
        from dataclasses import replace

        from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
        from umeregrobust_tpu.pipeline.registration import (
            RegistrationConfig, refine_with_icp)

        pair = make_pair(SceneConfig(extent=15.0, ground_points=4000,
                                     structure_points=8000, n_boxes=12,
                                     n_walls=4, n_poles=6,
                                     observe_mode="lidar", baseline=3.0),
                         max_rotation_deg=30, max_translation=3.0, seed=5)
        gt = pair["gt_tform"]
        # randomized fill order (the multires stage slices a prefix)
        perm = rng.permutation(len(pair["src_pts"]))[:3000]
        src = jnp.asarray(pair["src_pts"][perm])
        tgt = jnp.asarray(pair["tgt_pts"][: 3000])
        m = jnp.ones((3000,), bool)
        ang = np.radians(2.0)
        dR = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        init = gt.copy()
        init[:3, :3] = dR @ gt[:3, :3]
        init[:3, 3] += np.array([0.2, -0.1, 0.05], np.float32)

        base = RegistrationConfig(icp_max_corr=0.4, icp_max_iter=60,
                                  icp_budget=32, icp_raw_iter=0)
        cfg_multi = replace(base, icp_multires=512, icp_multires_iter=40,
                            icp_multires_budget=8)
        cfg_single = replace(base, icp_multires=0)
        T_m, _, _ = refine_with_icp(cfg_multi, jnp.asarray(init),
                                    src, m, tgt, m)
        T_s, _, _ = refine_with_icp(cfg_single, jnp.asarray(init),
                                    src, m, tgt, m)
        np.testing.assert_allclose(np.asarray(T_m), np.asarray(T_s),
                                   atol=5e-3)
        rte = float(np.linalg.norm(np.asarray(T_m)[:3, 3] - gt[:3, 3]))
        assert rte < 0.1, rte

    def test_exact_rows_subsample_matches_full(self, rng):
        """icp_exact_rows caps the exact stage's source rows (a uniform
        subsample under the randomized-fill invariant); the resulting
        transform must agree with the full-rows fit far below the SP bar
        (fit noise scales as 1/sqrt(rows))."""
        from dataclasses import replace

        from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
        from umeregrobust_tpu.pipeline.registration import (
            RegistrationConfig, refine_with_icp)

        pair = make_pair(SceneConfig(extent=15.0, ground_points=4000,
                                     structure_points=8000, n_boxes=12,
                                     n_walls=4, n_poles=6,
                                     observe_mode="lidar", baseline=3.0),
                         max_rotation_deg=30, max_translation=3.0, seed=11)
        gt = pair["gt_tform"]
        perm = rng.permutation(len(pair["src_pts"]))[:3000]
        src = jnp.asarray(pair["src_pts"][perm])
        tgt = jnp.asarray(pair["tgt_pts"][:3000])
        m = jnp.ones((3000,), bool)
        ang = np.radians(1.5)
        dR = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        init = gt.copy()
        init[:3, :3] = dR @ gt[:3, :3]
        init[:3, 3] += np.array([0.15, -0.1, 0.05], np.float32)

        base = RegistrationConfig(icp_max_corr=0.4, icp_max_iter=60,
                                  icp_budget=32, icp_raw_iter=0,
                                  icp_multires=512, icp_multires_iter=40,
                                  icp_multires_budget=8)
        T_full, _, _ = refine_with_icp(base, jnp.asarray(init),
                                       src, m, tgt, m)
        T_sub, _, _ = refine_with_icp(replace(base, icp_exact_rows=1024),
                                      jnp.asarray(init), src, m, tgt, m)
        d_rot = np.abs(np.asarray(T_sub)[:3, :3] - np.asarray(T_full)[:3, :3])
        d_t = np.linalg.norm(np.asarray(T_sub)[:3, 3]
                             - np.asarray(T_full)[:3, 3])
        assert d_rot.max() < 5e-3, d_rot.max()
        assert d_t < 0.05, d_t
        rte = float(np.linalg.norm(np.asarray(T_sub)[:3, 3] - gt[:3, 3]))
        assert rte < 0.1, rte


class TestCorrelator:
    def test_selects_gt_hypothesis(self, rng, key):
        """Among random wrong hypotheses plus the true transform, the
        correlator must pick the true one."""
        from umeregrobust_tpu.core.transforms import random_rigid_transform
        from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
        pair = make_pair(SceneConfig(extent=12.0, ground_points=2500,
                                     structure_points=5000, n_boxes=10,
                                     n_walls=4, n_poles=5, dropout=0.2),
                         max_rotation_deg=60, max_translation=4.0, seed=7)
        n = 2000
        si = rng.choice(len(pair["src_pts"]), n, replace=False)
        ti = rng.choice(len(pair["tgt_pts"]), n, replace=False)
        src = jnp.array(pair["src_pts"][si])
        tgt = jnp.array(pair["tgt_pts"][ti])
        # geometric pseudo-features: height + label, transform-covariant
        def feats(p, seg):
            return jnp.stack([p[:, 2], jnp.array(seg, jnp.float32)], axis=-1)
        fs = feats(src, pair["src_seg"][si])
        ft = feats(tgt, pair["tgt_seg"][ti])
        mask = jnp.ones(n, bool)
        bad = random_rigid_transform(key, (15,), max_translation=8.0)
        Ts = jnp.concatenate([bad, jnp.array(pair["gt_tform"])[None]], axis=0)
        best_T, scores = select_best_transform(
            src, fs, mask, tgt, ft, mask, Ts, sigma=1.5, coarse_src=None)
        np.testing.assert_allclose(np.asarray(best_T), pair["gt_tform"], atol=1e-5)

    @pytest.mark.slow  # exhaustive cross-check; fast tier keeps test_selects_gt_hypothesis
    def test_two_stage_agrees_with_exact(self, rng, key):
        from umeregrobust_tpu.core.transforms import random_rigid_transform
        from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
        pair = make_pair(SceneConfig(extent=12.0, ground_points=2500,
                                     structure_points=5000, n_boxes=10,
                                     n_walls=4, n_poles=5, dropout=0.2),
                         max_rotation_deg=60, max_translation=4.0, seed=9)
        n = 2000
        si = rng.choice(len(pair["src_pts"]), n, replace=False)
        ti = rng.choice(len(pair["tgt_pts"]), n, replace=False)
        src = jnp.array(pair["src_pts"][si])
        tgt = jnp.array(pair["tgt_pts"][ti])
        fs = src[:, 2:3]
        ft = tgt[:, 2:3]
        mask = jnp.ones(n, bool)
        bad = random_rigid_transform(key, (127,), max_translation=8.0)
        Ts = jnp.concatenate([bad, jnp.array(pair["gt_tform"])[None]], axis=0)
        best_exact, _ = select_best_transform(
            src, fs, mask, tgt, ft, mask, Ts, sigma=1.5, coarse_src=None)
        best_2s, _ = select_best_transform(
            src, fs, mask, tgt, ft, mask, Ts, sigma=1.5,
            coarse_src=512, rescore_top=16, key=key)
        np.testing.assert_allclose(np.asarray(best_exact), np.asarray(best_2s))

    def test_triage_cascade_preserves_winner(self, rng, key):
        """The triage pre-stage (score all hypotheses on a tiny subsample,
        keep the top block for the coarse cascade) must still return the
        true transform, and its scores vector must carry the winner at the
        right row of the FULL hypothesis set."""
        from umeregrobust_tpu.core.transforms import random_rigid_transform
        from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
        pair = make_pair(SceneConfig(extent=12.0, ground_points=2500,
                                     structure_points=5000, n_boxes=10,
                                     n_walls=4, n_poles=5, dropout=0.2),
                         max_rotation_deg=60, max_translation=4.0, seed=13)
        n = 2000
        si = rng.choice(len(pair["src_pts"]), n, replace=False)
        ti = rng.choice(len(pair["tgt_pts"]), n, replace=False)
        src = jnp.array(pair["src_pts"][si])
        tgt = jnp.array(pair["tgt_pts"][ti])
        fs = jnp.stack([src[:, 2], jnp.array(pair["src_seg"][si], jnp.float32)], -1)
        ft = jnp.stack([tgt[:, 2], jnp.array(pair["tgt_seg"][ti], jnp.float32)], -1)
        mask = jnp.ones(n, bool)
        bad = random_rigid_transform(key, (255,), max_translation=8.0)
        gt_row = 100
        Ts = jnp.concatenate(
            [bad[:gt_row], jnp.array(pair["gt_tform"])[None], bad[gt_row:]],
            axis=0)  # 256 hypotheses, gt at an interior row
        best_T, scores = select_best_transform(
            src, fs, mask, tgt, ft, mask, Ts, sigma=1.5,
            coarse_src=512, rescore_top=8, key=key,
            triage_src=256, triage_tgt=512, triage_top=32)
        np.testing.assert_allclose(np.asarray(best_T), pair["gt_tform"],
                                   atol=1e-5)
        assert scores.shape == (256,)
        assert int(jnp.argmax(scores)) == gt_row
        # non-survivors are -inf, survivors of the exact stage are finite
        assert int(jnp.sum(jnp.isfinite(scores))) == 8

    def test_radius_mode_agrees_with_knn_on_winner(self, rng, key):
        """The MXU-native radius-capped scorer must select the same winning
        hypothesis as the reference-parity kNN scorer."""
        from umeregrobust_tpu.core.transforms import random_rigid_transform
        from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
        pair = make_pair(SceneConfig(extent=12.0, ground_points=2500,
                                     structure_points=5000, n_boxes=10,
                                     n_walls=4, n_poles=5, dropout=0.2),
                         max_rotation_deg=60, max_translation=4.0, seed=11)
        n = 1500
        si = rng.choice(len(pair["src_pts"]), n, replace=False)
        ti = rng.choice(len(pair["tgt_pts"]), n, replace=False)
        src = jnp.array(pair["src_pts"][si])
        tgt = jnp.array(pair["tgt_pts"][ti])
        fs = jnp.stack([src[:, 2], jnp.array(pair["src_seg"][si], jnp.float32)], -1)
        ft = jnp.stack([tgt[:, 2], jnp.array(pair["tgt_seg"][ti], jnp.float32)], -1)
        mask = jnp.ones(n, bool)
        bad = random_rigid_transform(key, (15,), max_translation=8.0)
        Ts = jnp.concatenate([bad, jnp.array(pair["gt_tform"])[None]], axis=0)
        b_knn, _ = select_best_transform(src, fs, mask, tgt, ft, mask, Ts,
                                         sigma=1.5, coarse_src=None, mode="knn")
        b_rad, _ = select_best_transform(src, fs, mask, tgt, ft, mask, Ts,
                                         sigma=1.5, coarse_src=None, mode="radius")
        np.testing.assert_allclose(np.asarray(b_knn), np.asarray(b_rad))
        np.testing.assert_allclose(np.asarray(b_rad), pair["gt_tform"], atol=1e-5)


class TestDenseGrid:
    def test_exact_within_radius(self, rng):
        from umeregrobust_tpu.ops.densegrid import (
            build_dense_grid, dense_nn_query, max_cell_count)

        p = rng.uniform(-5, 5, size=(700, 3)).astype(np.float32)
        q = rng.uniform(-5, 5, size=(200, 3)).astype(np.float32)
        r = 0.5
        grid = build_dense_grid(jnp.array(p), jnp.ones(700, bool), cell=r,
                                dims=(32, 32, 32))
        assert int(grid.overflow) == 0
        assert int(max_cell_count(grid)) <= 64
        dist, idx = dense_nn_query(grid, jnp.array(q), radius=r, budget=64)
        dist, idx = np.asarray(dist), np.asarray(idx)
        dd = np.linalg.norm(q[:, None] - p[None], axis=-1)
        best = dd.argmin(axis=1)
        for i in range(200):
            if dd[i, best[i]] <= r:
                assert idx[i] >= 0
                np.testing.assert_allclose(dist[i], dd[i, best[i]], atol=1e-5)
                assert np.isclose(dd[i, idx[i]], dd[i, best[i]], atol=1e-5)
            else:
                assert idx[i] == -1

    def test_max_window_count_is_tight(self, rng):
        """max_window_count equals the true max 3-z-cell occupancy, and a
        budget >= it makes queries exact (VERDICT r1 #6: the ICP budget
        is escalated off this number in bench.py)."""
        from umeregrobust_tpu.ops.densegrid import (
            build_dense_grid, dense_nn_query, max_window_count)

        p = rng.uniform(-2, 2, size=(600, 3)).astype(np.float32)
        r = 0.5
        grid = build_dense_grid(jnp.array(p), jnp.ones(600, bool), cell=r,
                                dims=(16, 16, 16))
        # oracle: count per cell, then max over z-windows
        cc = np.floor(p / r).astype(np.int64)
        cc -= cc.min(axis=0)
        occ = np.zeros(cc.max(axis=0) + 1, np.int64)
        np.add.at(occ, tuple(cc.T), 1)
        w = occ.copy()
        w[:, :, :-1] += occ[:, :, 1:]
        w[:, :, 1:] += occ[:, :, :-1]
        assert int(max_window_count(grid)) == int(w.max())
        # exactness at budget == max_window_count
        b = int(max_window_count(grid))
        q = rng.uniform(-2, 2, size=(100, 3)).astype(np.float32)
        dist, idx = dense_nn_query(grid, jnp.array(q), radius=r, budget=b)
        dd = np.linalg.norm(q[:, None] - p[None], axis=-1)
        best = dd.min(axis=1)
        for i in range(100):
            if best[i] <= r:
                np.testing.assert_allclose(float(dist[i]), best[i], atol=1e-5)

    def test_overflow_reported_and_masked_points_ignored(self, rng):
        from umeregrobust_tpu.ops.densegrid import (
            build_dense_grid, dense_nn_query)

        p = rng.uniform(0, 3, size=(50, 3)).astype(np.float32)
        p[0] = [100.0, 100.0, 100.0]  # outside a small box
        mask = np.ones(50, bool)
        mask[1] = False
        grid = build_dense_grid(jnp.array(p), jnp.array(mask), cell=0.5,
                                dims=(16, 16, 16))
        assert int(grid.overflow) == 1
        # query exactly at the masked point: must not match row 1
        dist, idx = dense_nn_query(grid, jnp.array(p[1:2]), radius=0.5)
        if int(idx[0]) >= 0:
            assert int(idx[0]) != 1


class TestVarAnchors:
    """Anchor-transferred spatial-variance weights (correlator
    feature_spatial_var anchors=M): exact on anchor rows, nearest-anchor
    everywhere else, and a no-op when M >= N."""

    def test_anchor_weights_match_nearest_anchor(self, rng):
        from umeregrobust_tpu.pipeline.correlator import feature_spatial_var

        pts, feat = _cloud(rng, n=256)
        mask = jnp.ones(256, bool)
        M = 64
        w_full_anchor = feature_spatial_var(
            pts[:M], feat[:M], mask[:M], k=8)  # exact weight on anchors...
        w = feature_spatial_var(pts, feat, mask, k=8, anchors=M)
        # ...except the anchored variant searches neighbors in the FULL
        # cloud; check the transfer structure instead: every output row
        # equals the weight of its nearest anchor
        d2 = np.sum((np.asarray(pts)[:, None] - np.asarray(pts[:M])[None]) ** 2,
                    axis=-1)
        j = np.argmin(d2, axis=1)
        w_np = np.asarray(w)
        np.testing.assert_allclose(w_np, w_np[:M][j], rtol=0, atol=0)
        assert not np.allclose(np.asarray(w_full_anchor), 0)

    def test_anchors_none_and_full_are_exact(self, rng):
        from umeregrobust_tpu.pipeline.correlator import feature_spatial_var

        pts, feat = _cloud(rng, n=128)
        mask = jnp.ones(128, bool)
        w_none = feature_spatial_var(pts, feat, mask, k=8)
        w_full = feature_spatial_var(pts, feat, mask, k=8, anchors=128)
        np.testing.assert_allclose(np.asarray(w_none), np.asarray(w_full))


class TestEstimatorSweeps:
    def test_three_sweeps_matches_six(self, rng):
        """sweeps=3 vs 6 on random UME pairs: rotations agree to well
        under the SP threshold (the validation behind the fast default,
        core/ume.estimate_rigid_from_ume docstring)."""
        from umeregrobust_tpu.core.ume import estimate_rigid_from_ume

        G = jnp.asarray(rng.normal(0, 1, (64, 16, 4)).astype(np.float32))
        H = jnp.asarray(rng.normal(0, 1, (64, 16, 4)).astype(np.float32))
        T6, _ = estimate_rigid_from_ume(G, H, compute_distance=False,
                                        sweeps=6)
        T3, _ = estimate_rigid_from_ume(G, H, compute_distance=False,
                                        sweeps=3)
        R6 = np.asarray(T6)[:, :3, :3]
        R3 = np.asarray(T3)[:, :3, :3]
        tr = np.clip((np.einsum("nij,nij->n", R3, R6) - 1) / 2, -1, 1)
        assert np.degrees(np.arccos(tr)).max() < 0.2


class TestStructBiasedKeypoints:
    def test_boost_prefers_structure_and_respects_mask(self, rng):
        """kp_struct_boost > 0 raises the structure fraction of sampled
        keypoints (label-free min-z criterion) without ever sampling
        padded rows; boost=0 is the uniform reference-parity path."""
        from umeregrobust_tpu.pipeline.registration import _sample_keypoints

        N = 4096
        pts = np.zeros((N, 3), np.float32)
        pts[:, :2] = rng.uniform(0, 40, (N, 2))
        pts[3500:, 2] = rng.uniform(1.0, 4.0, N - 3500)  # structure
        mask = np.ones(N, bool)
        mask[4000:] = False
        pts[4000:] = 1e3  # padded rows, far away
        kp_b, ok_b = _sample_keypoints(
            jax.random.PRNGKey(1), jnp.asarray(pts), jnp.asarray(mask),
            1024, struct_boost=4.0)
        kp_u, ok_u = _sample_keypoints(
            jax.random.PRNGKey(1), jnp.asarray(pts), jnp.asarray(mask),
            1024)
        kp_b, ok_b = np.asarray(kp_b), np.asarray(ok_b)
        kp_u, ok_u = np.asarray(kp_u), np.asarray(ok_u)
        assert ok_b.all() and ok_u.all()
        assert (np.abs(kp_b) < 100).all()  # no padded rows
        frac_b = (kp_b[:, 2] > 0.5).mean()
        frac_u = (kp_u[:, 2] > 0.5).mean()
        assert frac_b > 2.0 * frac_u


class TestIcpGridScale:
    def test_scaled_cell_query_exact(self, rng):
        """A grid built at cell = 2 * radius answers radius-bounded 1-NN
        identically to cell = radius (the icp_grid_scale contract:
        exactness only needs radius <= cell, ops/densegrid)."""
        from umeregrobust_tpu.ops.densegrid import (
            build_dense_grid, dense_nn_query, max_window_count)

        p = rng.uniform(-5, 5, size=(900, 3)).astype(np.float32)
        q = rng.uniform(-5, 5, size=(250, 3)).astype(np.float32)
        r = 0.5
        g1 = build_dense_grid(jnp.array(p), jnp.ones(900, bool), cell=r,
                              dims=(32, 32, 32))
        g2 = build_dense_grid(jnp.array(p), jnp.ones(900, bool), cell=2 * r,
                              dims=(16, 16, 16))
        b1 = int(max_window_count(g1))
        b2 = int(max_window_count(g2))
        d1, i1 = dense_nn_query(g1, jnp.array(q), radius=r, budget=b1)
        d2, i2 = dense_nn_query(g2, jnp.array(q), radius=r, budget=b2)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)

    def test_schedule_scale_matches_unit_scale(self, rng):
        """refine_with_icp at icp_grid_scale=2 lands on the same transform
        as scale=1 (budgets sized to the worst window at each cell)."""
        from dataclasses import replace

        from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
        from umeregrobust_tpu.pipeline.registration import (
            RegistrationConfig, refine_with_icp)

        pair = make_pair(SceneConfig(extent=15.0, ground_points=4000,
                                     structure_points=8000, n_boxes=12,
                                     n_walls=4, n_poles=6,
                                     observe_mode="lidar", baseline=3.0),
                         max_rotation_deg=30, max_translation=3.0, seed=7)
        gt = pair["gt_tform"]
        perm = rng.permutation(len(pair["src_pts"]))[:3000]
        src = jnp.asarray(pair["src_pts"][perm])
        tgt = jnp.asarray(pair["tgt_pts"][:3000])
        m = jnp.ones((3000,), bool)
        ang = np.radians(2.0)
        dR = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        init = gt.copy()
        init[:3, :3] = dR @ gt[:3, :3]
        init[:3, 3] += np.array([0.2, -0.1, 0.05], np.float32)

        # budgets must cover the worst 3-z-cell window at EACH cell size
        # (32 at cell 0.4, 69 at cell 0.8 for this cloud — measured; the
        # bench pre-check escalates budgets the same way)
        base = RegistrationConfig(icp_max_corr=0.4, icp_max_iter=60,
                                  icp_budget=40, icp_raw_iter=0,
                                  icp_multires=0)
        T_1, _, _ = refine_with_icp(base, jnp.asarray(init), src, m, tgt, m)
        T_2, _, _ = refine_with_icp(replace(base, icp_grid_scale=2.0,
                                            icp_budget=80),
                                    jnp.asarray(init), src, m, tgt, m)
        np.testing.assert_allclose(np.asarray(T_1), np.asarray(T_2),
                                   atol=1e-5)
