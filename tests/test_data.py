"""Data-layer tests: readers, registry, SEM equalizer, matches, collate,
cache round-trip — against a tiny synthetic KITTI-format tree."""
import os
import pickle

import numpy as np
import pytest

from umeregrobust_tpu.data import (
    SEMConfig,
    SceneConfig,
    SemanticKITTIDataset,
    apply_learning_map,
    collate_fixed,
    equalize_sampling,
    load_registry,
    make_pair,
    mutual_matches,
    one_side_matches,
)


class TestRegistry:
    def test_kitti_test_split_counts(self):
        reg = load_registry("kitti", "test", skip_invalid_entries=False)
        # 1476 pairs in the metadata; <= 50 m filter keeps all test pairs
        assert len(reg) == 1476
        assert reg.gt_tforms.shape == (len(reg), 4, 4)

    def test_all_kitti_splits_load(self):
        for split, n in [("train", 12714), ("val", 1307), ("lokitti", 545),
                         ("rotkitti", 600)]:
            reg = load_registry("kitti", split, skip_invalid_entries=False)
            assert len(reg) <= n and len(reg) > 0

    def test_nuscenes_splits_load(self):
        for split in ["val", "test", "lonuscenes", "rotnuscenes"]:
            reg = load_registry("nuscenes", split, skip_invalid_entries=False)
            assert len(reg) > 0

    def test_skip_invalid(self):
        a = load_registry("kitti", "test", skip_invalid_entries=False)
        b = load_registry("kitti", "test", skip_invalid_entries=True)
        assert len(b) == len(a) - 1  # one curated invalid test pair


class TestLearningMap:
    def test_known_mappings(self):
        raw = np.array([0, 10, 40, 70, 252])
        np.testing.assert_array_equal(apply_learning_map(raw), [0, 1, 9, 15, 1])


class TestMatches:
    def test_mutual_matches_identity(self, rng):
        pts = rng.uniform(-5, 5, size=(200, 3)).astype(np.float32)
        m = mutual_matches(pts, pts, np.eye(4, dtype=np.float32), 0.1)
        np.testing.assert_array_equal(m[:, 0], m[:, 1])
        assert len(m) == 200

    def test_one_side_radius(self, rng):
        src = rng.uniform(-5, 5, size=(50, 3)).astype(np.float32)
        tgt = src + 0.05
        m = one_side_matches(src, tgt, np.eye(4, dtype=np.float32), 0.2)
        assert len(m) == 50
        m2 = one_side_matches(src, tgt + 10.0, np.eye(4, dtype=np.float32), 0.2)
        assert len(m2) == 0


class TestSEM:
    def test_output_size_and_labels(self):
        pair = make_pair(SceneConfig(extent=10.0, ground_points=3000,
                                     structure_points=4000, n_boxes=6,
                                     n_walls=2, n_poles=3), seed=1)
        pts, seg = pair["src_pts"], pair["src_seg"]
        new_pts, new_seg = equalize_sampling(
            pts, seg, SEMConfig(num_points=20000, fine_voxel=0.15))
        assert new_pts.shape == (20000, 3)
        assert new_seg.shape == (20000,)
        # labels should be mostly copied (everything is within 3 m of a point)
        assert (new_seg > 0).mean() > 0.95

    def test_density_equalization(self):
        """After SEM, near-sensor and far regions have comparable density."""
        rng = np.random.default_rng(0)
        # radially-decaying density like a LiDAR: many near, few far
        r = np.abs(rng.normal(0, 8, size=30000)) + 1
        th = rng.uniform(0, 2 * np.pi, size=30000)
        pts = np.stack([r * np.cos(th), r * np.sin(th),
                        0.05 * rng.standard_normal(30000)], 1).astype(np.float32)
        seg = np.ones(len(pts), np.int32)
        new_pts, _ = equalize_sampling(pts, seg, SEMConfig(num_points=20000,
                                                           fine_voxel=0.3))
        rr = np.linalg.norm(new_pts[:, :2], axis=1)
        near = ((rr > 2) & (rr < 6)).sum() / (np.pi * (36 - 4))
        far = ((rr > 10) & (rr < 14)).sum() / (np.pi * (196 - 100))
        ratio_new = near / max(far, 1e-9)
        rr0 = np.linalg.norm(pts[:, :2], axis=1)
        near0 = ((rr0 > 2) & (rr0 < 6)).sum() / (np.pi * (36 - 4))
        far0 = ((rr0 > 10) & (rr0 < 14)).sum() / (np.pi * (196 - 100))
        ratio_old = near0 / max(far0, 1e-9)
        assert ratio_new < ratio_old / 3  # much flatter density profile


class TestSEMOracle:
    def test_oracle_completion_is_shared_surface(self):
        """mode="oracle" (VERDICT r4 #4): both scans' completions come from
        the SAME scene samples, so in the overlap the two equalized clouds
        agree where the per-scan voxel/patch fills cannot — and every added
        point stays within oracle_radius of the scan that received it."""
        pair = make_pair(SceneConfig(extent=10.0, ground_points=3000,
                                     structure_points=4000, n_boxes=6,
                                     n_walls=2, n_poles=3,
                                     observe_mode="lidar", baseline=4.0,
                                     azimuth_bins=600, elevation_bins=32),
                         max_rotation_deg=30, max_translation=2.0, seed=3)
        gt = pair["gt_tform"]
        scene_src = pair["scene_pts"]
        scene_tgt = (scene_src @ gt[:3, :3].T + gt[:3, 3]).astype(np.float32)
        cfg = SEMConfig(num_points=20000, mode="oracle", oracle_radius=1.5,
                        seed=5)
        ep_s, es_s = equalize_sampling(pair["src_pts"], pair["src_seg"], cfg,
                                       scene_pts=scene_src,
                                       scene_seg=pair["scene_seg"])
        ep_t, es_t = equalize_sampling(pair["tgt_pts"], pair["tgt_seg"], cfg,
                                       scene_pts=scene_tgt,
                                       scene_seg=pair["scene_seg"])
        assert ep_s.shape == (20000, 3) and ep_t.shape == (20000, 3)
        assert (es_s > 0).mean() > 0.9 and (es_t > 0).mean() > 0.9
        # augmentation is local: no equalized point far from the raw scan
        from scipy.spatial import cKDTree
        d_s, _ = cKDTree(pair["src_pts"]).query(ep_s)
        assert d_s.max() < cfg.oracle_radius + 3 * cfg.fine_voxel
        # completion consistency: map src-side output into tgt frame; in
        # the co-observed region the NN distance to the tgt-side output is
        # voxel-scale (shared surface), not patch/ring-gap scale
        ep_s_in_t = ep_s @ gt[:3, :3].T + gt[:3, 3]
        d_sym, _ = cKDTree(ep_t).query(ep_s_in_t)
        near_tgt_scan, _ = cKDTree(pair["tgt_pts"]).query(ep_s_in_t)
        overlap = near_tgt_scan < 1.0
        assert overlap.mean() > 0.2
        assert np.median(d_sym[overlap]) < 3 * cfg.fine_voxel

    def test_oracle_requires_scene(self):
        with pytest.raises(ValueError):
            equalize_sampling(np.zeros((10, 3), np.float32),
                              np.ones(10, np.int32),
                              SEMConfig(mode="oracle"))


class TestDatasetAndCollate:
    @pytest.fixture
    def kitti_tree(self, tmp_path, rng):
        """Tiny synthetic KITTI-format tree for the first test-split pair."""
        reg = load_registry("kitti", "test", skip_invalid_entries=False)
        seq, f0, f1 = int(reg.pairs[0][0]), int(reg.pairs[0][1]), int(reg.pairs[0][2])
        gt = reg.gt_tforms[0]
        base = tmp_path / "sequences"
        scene = make_pair(SceneConfig(extent=15.0, ground_points=4000,
                                      structure_points=6000, n_boxes=8,
                                      n_walls=3, n_poles=4), seed=2)
        for fid, pts, seg in [(f0, scene["src_pts"], scene["src_seg"]),
                              (f1, None, None)]:
            d = base / f"{seq:02d}"
            (d / "velodyne").mkdir(parents=True, exist_ok=True)
            (d / "labels").mkdir(parents=True, exist_ok=True)
            if pts is None:
                # target frame: transform source scene by the REGISTRY's gt
                pts = (scene["tgt_pts"] - scene["gt_tform"][:3, 3]) @ scene["gt_tform"][:3, :3]
                pts = (pts @ gt[:3, :3].T + gt[:3, 3]).astype(np.float32)
                seg = scene["tgt_seg"]
            arr = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1)
            arr.astype(np.float32).tofile(d / "velodyne" / f"{fid:06d}.bin")
            # raw labels: map train-id back to a raw id (9 -> 40 road, 1 -> 10 car)
            raw = np.where(seg == 9, 40, 10).astype(np.uint32)
            raw.tofile(d / "labels" / f"{fid:06d}.label")
        return str(base), gt

    def test_preprocess_and_collate(self, kitti_tree):
        base, gt = kitti_tree
        dset = SemanticKITTIDataset(data_path=base, split="test",
                                    cache_data_path="", dataset_size=1)
        s = dset[0]
        (src_pts, src_seg, src_coords, tgt_pts, tgt_seg, tgt_coords,
         src_tf, gt_tform, matches) = s
        assert src_pts.shape[1] == 3 and src_coords.shape[1] == 3
        np.testing.assert_allclose(gt_tform, gt, atol=1e-6)
        assert len(matches) > 50  # true-overlap pair must have many matches
        # transformed source matches land near their targets
        err = np.linalg.norm(
            src_tf[matches[:, 0]] - tgt_pts[matches[:, 1]], axis=1)
        assert np.quantile(err, 0.9) < 0.3

        batch = collate_fixed([s, s], max_pc_size=4096, num_matches=128)
        assert batch["src_pts"].shape == (2, 4096, 3)
        assert batch["matches"].shape == (2, 128, 2)
        assert batch["match_mask"].any()
        # reindexed matches remain correct under subsampling
        b = 0
        mm = batch["matches"][b][batch["match_mask"][b]]
        err = np.linalg.norm(
            batch["src_pts_tform"][b][mm[:, 0]] - batch["tgt_pts"][b][mm[:, 1]],
            axis=1)
        assert np.quantile(err, 0.9) < 0.3

    def test_augmented_cached_mode(self, kitti_tree, tmp_path):
        base, gt = kitti_tree
        dset = SemanticKITTIDataset(data_path=base, split="test",
                                    cache_data_path="", dataset_size=1)
        s = dset.preprocess_getitem(0)
        from umeregrobust_tpu.data import save_pair_pickle
        seq, f0, f1 = dset._pair_key(0)
        cache = tmp_path / "cache"
        save_pair_pickle(
            str(cache / "test" / f"{seq:02d}" / f"{f0:06d}_{f1:06d}.pickle"),
            {k: v for k, v in zip(
                ["src_pts", "src_seg", "src_coords", "tgt_pts", "tgt_seg",
                 "tgt_coords", "src_pts_tform", "gt_tform", "matches"], s)})
        dset2 = SemanticKITTIDataset(data_path=base, split="test",
                                     cache_data_path=str(cache), dataset_size=1,
                                     use_augmentations=True,
                                     skip_invalid_entries=False)
        (src_pts, src_seg, _, tgt_pts, _, _, src_tf, gt_aug, matches) = dset2[0]
        # augmented gt must still map src onto tgt
        assert len(matches) > 50
        err = np.linalg.norm(src_tf[matches[:, 0]] - tgt_pts[matches[:, 1]], axis=1)
        assert np.quantile(err, 0.9) < 0.3
