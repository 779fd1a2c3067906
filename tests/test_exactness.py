"""ICP dense-grid exactness pre-check (pipeline/exactness.py) — the
shared bench.py/CLI machinery that keeps the while_loop ICP's
correspondences exact (the Open3D-parity property, reference
evaluate.py:93-96) by escalating the window budget before compiling."""
import numpy as np
import pytest

from umeregrobust_tpu.pipeline.exactness import (
    escalated_budget, fine_grid_geometry, window_occupancy)
from umeregrobust_tpu.pipeline.registration import RegistrationConfig

pytestmark = pytest.mark.slow  # heavy tier; fast gate runs -m 'not slow'


def test_fine_grid_geometry_default():
    cfg = RegistrationConfig()
    cell, dims = fine_grid_geometry(cfg)
    assert cell == pytest.approx(cfg.icp_max_corr)
    assert dims == cfg.icp_dims


def test_fine_grid_geometry_scaled():
    from dataclasses import replace

    cfg = replace(RegistrationConfig(), icp_grid_scale=2.0)
    cell, dims = fine_grid_geometry(cfg)
    assert cell == pytest.approx(2.0 * cfg.icp_max_corr)
    # same physical box, half the cells per axis (ceil)
    assert dims == tuple(-(-d // 2) for d in cfg.icp_dims)


def test_window_occupancy_exact_counts():
    # 5 points in one cell, 3 in the cell directly above (z+1):
    # the 3-z-cell window centered anywhere in that column sees 8
    pts = np.array([[0.05, 0.05, 0.05]] * 5
                   + [[0.05, 0.05, 0.25]] * 3, np.float32)
    w, box = window_occupancy(pts, cell=0.2, grid_dims=(64, 64, 64))
    assert w == 8
    assert box == 0
    # a lone far point does not inflate the window
    pts2 = np.concatenate([pts, [[5.0, 5.0, 5.0]]]).astype(np.float32)
    w2, _ = window_occupancy(pts2, cell=0.2, grid_dims=(64, 64, 64))
    assert w2 == 8


def test_window_occupancy_box_overflow():
    # relative cell coords exceed grid_dims -> counted as overflow
    pts = np.array([[0.0, 0.0, 0.0], [100.0, 0.0, 0.0]], np.float32)
    w, box = window_occupancy(pts, cell=0.2, grid_dims=(64, 64, 64))
    assert box == 1  # the far point is 500 cells out in x


def test_window_occupancy_empty():
    assert window_occupancy(np.zeros((0, 3), np.float32), 0.2,
                            (8, 8, 8)) == (0, 0)


def test_escalated_budget():
    assert escalated_budget(8, 8) == 8  # sufficient: unchanged
    assert escalated_budget(9, 8) == 16
    assert escalated_budget(19, 8) == 24  # E4's measured case
    assert escalated_budget(97, 8) == 104
    assert escalated_budget(10_000, 8) == 128  # capped


def test_cli_escalates_on_overdense_cloud(monkeypatch):
    """VERDICT r4 #5: an over-dense raw target cloud must escalate
    icp_raw_budget (with a printed notice) before its pair is dispatched,
    and the run report must carry the telemetry."""
    import argparse
    import os

    import umeregrobust_tpu.pipeline.e2e as e2e_mod
    from umeregrobust_tpu.cli.evaluate import (
        BENCHMARK_CONFIGS, _CFG_DIR, evaluate_pairs)
    from umeregrobust_tpu.utils.config import (
        apply_overrides, update_namespace_from_yaml)

    args = argparse.Namespace(set=["max_pc_size=512", "pc_corr_max_size=256",
                                   "model_checkpoint_path="])
    cfg_path = os.path.join(_CFG_DIR, BENCHMARK_CONFIGS["kitti_test"])
    args = update_namespace_from_yaml(args, cfg_path)
    args = apply_overrides(args, args.set)
    args.icp_raw_max_size = 4096

    seen_cfgs = []

    def fake_e2e(params, state, arch, caps, cfg, key, *a, **kw):
        seen_cfgs.append(cfg)
        return None, np.eye(4, dtype=np.float32)

    monkeypatch.setattr(e2e_mod, "register_pair_e2e", fake_e2e)

    rng = np.random.default_rng(0)

    def mk_pair(dense):
        # sparse scene points on a coarse lattice; the dense variant adds
        # a 600-point cluster inside one 0.2 m ICP cell
        base = rng.uniform(-10, 10, (2000, 3)).astype(np.float32)
        pts = base
        if dense:
            blob = (np.float32([3.0, 3.0, 0.5])
                    + rng.uniform(0, 0.05, (600, 3)).astype(np.float32))
            pts = np.concatenate([base, blob])
        seg = np.ones(len(pts), np.int32)
        coords = np.floor(pts / 0.3).astype(np.int32)
        return {"sem_src": (pts, seg, coords), "sem_tgt": (pts, seg, coords),
                "raw_src": pts, "raw_tgt": pts,
                "gt_tform": np.eye(4, dtype=np.float32)}

    pairs = [mk_pair(False), mk_pair(True), mk_pair(False)]
    res = evaluate_pairs(args, iter(pairs), len(pairs))

    stats = res["icp_exactness"]
    assert stats["worst_raw"] >= 600
    assert any("icp_raw_budget" in e for e in stats["escalations"])
    # the escalated budget reached the pair that needed it and stuck for
    # the pairs after it
    assert seen_cfgs[0].icp_raw_budget == RegistrationConfig().icp_raw_budget
    assert seen_cfgs[1].icp_raw_budget >= 600 or \
        seen_cfgs[1].icp_raw_budget == 128  # escalation is capped at 128
    assert seen_cfgs[2].icp_raw_budget == seen_cfgs[1].icp_raw_budget
