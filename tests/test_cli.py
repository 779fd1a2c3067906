"""CLI config plumbing: every documented --set knob must reach the
compiled pipeline's RegistrationConfig (reference parity switches, e.g.
corr_mode=knn restoring loc_utils.py:640-681 semantics)."""
import argparse
import os

from umeregrobust_tpu.cli.evaluate import (
    BENCHMARK_CONFIGS, _CFG_DIR, _registration_cfg)
from umeregrobust_tpu.pipeline.registration import RegistrationConfig
from umeregrobust_tpu.utils.config import (
    apply_overrides, update_namespace_from_yaml)

import pytest

pytestmark = pytest.mark.slow  # heavy tier; fast gate runs -m 'not slow'


def _args(overrides):
    args = argparse.Namespace(set=list(overrides))
    cfg_path = os.path.join(_CFG_DIR, BENCHMARK_CONFIGS["kitti_test"])
    args = update_namespace_from_yaml(args, cfg_path)
    return apply_overrides(args, args.set)


def test_default_cfg_matches_dataclass_defaults():
    cfg = _registration_cfg(_args([]))
    d = RegistrationConfig()
    assert cfg.corr_mode == d.corr_mode == "radius"
    assert cfg.corr_knn == d.corr_knn
    assert cfg.corr_var_knn == d.corr_var_knn
    assert cfg.icp_coarse_corr == d.icp_coarse_corr
    assert cfg.ume_r_nn == 5.0  # from the kitti yaml


def test_parity_switches_reach_registration_config():
    cfg = _registration_cfg(_args(
        ["corr_mode=knn", "corr_knn=10", "corr_var_knn=25",
         "icp_coarse_corr=1.5", "icp_coarse_iter=7"]))
    assert cfg.corr_mode == "knn"
    assert cfg.corr_knn == 10
    assert cfg.corr_var_knn == 25
    assert cfg.icp_coarse_corr == 1.5
    assert cfg.icp_coarse_iter == 7


def test_icp_coarse_corr_zero_disables():
    cfg = _registration_cfg(_args(["icp_coarse_corr=0"]))
    assert cfg.icp_coarse_corr is None


def test_cfg_is_hashable_static_arg():
    # RegistrationConfig is a static jit arg: must stay hashable
    cfg = _registration_cfg(_args(["corr_mode=knn"]))
    hash(cfg)


def test_yaml_style_boolean_overrides():
    """--set flag=false must parse to Python False, not the truthy string
    'false' (caught live: filter_by_ume_dist_cond=false silently kept the
    10000-keypoint filter path on)."""
    args = _args(["filter_by_ume_dist_cond=false"])
    assert args.filter_by_ume_dist_cond is False
    cfg = _registration_cfg(args)
    assert cfg.filter_by_ume_dist is False
    assert cfg.num_init_keypoints == cfg.ume_n_samples
    args = _args(["filter_by_ume_dist_cond=true", "icp_coarse_corr=null"])
    assert args.filter_by_ume_dist_cond is True
    assert args.icp_coarse_corr is None
