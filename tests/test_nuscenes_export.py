"""Smoke test for the nuScenes->KITTI exporter behind a mocked devkit
(the nuscenes-devkit is not bundled; reference analog:
datasets/nuscenes/export_kitti_minimal.py:71-159)."""
import os
import sys
import types

import numpy as np
import pytest


def _install_fake_devkit(root, n_samples=2):
    """Minimal in-memory nuScenes devkit: 1 log, n samples, 40-pt sweeps."""
    rng = np.random.default_rng(0)
    sweeps = [rng.uniform(-10, 10, (4, 40)).astype(np.float32)
              for _ in range(n_samples)]
    seg = [rng.integers(0, 30, 40).astype(np.uint8) for _ in range(n_samples)]
    os.makedirs(os.path.join(root, "sweeps"), exist_ok=True)
    for i, (s, g) in enumerate(zip(sweeps, seg)):
        # LidarPointCloud.from_file reads (N, 5) float32 in real data; our
        # fake loader reads the raw (4, N) array we wrote
        np.save(os.path.join(root, "sweeps", f"{i}.npy"), s)
        # lidarseg is raw uint8 bytes in real data (read with np.fromfile)
        g.tofile(os.path.join(root, "sweeps", f"{i}_seg.bin"))

    class FakeNuScenes:
        def __init__(self, version, dataroot, verbose=False):
            self.dataroot = dataroot
            self.sample = [
                {"token": f"tok{i}", "scene_token": "sc0",
                 "data": {"LIDAR_TOP": f"ld{i}"}}
                for i in range(n_samples)
            ]
            self._tables = {
                ("scene", "sc0"): {"log_token": "lg0"},
                ("log", "lg0"): {"logfile": "log-0001"},
            }
            for i in range(n_samples):
                self._tables[("sample", f"tok{i}")] = self.sample[i]
                self._tables[("sample_data", f"ld{i}")] = {
                    "calibrated_sensor_token": "cs0",
                    "ego_pose_token": f"ep{i}",
                    "timestamp": 1000 + i,
                    "filename": os.path.join("sweeps", f"{i}.npy"),
                }
                self._tables[("ego_pose", f"ep{i}")] = {
                    "translation": [float(i), 0.0, 0.0],
                    "rotation": [1.0, 0.0, 0.0, 0.0],
                }
                self._tables[("lidarseg", f"ld{i}")] = {
                    "filename": os.path.join("sweeps", f"{i}_seg.bin"),
                }
            self._tables[("calibrated_sensor", "cs0")] = {
                "translation": [0.5, 0.0, 1.8],
                "rotation": [1.0, 0.0, 0.0, 0.0],
            }

        def get(self, table, token):
            return self._tables[(table, token)]

    class FakeQuaternion:
        def __init__(self, wxyz):
            self.rotation_matrix = np.eye(3)

    class FakeLPC:
        def __init__(self, pts):
            self.points = pts

        @classmethod
        def from_file(cls, path):
            return cls(np.load(path if path.endswith(".npy")
                               else path + ".npy"))

    def fake_transform_matrix(translation, rotation):
        T = np.eye(4)
        T[:3, 3] = translation
        T[:3, :3] = rotation.rotation_matrix
        return T

    def fake_splits_logs(split, nusc):
        return ["log-0001"]

    mods = {}
    nuscenes = types.ModuleType("nuscenes")
    mods["nuscenes"] = nuscenes
    m = types.ModuleType("nuscenes.nuscenes")
    m.NuScenes = FakeNuScenes
    mods["nuscenes.nuscenes"] = m
    utils = types.ModuleType("nuscenes.utils")
    mods["nuscenes.utils"] = utils
    dc = types.ModuleType("nuscenes.utils.data_classes")
    dc.LidarPointCloud = FakeLPC
    mods["nuscenes.utils.data_classes"] = dc
    gu = types.ModuleType("nuscenes.utils.geometry_utils")
    gu.transform_matrix = fake_transform_matrix
    mods["nuscenes.utils.geometry_utils"] = gu
    sp = types.ModuleType("nuscenes.utils.splits")
    sp.create_splits_logs = fake_splits_logs
    mods["nuscenes.utils.splits"] = sp
    pq = types.ModuleType("pyquaternion")
    pq.Quaternion = FakeQuaternion
    mods["pyquaternion"] = pq
    return mods, sweeps, seg


def test_export_writes_kitti_tree_and_rotates_frames(tmp_path, monkeypatch):
    nusc_dir = str(tmp_path / "nusc")
    out_dir = str(tmp_path / "out")
    mods, sweeps, seg = _install_fake_devkit(nusc_dir)
    for name, mod in mods.items():
        monkeypatch.setitem(sys.modules, name, mod)

    from umeregrobust_tpu.data.nuscenes_export import (
        _KITTI_TO_NU, export_nuscenes_to_kitti)

    logs = export_nuscenes_to_kitti(nusc_dir, out_dir, split="train")
    assert logs == ["log-0001"]
    base = os.path.join(out_dir, "train", "sequences", "log-0001")
    for i in range(2):
        b = np.fromfile(os.path.join(base, "velodyne", f"{i:06d}.bin"),
                        dtype=np.float32).reshape(-1, 4)
        # exported xyz = nu->kitti rotation applied to the sweep
        expect = (_KITTI_TO_NU.T @ sweeps[i][:3]).T
        np.testing.assert_allclose(b[:, :3], expect, rtol=1e-6)
        lab = np.load(os.path.join(base, "labels", f"{i:06d}.npy"))
        np.testing.assert_array_equal(lab, seg[i])
    poses = np.load(os.path.join(base, "poses.npy"))
    stamps = np.load(os.path.join(base, "timestamps.npy"))
    assert poses.shape == (2, 4, 4) and stamps.tolist() == [1000, 1001]
    # pose = ego_to_world @ lid_to_ego @ kitti_to_nu with identity rotations:
    # translation = ego + sensor offset; rotation block = _KITTI_TO_NU
    np.testing.assert_allclose(poses[1, :3, 3], [1.5, 0.0, 1.8], atol=1e-9)
    np.testing.assert_allclose(poses[0, :3, :3], _KITTI_TO_NU, atol=1e-12)


def test_export_without_devkit_raises_importerror(monkeypatch):
    for name in list(sys.modules):
        if name.startswith("nuscenes") or name == "pyquaternion":
            monkeypatch.delitem(sys.modules, name, raising=False)
    monkeypatch.setitem(sys.modules, "nuscenes", None)
    from umeregrobust_tpu.data.nuscenes_export import export_nuscenes_to_kitti
    with pytest.raises(ImportError):
        export_nuscenes_to_kitti("/nonexistent", "/tmp/out")
