"""SEM preprocessing CLI: writes the reference cache layout, is resumable
(second run writes nothing), and honors --range_idxs. Plus the compile-
cache activation helper."""
import os

import numpy as np
import pytest

from umeregrobust_tpu.data.registry import load_registry
from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair


@pytest.fixture
def kitti_tree(tmp_path):
    reg = load_registry("kitti", "test", skip_invalid_entries=False)
    seq, f0, f1 = (int(reg.pairs[0][0]), int(reg.pairs[0][1]),
                   int(reg.pairs[0][2]))
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
            pts = ((scene["tgt_pts"] - scene["gt_tform"][:3, 3])
                   @ scene["gt_tform"][:3, :3])
            pts = (pts @ gt[:3, :3].T + gt[:3, 3]).astype(np.float32)
            seg = scene["tgt_seg"]
        arr = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1)
        arr.astype(np.float32).tofile(d / "velodyne" / f"{fid:06d}.bin")
        raw = np.where(seg == 9, 40, 10).astype(np.uint32)
        raw.tofile(d / "labels" / f"{fid:06d}.label")
    return str(base), (seq, f0, f1)


def test_sem_cli_writes_and_resumes(kitti_tree, tmp_path, capsys):
    from umeregrobust_tpu.cli.sem_preprocessing import main

    base, (seq, f0, f1) = kitti_tree
    out = str(tmp_path / "sem_cache")
    main(["--dataset_mode", "kitti", "--split", "test",
          "--data_path", base, "--output_path", out,
          "--range_idxs", "0", "1"])
    assert "wrote 1 pairs" in capsys.readouterr().out
    p = os.path.join(out, "test", f"{seq:02d}", f"{f0:06d}_{f1:06d}.pickle")
    assert os.path.exists(p)
    from umeregrobust_tpu.data import load_pair_pickle
    blob = load_pair_pickle(p)
    assert blob["src_pts"].shape[1] == 3 and len(blob["matches"]) > 0

    # resumable: the same range writes nothing the second time
    main(["--dataset_mode", "kitti", "--split", "test",
          "--data_path", base, "--output_path", out,
          "--range_idxs", "0", "1"])
    assert "wrote 0 pairs" in capsys.readouterr().out


def test_ensure_compile_cache_sets_config(tmp_path):
    import jax

    from umeregrobust_tpu.utils.cache import ensure_compile_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        d = str(tmp_path / "jaxcache")
        got = ensure_compile_cache(d)
        assert got == d and os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
