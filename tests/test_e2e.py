"""Fused end-to-end registration path: compile + run at small capacities,
plus the batched multi-pair variant on the virtual device mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from umeregrobust_tpu.core.transforms import relative_rotation_error
from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
from umeregrobust_tpu.models.resunet import ARCHS, init_resunet
from umeregrobust_tpu.ops.voxel import coords_to_grid_pts_np, quantize_np
from umeregrobust_tpu.pipeline.e2e import register_pair_e2e, register_pairs_batched
from umeregrobust_tpu.pipeline.registration import RegistrationConfig
import pytest

pytestmark = pytest.mark.slow  # heavy tier; fast gate runs -m 'not slow'

SEM_CAP, CORR_CAP = 2048, 1024
CAPS = (SEM_CAP, 2048, 1024, 512, 256)
CFG = RegistrationConfig(num_init_keypoints=256, ume_n_samples=64,
                         ume_max_nn=128, corr_coarse_src=None,
                         corr_rescore_top=16, icp_max_corr=0.5,
                         icp_max_iter=15)


def _prep(seed):
    pair = make_pair(SceneConfig(extent=10.0, ground_points=2500,
                                 structure_points=5000, n_boxes=8,
                                 n_walls=3, n_poles=4, dropout=0.2),
                     max_rotation_deg=60, max_translation=4.0, seed=seed)
    out = {"gt": pair["gt_tform"]}
    rng = np.random.default_rng(seed)
    for tag, pts in [("src", pair["src_pts"]), ("tgt", pair["tgt_pts"])]:
        coords, sel = quantize_np(pts, 0.3)
        grid = coords_to_grid_pts_np(pts, coords, 0.3)
        n = min(len(grid), SEM_CAP)
        pick = rng.choice(len(grid), n, replace=False) if len(grid) > SEM_CAP \
            else np.arange(n)
        c4 = np.full((SEM_CAP, 4), 2**20, np.int32)
        c4[:n, 0] = 0
        c4[:n, 1:] = coords[pick]
        g = np.zeros((SEM_CAP, 3), np.float32)
        g[:n] = grid[pick]
        m = np.arange(SEM_CAP) < n
        ci = rng.choice(len(pts), min(len(pts), CORR_CAP), replace=False)
        cp = np.zeros((CORR_CAP, 3), np.float32)
        cp[: len(ci)] = pts[ci]
        cm = np.arange(CORR_CAP) < len(ci)
        out[tag] = dict(coords=jnp.asarray(c4), grid=jnp.asarray(g),
                        mask=jnp.asarray(m), corr=jnp.asarray(cp),
                        cmask=jnp.asarray(cm))
    return out


class TestFusedE2E:
    def test_single_pair_runs_and_is_rigid(self, key):
        arch = ARCHS["ResUNetSmall2"]
        params, state = init_resunet(key, arch, 1, 32)
        p = _prep(42)
        Ti, Tr = register_pair_e2e(
            params, state, arch, CAPS, CFG, key,
            p["src"]["coords"], p["src"]["grid"], p["src"]["mask"],
            p["tgt"]["coords"], p["tgt"]["grid"], p["tgt"]["mask"],
            p["src"]["corr"], p["src"]["cmask"],
            p["tgt"]["corr"], p["tgt"]["cmask"])
        for T in (np.asarray(Ti), np.asarray(Tr)):
            assert np.isfinite(T).all()
            R = T[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
            np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)

    def test_batched_matches_single(self, key):
        arch = ARCHS["ResUNetSmall2"]
        params, state = init_resunet(key, arch, 1, 32)
        ps = [_prep(7), _prep(8)]
        keys = jax.random.split(key, 2)

        def stk(tag, f):
            return jnp.stack([p[tag][f] for p in ps])

        Ti_b, Tr_b = register_pairs_batched(
            params, state, arch, CAPS, CFG, keys,
            stk("src", "coords"), stk("src", "grid"), stk("src", "mask"),
            stk("tgt", "coords"), stk("tgt", "grid"), stk("tgt", "mask"),
            stk("src", "corr"), stk("src", "cmask"),
            stk("tgt", "corr"), stk("tgt", "cmask"))
        for i, p in enumerate(ps):
            Ti, Tr = register_pair_e2e(
                params, state, arch, CAPS, CFG, keys[i],
                p["src"]["coords"], p["src"]["grid"], p["src"]["mask"],
                p["tgt"]["coords"], p["tgt"]["grid"], p["tgt"]["mask"],
                p["src"]["corr"], p["src"]["cmask"],
                p["tgt"]["corr"], p["tgt"]["cmask"])
            np.testing.assert_allclose(np.asarray(Ti_b[i]), np.asarray(Ti),
                                       atol=1e-4)
