"""Tests for voxel quantization and the device hash table."""
import jax.numpy as jnp
import numpy as np

from umeregrobust_tpu.ops.hashing import build_hash_table, lookup
from umeregrobust_tpu.ops.voxel import (
    coords_to_grid_pts,
    coords_to_grid_pts_np,
    quantize_jax,
    quantize_np,
)


class TestQuantizeNp:
    def test_unique_and_representatives(self, rng):
        pts = rng.uniform(-10, 10, size=(500, 3)).astype(np.float32)
        coords, idx = quantize_np(pts, 0.5)
        assert len(np.unique(coords.view([("", coords.dtype)] * 3))) == len(coords)
        np.testing.assert_array_equal(coords, np.floor(pts[idx] / 0.5).astype(np.int32))

    def test_first_occurrence(self):
        pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [1.1, 0.1, 0.1]], np.float32)
        coords, idx = quantize_np(pts, 1.0)
        assert idx.tolist() == [0, 2]


class TestQuantizeJax:
    def test_matches_numpy(self, rng):
        pts = rng.uniform(-10, 10, size=(400, 3)).astype(np.float32)
        mask = np.ones(400, bool)
        mask[350:] = False
        c_np, i_np = quantize_np(pts[:350], 0.5)
        c_j, rep, m = quantize_jax(jnp.array(pts), 0.5, jnp.array(mask), max_voxels=512)
        c_j, rep, m = np.asarray(c_j), np.asarray(rep), np.asarray(m)
        assert m.sum() == len(c_np)
        got = set(map(tuple, c_j[m]))
        want = set(map(tuple, c_np))
        assert got == want
        # representatives must be the first input index of each voxel
        rep_valid = np.sort(rep[m])
        np.testing.assert_array_equal(rep_valid, np.sort(i_np))

    def test_overflow_truncates(self, rng):
        pts = rng.uniform(-50, 50, size=(300, 3)).astype(np.float32)
        mask = np.ones(300, bool)
        _, _, m = quantize_jax(jnp.array(pts), 0.1, jnp.array(mask), max_voxels=64)
        assert np.asarray(m).sum() == 64


class TestGridPts:
    def test_formula_parity_np_jax(self, rng):
        pts = rng.uniform(-20, 20, size=(300, 3)).astype(np.float32)
        coords, idx = quantize_np(pts, 0.3)
        g_np = coords_to_grid_pts_np(pts, coords, 0.3)
        g_j = np.asarray(coords_to_grid_pts(jnp.array(pts), jnp.array(coords), 0.3))
        np.testing.assert_allclose(g_np, g_j, atol=1e-4)
        # grid points live close to their voxel centers
        err = np.abs(g_np - (coords + 0.5) * 0.3).max()
        assert err < 0.3 * 2


class TestHashTable:
    def _coords(self, rng, n):
        c = rng.integers(-512, 512, size=(n, 4)).astype(np.int32)
        c[:, 0] = rng.integers(0, 8, size=n)  # batch idx
        c = np.unique(c, axis=0)
        return c

    def test_roundtrip(self, rng):
        c = self._coords(rng, 2000)
        n = len(c)
        pad = np.zeros((2048 - n, 4), np.int32)
        coords = jnp.array(np.concatenate([c, pad]))
        mask = jnp.array(np.arange(2048) < n)
        table = build_hash_table(coords, mask)
        hit = np.asarray(lookup(table, coords, mask))
        assert np.all(hit[:n] == np.arange(n))
        assert np.all(hit[n:] == -1)

    def test_misses(self, rng):
        c = self._coords(rng, 500)
        coords = jnp.array(c)
        mask = jnp.ones(len(c), bool)
        table = build_hash_table(coords, mask)
        q = jnp.array(c + np.array([0, 10000, 0, 0], np.int32))
        miss = np.asarray(lookup(table, q))
        assert np.all(miss == -1)

    def test_symmetric_coordinate_families(self):
        """Swapped and negated coordinates (ubiquitous in symmetric voxel
        grids) must not collide: regression for the XOR-of-products hash
        whose probe AND fingerprint collided together on such keys."""
        base = []
        for x in range(-6, 7, 2):
            for y in range(-6, 7, 2):
                for z in range(-6, 7, 2):
                    base.append((0, x, y, z))
                    base.append((1, y, x, z))
        c = np.unique(np.asarray(base, np.int32), axis=0)
        table = build_hash_table(jnp.array(c), jnp.ones(len(c), bool))
        hit = np.asarray(lookup(table, jnp.array(c)))
        np.testing.assert_array_equal(hit, np.arange(len(c)))

    def test_mixed_queries(self, rng):
        c = self._coords(rng, 300)
        table = build_hash_table(jnp.array(c), jnp.ones(len(c), bool))
        q = np.concatenate([c[:50], c[:50] + np.array([0, 99999, 0, 0], np.int32)])
        res = np.asarray(lookup(table, jnp.array(q)))
        np.testing.assert_array_equal(res[:50], np.arange(50))
        assert np.all(res[50:] == -1)
