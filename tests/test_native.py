"""Parity tests: native C++ host ops vs the numpy/scipy references."""
import numpy as np
import pytest

from umeregrobust_tpu import native
from umeregrobust_tpu.ops.voxel import quantize_np


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.have_native():
        pytest.skip("native hostops.so unavailable (no toolchain)")


class TestQuantize:
    def test_matches_numpy(self, rng):
        pts = rng.uniform(-30, 30, size=(5000, 3)).astype(np.float32)
        c1, i1 = native.quantize(pts, 0.3)
        c2, i2 = quantize_np(pts, 0.3)
        # same voxel sets; representative = first occurrence in both
        assert set(map(tuple, c1)) == set(map(tuple, c2))
        assert set(i1.tolist()) == set(i2.tolist())
        # native preserves first-occurrence ORDER
        assert (np.diff(i1) > 0).all() == (np.diff(np.sort(i1)) > 0).all()


class TestNN:
    def test_radius_matches_kdtree(self, rng):
        q = rng.uniform(-10, 10, size=(500, 3)).astype(np.float32)
        p = rng.uniform(-10, 10, size=(2000, 3)).astype(np.float32)
        idx, dist = native.nn_radius(q, p, 0.7)
        from scipy.spatial import cKDTree
        d2, i2 = cKDTree(p).query(q, k=1)
        want = np.where(d2 <= 0.7, i2, -1)
        np.testing.assert_array_equal(idx, want)
        ok = idx >= 0
        np.testing.assert_allclose(dist[ok], d2[ok], atol=1e-5)

    def test_nn1_matches_kdtree(self, rng):
        q = rng.uniform(-20, 20, size=(300, 3)).astype(np.float32)
        p = rng.uniform(-10, 10, size=(1500, 3)).astype(np.float32)
        idx, dist = native.nn_1(q, p, cell=1.0)
        from scipy.spatial import cKDTree
        d2, i2 = cKDTree(p).query(q, k=1)
        np.testing.assert_allclose(dist, d2, atol=1e-5)
        # ties can swap indices; distances must agree
        got = np.linalg.norm(q - p[idx], axis=1)
        np.testing.assert_allclose(got, d2, atol=1e-5)


class TestHungarian:
    def test_matches_scipy(self, rng):
        from scipy.optimize import linear_sum_assignment
        for shape in [(8, 8), (6, 10), (10, 6)]:
            cost = rng.uniform(0, 10, size=shape)
            r1, c1 = native.hungarian(cost)
            r2, c2 = linear_sum_assignment(cost)
            np.testing.assert_allclose(
                cost[r1, c1].sum(), cost[r2, c2].sum(), atol=1e-9)
