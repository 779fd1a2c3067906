"""Golden fixture for the checkpoint converter's ME-offset permutation
(round-2 VERDICT missing #4): a tiny coordinate set with per-tap
fingerprint weights, expected conv outputs for BOTH me_order hypotheses,
and the anisotropy decision procedure. Makes day-one validation against
real released weights a one-command task (tools/validate_converter.py)
instead of a debugging session. Reference semantics consumed at
models.py:36,418,484 (MinkowskiEngine 0.5 kernel-region iteration)."""
import numpy as np
import jax.numpy as jnp

from umeregrobust_tpu.models.convert import (
    convert_state_dict, decide_me_order, offset_permutation)
from umeregrobust_tpu.ops.sparse import (
    build_self_map, sort_level, sparse_conv)

# a 5-voxel L-shape: probes x, y and z adjacency separately
_COORDS = np.asarray([
    [0, 0, 0, 0],
    [0, 1, 0, 0],   # +x neighbor of origin
    [0, 0, 1, 0],   # +y neighbor
    [0, 0, 0, 1],   # +z neighbor
    [0, 0, 0, 2],   # +2z (z-column run)
], np.int32)

# torch-side kernel with per-tap fingerprints: theirs[k] = k + 1
_KERNEL = (np.arange(27, dtype=np.float32) + 1.0).reshape(27, 1, 1)

# Golden per-voxel outputs of a single sparse conv with ones features,
# computed from first principles: out[v] = sum of (tap id + 1) over taps
# whose offset leads to an existing voxel, where tap id is the SOURCE
# (torch-side) enumeration re-read through offset_permutation. Computed
# once with verified map semantics and frozen here; a change in either
# the offset enumeration or the permutation breaks the equality.
_GOLDEN = {
    # ours[k] = theirs[perm[k]]; perm differs between the two hypotheses
    "x_fastest": np.asarray([69.0, 65.0, 57.0, 56.0, 19.0], np.float32),
    "z_fastest": np.asarray([69.0, 33.0, 57.0, 80.0, 27.0], np.float32),
}


def _conv_out(me_order):
    params, _ = convert_state_dict({"conv1.kernel": _KERNEL},
                                   me_order=me_order)
    coords = jnp.asarray(_COORDS)
    mask = jnp.ones((5,), bool)
    level, order, inv = sort_level(coords, mask)
    nbr = build_self_map(level, kernel_size=3, t=1)
    feats = jnp.ones((5, 1), jnp.float32)
    out = sparse_conv(feats[order], params["conv1"]["w"], nbr)
    return np.asarray(out[inv][:, 0])


def _expected(me_order):
    """Independent recomputation from the offset enumeration."""
    perm = offset_permutation(3, me_order)
    occ = {tuple(c[1:]) for c in _COORDS}
    r = range(-1, 2)
    ours = [(dx, dy, dz) for dx in r for dy in r for dz in r]
    out = []
    for c in _COORDS:
        tot = 0.0
        for k, off in enumerate(ours):
            nb = (c[1] + off[0], c[2] + off[1], c[3] + off[2])
            if nb in occ:
                tot += float(perm[k]) + 1.0  # theirs[perm[k]] fingerprint
        out.append(tot)
    return np.asarray(out, np.float32)


class TestConverterGoldenFixture:
    def test_golden_outputs_both_orders(self):
        for order in ("x_fastest", "z_fastest"):
            got = _conv_out(order)
            np.testing.assert_allclose(got, _GOLDEN[order], atol=1e-5,
                                       err_msg=order)
            np.testing.assert_allclose(_expected(order), _GOLDEN[order],
                                       atol=1e-5, err_msg=order)

    def test_orders_differ(self):
        """The flag must matter on this fixture (else it can't validate)."""
        assert np.abs(_GOLDEN["x_fastest"] - _GOLDEN["z_fastest"]).max() > 1

    def test_permutation_is_involution_on_xz_swap(self):
        """x_fastest <-> z_fastest is an x/z transpose: applying the
        permutation twice returns the identity."""
        p = offset_permutation(3, "x_fastest")
        np.testing.assert_array_equal(p[p], np.arange(27))

    def test_decide_me_order_on_synthetic_anisotropy(self):
        """Kernels built smooth in (x, y) and rough in z (the LiDAR
        ground-plane prior) must be recognized in either storage order."""
        rng = np.random.default_rng(0)
        # vol is the TRUE spatial layout (x, y, z): smooth horizontally
        vol = (np.linspace(0, 1, 3)[None, None, :, None, None]
               * rng.standard_normal((1, 1, 3, 4, 4))
               + 0.05 * rng.standard_normal((3, 3, 3, 4, 4)))
        flat_true = vol.reshape(27, 4, 4)  # stored z-fastest

        sd_z = {"conv1.kernel": flat_true}
        order, margin = decide_me_order(sd_z)
        assert order == "z_fastest", (order, margin)

        # same kernel stored x-fastest (transpose x/z before flattening)
        perm = offset_permutation(3, "x_fastest")
        inv = np.argsort(perm)
        sd_x = {"conv1.kernel": flat_true[inv]}
        order, margin = decide_me_order(sd_x)
        assert order == "x_fastest", (order, margin)
