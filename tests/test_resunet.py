"""Model family tests: forward smoke, shape/structure parity between init
and the torch-checkpoint converter, BN-state plumbing, batching invariance."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umeregrobust_tpu.models.convert import convert_state_dict, offset_permutation
from umeregrobust_tpu.models.resunet import (
    ARCHS,
    build_unet_geometry,
    default_level_capacities,
    init_resunet,
    resunet_apply,
)


def _cloud(rng, n=400, cap=512, batch=1, lim=40):
    c = rng.integers(-lim, lim, size=(n, 3)).astype(np.int32)
    b = rng.integers(0, batch, size=(n, 1)).astype(np.int32)
    c4 = np.unique(np.concatenate([b, c], axis=1), axis=0)
    n = len(c4)
    pad = cap - n
    coords = np.concatenate([c4, np.full((pad, 4), 2**20, np.int32)])
    mask = np.arange(cap) < n
    return jnp.array(coords), jnp.array(mask), n


@pytest.fixture(scope="module")
def small2_setup():
    rng = np.random.default_rng(3)
    arch = ARCHS["ResUNetSmall2"]
    coords, mask, n = _cloud(rng, n=400, cap=512)
    # random (non-surface) points barely merge under striding: use flat caps
    caps = (512,) * 5
    geom = build_unet_geometry(coords, mask, arch, caps)
    params, state = init_resunet(jax.random.PRNGKey(0), arch, 1, 32)
    return arch, coords, mask, n, geom, params, state


class TestForward:
    def test_smoke_and_shapes(self, small2_setup):
        arch, coords, mask, n, geom, params, state = small2_setup
        feats = jnp.ones((512, 1)) * mask[:, None]
        out, new_state = resunet_apply(params, state, geom, feats, arch, train=False)
        assert out.shape == (512, 32)
        out = np.asarray(out)
        m = np.asarray(mask)
        # L2 normalized on valid rows, zero on padding
        np.testing.assert_allclose(np.linalg.norm(out[m], axis=-1), 1.0, atol=1e-4)
        np.testing.assert_allclose(out[~m], 0.0)

    def test_grouped_conv_matches_scan(self, small2_setup):
        """The grouped-window conv path (default) must match the per-tap
        scan formulation through the whole UNet (ops/sparse.GroupedMap is
        a pure re-association of the same gathers)."""
        arch, coords, mask, n, geom, params, state = small2_setup
        feats = jnp.ones((512, 1)) * mask[:, None]
        o_g, _ = resunet_apply(params, state, geom, feats, arch,
                               conv_impl="grouped")
        o_s, _ = resunet_apply(params, state, geom, feats, arch,
                               conv_impl="scan")
        np.testing.assert_allclose(np.asarray(o_g), np.asarray(o_s),
                                   atol=1e-5)

    def test_train_updates_bn_state(self, small2_setup):
        arch, coords, mask, n, geom, params, state = small2_setup
        feats = jnp.ones((512, 1)) * mask[:, None]
        _, new_state = resunet_apply(params, state, geom, feats, arch, train=True)
        d0 = float(jnp.abs(new_state["norm1"]["mean"] - state["norm1"]["mean"]).max())
        assert d0 > 0

    def test_eval_deterministic_under_jit(self, small2_setup):
        arch, coords, mask, n, geom, params, state = small2_setup
        feats = jnp.ones((512, 1)) * mask[:, None]

        f = jax.jit(lambda p, s, ft: resunet_apply(p, s, geom, ft, arch)[0])
        o1, o2 = f(params, state, feats), f(params, state, feats)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))

    def test_padding_rows_do_not_affect_output(self, small2_setup):
        """Growing the capacity (more padding) must not change valid outputs."""
        arch, coords, mask, n, geom, params, state = small2_setup
        feats = jnp.ones((512, 1)) * mask[:, None]
        out1, _ = resunet_apply(params, state, geom, feats, arch)

        coords_big = jnp.concatenate([coords, jnp.full((256, 4), 2**20, jnp.int32)])
        mask_big = jnp.concatenate([mask, jnp.zeros(256, bool)])
        geom_big = build_unet_geometry(coords_big, mask_big, arch, (768,) * 5)
        feats_big = jnp.ones((768, 1)) * mask_big[:, None]
        out2, _ = resunet_apply(params, state, geom_big, feats_big, arch)
        np.testing.assert_allclose(
            np.asarray(out1)[:n], np.asarray(out2)[:n], atol=2e-4)


@pytest.mark.slow  # compile-dominated variant coverage (63 s on 1 core)
class TestSixLevelFamily:
    def test_resunet5_forward(self):
        """6-level variant: k5 kernels and the deep stride chain (1,2,2,2,2,3)
        exercise non-k3 offsets and a 6-deep pyramid."""
        rng = np.random.default_rng(5)
        arch = ARCHS["ResUNet5"]
        coords, mask, n = _cloud(rng, n=600, cap=768, lim=60)
        geom = build_unet_geometry(coords, mask, arch, (768,) * 6)
        params, state = init_resunet(jax.random.PRNGKey(2), arch, 1, 16)
        feats = jnp.ones((768, 1)) * mask[:, None]
        out, _ = resunet_apply(params, state, geom, feats, arch)
        out = np.asarray(out)
        m = np.asarray(mask)
        assert out.shape == (768, 16)
        np.testing.assert_allclose(np.linalg.norm(out[m], axis=-1), 1.0,
                                   atol=1e-4)

    def test_resunet_stride4_stem7(self):
        """The original ResUNet: k7 stem and a stride-4 second level."""
        rng = np.random.default_rng(6)
        arch = ARCHS["ResUNet"]
        coords, mask, n = _cloud(rng, n=500, cap=640, lim=80)
        geom = build_unet_geometry(coords, mask, arch, (640,) * 6)
        params, state = init_resunet(jax.random.PRNGKey(3), arch, 1, 16)
        feats = jnp.ones((640, 1)) * mask[:, None]
        out, _ = resunet_apply(params, state, geom, feats, arch)
        assert np.isfinite(np.asarray(out)).all()


class TestConverter:
    def test_structure_matches_init(self):
        """A synthetic torch-style state dict converts to pytrees with the
        same structure and shapes as init_resunet."""
        arch = ARCHS["ResUNetSmall2"]
        params, state = init_resunet(jax.random.PRNGKey(1), arch, 1, 32)

        sd = {}

        def emit(path, node, into_state):
            for k, v in node.items():
                if isinstance(v, dict):
                    emit(path + [k], v, into_state)
                else:
                    sd_key = None
                    if k == "w":
                        sd_key = ".".join(path) + ".kernel"
                        val = np.asarray(v)
                        if val.ndim == 3 and val.shape[0] == 1:
                            val = val[0]
                    elif k == "b":
                        sd_key, val = ".".join(path) + ".bias", np.asarray(v)
                    elif k == "scale":
                        sd_key, val = ".".join(path) + ".bn.weight", np.asarray(v)
                    elif k == "bias":
                        sd_key, val = ".".join(path) + ".bn.bias", np.asarray(v)
                    elif k == "mean":
                        sd_key, val = ".".join(path) + ".bn.running_mean", np.asarray(v)
                    elif k == "var":
                        sd_key, val = ".".join(path) + ".bn.running_var", np.asarray(v)
                    sd[sd_key] = val

        emit([], params, False)
        emit([], state, True)

        # mlp1/final in torch are (Cin, Cout) 1x1 kernels; ours store 2D too
        p2, s2 = convert_state_dict(sd, me_order="z_fastest")
        flat1 = jax.tree_util.tree_leaves_with_path(params)
        flat2 = jax.tree_util.tree_leaves_with_path(p2)
        assert len(flat1) == len(flat2)
        for (k1, v1), (k2, v2) in zip(sorted(flat1, key=str), sorted(flat2, key=str)):
            assert str(k1) == str(k2)
            assert v1.shape == v2.shape, (k1, v1.shape, v2.shape)
        flat_s1 = jax.tree_util.tree_leaves_with_path(state)
        flat_s2 = jax.tree_util.tree_leaves_with_path(s2)
        assert len(flat_s1) == len(flat_s2)

    def test_numerical_roundtrip_forward(self, small2_setup):
        """Params exported to a torch-style state dict and re-imported must
        produce bit-identical forward outputs (value mapping, not just
        structure)."""
        arch, coords, mask, n, geom, params, state = small2_setup

        sd = {}

        def emit(path, node):
            for k, v in node.items():
                if isinstance(v, dict):
                    emit(path + [k], v)
                    continue
                val = np.asarray(v)
                if k == "w":
                    if val.ndim == 3 and val.shape[0] == 1:
                        val = val[0]
                    sd[".".join(path) + ".kernel"] = val
                elif k == "b":
                    sd[".".join(path) + ".bias"] = val
                elif k == "scale":
                    sd[".".join(path) + ".bn.weight"] = val
                elif k == "bias":
                    sd[".".join(path) + ".bn.bias"] = val
                elif k == "mean":
                    sd[".".join(path) + ".bn.running_mean"] = val
                elif k == "var":
                    sd[".".join(path) + ".bn.running_var"] = val

        emit([], params)
        emit([], state)
        p2, s2 = convert_state_dict(sd, me_order="z_fastest")
        feats = jnp.ones((512, 1)) * mask[:, None]
        out1, _ = resunet_apply(params, state, geom, feats, arch)
        out2, _ = resunet_apply(p2, s2, geom, feats, arch)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   atol=1e-6)

    def test_offset_permutation_roundtrip(self):
        perm = offset_permutation(3, "x_fastest")
        assert sorted(perm.tolist()) == list(range(27))
        # center offset is its own image in both conventions
        assert perm[13] == 13
        assert offset_permutation(3, "z_fastest").tolist() == list(range(27))
