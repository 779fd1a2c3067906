"""Sparse conv vs dense-conv oracle on tiny grids; stride/transpose maps;
adjointness; masked batch norm vs numpy."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umeregrobust_tpu.ops.sparse import (
    build_conv_map,
    build_self_map,
    build_transpose_map,
    downsample_coords,
    kernel_offsets,
    make_level,
    masked_batch_norm,
    sparse_conv,
)


def _random_sparse(rng, n=60, cin=4, lim=6, batch=2, cap=96):
    """Random occupied voxels in [-lim, lim)^3 across `batch` clouds."""
    coords = rng.integers(-lim, lim, size=(n, 3)).astype(np.int32)
    b = rng.integers(0, batch, size=(n, 1)).astype(np.int32)
    c4 = np.concatenate([b, coords], axis=1)
    c4 = np.unique(c4, axis=0)
    n = len(c4)
    feats = rng.normal(size=(n, cin)).astype(np.float32)
    pad = cap - n
    c4p = np.concatenate([c4, np.zeros((pad, 4), np.int32)])
    fp = np.concatenate([feats, np.zeros((pad, cin), np.float32)])
    mask = np.arange(cap) < n
    return jnp.array(c4p), jnp.array(fp), jnp.array(mask), n


def _dense_oracle(c4, feats, mask, out_c4, out_mask, W, offsets, sign=+1):
    """out[i] = sum_k feats[row_of(out_c4[i] + sign*offs[k])] @ W[k]."""
    c4, feats, mask = np.asarray(c4), np.asarray(feats), np.asarray(mask)
    out_c4, out_mask = np.asarray(out_c4), np.asarray(out_mask)
    W = np.asarray(W)
    index = {tuple(c): i for i, c in enumerate(c4[mask])}
    out = np.zeros((len(out_c4), W.shape[2]), np.float32)
    for i in range(len(out_c4)):
        if not out_mask[i]:
            continue
        for k, off in enumerate(offsets):
            q = tuple(out_c4[i] + sign * off)
            j = index.get(q)
            if j is not None:
                out[i] += feats[j] @ W[k]
    return out


class TestSelfConv:
    def test_matches_dense_oracle(self, rng):
        c4, feats, mask, n = _random_sparse(rng)
        level = make_level(c4, mask)
        nbr = build_self_map(level, kernel_size=3, t=1)
        W = jnp.array(rng.normal(size=(27, 4, 5)).astype(np.float32) * 0.3)
        out = np.asarray(sparse_conv(feats, W, nbr))
        offs = kernel_offsets(3, 1)
        want = _dense_oracle(c4, feats, mask, c4, mask, W, offs)
        np.testing.assert_allclose(out, want, atol=1e-4)

    def test_bias(self, rng):
        c4, feats, mask, n = _random_sparse(rng, n=20, cap=32)
        level = make_level(c4, mask)
        nbr = build_self_map(level, 3, 1)
        W = jnp.zeros((27, 4, 3))
        b = jnp.array([1.0, 2.0, 3.0])
        out = np.asarray(sparse_conv(feats, W, nbr, bias=b))
        valid = out[np.asarray(mask)]
        np.testing.assert_allclose(
            valid, np.tile([[1.0, 2.0, 3.0]], (len(valid), 1)))


class TestStridedConv:
    def test_downsample_coords_unique_stride_grid(self, rng):
        c4, feats, mask, n = _random_sparse(rng)
        out_c, out_m = downsample_coords(c4, mask, out_stride=2, capacity=96)
        out_c, out_m = np.asarray(out_c), np.asarray(out_m)
        c4n, maskn = np.asarray(c4), np.asarray(mask)
        q = c4n[maskn].copy()
        q[:, 1:] = np.floor_divide(q[:, 1:], 2) * 2
        want = set(map(tuple, q))
        got = set(map(tuple, out_c[out_m]))
        assert got == want

    def test_strided_conv_oracle(self, rng):
        c4, feats, mask, n = _random_sparse(rng)
        lin = make_level(c4, mask)
        out_c, out_m = downsample_coords(c4, mask, out_stride=2, capacity=96)
        lout = make_level(out_c, out_m)
        nbr = build_conv_map(lin, lout, kernel_size=3, t_in=1)
        W = jnp.array(rng.normal(size=(27, 4, 6)).astype(np.float32) * 0.3)
        out = np.asarray(sparse_conv(feats, W, nbr))
        want = _dense_oracle(c4, feats, mask, out_c, out_m, W, kernel_offsets(3, 1))
        np.testing.assert_allclose(out, want, atol=1e-4)

    def test_stride3(self, rng):
        c4, feats, mask, n = _random_sparse(rng, lim=9)
        out_c, out_m = downsample_coords(c4, mask, out_stride=3, capacity=96)
        lin = make_level(c4, mask)
        lout = make_level(out_c, out_m)
        nbr = build_conv_map(lin, lout, 3, t_in=1)
        W = jnp.array(rng.normal(size=(27, 4, 4)).astype(np.float32) * 0.3)
        out = np.asarray(sparse_conv(feats, W, nbr))
        want = _dense_oracle(c4, feats, mask, out_c, out_m, W, kernel_offsets(3, 1))
        np.testing.assert_allclose(out, want, atol=1e-4)


class TestTransposedConv:
    def test_transpose_oracle(self, rng):
        c4, feats, mask, n = _random_sparse(rng)
        fine = make_level(c4, mask)
        out_c, out_m = downsample_coords(c4, mask, out_stride=2, capacity=96)
        coarse = make_level(out_c, out_m)
        cf = jnp.array(rng.normal(size=(96, 5)).astype(np.float32))
        cf = cf * out_m[:, None]
        nbr = build_transpose_map(coarse, fine, kernel_size=3, t_out=1)
        W = jnp.array(rng.normal(size=(27, 5, 3)).astype(np.float32) * 0.3)
        out = np.asarray(sparse_conv(cf, W, nbr))
        want = _dense_oracle(out_c, cf, out_m, c4, mask, W, kernel_offsets(3, 1), sign=-1)
        np.testing.assert_allclose(out, want, atol=1e-4)

    def test_adjointness(self, rng):
        """<conv(x), y> == <x, conv_tr(y; W^T)> validates the map pairing."""
        c4, x, mask, n = _random_sparse(rng, cin=4)
        fine = make_level(c4, mask)
        out_c, out_m = downsample_coords(c4, mask, out_stride=2, capacity=96)
        coarse = make_level(out_c, out_m)
        W = jnp.array(rng.normal(size=(27, 4, 6)).astype(np.float32) * 0.3)
        nbr_fwd = build_conv_map(fine, coarse, 3, t_in=1)
        cx = sparse_conv(x, W, nbr_fwd)  # (96, 6) on coarse
        y = jnp.array(rng.normal(size=(96, 6)).astype(np.float32)) * out_m[:, None]
        nbr_tr = build_transpose_map(coarse, fine, 3, t_out=1)
        cty = sparse_conv(y, jnp.swapaxes(W, 1, 2), nbr_tr)  # (cap, 4) on fine
        lhs = float(jnp.sum(cx * y))
        rhs = float(jnp.sum(x * cty * mask[:, None]))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


class TestBatchNorm:
    def test_train_stats_exclude_padding(self, rng):
        n, cap, c = 40, 64, 8
        f = rng.normal(size=(cap, c)).astype(np.float32) * 3 + 1
        mask = np.arange(cap) < n
        f[~mask] = 0
        scale = np.ones(c, np.float32) * 2
        bias = np.ones(c, np.float32)
        out, nm, nv = masked_batch_norm(
            jnp.array(f), jnp.array(mask), jnp.array(scale), jnp.array(bias),
            jnp.zeros(c), jnp.ones(c), train=True, momentum=0.1)
        valid = f[:n]
        mean, var = valid.mean(0), valid.var(0)
        want = (valid - mean) / np.sqrt(var + 1e-5) * scale + bias
        np.testing.assert_allclose(np.asarray(out)[:n], want, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out)[n:], 0.0)
        np.testing.assert_allclose(np.asarray(nm), 0.1 * mean, atol=1e-5)
        unb = valid.var(0, ddof=1)
        np.testing.assert_allclose(np.asarray(nv), 0.9 + 0.1 * unb, rtol=1e-4)

    def test_eval_uses_running(self, rng):
        cap, c = 16, 4
        f = rng.normal(size=(cap, c)).astype(np.float32)
        mask = np.ones(cap, bool)
        rm = np.full(c, 0.5, np.float32)
        rv = np.full(c, 2.0, np.float32)
        out, _, _ = masked_batch_norm(
            jnp.array(f), jnp.array(mask), jnp.ones(c), jnp.zeros(c),
            jnp.array(rm), jnp.array(rv), train=False)
        want = (f - 0.5) / np.sqrt(2.0 + 1e-5)
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


class TestGeometryEquivalence:
    """build_unet_geometry's symmetric/adjoint fast path must produce the
    exact maps the generic per-map builders produce."""

    def _check(self, rng, arch_name):
        from umeregrobust_tpu.models.resunet import (
            ARCHS, _tensor_strides, build_unet_geometry)
        from umeregrobust_tpu.ops.sparse import (
            build_conv_map, build_self_map, build_transpose_map, make_level)

        arch = ARCHS[arch_name]
        L = len(arch.channels)
        n = 150
        coords = np.unique(np.concatenate(
            [rng.integers(0, 2, (2 * n, 1)),
             rng.integers(-16, 16, (2 * n, 3))], axis=1).astype(np.int32),
            axis=0)[:n]
        cap = 192
        c4 = np.full((cap, 4), 2**20, np.int32)
        c4[: len(coords)] = coords
        mask = np.arange(cap) < len(coords)
        caps = tuple(cap for _ in range(L))
        geom = build_unet_geometry(jnp.asarray(c4), jnp.asarray(mask), arch,
                                   caps)
        ts = _tensor_strides(arch)
        levels = geom["levels"]
        for lv in range(L):
            ref_block = build_self_map(levels[lv], 3, ts[lv])
            np.testing.assert_array_equal(
                np.asarray(geom["block_maps"][lv]), np.asarray(ref_block),
                err_msg=f"block map level {lv}")
        ref_stem = build_self_map(levels[0], arch.kernel_sizes[0], ts[0])
        np.testing.assert_array_equal(
            np.asarray(geom["enc_maps"][0]), np.asarray(ref_stem))
        for lv in range(1, L):
            ref_enc = build_conv_map(levels[lv - 1], levels[lv],
                                     arch.kernel_sizes[lv], ts[lv - 1])
            np.testing.assert_array_equal(
                np.asarray(geom["enc_maps"][lv]), np.asarray(ref_enc),
                err_msg=f"enc map level {lv}")
            ref_dec = build_transpose_map(levels[lv], levels[lv - 1],
                                          arch.kernel_sizes[lv], ts[lv - 1])
            np.testing.assert_array_equal(
                np.asarray(geom["dec_maps"][L - 1 - lv]), np.asarray(ref_dec),
                err_msg=f"dec map level {lv}")

    def test_resunetsmall2(self, rng):
        self._check(rng, "ResUNetSmall2")

    def test_fast_grouped_forms_match_tap_grouping(self, rng):
        """The rank-join fast path builds GroupedMaps directly; they must
        equal group_kernel_map() of the (reconstructed) tap maps, and
        ungroup must round-trip."""
        from umeregrobust_tpu.models.resunet import (
            ARCHS, build_unet_geometry)
        from umeregrobust_tpu.ops.sparse import (
            group_kernel_map, ungroup_kernel_map)

        arch = ARCHS["ResUNetSmall2"]
        L = len(arch.channels)
        n = 150
        coords = np.unique(np.concatenate(
            [rng.integers(0, 2, (2 * n, 1)),
             rng.integers(-16, 16, (2 * n, 3))], axis=1).astype(np.int32),
            axis=0)[:n]
        cap = 192
        c4 = np.full((cap, 4), 2**20, np.int32)
        c4[: len(coords)] = coords
        mask = np.arange(cap) < len(coords)
        geom = build_unet_geometry(jnp.asarray(c4), jnp.asarray(mask), arch,
                                   tuple(cap for _ in range(L)))

        def check(got, tap, z_reversed, tag):
            want = group_kernel_map(tap, 3, z_reversed=z_reversed)
            for f in ("center", "masks", "patho", "worder"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(got, f)), np.asarray(getattr(want, f)),
                    err_msg=f"{tag}.{f}")
            np.testing.assert_array_equal(
                np.asarray(ungroup_kernel_map(want)), np.asarray(tap),
                err_msg=f"{tag} ungroup round-trip")

        for lv in range(L):
            check(geom["block_g"][lv], geom["block_maps"][lv], False,
                  f"block_g[{lv}]")
            check(geom["enc_g"][lv], geom["enc_maps"][lv], False,
                  f"enc_g[{lv}]")
        for d in range(L - 1):
            check(geom["dec_g"][d], geom["dec_maps"][d], True,
                  f"dec_g[{d}]")

    @pytest.mark.slow  # non-flagship arch variant (compile-heavy)
    def test_resunet_k7_stride4(self, rng):
        self._check(rng, "ResUNet")

    @pytest.mark.slow  # non-flagship arch variant (compile-heavy)
    def test_resunet2_k5_stride2(self, rng):
        self._check(rng, "ResUNet2")
