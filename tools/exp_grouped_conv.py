"""Experiment 3: grouped-window sparse conv vs the per-tap scan.

Key structure: levels are code-sorted with z fastest, so the <=3 valid
z-candidates of any (dx, dy) kernel-offset group live on CONSECUTIVE rows
(a z-column is a contiguous run; lattice arithmetic rules out interlopers
at every level/interface). Hence tap triplets collapse to ONE monotone
row-gather from a shift-concatenated (N, 3C) table + per-tap 3-way
selects:

    27 narrow gathers  ->  9 wide gathers  (gather is the measured
    bottleneck at ~3 cycles/row regardless of width; exp_gather2)

Measures per-conv time and correctness vs ops/sparse.sparse_conv on a
REAL synthetic-LiDAR level-0 self map at bench size (2x16k fused rows).
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from umeregrobust_tpu.utils.cache import ensure_compile_cache

ensure_compile_cache()

from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair  # noqa
from umeregrobust_tpu.ops.sparse import (  # noqa: E402
    Level, build_self_map, sort_level, sparse_conv)
from umeregrobust_tpu.ops.voxel import quantize_np  # noqa: E402

N, C = 32768, 32
R = 50


def make_group_maps(nbr):
    """(27, N) tap map -> (s (9, N), pos (9, 3, N), valid (9, 3, N)).

    Taps are lexicographic (dz fastest), so taps [3g, 3g+2] share (dx, dy).
    s = first (smallest) valid row of the group; pos = row offset in the
    3-row window (guaranteed <= 2 by column contiguity)."""
    K, n = nbr.shape
    g = nbr.reshape(9, 3, n)
    valid = g >= 0
    big = jnp.where(valid, g, jnp.int32(2**30))
    s = jnp.min(big, axis=1)  # (9, N)
    s = jnp.where(s < 2**30, s, jnp.int32(-1))
    pos = jnp.where(valid, g - s[:, None, :], jnp.int32(0))
    return s, pos.astype(jnp.int32), valid


@jax.jit
def conv_grouped(feats, w, s, pos, valid):
    """w: (27, C, Cout). Gathers 9 (N, 3C) windows instead of 27 (N, C)."""
    f = feats.astype(jnp.bfloat16)
    z = jnp.zeros((1, C), jnp.bfloat16)
    f1 = jnp.concatenate([f[1:], z], axis=0)
    f2 = jnp.concatenate([f[2:], z, z], axis=0)
    F3 = jnp.concatenate([f, f1, f2], axis=1)  # (N, 3C): rows r, r+1, r+2
    F3p = jnp.concatenate([F3, jnp.zeros((1, 3 * C), jnp.bfloat16)], axis=0)
    wg = w.astype(jnp.bfloat16).reshape(9, 3, C, -1)

    def group(acc, xs):
        w3, s_g, pos_g, val_g = xs
        win = F3p[jnp.where(s_g >= 0, s_g, N)]  # (N, 3C), monotone gather
        win = win.reshape(-1, 3, C)
        out = acc
        for t in range(3):
            sel = jnp.take_along_axis(
                win, pos_g[t][:, None, None], axis=1)[:, 0]  # (N, C)
            sel = jnp.where(val_g[t][:, None], sel, 0)
            out = out + jnp.matmul(sel, w3[t],
                                   preferred_element_type=jnp.float32)
        return out, None

    acc0 = jnp.zeros((s.shape[1], w.shape[2]), jnp.float32)
    out, _ = jax.lax.scan(group, acc0, (wg, s, pos, valid))
    return out


@jax.jit
def conv_grouped_unrolled(feats, w, s, pos, valid):
    """Same, python-unrolled over the 9 groups (lets XLA keep acc live)."""
    f = feats.astype(jnp.bfloat16)
    z = jnp.zeros((1, C), jnp.bfloat16)
    f1 = jnp.concatenate([f[1:], z], axis=0)
    f2 = jnp.concatenate([f[2:], z, z], axis=0)
    F3 = jnp.concatenate([f, f1, f2], axis=1)
    F3p = jnp.concatenate([F3, jnp.zeros((1, 3 * C), jnp.bfloat16)], axis=0)
    wg = w.astype(jnp.bfloat16)
    acc = jnp.zeros((s.shape[1], w.shape[2]), jnp.float32)
    for g in range(9):
        win = F3p[jnp.where(s[g] >= 0, s[g], N)].reshape(-1, 3, C)
        for t in range(3):
            sel = jnp.take_along_axis(
                win, pos[g, t][:, None, None], axis=1)[:, 0]
            sel = jnp.where(valid[g, t][:, None], sel, 0)
            acc = acc + jnp.matmul(sel, wg[3 * g + t],
                                   preferred_element_type=jnp.float32)
    return acc


def timed(tag, fn, *args, reps=R):
    @jax.jit
    def rep(*a):
        def step(acc, _):
            out = fn(acc, *a[1:])
            return out / (jnp.max(jnp.abs(out)) + 1.0), None

        out, _ = jax.lax.scan(step, a[0], None, length=reps)
        return jnp.sum(out)

    t0 = time.time()
    sv = float(np.asarray(rep(*args)))
    t1 = time.time()
    sv = float(np.asarray(rep(*args)))
    dt = (time.time() - t1) / reps
    print(f"{tag}: {dt*1e3:7.3f} ms/conv (compile {t1-t0:.0f}s, chk {sv:.3f})",
          flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    # realistic fused-2-cloud level-0 geometry
    pair = make_pair(SceneConfig(extent=25.0, ground_points=12000,
                                 structure_points=24000, observe_mode="lidar",
                                 seed=1), seed=1)
    coords_list = []
    for b, pts in enumerate([pair["src_pts"], pair["tgt_pts"]]):
        cc, _ = quantize_np(pts, 0.3)
        cc = cc[: N // 2]
        c4 = np.full((N // 2, 4), 2**20, np.int32)
        c4[: len(cc), 0] = b
        c4[: len(cc), 1:] = cc
        coords_list.append(c4)
    coords = jnp.asarray(np.concatenate(coords_list))
    mask = jnp.asarray((np.concatenate(coords_list)[:, 1] < 2**20))
    level, _, _ = sort_level(coords, mask)
    nbr = build_self_map(level, kernel_size=3, t=1)
    nbr = jax.block_until_ready(nbr)
    hits = float(jnp.mean((nbr >= 0).astype(jnp.float32)))
    print(f"tap hit rate: {hits:.3f}", flush=True)

    s, pos, valid = make_group_maps(nbr)
    # invariant check: every valid tap row within [s, s+2]
    g = nbr.reshape(9, 3, -1)
    off = jnp.where(valid, g - s[:, None, :], 0)
    print(f"max window offset (must be <=2): {int(jnp.max(off))}", flush=True)

    feats = jnp.asarray(rng.standard_normal((N, C)), jnp.float32)
    feats = feats * mask[:, None]
    w = jnp.asarray(rng.standard_normal((27, C, C)) * 0.1, jnp.float32)

    ref = np.asarray(sparse_conv(feats, w, nbr, compute_dtype=jnp.bfloat16))
    got = np.asarray(conv_grouped(feats, w, s, pos, valid))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"grouped rel err: {err:.2e}", flush=True)
    got2 = np.asarray(conv_grouped_unrolled(feats, w, s, pos, valid))
    err2 = np.abs(got2 - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"grouped-unrolled rel err: {err2:.2e}", flush=True)

    timed("scan_27tap ", lambda f_, w_, n_: sparse_conv(
        f_, w_, n_, compute_dtype=jnp.bfloat16), feats, w, nbr)
    timed("grouped9   ", conv_grouped, feats, w, s, pos, valid)
    timed("grouped9-un", conv_grouped_unrolled, feats, w, s, pos, valid)


if __name__ == "__main__":
    main()
