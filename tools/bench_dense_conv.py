"""Dense-grid 3D conv vs the sparse grouped conv at reference L0 scale.

VERDICT r4 #1(a): the sparse conv is gather-rate-bound (~3.8 ns/row on
v5e, insensitive to width/locality — tools/bench_conv.py, EXPERIMENTS.md
E5). A dense occupancy grid sidesteps gathers entirely: scatter the N
occupied voxels into a (X, Y, Z, C) grid once per level, run the conv as
a dense MXU op over ALL cells (empty cells hold zeros, so values at
occupied cells equal the sparse conv exactly — ME zero-padding
semantics), and gather occupied rows back out. Pays O(cells) MXU flops
(mostly idle today: HBM analysis shows the e2e peak at 5.9% of v5e HBM
and the MXU near-idle during gathers) to avoid O(9N) serial gathers.

Reference-point L0: extent-50 scenes at 0.3 m voxels -> ~(336, 336, 40)
grid = 4.5M cells; occupancy 50176 / 4.5M ~ 1.1%.

Variants:
  s0  sparse_conv_grouped at N rows (the shipping form; N = one cloud)
  d0  lax.conv_general_dilated 3x3x3 NDHWC bf16 over the dense grid
  d1  z-decomposed: 3 z-shifted conv2d's with batch=Z (some TPU stacks
      lower 2D convs better than 3D)
  io  scatter N rows into the grid + gather N rows back (per-level cost
      of entering/leaving the dense form)

Usage: python tools/bench_dense_conv.py [--x 336] [--z 40] [--c 32]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *a, reps=20):
    import jax
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--x", type=int, default=336)
    ap.add_argument("--z", type=int, default=40)
    ap.add_argument("--c", type=int, default=32)
    ap.add_argument("--cout", type=int, default=0, help="default = --c")
    ap.add_argument("--n", type=int, default=50176)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    from umeregrobust_tpu.ops.sparse import GroupedMap, sparse_conv_grouped

    X = Y = args.x
    Z, C = args.z, args.c
    Cout = args.cout or C
    N = args.n
    cells = X * Y * Z
    rng = np.random.default_rng(0)
    print(f"grid ({X},{Y},{Z}) = {cells/1e6:.1f}M cells, C={C}->{Cout}, "
          f"N={N} occupied ({100*N/cells:.1f}%)")

    # --- s0: sparse grouped conv, one cloud at L0 ----------------------
    feats = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, C, Cout)).astype(np.float32) * .1)
    base = np.arange(N, dtype=np.int64)[None, :] + rng.integers(
        -4, 5, size=(9, N))
    center = np.clip(base, 0, N).astype(np.int32)
    gmap = GroupedMap(center=jnp.asarray(center),
                      masks=jnp.asarray(rng.random((9, 3, N)) < 0.7),
                      patho=jnp.asarray(rng.random((9, N)) < 0.02),
                      worder=jnp.asarray(np.arange(3, dtype=np.int32)))

    @jax.jit
    def s0(f):
        return sparse_conv_grouped(f, w, gmap, compute_dtype=jnp.bfloat16)

    ms = timeit(s0, feats, reps=args.reps)
    print(f"s0 sparse grouped conv      : {ms:7.2f} ms")

    # --- d0: dense 3D conv ---------------------------------------------
    grid = jnp.asarray(rng.normal(size=(1, X, Y, Z, C)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    wd = jnp.asarray(
        rng.normal(size=(3, 3, 3, C, Cout)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)

    @jax.jit
    def d0(g):
        return jax.lax.conv_general_dilated(
            g, wd, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)

    ms = timeit(d0, grid, reps=args.reps)
    gflop = cells * 27 * C * Cout * 2 / 1e9
    print(f"d0 dense conv3d             : {ms:7.2f} ms "
          f"({gflop/ms:6.1f} TFLOP/s of ~197 peak)")

    # --- d1: z-decomposed conv2d x3 -------------------------------------
    gz = jnp.asarray(rng.normal(size=(Z, X, Y, C)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    w2 = wd.transpose(2, 0, 1, 3, 4)  # (3dz, 3, 3, C, Cout)

    @jax.jit
    def d1(g):
        z0 = jnp.zeros((1, X, Y, C), g.dtype)
        out = None
        for dz in range(3):
            shifted = jnp.concatenate(
                [g[1:], z0] if dz == 2 else
                ([z0, g[:-1]] if dz == 0 else [g]), axis=0)
            r = jax.lax.conv_general_dilated(
                shifted, w2[dz], window_strides=(1, 1),
                padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            out = r if out is None else out + r
        return out

    ms = timeit(d1, gz, reps=args.reps)
    print(f"d1 z-decomposed conv2d x3   : {ms:7.2f} ms "
          f"({gflop/ms:6.1f} TFLOP/s)")

    # --- io: scatter in + gather out ------------------------------------
    lin = np.sort(rng.choice(cells, size=N, replace=False)).astype(np.int32)
    lin_j = jnp.asarray(lin)

    @jax.jit
    def io(f):
        g = jnp.zeros((cells, C), jnp.bfloat16).at[lin_j].set(
            f.astype(jnp.bfloat16))
        back = g[lin_j]
        return back.astype(jnp.float32)

    ms = timeit(io, feats, reps=args.reps)
    print(f"io scatter+gather {N} rows : {ms:7.2f} ms")


if __name__ == "__main__":
    main()
