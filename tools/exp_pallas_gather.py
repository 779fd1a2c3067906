"""Experiment: Pallas dynamic_gather sparse-conv vs the XLA per-tap scan.

Question (VERDICT r2 #1): can a Pallas kernel with the feature table
VMEM-resident beat the XLA per-tap gather+matmul scan (forward is 40 ms of
~157 ms device time, gather-rate-bound)? Mosaic lowers
jnp.take_along_axis(x, idx, axis=0) to tpu.dynamic_gather when
x.shape == out.shape (same-shape row shuffle) — exactly the self-map conv
case (N_out == N_in).

Measures, at bench sizes (N=32768 rows fused 2x16k, C=32, K=27):
  A. XLA per-tap scan (current ops/sparse.sparse_conv)
  B. Pallas: grid over taps, table+acc VMEM-resident, dynamic_gather + MXU
  C. Pallas: single program, unrolled taps (no grid revisits)

Each timed as R repeats inside one jit (scan with data dependency), scalar
fetched. Tunnel launch floor ~28-31 ms amortized over R.
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

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from umeregrobust_tpu.ops.sparse import sparse_conv  # noqa: E402

N, C, K = 32768, 32, 27
R = 50


def make_maps(rng):
    # realistic self-map: per tap, a monotone subsequence with ~45% validity
    maps = np.full((K, N), -1, np.int32)
    for k in range(K):
        hit = rng.random(N) < 0.45
        src = np.sort(rng.choice(N, size=hit.sum(), replace=False))
        maps[k, np.nonzero(hit)[0]] = src
    maps[13] = np.arange(N)  # center tap = identity
    return jnp.asarray(maps)


# --- B: grid over taps, accumulate into resident out block ---------------
def _kern_taps(idx_ref, tab_ref, w_ref, out_ref):
    k = pl.program_id(0)
    idx = idx_ref[0]  # (N,)
    safe = jnp.maximum(idx, 0)
    rows = jnp.take_along_axis(
        tab_ref[:], jax.lax.broadcast_in_dim(safe, (N, C), (0,)), axis=0,
        mode="promise_in_bounds")
    rows = jnp.where((idx >= 0)[:, None], rows, 0.0)
    contrib = jnp.dot(rows.astype(jnp.bfloat16), w_ref[0],
                      preferred_element_type=jnp.float32)

    @pl.when(k == 0)
    def _():
        out_ref[:] = contrib

    @pl.when(k > 0)
    def _():
        out_ref[:] = out_ref[:] + contrib


@jax.jit
def conv_pallas_taps(feats, w, nbr):
    return pl.pallas_call(
        _kern_taps,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, N), lambda k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, C), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, C), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, C), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
    )(nbr, feats, w.astype(jnp.bfloat16))


# --- C: one program, python-unrolled taps --------------------------------
def _kern_unroll(idx_ref, tab_ref, w_ref, out_ref):
    tab = tab_ref[:]
    acc = jnp.zeros((N, C), jnp.float32)
    for k in range(K):
        idx = idx_ref[k]
        safe = jnp.maximum(idx, 0)
        rows = jnp.take_along_axis(
            tab, jax.lax.broadcast_in_dim(safe, (N, C), (0,)), axis=0,
            mode="promise_in_bounds")
        rows = jnp.where((idx >= 0)[:, None], rows, 0.0)
        acc = acc + jnp.dot(rows.astype(jnp.bfloat16), w_ref[k],
                            preferred_element_type=jnp.float32)
    out_ref[:] = acc


@jax.jit
def conv_pallas_unroll(feats, w, nbr):
    return pl.pallas_call(
        _kern_unroll,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
    )(nbr, feats, w.astype(jnp.bfloat16))


def timed(name, fn, *args):
    @jax.jit
    def rep(x, w, nbr):
        def step(acc, _):
            out = fn(acc, w, nbr)
            # renormalize so values stay finite across repeats
            return out / (jnp.max(jnp.abs(out)) + 1.0), None

        out, _ = jax.lax.scan(step, x, None, length=R)
        return jnp.sum(out)

    t0 = time.time()
    s = np.asarray(rep(*args))
    t1 = time.time()
    s = np.asarray(rep(*args))
    t2 = time.time()
    print(f"{name}: compile+run {t1-t0:.1f}s, steady {(t2-t1)/R*1e3:.3f} "
          f"ms/conv (checksum {s:.4f})")
    return (t2 - t1) / R


def main():
    rng = np.random.default_rng(0)
    nbr = make_maps(rng)
    feats = jnp.asarray(rng.standard_normal((N, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, C, C)) * 0.1, jnp.float32)

    print(f"devices: {jax.devices()}")
    # correctness cross-check first (single conv, no repeats)
    ref = np.asarray(sparse_conv(feats, w, nbr, compute_dtype=jnp.bfloat16))
    for name, fn in [("pallas_taps", conv_pallas_taps),
                     ("pallas_unroll", conv_pallas_unroll)]:
        try:
            got = np.asarray(fn(feats, w, nbr))
        except Exception as e:
            print(f"{name}: FAILED to compile/run: {type(e).__name__}: "
                  f"{str(e)[:500]}")
            continue
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"{name}: rel err vs scan = {err:.2e}")

    timed("xla_scan   ", lambda f, w_, n_: sparse_conv(
        f, w_, n_, compute_dtype=jnp.bfloat16), feats, w, nbr)
    try:
        timed("pallas_taps", conv_pallas_taps, feats, w, nbr)
    except Exception as e:
        print("pallas_taps timing failed:", str(e)[:300])
    try:
        timed("pallas_unrl", conv_pallas_unroll, feats, w, nbr)
    except Exception as e:
        print("pallas_unrl timing failed:", str(e)[:300])


if __name__ == "__main__":
    main()
