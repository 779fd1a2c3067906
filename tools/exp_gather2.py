"""Experiment 2: XLA gather cost model + Mosaic dynamic_gather feasibility.

Q1: is XLA row-gather row-rate-bound (time ~ rows) or byte-bound
    (time ~ rows*width)? Decides whether "fewer, wider gathers" can work.
Q2: monotone vs random indices — does XLA exploit sortedness at all?
Q3: at which shapes does tpu.dynamic_gather (take_along_axis inside
    Pallas) compile at all, and at what throughput?
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

R = 100


def timed(tag, fn, *args, reps=R):
    @jax.jit
    def rep(*a):
        def step(acc, _):
            out = fn(acc, *a[1:])
            return out / (jnp.max(jnp.abs(out)) + 1.0), None

        out, _ = jax.lax.scan(step, a[0], None, length=reps)
        return jnp.sum(out)

    try:
        t0 = time.time()
        s = np.asarray(rep(*args))
        t1 = time.time()
        s = np.asarray(rep(*args))
        dt = (time.time() - t1) / reps
        print(f"{tag}: {dt*1e6:8.1f} us/op (compile {t1-t0:.0f}s, "
              f"chk {s:.3f})", flush=True)
        return dt
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    N = 32768

    # --- Q1/Q2: XLA gather cost vs width, dtype, monotony ---------------
    idx_rand = jnp.asarray(rng.integers(0, N, size=N), jnp.int32)
    idx_mono = jnp.asarray(np.sort(rng.integers(0, N, size=N)), jnp.int32)
    for C in (32, 128, 512):
        for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
            tab = jnp.asarray(rng.standard_normal((N, C)), dt)

            def g(t, i):
                return jnp.take(t, i, axis=0)

            timed(f"xla_take N={N} C={C:4d} {dt_name} rand", g, tab, idx_rand)
            if C == 32:
                timed(f"xla_take N={N} C={C:4d} {dt_name} mono", g, tab,
                      idx_mono)

    # one-hot matmul alternative for C=32, idx arbitrary: tile 256 x full N
    tab32 = jnp.asarray(rng.standard_normal((N, 32)), jnp.bfloat16)

    def onehot_gather(t, i):
        # (N/256) blocks of one-hot (256, N) @ t — pure MXU gather
        def blk(carry, ib):
            oh = (ib[:, None] == jnp.arange(N, dtype=jnp.int32)[None, :])
            o = jnp.dot(oh.astype(jnp.bfloat16), t,
                        preferred_element_type=jnp.float32)
            return carry, o

        _, outs = jax.lax.scan(blk, None, i.reshape(-1, 256))
        return outs.reshape(N, 32)

    timed("xla_onehot N=32768 C=32 bf16", onehot_gather, tab32, idx_rand,
          reps=10)

    # --- Q3: Pallas dynamic_gather feasibility matrix -------------------
    for (n, c, dt, dt_name) in [
        (256, 128, jnp.float32, "f32"),
        (256, 128, jnp.bfloat16, "bf16"),
        (2048, 128, jnp.float32, "f32"),
        (2048, 32, jnp.float32, "f32"),
        (8192, 128, jnp.float32, "f32"),
        (32768, 128, jnp.float32, "f32"),
    ]:
        tab = jnp.asarray(rng.standard_normal((n, c)), dt)
        idx = jnp.asarray(rng.integers(0, n, size=n), jnp.int32)

        def kern(i_ref, t_ref, o_ref, n=n, c=c):
            ii = jax.lax.broadcast_in_dim(i_ref[0], (n, c), (0,))
            o_ref[:] = jnp.take_along_axis(t_ref[:], ii, axis=0,
                                           mode="promise_in_bounds")

        def pg(t, i, n=n, c=c, dt=dt, kern=kern):
            return pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n, c), dt),
            )(i.reshape(1, n), t)

        timed(f"pl_dyngather n={n:6d} c={c:3d} {dt_name}", pg, tab, idx,
              reps=20)


if __name__ == "__main__":
    main()
