"""Dispatch-free consensus sub-stage costs: time k stacked calls in one
jit and report the per-call delta (subtracts tunnel dispatch exactly).

Usage: python tools/profile_consensus2.py [--reps 10]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    from umeregrobust_tpu.pipeline.consensus import (
        compact_structure, consensus_refit, polish_candidates)
    from umeregrobust_tpu.pipeline.correlator import _score

    print("devices:", jax.devices(), flush=True)
    H, CORR, CANDS, CAP, ROWS = 2048, 4096, 32, 2048, 512

    rng = np.random.default_rng(0)
    Ts = np.tile(np.eye(4, dtype=np.float32)[None], (H, 1, 1))
    Ts[:, :3, 3] = rng.normal(0, 3, (H, 3))
    Ts = jnp.asarray(Ts)
    s_kp = jnp.asarray(rng.uniform(-25, 25, (H, 3)).astype(np.float32))
    t_kp = jnp.asarray(rng.uniform(-25, 25, (H, 3)).astype(np.float32))
    ok = jnp.ones((H,), bool)
    cpts = jnp.asarray(rng.uniform(-25, 25, (CORR, 3)).astype(np.float32))
    cfeat = jnp.asarray(rng.normal(0, 1, (CORR, 32)).astype(np.float32))
    cmask = jnp.ones((CORR,), bool)

    def t(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            out = fn(*a)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        return min(ts) * 1000

    def delta(name, mk):
        """mk(k) -> a jitted fn running the stage k times (data-chained)."""
        t1, t3 = t(mk(1)), t(mk(3))
        print(f"{name:46s} {(t3 - t1) / 2:9.2f} ms/call "
              f"(1x={t1:.1f} 3x={t3:.1f})", flush=True)

    def mk_refit(k):
        def f():
            acc = Ts
            outs = []
            for _ in range(k):
                c = consensus_refit(acc, s_kp, t_kp, ok, n_cand=CANDS)
                outs.append(c)
                acc = Ts + 1e-9 * jnp.sum(c)  # serialize
            return outs
        return jax.jit(f)

    delta(f"consensus_refit (H={H}, cands={CANDS})", mk_refit)

    cand0 = np.tile(np.eye(4, dtype=np.float32)[None], (CANDS + 1, 1, 1))
    cand0[:, :3, 3] = rng.normal(0, 1, (CANDS + 1, 3))
    cand0 = jnp.asarray(cand0)

    def mk_pol(k):
        def f():
            c = cand0
            for _ in range(k):
                c = polish_candidates(c, cpts[:ROWS], cmask[:ROWS],
                                      cpts, cmask)
            return c
        return jax.jit(f)

    delta(f"polish_candidates ({CANDS + 1} x {ROWS} rows)", mk_pol)

    def mk_comp(k):
        def f():
            p, fe = cpts, cfeat
            outs = []
            for _ in range(k):
                sp, sf, sm = compact_structure(p, fe, cmask, CAP)
                outs.append(sm)
                p = cpts + 1e-9 * jnp.sum(sp)
            return outs
        return jax.jit(f)

    delta(f"compact_structure ({CORR}->{CAP})", mk_comp)

    sp_c, sf_c, sm_c = compact_structure(cpts, cfeat, cmask, CAP)

    def mk_score(k):
        def f():
            c = cand0
            outs = []
            for _ in range(k):
                s = _score("radius", sp_c, sf_c, sm_c, sp_c, sf_c, sm_c, c,
                           knn_k=20, sigma=1.5)
                outs.append(s)
                c = cand0 + 1e-9 * jnp.sum(s)
            return outs
        return jax.jit(f)

    delta(f"struct exact score ({CANDS + 1} x {CAP}x{CAP})", mk_score)


if __name__ == "__main__":
    main()
