"""Sub-stage timing of the consensus rescue (pipeline/consensus.py) at
bench sizes: vote+NMS+refit, candidate polish, structure compaction, and
the structure-only exact arbiter score.

Usage: python tools/profile_consensus.py [--reps 10]
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

    def timeit(name, fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            out = fn(*a)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        print(f"{name:46s} {min(ts)*1000:9.2f} ms", flush=True)
        return out

    refit_fn = jax.jit(lambda: consensus_refit(Ts, s_kp, t_kp, ok,
                                               n_cand=CANDS))
    cand = timeit(f"consensus_refit (H={H}, cands={CANDS})", refit_fn)

    pol_fn = jax.jit(lambda c: polish_candidates(
        c, cpts[:ROWS], cmask[:ROWS], cpts, cmask))
    cand33 = jnp.concatenate([cand, jnp.eye(4)[None]], axis=0)
    pol = timeit(f"polish_candidates ({CANDS + 1} x {ROWS} rows)",
                 pol_fn, cand33)

    comp_fn = jax.jit(lambda: (
        compact_structure(cpts, cfeat, cmask, CAP),
        compact_structure(cpts, cfeat, cmask, CAP)))
    (sp_c, sf_c, sm_c), (tp_c, tf_c, tm_c) = timeit(
        f"compact_structure ({CORR}->{CAP}) x2", comp_fn)

    score_fn = jax.jit(lambda p: _score(
        "radius", sp_c, sf_c, sm_c, tp_c, tf_c, tm_c, p,
        knn_k=20, sigma=1.5))
    timeit(f"struct exact score ({CANDS + 1} x {CAP}x{CAP})", score_fn, pol)


if __name__ == "__main__":
    main()
