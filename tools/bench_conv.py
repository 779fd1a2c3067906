"""Microbenchmark the grouped sparse conv at reference L0/L1 sizes.

The r4 reference-point trace attributes ~47 ms/pair to the backbone conv
scans plus ~30 ms of x9 bf16 copies/broadcasts around the window tables
(PROFILE.md). This tool times isolated formulations of one conv so the
next kernel decision is measured, not guessed:

  v0  sparse_conv_grouped (shipping form: wide gather -> maskv repeat
      multiply -> 2 matmuls per group, lax.scan over 9 groups)
  v1  slot-decomposed: same single wide gather, but the mask multiply is
      a (N,1) broadcast per slot and the matmul splits into 3 K=Cin
      matmuls (no (N, 3Cin) maskv materialization)
  v2  v1 with the patho correction folded into the middle slot's mask
      pair (one extra broadcast multiply, no 4th matmul)
  v3  gather floor: just the 9 wide gathers + add (no mask/matmul)
  v4  unrolled v0 (no lax.scan: 9 bodies inline so XLA can interleave
      groups; measures scan sequencing overhead)

Usage: python tools/bench_conv.py [--n 100352] [--cin 32] [--cout 32]
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
    ap.add_argument("--n", type=int, default=100352)
    ap.add_argument("--cin", type=int, default=32)
    ap.add_argument("--cout", type=int, default=32)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--centers", choices=("rand", "affine"), default="rand",
                    help="center-index distribution: 'rand' = sorted "
                         "uniform (worst case), 'affine' = r + jitter "
                         "(real code-sorted self-map statistics)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    from umeregrobust_tpu.ops.sparse import GroupedMap, sparse_conv_grouped

    N, Cin, Cout = args.n, args.cin, args.cout
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(N, Cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, Cin, Cout)).astype(np.float32) * 0.1)
    # synthetic but realistic map stats: ~70% of slots valid, centers
    # roughly monotone (code-sorted levels give near-sorted anchors)
    if args.centers == "affine":
        base = np.arange(N, dtype=np.int64)[None, :] + rng.integers(
            -4, 5, size=(9, N))
        center = np.clip(base, 0, N).astype(np.int32)
    else:
        center = np.sort(rng.integers(0, N, size=(9, N)).astype(np.int32),
                         axis=1)
    masks = jnp.asarray(rng.random((9, 3, N)) < 0.7)
    patho = jnp.asarray(rng.random((9, N)) < 0.02)
    gmap = GroupedMap(center=jnp.asarray(center), masks=masks,
                      patho=jnp.asarray(patho),
                      worder=jnp.asarray(np.arange(3, dtype=np.int32)))
    cd = jnp.bfloat16

    def v0(f):
        return sparse_conv_grouped(f, w, gmap, compute_dtype=cd)

    def _table(f):
        z = jnp.zeros((1, Cin), cd)
        fc = f.astype(cd)
        a = jnp.concatenate([z, z, fc, z], axis=0)
        b = jnp.concatenate([z, fc, z, z], axis=0)
        c = jnp.concatenate([fc, z, z, z], axis=0)
        return jnp.concatenate([a, b, c], axis=1)  # (N+3, 3Cin)

    def v1(f):
        F3c = _table(f)
        w3 = w.astype(cd).reshape(9, 3, Cin, Cout)
        wp1 = w3[:, 2]

        def group(acc, xs):
            w_g, wp1_g, c_g, m_g, p_g = xs
            wide = F3c[c_g]  # (N, 3Cin)
            out = acc
            for s in range(3):
                xs_ = wide[:, s * Cin:(s + 1) * Cin]
                ms = m_g[s][:, None].astype(cd)
                out = out + jnp.matmul(xs_ * ms, w_g[s],
                                       preferred_element_type=jnp.float32)
            corr = wide[:, Cin:2 * Cin] * p_g[:, None].astype(cd)
            out = out + jnp.matmul(corr, wp1_g,
                                   preferred_element_type=jnp.float32)
            return out, None

        acc0 = jnp.zeros((N, Cout), jnp.float32)
        out, _ = jax.lax.scan(group, acc0,
                              (w3, wp1, gmap.center, gmap.masks, gmap.patho))
        return out

    def v2(f):
        # one (N, 4Cin) @ (4Cin, Cout) matmul per group: mask applied on
        # the (N, 3, Cin) view with a (N, 3, 1) broadcast (no repeat), the
        # patho-corrected middle slot appended as a 4th K-block
        F3c = _table(f)
        w3 = w.astype(cd).reshape(9, 3, Cin, Cout)
        w4 = jnp.concatenate([w3, w3[:, 2:3]], axis=1)  # (9,4,Cin,Cout)

        def group(acc, xs):
            w_g, c_g, m_g, p_g = xs
            wide = F3c[c_g].reshape(N, 3, Cin)
            masked = wide * m_g.T[:, :, None].astype(cd)
            corr = wide[:, 1:2] * p_g[:, None, None].astype(cd)
            x4 = jnp.concatenate([masked, corr], axis=1).reshape(N, 4 * Cin)
            out = acc + jnp.matmul(x4, w_g.reshape(4 * Cin, Cout),
                                   preferred_element_type=jnp.float32)
            return out, None

        acc0 = jnp.zeros((N, Cout), jnp.float32)
        out, _ = jax.lax.scan(group, acc0,
                              (w4, gmap.center, gmap.masks, gmap.patho))
        return out

    def v3(f):
        F3c = _table(f)
        acc = jnp.zeros((N, 3 * Cin), jnp.float32)
        for g in range(9):
            acc = acc + F3c[gmap.center[g]].astype(jnp.float32)
        return acc[:, :Cout]

    def v4(f):
        F3c = _table(f)
        w3 = w.astype(cd).reshape(9, 3, Cin, Cout)[:, gmap.worder]
        wg = w3.reshape(9, 3 * Cin, Cout)
        wp1 = w3[:, 2]
        out = jnp.zeros((N, Cout), jnp.float32)
        for g in range(9):
            wide = F3c[gmap.center[g]]
            maskv = jnp.repeat(gmap.masks[g].T.astype(cd), Cin, axis=1)
            out = out + jnp.matmul(wide * maskv, wg[g],
                                   preferred_element_type=jnp.float32)
            corr = wide[:, Cin:2 * Cin] * gmap.patho[g][:, None].astype(cd)
            out = out + jnp.matmul(corr, wp1[g],
                                   preferred_element_type=jnp.float32)
        return out

    # v5: pair-window prototype (TIMING ONLY, synthetic selection): one
    # 8-slot window gather serves TWO consecutive outputs; per-output
    # slot selection is a precomputed (2*4, 8) bf16 matrix applied as 8
    # broadcast-FMAs. Halves gathered rows; measures whether the select
    # overhead eats the row saving before any geometry-builder work.
    N2 = N // 2
    sel = jnp.asarray((rng.random((9, N2, 8, 8)) < 0.12).astype(np.float32)
                      ).astype(cd)

    def v5(f):
        z = jnp.zeros((1, Cin), cd)
        fc = f.astype(cd)
        shifts = [jnp.concatenate([z] * (7 - k) + [fc] + [z] * (k + 1),
                                  axis=0) for k in range(8)]
        F8c = jnp.concatenate(shifts, axis=1)  # (N+8, 8Cin)
        w3 = w.astype(cd).reshape(9, 3, Cin, Cout)
        w4 = jnp.concatenate([w3, w3[:, 2:3]], axis=1).reshape(
            9, 4 * Cin, Cout)
        base = gmap.center[:, ::2]  # (9, N2) synthetic pair bases

        def group(acc, xs):
            w_g, b_g, s_g = xs
            win = F8c[b_g].reshape(N2, 8, Cin)  # HALF the gathered rows
            # x[n, a, c] = sum_k s_g[n, a, k] * win[n, k, c]
            x = jnp.zeros((N2, 8, Cin), cd)
            for k in range(8):
                x = x + s_g[:, :, k, None] * win[:, None, k, :]
            x4 = x.reshape(N, 4 * Cin)
            out = acc + jnp.matmul(x4, w_g,
                                   preferred_element_type=jnp.float32)
            return out, None

        acc0 = jnp.zeros((N, Cout), jnp.float32)
        out, _ = jax.lax.scan(group, acc0, (w4, base, sel))
        return out

    def v6(f):
        # TRUE patho fold: slot-2's input column becomes
        # m2 * wide[:, 2] + patho * wide[:, 1] (exact — masks guarantee
        # m2 == 0 whenever patho), so the matmul stays K = 3Cin and the
        # 4th K-block + its concat disappear.
        F3c = _table(f)
        w3 = w.astype(cd).reshape(9, 3, Cin, Cout)

        def group(acc, xs):
            w_g, c_g, m_g, p_g = xs
            wide = F3c[c_g].reshape(N, 3, Cin)
            masked = wide * m_g.T[:, :, None].astype(cd)
            mid = masked[:, 2] + wide[:, 1] * p_g[:, None].astype(cd)
            x3 = jnp.concatenate(
                [masked[:, 0], masked[:, 1], mid], axis=1)
            out = acc + jnp.matmul(x3, w_g.reshape(3 * Cin, Cout),
                                   preferred_element_type=jnp.float32)
            return out, None

        acc0 = jnp.zeros((N, Cout), jnp.float32)
        out, _ = jax.lax.scan(group, acc0,
                              (w3, gmap.center, gmap.masks, gmap.patho))
        return out

    fns = {"v0_shipping": v0, "v1_slotdecomp": v1, "v2_pathofold": v2,
           "v3_gatherfloor": v3, "v4_unrolled": v4, "v5_pairwindow": v5,
           "v6_truefold": v6}
    ref = None
    for name, fn in fns.items():
        jf = jax.jit(lambda f, fn=fn: jnp.sum(fn(f)))
        s = float(jf(feats))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            v = jf(feats)
        float(v)
        dt = (time.perf_counter() - t0) / args.reps * 1000
        if name == "v0_shipping":
            ref = s
        tag = ""
        if ref is not None and name in ("v1_slotdecomp", "v2_pathofold",
                                        "v4_unrolled"):
            tag = f"  (sum rel diff {abs(s-ref)/max(abs(ref),1e-9):.2e})"
        print(f"{name:15s}: {dt:7.3f} ms  sum={s:.4f}{tag}", flush=True)


if __name__ == "__main__":
    main()
