"""Experiment 3b: canonical-anchor grouped conv (fusable masks, no selects).

exp_grouped_conv showed the slot-select formulation is 3.6x SLOWER than
the per-tap scan: take_along_axis breaks XLA's gather->matmul operand
fusion and the wide gather materializes. This variant anchors the window
so slot p holds tap p BY CONSTRUCTION (centered window table, rows
[f[r-1], f[r], f[r+1]] zero-extended both sides):

  center c = j0              if the dz=0 candidate exists     (case A)
           = j_{-1} + 1      elif dz=-1 exists                (case B)
           = j_{+1} - 1      elif dz=+1 exists                (case C)
           = (zero row)      else
  slot masks: m0 = v-1; m1 = v0; m2 = v+1 & (v0 | ~v-1)
  pathological (case B with v+1): dz=+1's row sits at slot 1 ->
  correction term patho * (slot1 @ W_{+1}).

The conv is then: wide = F3c[c]; out += (wide * mask) @ Wg + correction —
gather -> elementwise -> matmul, exactly the chain XLA fuses.
Correctness target: equal to the scan. Perf target: well under the
2.6 ms/conv scan (3x fewer gather addresses).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from umeregrobust_tpu.utils.cache import ensure_compile_cache

ensure_compile_cache()

from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair  # noqa
from umeregrobust_tpu.ops.sparse import (  # noqa: E402
    build_self_map, sort_level, sparse_conv)
from umeregrobust_tpu.ops.voxel import quantize_np  # noqa: E402

N, C = 32768, 32
R = 50


def make_canonical_maps(nbr):
    """(27, N) -> center (9, N) int32 (row+1 into the extended table; the
    last row N+2 is all-zero), masks (9, 3, N) bool, patho (9, N) bool."""
    g = nbr.reshape(9, 3, N)
    vm1, v0, vp1 = g[:, 0] >= 0, g[:, 1] >= 0, g[:, 2] >= 0
    c = jnp.where(v0, g[:, 1],
                  jnp.where(vm1, g[:, 0] + 1,
                            jnp.where(vp1, g[:, 2] - 1, jnp.int32(N + 1))))
    m0 = vm1
    m1 = v0
    m2 = vp1 & (v0 | ~vm1)
    patho = vm1 & ~v0 & vp1
    return c + 1, jnp.stack([m0, m1, m2], axis=1), patho


def _centered_table(f):
    """(N+3, 3C): row r' = [f[r'-2], f[r'-1], f[r']], zero-extended."""
    n = f.shape[0]
    z = jnp.zeros((1, f.shape[1]), f.dtype)
    a = jnp.concatenate([z, z, f, z], axis=0)  # A[r'] = f[r'-2]
    b = jnp.concatenate([z, f, z, z], axis=0)  # B[r'] = f[r'-1]
    cc = jnp.concatenate([f, z, z, z], axis=0)  # C[r'] = f[r']
    return jnp.concatenate([a, b, cc], axis=1)


@jax.jit
def conv_canonical(feats, w, center, masks, patho):
    f = feats.astype(jnp.bfloat16)
    F3c = _centered_table(f)  # (N+3, 3C)
    wg = w.astype(jnp.bfloat16).reshape(9, 3 * C, -1)
    wp1 = w.astype(jnp.bfloat16).reshape(9, 3, C, -1)[:, 2]  # W_{dz=+1}

    def group(acc, xs):
        w_g, wp1_g, c_g, m_g, p_g = xs
        wide = F3c[c_g]  # (N, 3C) monotone gather
        maskv = jnp.repeat(m_g.T.astype(jnp.bfloat16), C, axis=1)
        out = acc + jnp.matmul(wide * maskv, w_g,
                               preferred_element_type=jnp.float32)
        corr_in = wide[:, C:2 * C] * p_g[:, None].astype(jnp.bfloat16)
        out = out + jnp.matmul(corr_in, wp1_g,
                               preferred_element_type=jnp.float32)
        return out, None

    acc0 = jnp.zeros((N, w.shape[2]), jnp.float32)
    out, _ = jax.lax.scan(group, acc0, (wg, wp1, center, masks, patho))
    return out


@jax.jit
def conv_wide_floor(feats, w, center):
    """Cost floor: 9 wide gathers straight into matmuls, no masks."""
    f = feats.astype(jnp.bfloat16)
    F3c = _centered_table(f)
    wg = w.astype(jnp.bfloat16).reshape(9, 3 * C, -1)

    def group(acc, xs):
        w_g, c_g = xs
        return acc + jnp.matmul(F3c[c_g], w_g,
                                preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((N, w.shape[2]), jnp.float32)
    out, _ = jax.lax.scan(group, acc0, (wg, center))
    return out


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
    mask = jnp.asarray(np.concatenate(coords_list)[:, 1] < 2**20)
    level, _, _ = sort_level(coords, mask)
    nbr = jax.block_until_ready(build_self_map(level, kernel_size=3, t=1))

    c, m, p = make_canonical_maps(nbr)
    print(f"patho fraction: {float(jnp.mean(p.astype(jnp.float32))):.4f}",
          flush=True)

    feats = jnp.asarray(rng.standard_normal((N, C)), jnp.float32)
    feats = feats * mask[:, None]
    w = jnp.asarray(rng.standard_normal((27, C, C)) * 0.1, jnp.float32)

    ref = np.asarray(sparse_conv(feats, w, nbr, compute_dtype=jnp.bfloat16))
    got = np.asarray(conv_canonical(feats, w, c, m, p))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"canonical rel err: {err:.2e}", flush=True)

    timed("scan_27tap ", lambda f_, w_, n_: sparse_conv(
        f_, w_, n_, compute_dtype=jnp.bfloat16), feats, w, nbr)
    timed("canonical9 ", conv_canonical, feats, w, c, m, p)
    timed("wide_floor9", conv_wide_floor, feats, w, c)


if __name__ == "__main__":
    main()
