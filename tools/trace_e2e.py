"""Definitive fused-program breakdown via jax.profiler (works through the
axon tunnel: the trace carries real device-lane XLA fusion events).

Runs register_pair_e2e at exact bench shapes under jax.profiler.trace and
aggregates device-lane op durations by fusion name, printing the top
entries — the ground truth the cumulative stage timers can only estimate.

Usage: python tools/trace_e2e.py [--reps 3] [--hyps 512]
"""
import argparse
import glob
import gzip
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--hyps", type=int, default=2048)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dual", action="store_true",
                    help="trace the bench's fused-2 (two pairs/program)")
    ap.add_argument("--regime", choices=("reduced", "reference"),
                    default="reduced",
                    help="operating point (mirrors bench.py --regime)")
    args = ap.parse_args()

    import jax

    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    import jax.numpy as jnp

    from umeregrobust_tpu.data.sem import SEMConfig, equalize_sampling
    from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair
    from umeregrobust_tpu.models.resunet import ARCHS, init_resunet
    from umeregrobust_tpu.ops.voxel import coords_to_grid_pts_np, quantize_np
    from umeregrobust_tpu.pipeline.e2e import register_pair_e2e
    from umeregrobust_tpu.pipeline.registration import RegistrationConfig

    print("devices:", jax.devices(), flush=True)
    arch = ARCHS["ResUNetSmall2"]
    if args.regime == "reference":
        # mirror bench.py's reference-regime cfg exactly (r5 occupancy-
        # sized caps, BENCH_NOTES_r5 #1)
        SEM_CAP, CORR_CAP = 22528, 10240
        caps = (SEM_CAP, 14336, 6912, 2304, 512)
        cfg = RegistrationConfig(icp_dims=(768, 768, 96), icp_budget=24,
                                 corr_coarse_src=1024, corr_coarse_tgt=2048,
                                 corr_rescore_top=8)
        scene_kw = dict(extent=50.0, ground_points=30000,
                        structure_points=60000)
        sem_points = 125000
    else:
        SEM_CAP, CORR_CAP = 16384, 4096
        caps = (SEM_CAP, 10240, 4096, 1280, 256)
        # mirror bench.py's reduced-regime cfg exactly
        # consensus_gate stays 0 here: the trace runs ONE nominal pair,
        # and the gate would skip the consensus program entirely —
        # keeping it visible in the breakdown is the point of the trace
        cfg = RegistrationConfig(
            num_init_keypoints=2048, ume_n_samples=args.hyps,
            corr_coarse_src=512, corr_coarse_tgt=1024, corr_rescore_top=4,
            icp_max_corr=0.4, icp_max_iter=60, icp_coarse_corr=None,
            icp_budget=32, icp_exact_rows=1024, icp_dims=(192, 192, 48))
        scene_kw = dict(extent=25.0, ground_points=12000,
                        structure_points=24000)
        sem_points = 50000

    seed = 100
    pair = make_pair(SceneConfig(seed=seed, observe_mode="lidar",
                                 baseline=8.0, **scene_kw),
                     max_rotation_deg=120, max_translation=8.0, seed=seed)
    data = {}
    for tag, pts, seg in [("src", pair["src_pts"], pair["src_seg"]),
                          ("tgt", pair["tgt_pts"], pair["tgt_seg"])]:
        ep, es = equalize_sampling(pts, seg, SEMConfig(num_points=sem_points,
                                                       seed=seed))
        ep = ep[es != 0]
        coords, _ = quantize_np(ep, 0.3)
        grid = coords_to_grid_pts_np(ep, coords, 0.3)
        n = min(len(grid), SEM_CAP)
        c4 = np.full((SEM_CAP, 4), 2**20, np.int32)
        c4[:n, 0] = 0
        c4[:n, 1:] = coords[:n]
        g = np.zeros((SEM_CAP, 3), np.float32)
        g[:n] = grid[:n]
        m = np.arange(SEM_CAP) < n
        ci = np.random.default_rng(seed).choice(
            len(pts), min(len(pts), CORR_CAP), replace=False)
        cp = np.zeros((CORR_CAP, 3), np.float32)
        cp[: len(ci)] = pts[ci]
        cm = np.arange(CORR_CAP) < len(ci)
        data[tag] = dict(coords=jnp.asarray(c4), grid=jnp.asarray(g),
                         mask=jnp.asarray(m), corr=jnp.asarray(cp),
                         cmask=jnp.asarray(cm))

    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "weights", "synthetic_pretrain.pkl")
    if os.path.exists(ckpt):
        from umeregrobust_tpu.train.checkpoint import load_checkpoint
        blob = load_checkpoint(ckpt)
        params, state = blob["params"], blob["bn_state"]
    else:
        params, state = init_resunet(jax.random.PRNGKey(0), arch, 1, 32)

    s, t = data["src"], data["tgt"]
    key = jax.random.PRNGKey(0)

    def one(key):
        _, T = register_pair_e2e(
            params, state, arch, caps, cfg, key,
            s["coords"], s["grid"], s["mask"],
            t["coords"], t["grid"], t["mask"],
            s["corr"], s["cmask"], t["corr"], t["cmask"])
        return T

    if args.dual:
        # the bench's fused-2 formulation: two pairs in one program
        @jax.jit
        def run(keys2):
            return one(keys2[0]), one(keys2[1])
        karg = jax.random.split(key)
    else:
        run = jax.jit(one)
        karg = key

    T = run(karg)
    jax.block_until_ready(T)
    print("compiled; tracing", flush=True)

    tdir = "/tmp/jax_trace_e2e"
    os.system(f"rm -rf {tdir}")
    import time
    t0 = time.time()
    with jax.profiler.trace(tdir):
        for _ in range(args.reps):
            T = run(karg)
        np.asarray(T[0] if args.dual else T)
    print(f"traced wall: {(time.time()-t0)/args.reps*1000:.1f} ms/run",
          flush=True)

    p = sorted(glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(p) as f:
        d = json.load(f)
    evs = d["traceEvents"]
    # identify device lanes: process_name metadata events
    pids = {}
    for e in evs:
        if e.get("name") == "process_name":
            pids[e["pid"]] = e["args"]["name"]
    dev_pids = {pid for pid, name in pids.items()
                if "TPU" in name or "/device" in name.lower()}
    print("process lanes:", pids, flush=True)
    agg = {}
    scopes = {}
    total = 0.0
    shown = 0
    for e in evs:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            dur = e.get("dur", 0) / 1000.0  # us -> ms
            name = e["name"]
            a = agg.setdefault(name, [0.0, 0])
            a[0] += dur
            a[1] += 1
            total += dur
            # jax.named_scope lands in the HLO op metadata, surfaced in
            # the trace as a per-event arg (long_name/tf_op/hlo_op);
            # aggregate by its first path segment = pipeline stage
            ar = e.get("args") or {}
            meta = (ar.get("long_name") or ar.get("tf_op")
                    or ar.get("hlo_op") or "")
            if shown < 3 and ar:
                print("sample event args:", name, dict(list(ar.items())[:6]),
                      flush=True)
                shown += 1
            stage = meta.split("/")[0] if "/" in meta else (meta or "?")
            s = scopes.setdefault(stage, [0.0, 0])
            s[0] += dur
            s[1] += 1
    # aggregate by the op's SOURCE line (args['source'] carries file:line
    # for every device op) — the most actionable attribution; note parent
    # control-flow ops (while/fusion wrappers) and their body ops both
    # carry time, so subsystem sums double-count nesting.
    by_src = {}
    for e in evs:
        if e.get("ph") != "X":
            continue
        a = e.get("args") or {}
        dur = a.get("device_duration_ps")
        if dur is None or e.get("name", "").startswith("jit_"):
            continue
        ms = int(dur) / 1e9
        src = a.get("source", "?").replace("/root/repo/", "")
        s = by_src.setdefault(src, [0.0, 0])
        s[0] += ms
        s[1] += 1
    print("\nby source line (device_duration; nesting double-counts):")
    for src, (ms, c) in sorted(by_src.items(), key=lambda x: -x[1][0])[:30]:
        print(f"{ms/args.reps:9.3f} ms  x{c//max(args.reps,1):<5d} {src}",
              flush=True)

    print(f"\ndevice total: {total:.2f} ms over {args.reps} reps "
          f"({total/args.reps:.2f} ms/run)\n")
    if len(scopes) > 1:
        print("by stage scope:")
        for name, (ms, c) in sorted(scopes.items(), key=lambda x: -x[1][0]):
            print(f"{ms/args.reps:9.3f} ms  x{c//max(args.reps,1):<5d} "
                  f"{name[:60]}")
        print()
    for name, (ms, c) in sorted(agg.items(), key=lambda x: -x[1][0])[: args.top]:
        print(f"{ms/args.reps:9.3f} ms  x{c//args.reps:<5d} {name[:100]}")


if __name__ == "__main__":
    main()
