"""HBM headroom analysis at reference caps (VERDICT r3 #8).

SURVEY §2c names point-axis sharding "for feature extraction + segment
reductions"; this tool answers whether the 2x50k-capacity fused backbone
forward (and the whole e2e program around it) actually NEEDS an sp-shard
on v5e (16 GB HBM/chip): AOT-compiles the programs at the reference
operating point and prints XLA's memory analysis (argument/output/temp/
peak). Results are committed to PROFILE.md.

Usage: python tools/hbm_analysis.py [--full]
"""
import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fmt(b):
    return f"{b/2**30:.3f} GiB" if b > 2**28 else f"{b/2**20:.1f} MiB"


def report(name, compiled):
    m = compiled.memory_analysis()
    peak = (m.argument_size_in_bytes + m.output_size_in_bytes
            + m.temp_size_in_bytes)
    print(f"{name}:")
    print(f"  arguments: {fmt(m.argument_size_in_bytes)}")
    print(f"  outputs:   {fmt(m.output_size_in_bytes)}")
    print(f"  temps:     {fmt(m.temp_size_in_bytes)}")
    print(f"  args+out+temp: {fmt(peak)}  "
          f"({100*peak/(16*2**30):.1f}% of v5e 16 GiB)", flush=True)
    return peak


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="also compile the FULL e2e program (slow)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    from umeregrobust_tpu.models.resunet import (
        ARCHS, build_unet_geometry, init_resunet, resunet_apply)

    print("devices:", jax.devices(), flush=True)
    arch = ARCHS["ResUNetSmall2"]
    SEM_CAP = 50176
    caps = (SEM_CAP, 37632, 18816, 9408, 3200)
    caps2 = tuple(2 * c for c in caps)
    params, state = init_resunet(jax.random.PRNGKey(0), arch, 1, 32)

    def fwd(params, state, coords2, mask2):
        geom = build_unet_geometry(coords2, mask2, arch, caps2)
        fin = jnp.ones((2 * SEM_CAP, 1), jnp.float32) * mask2[:, None]
        out, _ = resunet_apply(params, state, geom, fin, arch,
                               train=False, compute_dtype=jnp.bfloat16)
        return out

    c2 = jnp.zeros((2 * SEM_CAP, 4), jnp.int32)
    m2 = jnp.zeros((2 * SEM_CAP,), bool)
    lowered = jax.jit(fwd).lower(params, state, c2, m2)
    compiled = lowered.compile()
    report("fused 2x50176 backbone forward (+geometry)", compiled)

    if args.full:
        from umeregrobust_tpu.pipeline.e2e import register_pair_e2e
        from umeregrobust_tpu.pipeline.registration import RegistrationConfig

        cfg = RegistrationConfig(icp_dims=(768, 768, 96), icp_budget=24)
        CORR_CAP = 10240
        kw = dict(
            src_coords=jnp.zeros((SEM_CAP, 4), jnp.int32),
            src_grid=jnp.zeros((SEM_CAP, 3), jnp.float32),
            src_mask=jnp.zeros((SEM_CAP,), bool),
            tgt_coords=jnp.zeros((SEM_CAP, 4), jnp.int32),
            tgt_grid=jnp.zeros((SEM_CAP, 3), jnp.float32),
            tgt_mask=jnp.zeros((SEM_CAP,), bool),
            corr_src_pts=jnp.zeros((CORR_CAP, 3), jnp.float32),
            corr_src_mask=jnp.zeros((CORR_CAP,), bool),
            corr_tgt_pts=jnp.zeros((CORR_CAP, 3), jnp.float32),
            corr_tgt_mask=jnp.zeros((CORR_CAP,), bool),
        )
        lowered = register_pair_e2e.lower(
            params, state, arch, caps, cfg, jax.random.PRNGKey(0), **kw)
        report("full e2e program at reference caps", lowered.compile())


if __name__ == "__main__":
    main()
