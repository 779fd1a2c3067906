"""Day-one validation of the PyTorch->JAX checkpoint converter.

The released reference checkpoints (weights/*_coloring_best_checkpoint.pth,
reference train_coloring.py:215-222) are absent from this environment, so
the ME kernel-offset order ('x_fastest' per MinkowskiEngine 0.5's kernel
region iteration vs our dz-fastest enumeration) is encoded but unvalidated
(models/convert.py). The day real weights appear, validation is:

    python tools/validate_converter.py /path/to/checkpoint.pth
        [--pairs N]   # also run an end-to-end synthetic A/B (slower)

Decision procedure (in order of authority):
1. anisotropy statistic (models/convert.decide_me_order): trained LiDAR
   kernels treat x and y alike and z differently; the true layout makes
   the first axis's variation match y's. Prints order + margin.
2. --pairs N: run N synthetic registration pairs under BOTH orders and
   report recall/RRE for each — the correct order registers, the
   transposed one degrades. Authoritative when the margin is small.
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--pairs", type=int, default=0,
                    help="run an end-to-end synthetic A/B with N pairs")
    args = ap.parse_args(argv)

    import torch

    from umeregrobust_tpu.models.convert import (
        convert_state_dict, decide_me_order)

    ckpt = torch.load(args.checkpoint, map_location="cpu")
    sd = ckpt.get("model_state_dict", ckpt)
    order, margin = decide_me_order(sd)
    verdict = "confident" if margin >= 0.1 else "WEAK — run --pairs A/B"
    print(f"anisotropy decision: me_order={order} (margin {margin:.3f}, "
          f"{verdict})")

    if not args.pairs:
        return order

    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    import jax

    from umeregrobust_tpu.cli.evaluate import evaluate_pairs
    from umeregrobust_tpu.cli.evaluate import _synthetic_pair_iter

    results = {}
    for hyp in ("x_fastest", "z_fastest"):
        params, state = convert_state_dict(sd, me_order=hyp)
        ns = argparse.Namespace(
            seed=42, max_pc_size=16384, pc_corr_max_size=4096,
            ume_r_nn=5.0, ume_max_nn=750, ume_n_samples=512,
            filter_by_ume_dist_cond=True, tau=0.05, corr_kernel_sigma=1.5,
            corr_ds=0.6, out_ch=32, model_checkpoint_path="",
        )
        # monkey-patch the model loader to inject the converted weights
        import umeregrobust_tpu.cli.evaluate as ev
        orig = ev._load_model
        ev._load_model = lambda a: (
            __import__("umeregrobust_tpu.models.resunet",
                       fromlist=["ARCHS"]).ARCHS["ResUNetSmall2"],
            params, state)
        try:
            it, n = _synthetic_pair_iter(ns, args.pairs)
            results[hyp] = evaluate_pairs(ns, it, n)
        finally:
            ev._load_model = orig
        r = results[hyp]
        print(f"{hyp}: NP={100*r['np_recall']:.1f}% "
              f"SP={100*r['sp_recall']:.1f}% mRRE={r['mean_rre']:.3f}")
    best = max(results, key=lambda h: (results[h]["sp_recall"],
                                       -results[h]["mean_rre"]))
    print(f"end-to-end A/B decision: me_order={best}")
    return best


if __name__ == "__main__":
    main()
