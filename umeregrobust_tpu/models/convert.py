"""PyTorch (MinkowskiEngine) checkpoint -> JAX params converter.

Converts the reference's released ``weights/*_coloring_best_checkpoint.pth``
state dicts (saved by reference train_coloring.py:215-222 as
``checkpoint['model_state_dict']``) into this package's param/state pytrees.

Name mapping (reference models.py layer names are preserved 1:1 in our
pytrees, so the mapping is mechanical):
  conv{i}.kernel            -> params['conv{i}']['w']        (K^3, Cin, Cout)
  conv{i}_tr.kernel         -> params['conv{i}_tr']['w']
  norm{i}[_tr].bn.{weight,bias}             -> params['norm...']
  norm{i}[_tr].bn.running_{mean,var}        -> state['norm...']
  block{i}[_tr].conv{j}.kernel / .norm{j}.bn.* -> nested likewise
  mlp1.kernel (Cin, Cout)   -> params['mlp1']['w']
  final.kernel / final.bias -> params['final']

Kernel-offset ordering: our maps enumerate (dx, dy, dz) in {-1,0,1}^3 with
dz fastest; MinkowskiEngine's kernel region iterates with the FIRST spatial
dimension fastest. ``offset_permutation`` computes the reorder between the
two conventions; pass ``me_order='x_fastest'`` (default, ME's convention)
or 'z_fastest' (identity). The released checkpoints are not present in this
environment, so the ME ordering convention is encoded but has not been
validated against real weights — flip ``me_order`` if converted activations
mismatch.
"""
from __future__ import annotations

import itertools
from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["convert_state_dict", "load_torch_checkpoint",
           "offset_permutation", "decide_me_order"]


def offset_permutation(kernel_size: int, me_order: str = "x_fastest") -> np.ndarray:
    """perm such that ours[k] = theirs[perm[k]] for kernel offset tables."""
    r = kernel_size // 2
    rng = list(range(-r, r + 1))
    ours = list(itertools.product(rng, rng, rng))  # dz fastest
    if me_order == "z_fastest":
        theirs = ours
    elif me_order == "x_fastest":
        theirs = [(dx, dy, dz) for dz in rng for dy in rng for dx in rng]
    else:
        raise ValueError(me_order)
    lut = {off: i for i, off in enumerate(theirs)}
    return np.asarray([lut[o] for o in ours], dtype=np.int64)


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def convert_state_dict(
    sd: Mapping[str, Any], me_order: str = "x_fastest"
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a torch state dict into (params, bn_state) pytrees."""
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(value)

    for key, val in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        arr = _to_np(val)
        leaf = parts[-1]
        # normalize the ".bn." wrapper of MinkowskiBatchNorm away
        path = [p for p in parts[:-1] if p != "bn"]
        if leaf == "kernel":
            if arr.ndim == 3:  # (K^3, Cin, Cout): permute offset order
                k = round(arr.shape[0] ** (1.0 / 3.0))
                perm = offset_permutation(k, me_order)
                arr = arr[perm]
            put(params, path + ["w"], arr)
        elif leaf == "bias" and parts[-2] not in ("bn",):
            put(params, path + ["b"], arr)
        elif leaf == "weight":  # bn scale
            put(params, path + ["scale"], arr)
        elif leaf == "bias":  # bn bias (parts[-2] == 'bn')
            put(params, path + ["bias"], arr)
        elif leaf == "running_mean":
            put(state, path + ["mean"], arr)
        elif leaf == "running_var":
            put(state, path + ["var"], arr)
        else:
            raise KeyError(f"unhandled checkpoint key: {key}")
    return params, state


def decide_me_order(sd: Mapping[str, Any]) -> Tuple[str, float]:
    """Decide the ME kernel-offset order of a trained checkpoint.

    The two hypotheses ('x_fastest' vs 'z_fastest') differ by an x<->z
    transpose of every (k, k, k, Cin, Cout) kernel volume; the middle (y)
    axis is fixed. Any axis-symmetric statistic is therefore blind — the
    discriminator is the DATA's anisotropy: LiDAR scenes are ground-plane
    dominated, so trained kernels treat the two horizontal axes (x, y)
    statistically alike and the vertical (z) axis differently. Under the
    TRUE layout the first axis's total variation matches y's; under the
    transposed layout, z's takes its place and the mismatch grows.

    Returns (order, margin): margin > 0 means the statistic favored the
    returned order (relative gap between the two hypotheses' scores);
    margins < ~0.1 should be treated as undecided — fall back to an
    end-to-end recall A/B (tools/validate_converter.py runs both).
    """
    scores = {}
    for order in ("x_fastest", "z_fastest"):
        mismatch = total = 0.0
        for key, val in sd.items():
            if not key.endswith("kernel"):
                continue
            arr = _to_np(val)
            if arr.ndim != 3:
                continue
            k = round(arr.shape[0] ** (1.0 / 3.0))
            if k ** 3 != arr.shape[0] or k < 3:
                continue
            perm = offset_permutation(k, order)
            vol = arr[perm].reshape(k, k, k, *arr.shape[1:])  # (x, y, z, ...)
            tv = [float(np.abs(np.diff(vol, axis=a)).mean()) for a in range(3)]
            mismatch += abs(tv[0] - tv[1])  # x-vs-y anisotropy
            total += (tv[0] + tv[1]) / 2.0
        scores[order] = mismatch / max(total, 1e-12)
    best = min(scores, key=scores.get)
    other = "z_fastest" if best == "x_fastest" else "x_fastest"
    margin = (scores[other] - scores[best]) / max(scores[other], 1e-12)
    return best, float(margin)


def load_torch_checkpoint(
    path: str, me_order: str = "x_fastest"
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a reference .pth checkpoint file (requires torch, CPU is fine)."""
    import torch  # local import: torch is only needed for conversion

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("model_state_dict", ckpt)
    return convert_state_dict(sd, me_order=me_order)
