"""Checkpoint save/restore for params + BN state + optimizer + step.

Equivalent of the reference's torch checkpoints
(train_coloring.py:215-222: {epoch, model_state_dict,
optimizer_state_dict, total_loss}) with the same best-metric + last-epoch
policy handled by the trainer. Format: a pickle of numpy pytrees — no
framework lock-in, loadable anywhere.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint"]


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _to_jax(tree):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree)


def save_checkpoint(path: str, *, params, bn_state, opt_state, epoch: int,
                    metrics: Dict[str, float] | None = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = {
        "epoch": int(epoch),
        "params": _to_numpy(params),
        "bn_state": _to_numpy(bn_state),
        "opt_state": _to_numpy(opt_state),
        "metrics": dict(metrics or {}),
        "format_version": 1,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        blob = pickle.load(f)
    blob["params"] = _to_jax(blob["params"])
    blob["bn_state"] = _to_jax(blob["bn_state"])
    blob["opt_state"] = _to_jax(blob["opt_state"])
    return blob
