"""Persistent XLA compile-cache activation that actually works.

JAX binds `jax_compilation_cache_dir` from the environment when the
`jax` module is first imported. On hosts where site initialization
(sitecustomize) imports jax before user code runs, setting
JAX_COMPILATION_CACHE_DIR in the script is too late and the persistent
cache silently stays disabled — every process then recompiles the
full registration program (measured: 487 s cold vs 9 s from cache for
register_pair_e2e at eval sizes). Calling `jax.config.update` after
import works regardless of import order; this helper is invoked by
bench.py, the CLIs, and the tools.
"""
from __future__ import annotations

import os

__all__ = ["ensure_compile_cache"]

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache",
                        "umeregrobust_tpu", "jax")


def ensure_compile_cache(path: str | None = None) -> str:
    """Activate the persistent compile cache; returns the directory used.

    Priority: explicit `path` > $JAX_COMPILATION_CACHE_DIR > a per-user
    default. Safe to call multiple times.
    """
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    return path
