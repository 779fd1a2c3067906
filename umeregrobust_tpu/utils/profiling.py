"""Lightweight tracing/profiling utilities.

The reference has no profiling at all (SURVEY.md §5: tqdm + prints only).
This module provides the minimum a production pipeline needs:

- ``phase(name)``: context-manager wall-clock timer with device sync,
  accumulated into a global registry (``report()`` prints a table);
- ``device_trace(dir)``: wraps ``jax.profiler.trace`` for XLA device
  profiles viewable in TensorBoard/Perfetto (works where the platform
  supports profiling; degrades to a no-op otherwise).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Tuple

import jax

__all__ = ["phase", "report", "reset", "device_trace"]

_acc: Dict[str, Tuple[float, int]] = defaultdict(lambda: (0.0, 0))


@contextlib.contextmanager
def phase(name: str, sync: bool = True) -> Iterator[None]:
    """Time a named phase; blocks on outstanding device work when sync."""
    if sync:
        (jax.device_put(0.0) + 0).block_until_ready()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            (jax.device_put(0.0) + 0).block_until_ready()
        dt = time.perf_counter() - t0
        total, n = _acc[name]
        _acc[name] = (total + dt, n + 1)


def report() -> str:
    lines = [f"{'phase':30s} {'total_s':>9s} {'calls':>6s} {'mean_ms':>9s}"]
    for name, (total, n) in sorted(_acc.items(), key=lambda kv: -kv[1][0]):
        lines.append(f"{name:30s} {total:9.3f} {n:6d} {1000*total/max(n,1):9.2f}")
    out = "\n".join(lines)
    print(out, flush=True)
    return out


def reset() -> None:
    _acc.clear()


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """XLA device trace (TensorBoard format); no-op if unsupported."""
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
