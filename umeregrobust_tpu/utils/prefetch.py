"""Host-side input prefetching: overlap data prep with device compute.

The reference keeps the accelerator fed with
DataLoader(num_workers=8, pin_memory=True) (train_coloring.py:351-356);
the TPU-native equivalent is a small bounded-queue producer thread. Data
prep here is numpy (voxelize, SEM-equalize, collate) and releases the
GIL inside numpy kernels, so one or two threads hide it behind the
device step; JAX's async dispatch overlaps the subsequent host->device
transfer.

Usage:
    for batch in prefetch(batches_iter, depth=2):
        step(batch)          # device computes while the thread preps next
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

__all__ = ["prefetch"]

_SENTINEL = object()


def prefetch(it: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Iterate `it` on a daemon thread, keeping up to `depth` items ready.

    Exceptions raised by the producer are re-raised at the consuming site.
    The producer thread stops when the iterator is exhausted or the
    interpreter exits (daemon=True); a consumer that abandons iteration
    early leaves at most `depth` prepped items to be garbage-collected.
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    err: list = []

    def run():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # re-raised on the consumer side
            err.append(e)
        finally:
            q.put(_SENTINEL)

    threading.Thread(target=run, daemon=True).start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
