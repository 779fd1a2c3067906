"""utils/prefetch: ordering, exception propagation, bounded queue."""
import time

import pytest

from umeregrobust_tpu.utils.prefetch import prefetch


def test_order_preserved():
    assert list(prefetch(iter(range(50)), depth=3)) == list(range(50))


def test_producer_exception_reraised():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_overlaps_slow_producer():
    """Consumer work overlaps producer work: total < serial sum."""
    def gen():
        for _ in range(5):
            time.sleep(0.05)
            yield 1

    t0 = time.time()
    for _ in prefetch(gen(), depth=2):
        time.sleep(0.05)  # consumer side
    elapsed = time.time() - t0
    # serial would be ~0.5 s; overlapped ~0.3 s
    assert elapsed < 0.45, elapsed
