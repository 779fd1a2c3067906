"""utils/prefetch: ordering, exception propagation, bounded queue."""
import time

import pytest

from umeregrobust_tpu.utils.prefetch import prefetch, prefetch_map


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


def test_map_order_preserved_with_uneven_work():
    def fn(i):
        time.sleep(0.03 if i % 3 == 0 else 0.001)  # stragglers
        return i * 2

    assert list(prefetch_map(fn, range(40), workers=4, depth=8)) == \
        [i * 2 for i in range(40)]


def test_map_parallel_speedup():
    def fn(_):
        time.sleep(0.05)
        return 1

    t0 = time.time()
    assert sum(prefetch_map(fn, range(12), workers=4, depth=8)) == 12
    # serial would be 0.6 s; 4 workers ~0.2 s
    assert time.time() - t0 < 0.45


def test_map_exception_reraised_in_order():
    def fn(i):
        if i == 3:
            raise RuntimeError("bad item")
        return i

    out = []
    with pytest.raises(RuntimeError, match="bad item"):
        for x in prefetch_map(fn, range(10), workers=2, depth=4):
            out.append(x)
    assert out == [0, 1, 2]
