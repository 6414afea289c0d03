"""Prefetch loader + parallel map tests."""

import time

import pytest

from lip2speech_tpu.data.prefetch import ParallelMap, prefetch


def test_prefetch_preserves_order_and_completes():
    out = list(prefetch(iter(range(20)), depth=4))
    assert out == list(range(20))


def test_prefetch_overlaps_production():
    def slow_gen():
        for i in range(5):
            time.sleep(0.05)
            yield i

    it = prefetch(slow_gen(), depth=5)
    time.sleep(0.4)  # producer should have finished in the background
    t0 = time.time()
    out = list(it)
    assert out == list(range(5))
    assert time.time() - t0 < 0.05  # all items were ready


def test_prefetch_propagates_errors():
    def bad_gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(bad_gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_parallel_map():
    pm = ParallelMap(lambda x: x * x, n_workers=3)
    assert pm(list(range(10))) == [x * x for x in range(10)]


def test_parallel_map_raises():
    def f(x):
        if x == 3:
            raise ValueError("bad item")
        return x

    with pytest.raises(ValueError):
        ParallelMap(f, n_workers=2)(list(range(6)))


def test_prefetch_close_stops_endless_stream():
    """A consumer breaking out of an ENDLESS stream (train loop at
    max_updates) calls close(): the fill thread must exit and the
    generator's finalizers must run, releasing the buffered batches."""
    import threading

    released = threading.Event()

    def endless():
        try:
            i = 0
            while True:
                yield i
                i += 1
        finally:
            released.set()

    it = prefetch(endless(), depth=2)
    assert next(it) == 0
    it.close()
    assert released.wait(2.0)
    assert not it._thread.is_alive()
    it.close()  # idempotent


def test_prefetch_context_manager_closes():
    def endless():
        while True:
            yield 0

    with prefetch(endless(), depth=2) as it:
        next(it)
    assert not it._thread.is_alive()
