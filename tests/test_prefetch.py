"""Prefetcher: ordering-complete delivery, map_fn, error propagation."""

import time

import pytest

from unigen_tpu.data.prefetch import Prefetcher


def test_prefetch_delivers_all():
    items = list(range(20))
    out = sorted(Prefetcher(iter(items), depth=3, workers=2))
    assert out == items


def test_prefetch_single_worker_preserves_order():
    out = list(Prefetcher(iter(range(10)), depth=2, workers=1))
    assert out == list(range(10))


def test_prefetch_map_fn_runs_in_worker():
    out = sorted(Prefetcher(iter(range(5)), map_fn=lambda x: x * 10))
    assert out == [0, 10, 20, 30, 40]


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")
    p = Prefetcher(gen(), workers=1)
    it = iter(p)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_prefetch_overlaps_slow_producer():
    def slow():
        for i in range(6):
            time.sleep(0.02)
            yield i
    t0 = time.perf_counter()
    out = []
    for x in Prefetcher(slow(), depth=4, workers=2):
        time.sleep(0.02)  # consumer work overlaps producer
        out.append(x)
    elapsed = time.perf_counter() - t0
    assert sorted(out) == list(range(6))
    assert elapsed < 0.22  # sequential would be ~0.24s
