"""Prefetching generator wrapper: ordering, exceptions, depth=0 passthrough."""

import time

import pytest

from geoformer_tpu.utils.prefetch import prefetch


def test_prefetch_preserves_order():
    out = list(prefetch(iter(range(20)), depth=3))
    assert out == list(range(20))


def test_prefetch_depth0_passthrough():
    g = iter(range(3))
    assert prefetch(g, depth=0) is g


def test_prefetch_propagates_exception():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_prefetch_overlaps_producer():
    """Consumer wall-clock < serial sum when producer sleeps."""

    def slow_gen():
        for i in range(4):
            time.sleep(0.05)
            yield i

    it = prefetch(slow_gen(), depth=4)
    time.sleep(0.25)  # let the producer run ahead
    t0 = time.time()
    out = list(it)
    assert out == list(range(4))
    assert time.time() - t0 < 0.15  # items were already buffered
