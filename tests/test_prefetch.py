"""DevicePrefetcher tests."""

import time

import pytest

from yolov3_tpu.utils.prefetch import DevicePrefetcher


class TestPrefetcher:
    def test_order_preserved(self):
        out = list(DevicePrefetcher(iter(range(20)), lambda x: x * 2))
        assert out == [x * 2 for x in range(20)]

    def test_exception_propagates(self):
        def gen():
            yield 1
            raise RuntimeError("boom")

        it = DevicePrefetcher(gen(), lambda x: x)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="boom"):
            list(it)

    def test_stage_exception_propagates(self):
        it = DevicePrefetcher(iter([1, 0]), lambda x: 1 // x)
        with pytest.raises(ZeroDivisionError):
            list(it)

    def test_stop_unblocks_producer(self):
        def infinite():
            i = 0
            while True:
                yield i
                i += 1

        it = DevicePrefetcher(infinite(), lambda x: x, depth=2)
        assert next(it) == 0
        it.stop()
        time.sleep(0.05)  # let the thread wind down
        it._thread.join(timeout=2)
        assert not it._thread.is_alive()

    def test_overlap(self):
        # staging runs ahead of consumption
        staged = []

        def slow_consume():
            out = []
            for v in DevicePrefetcher(iter(range(5)),
                                      lambda x: staged.append(x) or x,
                                      depth=4):
                time.sleep(0.05)
                out.append(v)
            return out

        out = slow_consume()
        assert out == list(range(5))
