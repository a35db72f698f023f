"""Batch throttle — paced driver-side consumption (reference semantics:
slows iteration yields; reference tests/test_stream.py:1128-1210)."""

import time

import pytest

from kioss_spark import Stream


def test_throttle_paces_iteration(spark):
    s = Stream.of(spark, [1, 2, 3, 4, 5]).throttle(interval=0.1)
    t0 = time.monotonic()
    got = list(s)
    dt = time.monotonic() - t0
    assert got == [1, 2, 3, 4, 5]
    # 5 yields, first immediate, 4 gaps of 0.1s
    assert dt >= 0.35


def test_throttle_per_second(spark):
    s = Stream.of(spark, list(range(5))).throttle(per_second=20)
    t0 = time.monotonic()
    assert list(s) == [0, 1, 2, 3, 4]
    assert time.monotonic() - t0 >= 0.15


def test_throttle_collect_is_paced_count_is_not(spark):
    s = Stream.of(spark, [1, 2, 3]).throttle(interval=0.15)
    t0 = time.monotonic()
    assert s.collect() == [1, 2, 3]
    assert time.monotonic() - t0 >= 0.25  # collect routes through iter
    # count is a distributed action: unpaced by design (documented)
    assert s.count() == 3


def test_throttle_chain_slowest_wins(spark):
    # two throttles compose to the slowest effective rate (reference
    # tests/test_stream.py:1205-1206)
    s = Stream.of(spark, [1, 2, 3]).throttle(interval=0.2).throttle(interval=0.05)
    t0 = time.monotonic()
    list(s)
    assert time.monotonic() - t0 >= 0.35


def test_throttle_validation(spark):
    s = Stream.of(spark, [1])
    with pytest.raises(ValueError):
        s.throttle(per_second=0)
    with pytest.raises(ValueError):
        s.throttle(per_minute=0)
    with pytest.raises(ValueError):
        s.throttle(interval=-0.001)


def test_throttle_errors_are_slowed_not_swallowed(spark):
    from pyspark.sql import functions as F

    s = (
        Stream.of(spark, [1, 2, 3])
        .validate(F.col("value") != 2, ValueError)
        .throttle(interval=0.05)
    )
    got = []
    with pytest.raises(ValueError):
        for x in s:
            got.append(x)
    assert got == [1]  # error re-raises at its stream position, still paced
