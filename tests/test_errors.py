"""Errors-as-data semantics — the reference's contract: per-element errors
flow positionally, iteration continues, catch() restores control flow
(reference: tests/test_stream.py:555-576 continuation, :1445-1466
catch+replacement, README.md:43-57 inverses example)."""

import pytest
from pyspark.sql import types as T

from kioss_spark import Stream


def throw_on_odd(x):
    if x % 2 == 1:
        raise ValueError(f"odd: {x}")
    return x * 10


def inverse(x):
    return round(1 / x, 2)


def test_uncaught_error_raises_at_action(spark):
    s = Stream.range(spark, 10).map(throw_on_odd, returnType=T.LongType())
    with pytest.raises(ValueError):
        s.collect()


def test_catch_drops_errors(spark):
    s = Stream.range(spark, 10).map(throw_on_odd, returnType=T.LongType()).catch(ValueError)
    assert s.collect() == [0, 20, 40, 60, 80]


def test_catch_with_replacement(spark):
    # README inverses example (reference: README.md:43-57)
    s = (
        Stream.range(spark, 10)
        .map(inverse, returnType=T.DoubleType())
        .catch(ZeroDivisionError, replacement=float("inf"))
    )
    out = s.collect()
    assert out[0] == float("inf")
    assert out[1:] == [round(1 / n, 2) for n in range(1, 10)]


def test_catch_kind_mismatch_still_raises(spark):
    s = Stream.range(spark, 10).map(throw_on_odd, returnType=T.LongType()).catch(KeyError)
    with pytest.raises(ValueError):
        s.collect()


def test_catch_when_predicate(spark):
    s = (
        Stream.range(spark, 10)
        .map(throw_on_odd, returnType=T.LongType())
        .catch(ValueError, when=lambda exc: "3" not in str(exc))
    )
    with pytest.raises(ValueError, match="odd: 3"):
        s.collect()


def test_catch_finally_raise(spark):
    s = (
        Stream.range(spark, 10)
        .map(throw_on_odd, returnType=T.LongType())
        .catch(ValueError, finally_raise=True)
    )
    with pytest.raises(ValueError, match="odd: 1"):
        s.collect()


def test_errors_flow_through_filter(spark):
    s = (
        Stream.range(spark, 10)
        .map(throw_on_odd, returnType=T.LongType())
        .filter(lambda x: x >= 40)
        .catch(ValueError)
    )
    assert s.collect() == [40, 60, 80]


def test_errors_not_counted_by_truncate(spark):
    # errors are not counted as yields (reference: tests/test_stream.py:900-911)
    s = (
        Stream.range(spark, 10)
        .map(throw_on_odd, returnType=T.LongType())
        .truncate(count=3)
        .catch(ValueError)
    )
    assert s.collect() == [0, 20, 40]


def test_errors_not_counted_by_skip(spark):
    # errors don't count as skipped (reference: streamable/iterators.py:295-297)
    s = (
        Stream.range(spark, 10)
        .map(throw_on_odd, returnType=T.LongType())
        .skip(count=2)
        .catch(ValueError)
    )
    assert s.collect() == [40, 60, 80]


def test_group_flushes_around_errors(spark):
    s = (
        Stream.range(spark, 8)
        .map(throw_on_odd, returnType=T.LongType())
        .catch(ValueError)
        .group(size=2)
    )
    assert s.collect() == [[0, 20], [40, 60]]
