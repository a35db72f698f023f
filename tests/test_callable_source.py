"""Callable-source re-invocation contract (round-3 verdict #4).

The reference re-invokes a callable source at each iteration start
(streamable/visitors/iterator.py:146-159, re-iterability pinned by
tests/test_stream.py:1502-1509).  Ours ships the callable into a Python
DataSource whose read runs per job, so each ACTION re-invokes it — pinned
here by a callable that reads driver-external state (a file) mutated
between actions.
"""

import pytest
from pyspark.sql import types as T

from kioss_spark.stream import Stream


def test_callable_reinvoked_per_action(spark, tmp_path):
    p = tmp_path / "state.txt"
    p.write_text("1 2 3")

    path = str(p)

    def src():
        with open(path) as fh:
            return [int(t) for t in fh.read().split()]

    s = Stream.of(spark, src)
    assert s.collect() == [1, 2, 3]
    p.write_text("7 8")
    assert s.collect() == [7, 8]


def test_callable_scalar_and_count(spark):
    s = Stream.of(spark, lambda: range(10))
    assert s.count() == 10
    assert s.collect() == list(range(10))


def test_callable_dict_elements(spark):
    def src():
        return [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]

    s = Stream.of(spark, src)
    rows = s.to_df(ordered=True).collect()
    assert [(r["a"], r["b"]) for r in rows] == [(1, "x"), (2, "y")]


def test_callable_explicit_schema_no_build_invocation(spark):
    calls = {"n": 0}

    def src():
        calls["n"] += 1
        return [5, 6]

    schema = T.StructType([T.StructField("value", T.LongType(), True)])
    s = Stream.of(spark, src, schema=schema)
    assert calls["n"] == 0  # plan build must not invoke (explicit schema)
    assert s.collect() == [5, 6]


def test_callable_empty_requires_schema(spark):
    with pytest.raises(ValueError, match="schema"):
        Stream.of(spark, lambda: [])


def test_callable_ops_compose(spark):
    s = (
        Stream.of(spark, lambda: range(20))
        .map(lambda x: x * 2, returnType=T.LongType())
        .filter(lambda x: x % 4 == 0)
    )
    assert s.collect() == [x * 2 for x in range(20) if (x * 2) % 4 == 0]
