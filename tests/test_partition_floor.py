"""Plan-shape tests for the ``concurrency`` partition FLOOR (map/flatten).

The reference's ``concurrency`` is a worker-pool size
(streamable/iterators.py:563-567); Spark-first it maps to a *minimum*
partition count. Two invariants:

1. a narrow upstream is raised to ``concurrency`` partitions (a slow Python
   fn gets its parallelism);
2. a wide upstream KEEPS its width — round-2's bug was a plain
   ``repartition(n)`` that would shuffle a 1000-partition stream down to n.

Width is asserted on the executed output (AQE left on, as in production).
"""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kioss_spark.stream import Stream


def _out_width(df) -> int:
    return df.rdd.getNumPartitions()


def test_map_concurrency_raises_narrow_upstream(spark):
    df = spark.range(100).repartition(1).select(F.col("id").alias("value"))
    s = Stream.from_df(df, seq="value").map(
        lambda x: x + 1, returnType=T.LongType(), concurrency=4
    )
    assert _out_width(s.to_df(ordered=False)) >= 4


def test_map_concurrency_keeps_wide_upstream(spark):
    df = spark.range(1000).repartition(16).select(F.col("id").alias("value"))
    s = Stream.from_df(df, seq="value").map(
        lambda x: x + 1, returnType=T.LongType(), concurrency=2
    )
    assert _out_width(s.to_df(ordered=False)) >= 16


def test_flatten_concurrency_keeps_wide_upstream(spark):
    df = (
        spark.range(1000)
        .repartition(16)
        .select(F.array(F.col("id"), F.col("id") + 1).alias("value"))
    )
    s = Stream.from_df(df, seq=F.element_at("value", 1)).flatten(concurrency=2)
    assert _out_width(s.to_df(ordered=False)) >= 16


def test_flatten_concurrency_raises_narrow_upstream(spark):
    df = (
        spark.range(100)
        .repartition(1)
        .select(F.array(F.col("id"), F.col("id") + 1).alias("value"))
    )
    s = Stream.from_df(df, seq=F.element_at("value", 1)).flatten(concurrency=4)
    assert _out_width(s.to_df(ordered=False)) >= 4


def test_floor_probe_restores_aqe(spark):
    df = spark.range(10).repartition(1).select(F.col("id").alias("value"))
    Stream.from_df(df, seq="value").map(
        lambda x: x, returnType=T.LongType(), concurrency=2
    )
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_floor_probe_never_touches_rdd(spark, monkeypatch):
    """Plan build must stay metadata-only: .rdd under AQE finalizes the
    adaptive plan and can execute upstream stages (round-3 verdict #2)."""
    from pyspark.sql import DataFrame

    def _boom(self):
        raise AssertionError(".rdd accessed during plan build")

    monkeypatch.setattr(DataFrame, "rdd", property(_boom))
    df = spark.range(100).repartition(1).select(F.col("id").alias("value"))
    s = Stream.from_df(df, seq="value").map(
        lambda x: x + 1, returnType=T.LongType(), concurrency=4
    )
    # flatten shares the floor path
    df2 = (
        spark.range(10)
        .repartition(1)
        .select(F.array(F.col("id")).alias("value"))
    )
    Stream.from_df(df2, seq=F.element_at("value", 1)).flatten(concurrency=4)
    # the floor repartition is in the physical plan (topmost exchange = 4)
    assert s._plan_width() == 4


def test_plan_width_estimates(spark, tmp_path):
    df = spark.range(100).repartition(1).select(F.col("id").alias("value"))
    assert Stream.from_df(df, seq="value")._plan_width() == 1
    wide = spark.range(100).repartition(16).select(F.col("id").alias("value"))
    assert Stream.from_df(wide, seq="value")._plan_width() == 16
    shuffled = (
        spark.range(100)
        .select(F.col("id").alias("value"), (F.col("id") % 3).alias("k"))
        .groupBy("k")
        .agg(F.sum("value").alias("value"))
    )
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert Stream.from_df(shuffled, seq="k")._plan_width() == n_shuffle
    # file scan: width from the cached listing
    p = str(tmp_path / "t.parquet")
    spark.range(100).repartition(3).write.parquet(p)
    assert Stream.from_df(spark.read.parquet(p), seq="id")._plan_width() >= 3
