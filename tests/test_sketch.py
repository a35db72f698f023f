"""KMV distinct-count sketch: exactness below k, estimator accuracy above,
partial-path equivalence, mergeable-shape plan sanity."""

from pyspark.sql import functions as F

from kioss_spark.operators.sketch import kmv_distinct


def test_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", i % 10) for i in range(100)], ["g", "x"]
    )
    out = kmv_distinct(df, value=F.col("x").cast("string"), by=["g"], k=64)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["n_kept"] == 10
    assert rows[0]["est_distinct"] == 10  # fewer than k distinct -> exact


def test_estimate_above_k(spark):
    n = 5000
    df = spark.range(n).select(F.lit("g").alias("g"), F.col("id").cast("string").alias("x"))
    out = kmv_distinct(df, value=F.col("x"), by=["g"], k=64).collect()[0]
    assert out["n_kept"] == 64
    # std error ~ 1/sqrt(k-2) ~ 12.7%; allow 4 sigma
    assert abs(out["est_distinct"] - n) / n < 0.51


def test_partial_matches_full(spark):
    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("string").alias("x"),
    )
    full = kmv_distinct(df, F.col("x"), by=["g"], k=32, partial=False)
    part = kmv_distinct(df, F.col("x"), by=["g"], k=32, partial=True)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, part.collect()))


def test_global_sketch_no_group(spark):
    df = spark.range(300).select(F.col("id").cast("string").alias("x"))
    out = kmv_distinct(df, F.col("x"), by=None, k=64).collect()[0]
    assert out["n_kept"] == 64
    assert abs(out["est_distinct"] - 300) / 300 < 0.55
