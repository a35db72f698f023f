"""Skew/bucketing utilities — correctness + plan-shape assertions."""

from pyspark.sql import functions as F

from kioss_spark.operators import skew


def test_salted_agg_matches_plain(spark):
    # 90% of rows share one key: the salted two-stage agg must equal the
    # plain groupBy
    df = spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        F.col("id").alias("v"),
    )
    got = {r["k"]: (r["total"], r["n"]) for r in skew.salted_agg(df, "k", "v").collect()}
    want = {
        r["k"]: (r["total"], r["n"])
        for r in df.groupBy("k").agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_salted_agg_stage1_spreads_hot_key(spark):
    df = spark.range(1000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    partial = (
        df.withColumn("__salt__", F.pmod(F.xxhash64(F.col("v")), F.lit(16)))
        .groupBy("k", "__salt__").count()
    )
    # the single hot key occupies many distinct salt buckets
    assert partial.count() > 8


def test_salted_join_matches_plain(spark):
    fact = spark.range(5000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k long, name string")
    got = sorted(
        (r["k"], r["v"], r["name"]) for r in skew.salted_join(fact, dim, "k").collect()
    )
    want = sorted((r["k"], r["v"], r["name"]) for r in fact.join(dim, "k").collect())
    assert got == want


def test_bucketed_join_has_no_shuffle(spark):
    # warehouse dir points at tmp (static conf, set by get_spark). Disable
    # auto-broadcast so the planner exercises the bucketed path (at real
    # scale neither side fits in memory — that regime is what bucketing is
    # for; tiny test tables would otherwise just broadcast).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
        b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
        skew.write_bucketed(a, "t_bucket_a", "k", n_buckets=8, sort_by=["k"])
        skew.write_bucketed(b, "t_bucket_b", "k", n_buckets=8, sort_by=["k"])
        ta = skew.read_bucketed(spark, "t_bucket_a")
        tb = skew.read_bucketed(spark, "t_bucket_b")
        joined = ta.join(tb, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located bucketed join: no exchange anywhere in the join plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


# --- zvalue ----------------------------------------------------------------

from kioss_spark.operators.skew import zvalue


def _interleave(a, b, bits):
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_python_interleave(spark):
    from pyspark.sql import functions as F

    rows = [(a, b) for a in (0, 1, 5, 200, 255) for b in (0, 3, 17, 254)]
    df = spark.createDataFrame(rows, "u long, h long")
    got = {
        (r["u"], r["h"]): r["zv"]
        for r in df.withColumn("zv", zvalue("u", "h", bits=8)).collect()
    }
    assert got == {(a, b): _interleave(a, b, 8) for a, b in rows}


def test_zvalue_bucket_tiles_bound_both_dims(spark):
    # z div 2^(2t) confines a bucket to a 2^t x 2^t tile: max span 2^t - 1
    # in BOTH dimensions — the data-skipping property the layout exists for
    from pyspark.sql import functions as F

    rows = [(a, b) for a in range(0, 64, 3) for b in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "u long, h long")
    prof = (
        df.withColumn("zv", zvalue("u", "h", bits=8))
        .groupBy(F.expr("zv div 64").alias("bkt"))
        .agg(
            (F.max("u") - F.min("u")).alias("su"),
            (F.max("h") - F.min("h")).alias("sh"),
        )
        .collect()
    )
    assert prof and all(r["su"] <= 7 and r["sh"] <= 7 for r in prof)


def test_zvalue_bits16_no_32bit_wrap(spark):
    # regression for the BIGINT-cast fix (skew.py): bits=16 emits shifts up
    # to << 31, which wraps NEGATIVE in 32-bit INT arithmetic. Operands with
    # high bits set (>= 2^15) exercise exactly that regime.
    rows = [
        (a, b)
        for a in (0, 1, 32768, 40000, 65535)
        for b in (0, 32768, 54321, 65535)
    ]
    df = spark.createDataFrame(rows, "u long, h long")
    got = {
        (r["u"], r["h"]): r["zv"]
        for r in df.withColumn("zv", zvalue("u", "h", bits=16)).collect()
    }
    expect = {(a, b): _interleave(a, b, 16) for a, b in rows}
    assert got == expect
    # the wrap bug's signature: z(65535, 65535) = 2^32 - 1, positive and
    # above INT range — a 32-bit evaluation cannot produce it
    assert got[(65535, 65535)] == 2**32 - 1
    assert all(v >= 0 for v in got.values())


def test_spread_scan_spreads_single_split_input(spark, tmp_path):
    # a single parquet file arrives as one scan split; spread_scan must
    # re-spread it to the session's parallelism without changing rows
    p = str(tmp_path / "one")
    spark.range(1000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    assert df.rdd.getNumPartitions() == 1
    out = skew.spread_scan(df)
    target = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == target
    assert sorted(r["id"] for r in out.collect()) == list(range(1000))


def test_spread_scan_noop_when_already_parallel(spark):
    # inputs already at (or above) the target keep their EXACT plan —
    # no exchange is added just to reshuffle existing parallelism
    target = spark.sparkContext.defaultParallelism
    df = spark.range(10_000, numPartitions=target + 1)
    out = skew.spread_scan(df)
    assert out is df


def test_spread_scan_never_probes_via_rdd(spark, tmp_path, monkeypatch):
    # the split probe must stay in the DataFrame API: df.rdd forces a
    # plan-to-RDD conversion and, under AQE, can eagerly execute
    # upstream stages of a caller-supplied corpus (ADVICE r14)
    from pyspark.sql import DataFrame

    p = str(tmp_path / "one")
    spark.range(100).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)

    def _boom(self):  # pragma: no cover - failure path
        raise AssertionError("spread_scan touched df.rdd")

    monkeypatch.setattr(DataFrame, "rdd", property(_boom))
    out = skew.spread_scan(df)
    assert out is not df  # single small file still spreads


def test_spread_scan_leaves_non_scan_inputs_alone(spark, tmp_path):
    # joins/aggregations already carry the parallelism an upstream
    # exchange set; spread_scan must return them unchanged WITHOUT
    # probing (the probe itself could execute the upstream pipeline)
    p = str(tmp_path / "t")
    spark.range(100).coalesce(1).write.parquet(p)
    scan = spark.read.parquet(p)
    joined = scan.join(scan.withColumnRenamed("id", "id2"),
                       scan["id"] == F.col("id2"))
    assert skew.spread_scan(joined) is joined
    agg = scan.groupBy("id").count()
    assert skew.spread_scan(agg) is agg
