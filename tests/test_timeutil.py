"""Session-independence tests for the canonical TIMESTAMP_NTZ algebra —
the round-3 keystone: every expression here must produce identical values
under ANY session timezone (the driver's harness controls the session, not
us; round 2 lost 4 correctness rows to exactly this)."""

import contextlib

from pyspark.sql import functions as F

from kioss_spark.functions.timeutil import (
    epoch_s,
    epoch_us,
    ntz_from_epoch_us,
    ntz_lit,
    to_ntz,
)

US = 1704067200_123456  # 2024-01-01 00:00:00.123456 UTC, in epoch micros


@contextlib.contextmanager
def session_tz(spark, tz):
    key = "spark.sql.session.timeZone"
    prev = spark.conf.get(key)
    spark.conf.set(key, tz)
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _probe(spark):
    ntz = spark.range(1).select(
        F.lit("2024-01-01 00:00:00.123456").cast("timestamp_ntz").alias("ts")
    )
    return (
        ntz.select(epoch_us("ts").alias("us"), epoch_s("ts").alias("s")).collect()[0],
        ntz.select((F.col("ts") >= ntz_lit("2024-01-01")).alias("geq")).collect()[0],
        ntz.select(ntz_from_epoch_us(epoch_us("ts")).alias("rt")).collect()[0],
    )


def test_epoch_algebra_identical_across_timezones(spark):
    results = []
    for tz in ("UTC", "America/New_York", "Asia/Kolkata"):  # incl. a :30 offset
        with session_tz(spark, tz):
            (r_us, r_cmp, r_rt) = _probe(spark)
            results.append((r_us["us"], r_us["s"], r_cmp["geq"], r_rt["rt"]))
    assert all(r == results[0] for r in results)
    assert results[0][0] == US
    assert results[0][1] == US // 1_000_000
    assert results[0][2] is True


def test_to_ntz_bigint_nanos(spark):
    df = spark.range(1).select(F.lit(US * 1000 + 789).alias("ts"))  # nanos
    with session_tz(spark, "America/New_York"):
        out = to_ntz(df, "ts")
        assert dict(out.dtypes)["ts"] == "timestamp_ntz"
        got = out.collect()[0]["ts"]
    assert (got.year, got.hour, got.microsecond) == (2024, 0, 123456)  # nanos floored


def test_to_ntz_session_timestamp(spark):
    df = spark.range(1).select(F.timestamp_micros(F.lit(US)).alias("ts"))
    with session_tz(spark, "America/New_York"):
        out = to_ntz(df, "ts")
        assert dict(out.dtypes)["ts"] == "timestamp_ntz"
        got = out.collect()[0]["ts"]
    # instant rendered as its UTC wall clock regardless of session tz
    assert (got.year, got.month, got.day, got.hour) == (2024, 1, 1, 0)


def test_to_ntz_passthrough_and_reject(spark):
    ntz = spark.range(1).select(F.lit("2024-01-01").cast("timestamp_ntz").alias("ts"))
    assert to_ntz(ntz, "ts") is ntz  # already canonical: untouched
    s = spark.range(1).select(F.lit("x").alias("ts"))
    try:
        to_ntz(s, "ts")
        raise AssertionError("expected TypeError for string column")
    except TypeError:
        pass
