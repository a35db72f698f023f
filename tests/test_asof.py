"""operators.asof.asof_join — hand-computed trades/quotes fixtures."""

import datetime as dt

from pyspark.sql import functions as F

from kioss_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 10, m)


def _fixtures(spark):
    trades = spark.createDataFrame(
        [("A", _ts(1), 100.0), ("A", _ts(5), 101.0), ("B", _ts(3), 200.0)],
        "sym string, ts timestamp, px double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts(0), 99.5),
            ("A", _ts(4), 100.5),
            ("A", _ts(9), 102.0),
            ("B", _ts(8), 199.0),
        ],
        "sym string, ts timestamp, bid double",
    )
    return trades, quotes


def test_backward_inclusive(spark):
    trades, quotes = _fixtures(spark)
    out = asof_join(trades, quotes, on="ts", by="sym", values=["bid"])
    got = {(r["sym"], r["ts"].minute): r["bid"] for r in out.collect()}
    assert got == {("A", 1): 99.5, ("A", 5): 100.5, ("B", 3): None}


def test_forward(spark):
    trades, quotes = _fixtures(spark)
    out = asof_join(trades, quotes, on="ts", by="sym", values=["bid"], direction="forward")
    got = {(r["sym"], r["ts"].minute): r["bid"] for r in out.collect()}
    assert got == {("A", 1): 100.5, ("A", 5): 102.0, ("B", 3): 199.0}


def test_tolerance_nulls_far_matches(spark):
    trades, quotes = _fixtures(spark)
    out = asof_join(
        trades, quotes, on="ts", by="sym", values=["bid"],
        tolerance=F.expr("INTERVAL 1 MINUTE"),
    )
    got = {(r["sym"], r["ts"].minute): r["bid"] for r in out.collect()}
    # A@1 matched quote@0 (1 min, kept); A@5 matched quote@4 (1 min, kept);
    # B@3 has no preceding quote at all
    assert got == {("A", 1): 99.5, ("A", 5): 100.5, ("B", 3): None}
    tight = asof_join(
        trades, quotes, on="ts", by="sym", values=["bid"],
        tolerance=F.expr("INTERVAL 30 SECOND"),
    )
    got = {(r["sym"], r["ts"].minute): r["bid"] for r in tight.collect()}
    assert got == {("A", 1): None, ("A", 5): None, ("B", 3): None}


def test_same_ts_is_inclusive(spark):
    trades = spark.createDataFrame(
        [("A", _ts(4), 1.0)], "sym string, ts timestamp, px double"
    )
    quotes = spark.createDataFrame(
        [("A", _ts(4), 55.0)], "sym string, ts timestamp, bid double"
    )
    out = asof_join(trades, quotes, on="ts", by="sym", values=["bid"]).collect()
    assert out[0]["bid"] == 55.0


def test_no_global_sort_in_plan(spark):
    trades, quotes = _fixtures(spark)
    out = asof_join(trades, quotes, on="ts", by="sym", values=["bid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the one Exchange is keyed on sym, never a single-partition global sort
    assert "rangepartitioning" not in plan.lower()
