"""interval_join — chunked range join unit coverage."""

import datetime as dt

from pyspark.sql import functions as F

from kioss_spark.operators.rangejoin import interval_join


def _ts(m, s=0):
    return dt.datetime(2024, 1, 1, 0, m, s)


def _points(spark, rows):
    return spark.createDataFrame(rows, "pid long, ts timestamp")


def _ivals(spark, rows):
    return spark.createDataFrame(rows, "iid long, w_start timestamp, w_end timestamp")


def test_inner_matches_and_boundaries(spark):
    # interval [00:10, 00:20]: boundaries inclusive on both ends
    pts = _points(spark, [(1, _ts(9, 59)), (2, _ts(10)), (3, _ts(15)), (4, _ts(20)), (5, _ts(20, 1))])
    iv = _ivals(spark, [(100, _ts(10), _ts(20))])
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(pts, iv, "ts", "w_start", "w_end", chunk_seconds=60).collect()
    )
    assert got == [(2, 100), (3, 100), (4, 100)]


def test_interval_spanning_many_chunks(spark):
    # 30-min interval with 60s chunks: candidates come from every chunk,
    # and each (point, interval) pair appears exactly once (no dedup step)
    pts = _points(spark, [(1, _ts(0)), (2, _ts(14)), (3, _ts(29, 59))])
    iv = _ivals(spark, [(7, _ts(0), _ts(30))])
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(pts, iv, "ts", "w_start", "w_end", chunk_seconds=60).collect()
    )
    assert got == [(1, 7), (2, 7), (3, 7)]


def test_overlapping_intervals_fan_out(spark):
    pts = _points(spark, [(1, _ts(5))])
    iv = _ivals(spark, [(10, _ts(0), _ts(10)), (11, _ts(4), _ts(6)), (12, _ts(6), _ts(9))])
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(pts, iv, "ts", "w_start", "w_end", chunk_seconds=120).collect()
    )
    assert got == [(1, 10), (1, 11)]


def test_keys_partition_the_join(spark):
    pts = spark.createDataFrame(
        [(1, 1, _ts(5)), (2, 2, _ts(5))], "pid long, user_id long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [(100, 1, _ts(0), _ts(10))], "iid long, user_id long, w_start timestamp, w_end timestamp"
    )
    got = [
        (r["pid"], r["iid"])
        for r in interval_join(
            pts, iv, "ts", "w_start", "w_end", keys=("user_id",), chunk_seconds=60
        ).collect()
    ]
    assert got == [(1, 100)]  # same timestamp, wrong user -> no match


def test_left_keeps_unmatched_points(spark):
    pts = _points(spark, [(1, _ts(5)), (2, _ts(25))])
    iv = _ivals(spark, [(100, _ts(0), _ts(10))])
    rows = interval_join(pts, iv, "ts", "w_start", "w_end", how="left", chunk_seconds=60).collect()
    by_pid = {r["pid"]: r["iid"] for r in rows}
    assert by_pid == {1: 100, 2: None}


def test_no_nested_loop_in_plan(spark):
    pts = _points(spark, [(1, _ts(5))])
    iv = _ivals(spark, [(100, _ts(0), _ts(10))])
    plan = (
        interval_join(pts, iv, "ts", "w_start", "w_end", chunk_seconds=60)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
