"""Streaming dialect tests — rate-source runs with real micro-batches.

Wall-clock-dependent assertions use generous bounds (the reference pins
exact timing with DELTA_RATE=0.4 tolerance, tests/test_stream.py:113; a
distributed scheduler needs looser ones)."""

import os
import time

import pytest
from pyspark.sql import functions as F

from kioss_spark.streaming import SStream


def _drain(query, seconds):
    try:
        query.awaitTermination(seconds)
    finally:
        query.stop()


def test_rate_source_throttles_at_source(spark):
    # rows_per_second IS the throttle: after ~4s of a 50/s stream the sink
    # holds roughly 4*50 rows, never wildly more
    q = SStream.rate(spark, rows_per_second=50).to_memory("t_rate")
    _drain(q, 4)
    n = spark.sql("SELECT count(*) FROM t_rate").collect()[0][0]
    assert 0 < n <= 50 * 10  # upper bound: generous scheduler slack


def test_map_filter_streaming(spark):
    s = (
        SStream.rate(spark, rows_per_second=100)
        .map(doubled=F.col("value") * 2)
        .filter(F.col("doubled") % 4 == 0)
    )
    q = s.to_memory("t_mapfilter")
    _drain(q, 4)
    rows = spark.sql("SELECT doubled FROM t_mapfilter").collect()
    assert rows, "no micro-batch arrived in 4s"
    assert all(r[0] % 4 == 0 for r in rows)


def test_group_interval_micro_batches(spark):
    # group(interval=1s): foreach_batch receives one group per interval
    batches = []

    def sink(df, epoch_id):
        batches.append((epoch_id, df.count()))

    s = SStream.rate(spark, rows_per_second=100).group(interval=1)
    q = s.foreach_batch(sink)
    _drain(q, 5)
    non_empty = [b for b in batches if b[1] > 0]
    assert len(batches) >= 2, batches  # several flushes happened
    assert non_empty, batches


def test_streaming_groupby_collects_per_key(spark):
    s = SStream.rate(spark, rows_per_second=100).map(
        k=F.col("value") % 2, v=F.col("value")
    ).groupby("k", values_of="v")
    q = s.to_memory("t_gby", output_mode="complete")
    _drain(q, 5)
    rows = spark.sql("SELECT key, size(value) AS n FROM t_gby").collect()
    assert rows, "no aggregation output in 5s"
    assert {r["key"] for r in rows} <= {0, 1}


def test_streaming_distinct_watermarked(spark):
    # dedup on value%5 with watermark-bounded state -> at most 5 survivors
    s = SStream.rate(spark, rows_per_second=200).map(
        timestamp=F.col("timestamp"), k=(F.col("value") % 5)
    ).distinct(key="k")
    q = s.to_memory("t_dedup")
    _drain(q, 6)
    n = spark.sql("SELECT count(DISTINCT k) FROM t_dedup").collect()[0][0]
    total = spark.sql("SELECT count(*) FROM t_dedup").collect()[0][0]
    assert total <= 5 and n == total


def test_observe_metrics_in_progress(spark):
    s = SStream.rate(spark, rows_per_second=100).observe(
        "m", F.count(F.lit(1)).alias("rows")
    )
    q = s.to_memory("t_obs")
    deadline = time.time() + 8
    seen = None
    while time.time() < deadline:
        p = q.lastProgress
        if p and p.get("observedMetrics", {}).get("m"):
            seen = p["observedMetrics"]["m"]
            break
        time.sleep(0.3)
    q.stop()
    assert seen is not None and seen["rows"] >= 0


def test_groupby_sized_flushes_exact_groups(spark):
    # the reference's size-policy groupby (iterators.py:213-280): every
    # emitted group has EXACTLY `size` members; the < size remainder stays
    # in per-key state (bounded), never emitted while data keeps flowing
    s = SStream.rate(spark, rows_per_second=200, partitions=2).map(
        k=(F.col("value") % 2).cast("long"), v=F.col("value")
    ).groupby_sized("k", values_of="v", size=5)
    q = s.to_memory("t_gsized")
    _drain(q, 8)
    rows = spark.sql("SELECT key, value FROM t_gsized").collect()
    assert rows, "no sized group emitted in 8s"
    assert all(len(r["value"]) == 5 for r in rows), [len(r["value"]) for r in rows]
    assert {r["key"] for r in rows} <= {0, 1}
    # no element appears in two groups of the same key
    for k in (0, 1):
        vals = [v for r in rows if r["key"] == k for v in r["value"]]
        assert len(vals) == len(set(vals))


def test_to_files_durable_sink(spark, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    s = SStream.rate(spark, rows_per_second=100).map(v=F.col("value"))
    q = s.to_files(out, checkpoint=ckpt)
    _drain(q, 5)
    df = spark.read.parquet(out)
    assert df.count() > 0
    assert "v" in df.columns
    # checkpoint directory carries the WAL (restart/exactly-once machinery)
    import os
    assert os.path.isdir(os.path.join(ckpt, "offsets"))


def test_batch_df_rejected(spark):
    with pytest.raises(TypeError):
        SStream(spark.range(5))


def test_window_agg_tumbling_event_time(spark, tmp_path):
    # explicit event times via a file source: 2 one-minute windows of
    # 3 and 2 events; watermark bounds state, counts are exact
    src = str(tmp_path / "win_src")
    rows = [
        ("2024-01-01 00:00:05", "a"),
        ("2024-01-01 00:00:20", "b"),
        ("2024-01-01 00:00:59", "c"),
        ("2024-01-01 00:01:10", "d"),
        ("2024-01-01 00:01:30", "e"),
    ]
    df = spark.createDataFrame(rows, "ts string, k string").select(
        F.col("ts").cast("timestamp").alias("timestamp"), "k"
    )
    df.write.mode("overwrite").parquet(src)
    s = SStream.files(spark, src, schema="timestamp timestamp, k string").window_agg(
        60, F.count(F.lit(1)).alias("n")
    )
    q = s.to_memory("t_winagg", output_mode="complete")
    try:
        q.processAllAvailable()
        got = {
            r["start"].isoformat(): r["n"]
            for r in spark.sql(
                "SELECT window.start AS start, n FROM t_winagg"
            ).collect()
        }
    finally:
        q.stop()
    assert got == {
        "2024-01-01T00:00:00": 3,
        "2024-01-01T00:01:00": 2,
    }, got


def test_session_agg_gap_merges(spark, tmp_path):
    # events 10s apart merge into one session; a 5-minute silence opens a
    # second one — mirrors the batch sessionize_events contract
    src = str(tmp_path / "sess_src")
    rows = [
        ("2024-01-01 00:00:00", "u1"),
        ("2024-01-01 00:00:10", "u1"),
        ("2024-01-01 00:00:20", "u1"),
        ("2024-01-01 00:05:30", "u1"),
    ]
    df = spark.createDataFrame(rows, "ts string, user string").select(
        F.col("ts").cast("timestamp").alias("timestamp"), "user"
    )
    df.write.mode("overwrite").parquet(src)
    s = SStream.files(
        spark, src, schema="timestamp timestamp, user string"
    ).session_agg(60, F.count(F.lit(1)).alias("n"), keys=("user",))
    q = s.to_memory("t_sessagg", output_mode="complete")
    try:
        q.processAllAvailable()
        got = sorted(
            (r["user"], r["n"])
            for r in spark.sql("SELECT user, n FROM t_sessagg").collect()
        )
    finally:
        q.stop()
    assert got == [("u1", 1), ("u1", 3)], got


def test_enrich_stream_static_join(spark):
    dims = spark.createDataFrame(
        [(0, "mod0"), (1, "mod1"), (2, "mod2")], "k long, name string"
    )
    s = (
        SStream.rate(spark, rows_per_second=100)
        .map(k=F.col("value") % 3)
        .enrich(dims, on="k")
    )
    q = s.to_memory("t_enrich")
    _drain(q, 4)
    rows = spark.sql("SELECT k, name FROM t_enrich").collect()
    assert rows, "no micro-batch arrived in 4s"
    assert all(r["name"] == f"mod{r['k']}" for r in rows)


def test_enrich_left_join_keeps_unmatched(spark):
    dims = spark.createDataFrame([(0, "zero")], "k long, name string")
    s = (
        SStream.rate(spark, rows_per_second=100)
        .map(k=F.col("value") % 2)
        .enrich(dims, on="k", how="left")
    )
    q = s.to_memory("t_enrich_left")
    _drain(q, 4)
    rows = spark.sql("SELECT k, name FROM t_enrich_left").collect()
    assert rows
    assert any(r["name"] is None for r in rows if r["k"] == 1)
    assert all(r["name"] == "zero" for r in rows if r["k"] == 0)


def test_groupby_sized_interval_flush_partials(spark):
    # the reference's interval policy (iterators.py:213-280): when the
    # interval elapses without any group reaching `size`, buffered partial
    # groups flush anyway (latency bound). size=10_000 is unreachable at
    # this rate, so EVERY emitted group is an interval-cadence partial.
    s = SStream.rate(spark, rows_per_second=100, partitions=2).map(
        k=(F.col("value") % 2).cast("long"), v=F.col("value")
    ).groupby_sized("k", values_of="v", size=10_000, interval=2)
    q = s.to_memory("t_ginterval")
    _drain(q, 12)
    rows = spark.sql("SELECT key, value FROM t_ginterval").collect()
    assert rows, "no interval-cadence partial group emitted in 12s"
    # partials only (size never reached), each non-empty
    assert all(0 < len(r["value"]) < 10_000 for r in rows)
    # the reference's ordering contract within a key: flushed elements are
    # disjoint across flushes and arrive in stream order
    for k in (0, 1):
        vals = [v for r in rows if r["key"] == k for v in r["value"]]
        assert len(vals) == len(set(vals))
        assert vals == sorted(vals)


def test_groupby_sized_size_beats_interval(spark):
    # full groups flush the moment they fill, never waiting for the
    # interval edge: with size=5 at 200 rows/s, exact 5-groups dominate
    s = SStream.rate(spark, rows_per_second=200, partitions=2).map(
        k=(F.col("value") % 2).cast("long"), v=F.col("value")
    ).groupby_sized("k", values_of="v", size=5, interval=30)
    q = s.to_memory("t_gsizefirst")
    _drain(q, 8)
    rows = spark.sql("SELECT key, value FROM t_gsizefirst").collect()
    assert rows, "no sized group emitted in 8s"
    assert all(len(r["value"]) == 5 for r in rows), [len(r["value"]) for r in rows]


def test_validate_catch_drop_streaming(spark):
    # errors-as-data carries to the unbounded stream: odd values become
    # error rows, catch drops them — the sink only ever sees evens
    s = (
        SStream.rate(spark, rows_per_second=200)
        .map(v=F.col("value"))
        .validate(F.col("v") % 2 == 0, ValueError, message="odd")
        .catch(ValueError)
    )
    q = s.to_memory("t_vcatch")
    _drain(q, 5)
    rows = spark.sql("SELECT v FROM t_vcatch").collect()
    assert rows, "no micro-batch arrived in 5s"
    assert all(r["v"] % 2 == 0 for r in rows)


def test_validate_catch_replacement_streaming(spark):
    # replacement repairs the column and clears __err__ (no rows lost)
    s = (
        SStream.rate(spark, rows_per_second=200)
        .map(v=F.col("value"))
        .validate(F.col("v") % 2 == 0, ValueError)
        .catch(ValueError, replacement={"v": -1})
    )
    q = s.to_memory("t_vrepl")
    _drain(q, 5)
    rows = spark.sql("SELECT v, __err__ FROM t_vrepl").collect()
    assert rows, "no micro-batch arrived in 5s"
    assert all(r["__err__"] is None for r in rows)
    vals = [r["v"] for r in rows]
    assert -1 in vals and any(v > 0 and v % 2 == 0 for v in vals)
    assert all(v == -1 or v % 2 == 0 for v in vals)


def test_catch_kind_mro_streaming(spark):
    # catch(LookupError) swallows KeyError rows (MRO match) but a
    # ValueError row passes through untouched
    s = (
        SStream.rate(spark, rows_per_second=200)
        .map(v=F.col("value"))
        .validate(F.col("v") % 3 != 0, KeyError)     # multiples of 3 -> KeyError
        .validate(F.col("v") % 3 != 1, ValueError)   # v%3==1 -> ValueError
        .catch(LookupError)                           # catches KeyError only
    )
    q = s.to_memory("t_vmro")
    _drain(q, 5)
    rows = spark.sql("SELECT v, __err__ FROM t_vmro").collect()
    assert rows, "no micro-batch arrived in 5s"
    assert all(r["v"] % 3 != 0 for r in rows)  # KeyError rows dropped
    kinds = {r["__err__"]["kind"] for r in rows if r["__err__"] is not None}
    assert kinds <= {"ValueError"}
    assert any(r["__err__"] is not None for r in rows)


def test_distinct_count_approx_windowed(spark, tmp_path):
    # window 1: values {x, y} seen with repeats -> 2; window 2: {x} -> 1.
    # sparse-regime HLL is exact, so the assert is equality, not tolerance
    src = str(tmp_path / "hll_src")
    rows = [
        ("2024-01-01 00:00:05", "x"),
        ("2024-01-01 00:00:10", "x"),
        ("2024-01-01 00:00:20", "y"),
        ("2024-01-01 00:00:50", "y"),
        ("2024-01-01 00:01:10", "x"),
    ]
    df = spark.createDataFrame(rows, "ts string, v string").select(
        F.col("ts").cast("timestamp").alias("timestamp"), "v"
    )
    df.write.mode("overwrite").parquet(src)
    s = SStream.files(
        spark, src, schema="timestamp timestamp, v string"
    ).distinct_count_approx("v", 60)
    q = s.to_memory("t_hll", output_mode="complete")
    try:
        q.processAllAvailable()
        got = {
            r["start"].isoformat(): r["est_distinct"]
            for r in spark.sql(
                "SELECT window.start AS start, est_distinct FROM t_hll"
            ).collect()
        }
    finally:
        q.stop()
    assert got == {
        "2024-01-01T00:00:00": 2,
        "2024-01-01T00:01:00": 1,
    }, got


def test_join_stream_within_interval(spark, tmp_path):
    # clicks join purchases per user when the purchase lands within 60s of
    # the click; u1's purchase at +30s matches, u2's at +300s does not
    lsrc, rsrc = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    clicks = [("2024-01-01 00:00:00", "u1", "c1"), ("2024-01-01 00:10:00", "u2", "c2")]
    buys = [("2024-01-01 00:00:30", "u1", "p1"), ("2024-01-01 00:15:00", "u2", "p2")]
    spark.createDataFrame(clicks, "ts string, user string, click_id string").select(
        F.col("ts").cast("timestamp").alias("timestamp"), "user", "click_id"
    ).write.mode("overwrite").parquet(lsrc)
    spark.createDataFrame(buys, "ts string, user string, buy_id string").select(
        F.col("ts").cast("timestamp").alias("timestamp"), "user", "buy_id"
    ).write.mode("overwrite").parquet(rsrc)
    schema_l = "timestamp timestamp, user string, click_id string"
    schema_r = "timestamp timestamp, user string, buy_id string"
    s = SStream.files(spark, lsrc, schema=schema_l).join_stream(
        SStream.files(spark, rsrc, schema=schema_r), keys="user", within=60
    )
    q = s.to_memory("t_ssjoin", output_mode="append")
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT user, click_id, buy_id_r FROM t_ssjoin").collect()
    finally:
        q.stop()
    assert [(r["user"], r["click_id"], r["buy_id_r"]) for r in rows] == [("u1", "c1", "p1")]


def test_join_stream_left_outer_emits_unmatched(spark, tmp_path):
    # leftOuter: u2's click has no purchase within 60s -> emitted with NULL
    # right side once the watermark passes (processAllAvailable + an extra
    # batch closes the window for file sources with no more data... file
    # sources advance watermark only on new data, so feed a late row)
    lsrc, rsrc = str(tmp_path / "lclicks"), str(tmp_path / "lbuys")
    clicks = [("2024-01-01 00:00:00", "u1", "c1"), ("2024-01-01 00:10:00", "u2", "c2")]
    buys = [("2024-01-01 00:00:30", "u1", "p1")]

    def _write(rows, schema, path, mode):
        cols = [c.strip().split(" ")[0] for c in schema.split(",")][1:]
        spark.createDataFrame(rows, "ts string, " + ", ".join(
            f"{c} string" for c in cols
        )).select(F.col("ts").cast("timestamp").alias("timestamp"), *cols).write.mode(
            mode
        ).parquet(path)

    _write(clicks, "ts, user, click_id", lsrc, "overwrite")
    _write(buys, "ts, user, buy_id", rsrc, "overwrite")
    s = SStream.files(
        spark, lsrc, schema="timestamp timestamp, user string, click_id string"
    ).join_stream(
        SStream.files(spark, rsrc, schema="timestamp timestamp, user string, buy_id string"),
        keys="user", within=60, how="leftOuter",
    )
    q = s.to_memory("t_ssjoin_lo", output_mode="append")
    try:
        q.processAllAvailable()
        # outer results emit only after the watermark passes the unmatched
        # row's join window AND a subsequent batch evaluates with it —
        # feed much-later rows to both sides, twice (watermark update at
        # batch N is used by batch N+1)
        for ts in ("2024-01-01 01:00:00", "2024-01-01 02:00:00"):
            _write([(ts, "u9", "cx")], "ts, user, click_id", lsrc, "append")
            _write([(ts, "u9", "px")], "ts, user, buy_id", rsrc, "append")
            q.processAllAvailable()
        rows = {
            (r["user"], r["click_id"], r["buy_id_r"])
            for r in spark.sql("SELECT user, click_id, buy_id_r FROM t_ssjoin_lo").collect()
        }
    finally:
        q.stop()
    assert ("u1", "c1", "p1") in rows
    # u2 unmatched row appears with NULL right side (left-outer contract)
    assert ("u2", "c2", None) in rows


def test_distinct_count_approx_keyed(spark, tmp_path):
    src = str(tmp_path / "hll_keyed")
    rows = [
        ("2024-01-01 00:00:05", "a", "x"),
        ("2024-01-01 00:00:10", "a", "y"),
        ("2024-01-01 00:00:20", "b", "x"),
        ("2024-01-01 00:00:25", "b", "x"),
    ]
    df = spark.createDataFrame(rows, "ts string, g string, v string").select(
        F.col("ts").cast("timestamp").alias("timestamp"), "g", "v"
    )
    df.write.mode("overwrite").parquet(src)
    s = SStream.files(
        spark, src, schema="timestamp timestamp, g string, v string"
    ).distinct_count_approx("v", 60, keys=("g",))
    q = s.to_memory("t_hll_k", output_mode="complete")
    try:
        q.processAllAvailable()
        got = {
            r["g"]: r["est_distinct"]
            for r in spark.sql("SELECT g, est_distinct FROM t_hll_k").collect()
        }
    finally:
        q.stop()
    assert got == {"a": 2, "b": 1}


def test_rate_anomaly_stateful_across_batches(spark, tmp_path):
    # streaming twin of operators.timeseries.rate_anomaly: trailing state
    # must survive micro-batch boundaries (file-per-trigger = 2 batches)
    src = str(tmp_path / "ra_src")
    import os

    os.makedirs(src, exist_ok=True)
    batch1 = spark.createDataFrame(
        [(1, 0, 2), (1, 1, 2)], "k long, bucket long, cnt long"
    )
    batch1.coalesce(1).write.mode("append").parquet(src)
    s = SStream.files(
        spark, src, schema="k long, bucket long, cnt long", max_files_per_trigger=1
    ).rate_anomaly("k", bucket="bucket", count_col="cnt", trailing=3)
    q = s.to_memory("t_ranomaly")
    try:
        q.processAllAvailable()
        batch2 = spark.createDataFrame([(1, 2, 8)], "k long, bucket long, cnt long")
        batch2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {
            r["bucket"]: (r["trail_n"], r["trail_k"], r["anomaly_e6"])
            for r in spark.sql("SELECT * FROM t_ranomaly").collect()
        }
    finally:
        q.stop()
    # bucket 0: no history; bucket 1: trailing [2] -> exactly 1.0x;
    # bucket 2 (SECOND micro-batch): trailing [2, 2] carried in state -> 4.0x
    assert got[0] == (0, 0, 0), got
    assert got[1] == (2, 1, 1_000_000), got
    assert got[2] == (4, 2, 4_000_000), got


def test_rate_anomaly_stream_matches_batch_operator(spark, tmp_path):
    # engine-parity: one micro-batch over the full per-key bucket table
    # must reproduce operators.timeseries.rate_anomaly row for row
    from kioss_spark.operators.timeseries import rate_anomaly as batch_ra

    rows = [(k, b, (k * 3 + b * 7) % 11 + 1) for k in (1, 2) for b in range(6)]
    df = spark.createDataFrame(rows, "k long, bucket long, cnt long")
    want = {
        (r["k"], r["bucket"]): (r["trail_n"], r["trail_k"], r["anomaly_e6"])
        for r in batch_ra(df, key="k", bucket="bucket", count_col="cnt").collect()
    }
    src = str(tmp_path / "ra_parity_src")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    s = SStream.files(
        spark, src, schema="k long, bucket long, cnt long"
    ).rate_anomaly("k", bucket="bucket", count_col="cnt", trailing=3)
    q = s.to_memory("t_ra_parity")
    try:
        q.processAllAvailable()
        got = {
            (r["k"], r["bucket"]): (r["trail_n"], r["trail_k"], r["anomaly_e6"])
            for r in spark.sql("SELECT * FROM t_ra_parity").collect()
        }
    finally:
        q.stop()
    assert got == want


def test_heavy_hitters_exact_and_stateful_across_batches(spark, tmp_path):
    # distinct items << k: SpaceSaving summaries are exact counters, and
    # counts must accumulate across micro-batch boundaries
    import os

    src = str(tmp_path / "hh_src")
    os.makedirs(src, exist_ok=True)
    b1 = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 2 + [("c",)], "item string"
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    s = SStream.files(
        spark, src, schema="item string", max_files_per_trigger=1
    ).heavy_hitters("item", k=8, slots=4)
    q = s.to_memory("t_hh", output_mode="update")
    try:
        q.processAllAvailable()
        b2 = spark.createDataFrame([("a",)] * 3 + [("d",)] * 2, "item string")
        b2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM t_hh").collect()
    finally:
        q.stop()
    got = {r["item"]: (r["est_cnt"], r["max_err"]) for r in rows}
    assert got == {"a": (8, 0), "b": (2, 0), "c": (1, 0), "d": (2, 0)}
    # per-slot totals are consistent: summed over distinct slots == N
    slot_totals = {r["slot"]: r["slot_total"] for r in rows}
    assert sum(slot_totals.values()) == 13


def test_heavy_hitters_eviction_keeps_the_heavy_item_bounded_error(spark, tmp_path):
    # k=2 with 5 distinct items forces evictions; the dominant item must
    # survive with est_cnt - max_err <= true <= est_cnt (slots=1 so all
    # items share one summary)
    src = str(tmp_path / "hh_ev_src")
    rows = [("big",)] * 50 + [(f"s{i}",) for i in range(4)]
    spark.createDataFrame(rows, "item string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    s = SStream.files(spark, src, schema="item string").heavy_hitters(
        "item", k=2, slots=1
    )
    q = s.to_memory("t_hh_ev", output_mode="update")
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM t_hh_ev").collect()
    finally:
        q.stop()
    got = {r["item"]: r for r in out}
    assert len(got) == 2 and "big" in got
    big = got["big"]
    assert big["est_cnt"] - big["max_err"] <= 50 <= big["est_cnt"]
    assert big["slot_total"] == 54


def test_foreach_batch_changeset_merge_idempotent_replay(spark, tmp_path):
    # at-least-once sinks replay batches; apply_changeset is a natural
    # idempotent MERGE (delete of an absent id no-ops, upsert is
    # replace-with-same), so re-delivering a batch must leave the state
    # table unchanged — the exactly-once-by-idempotence pattern
    import os

    from kioss_spark.operators.curation import apply_changeset

    state_dir = str(tmp_path / "state")
    src = str(tmp_path / "chg_src")
    os.makedirs(src, exist_ok=True)

    def merge(batch_df, batch_id):
        if os.path.exists(state_dir):
            state = spark.read.parquet(state_dir)
        else:
            state = spark.createDataFrame([], "doc_id long, payload string")
        merged = apply_changeset(state, batch_df).collect()
        mdf = spark.createDataFrame(
            merged or [], "doc_id long, payload string"
        )
        mdf.coalesce(1).write.mode("overwrite").parquet(state_dir)

    b1 = spark.createDataFrame(
        [(1, "a", "upsert"), (2, "b", "upsert")],
        "doc_id long, payload string, op string",
    )
    b2 = spark.createDataFrame(
        [(1, None, "delete"), (3, "c", "upsert")],
        "doc_id long, payload string, op string",
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    s = SStream.files(
        spark, src, schema="doc_id long, payload string, op string",
        max_files_per_trigger=1,
    )
    q = s.foreach_batch(merge)
    try:
        q.processAllAvailable()
        b2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    once = {
        r["doc_id"]: r["payload"] for r in spark.read.parquet(state_dir).collect()
    }
    assert once == {2: "b", 3: "c"}
    # simulate an at-least-once redelivery of the LAST batch
    merge(b2, 99)
    replay = {
        r["doc_id"]: r["payload"] for r in spark.read.parquet(state_dir).collect()
    }
    assert replay == once


def test_stream_static_lsh_dedup_against_signature_table(spark, tmp_path):
    # the streaming twin of incremental_minhash_pairs: a stream of new
    # documents computes LSH band buckets INLINE (minhash_bands_expr —
    # per-row higher-order fns, no agg, so legal in a streaming
    # projection) and stream-static joins the persisted corpus bucket
    # table; candidates surface while the corpus is never re-shingled
    import os

    from pyspark.sql import functions as F

    from kioss_spark.operators.dedup import (
        _band_buckets,
        minhash_bands_expr,
        minhash_signatures,
    )

    corpus = spark.createDataFrame(
        [
            (101, "the quick brown fox jumps over the lazy dog today"),
            (102, "completely unrelated corpus text with many other words"),
        ],
        "doc_id long, text string",
    )
    buckets = _band_buckets(minhash_signatures(corpus, k=32), 32, 8).select(
        F.col("doc_id").alias("corpus_id"), "band", "bh"
    )
    src = str(tmp_path / "newdocs")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(
        [
            (201, "the quick brown fox jumps over the lazy dog today"),
            (202, "novel never seen before content that matches nothing else"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    s = SStream.files(spark, src, schema="doc_id long, text string")
    stream_buckets = s.map(
        doc_id=F.col("doc_id"), b=F.explode(minhash_bands_expr(F.col("text")))
    ).map(doc_id=F.col("doc_id"), band=F.col("b.band"), bh=F.col("b.bh"))
    joined = stream_buckets.enrich(buckets, on=["band", "bh"]).filter(
        F.col("corpus_id").isNotNull()
    )
    q = joined.to_memory("t_ss_lsh")
    try:
        q.processAllAvailable()
        got = {
            (r["doc_id"], r["corpus_id"])
            for r in spark.sql(
                "SELECT DISTINCT doc_id, corpus_id FROM t_ss_lsh"
            ).collect()
        }
    finally:
        q.stop()
    # the verbatim twin collides with its corpus original on every band;
    # the novel doc matches nothing
    assert got == {(201, 101)}


# --- batch/stream parity pins (round 7) ------------------------------------
# Each stateful op must reproduce, across REAL multi-micro-batch execution
# (max_files_per_trigger=1), exactly what the one-shot batch computation
# produces — the incremental state machinery must be invisible in the result.


def _write_batches(df_batches, src):
    for b in df_batches:
        b.coalesce(1).write.mode("append").parquet(src)


def test_window_agg_stream_matches_batch(spark, tmp_path):
    rows = [
        ("2024-01-01 00:00:05", "a", 3),
        ("2024-01-01 00:00:20", "b", 5),
        ("2024-01-01 00:00:59", "a", 2),
        ("2024-01-01 00:01:10", "b", 7),
        ("2024-01-01 00:01:30", "a", 1),
        ("2024-01-01 00:02:15", "b", 4),
        ("2024-01-01 00:02:45", "a", 6),
    ]
    df = spark.createDataFrame(rows, "ts string, k string, v long").select(
        F.col("ts").cast("timestamp").alias("timestamp"), "k", "v"
    )
    want = sorted(
        (r["start"].isoformat(), r["k"], r["n"], r["s"])
        for r in df.groupBy(F.window("timestamp", "60 seconds").alias("window"), "k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .select(F.col("window.start").alias("start"), "k", "n", "s")
        .collect()
    )
    src = str(tmp_path / "wa_parity")
    _write_batches([df.limit(3), df.offset(3).limit(2), df.offset(5)], src)
    s = SStream.files(
        spark,
        src,
        schema="timestamp timestamp, k string, v long",
        max_files_per_trigger=1,
    ).window_agg(60, F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), keys=("k",))
    q = s.to_memory("t_wa_parity", output_mode="complete")
    try:
        q.processAllAvailable()
        got = sorted(
            (r["start"].isoformat(), r["k"], r["n"], r["s"])
            for r in spark.sql(
                "SELECT window.start AS start, k, n, s FROM t_wa_parity"
            ).collect()
        )
    finally:
        q.stop()
    assert got == want, (got, want)


def test_session_agg_stream_matches_batch(spark, tmp_path):
    rows = [
        ("2024-01-01 00:00:00", "u1"),
        ("2024-01-01 00:00:30", "u1"),
        ("2024-01-01 00:00:45", "u2"),
        ("2024-01-01 00:03:00", "u1"),
        ("2024-01-01 00:03:20", "u2"),
        ("2024-01-01 00:03:40", "u2"),
    ]
    df = spark.createDataFrame(rows, "ts string, user string").select(
        F.col("ts").cast("timestamp").alias("timestamp"), "user"
    )
    want = sorted(
        (r["user"], r["start"].isoformat(), r["n"])
        for r in df.groupBy(
            F.session_window("timestamp", "60 seconds").alias("session"), "user"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user", F.col("session.start").alias("start"), "n")
        .collect()
    )
    src = str(tmp_path / "sa_parity")
    _write_batches([df.limit(3), df.offset(3)], src)
    s = SStream.files(
        spark,
        src,
        schema="timestamp timestamp, user string",
        max_files_per_trigger=1,
    ).session_agg(60, F.count(F.lit(1)).alias("n"), keys=("user",))
    q = s.to_memory("t_sa_parity", output_mode="complete")
    try:
        q.processAllAvailable()
        got = sorted(
            (r["user"], r["start"].isoformat(), r["n"])
            for r in spark.sql(
                "SELECT user, session.start AS start, n FROM t_sa_parity"
            ).collect()
        )
    finally:
        q.stop()
    assert got == want, (got, want)


def test_join_stream_matches_batch_range_join(spark, tmp_path):
    clicks = [
        ("2024-01-01 00:00:00", "u1", 1),
        ("2024-01-01 00:00:40", "u2", 2),
        ("2024-01-01 00:02:00", "u1", 3),
        ("2024-01-01 00:05:00", "u3", 4),
    ]
    buys = [
        ("2024-01-01 00:00:30", "u1", 10),
        ("2024-01-01 00:01:05", "u2", 20),
        ("2024-01-01 00:02:20", "u1", 30),
        ("2024-01-01 00:09:00", "u3", 40),  # outside the 60s range -> no pair
    ]
    lc = spark.createDataFrame(clicks, "ts string, user string, cid long").select(
        F.col("ts").cast("timestamp").alias("timestamp"), "user", "cid"
    )
    rc = spark.createDataFrame(buys, "ts string, user string, bid long").select(
        F.col("ts").cast("timestamp").alias("timestamp"), "user", "bid"
    )
    want = sorted(
        (r["user"], r["cid"], r["bid"])
        for r in lc.alias("l")
        .join(
            rc.alias("r"),
            (F.col("l.user") == F.col("r.user"))
            & (
                F.col("r.timestamp").between(
                    F.col("l.timestamp") - F.expr("INTERVAL 60 SECONDS"),
                    F.col("l.timestamp") + F.expr("INTERVAL 60 SECONDS"),
                )
            ),
        )
        .select(F.col("l.user").alias("user"), "cid", "bid")
        .collect()
    )
    lsrc, rsrc = str(tmp_path / "js_l"), str(tmp_path / "js_r")
    _write_batches([lc.limit(2), lc.offset(2)], lsrc)
    _write_batches([rc.limit(2), rc.offset(2)], rsrc)
    ls = SStream.files(
        spark,
        lsrc,
        schema="timestamp timestamp, user string, cid long",
        max_files_per_trigger=1,
    )
    rs = SStream.files(
        spark,
        rsrc,
        schema="timestamp timestamp, user string, bid long",
        max_files_per_trigger=1,
    )
    q = ls.join_stream(rs, "user", within=60).to_memory("t_js_parity")
    try:
        q.processAllAvailable()
        got = sorted(
            (r["user"], r["cid"], r["bid"])
            for r in spark.sql(
                "SELECT user, cid, bid_r AS bid FROM t_js_parity"
            ).collect()
        )
    finally:
        q.stop()
    assert got == want, (got, want)
    assert ("u3", 4, 40) not in got  # the out-of-range pair stayed out


def test_distinct_count_approx_matches_exact_in_sparse_regime(spark, tmp_path):
    # lg_k=12 HLL is EXACT below the sparse->dense transition; the stream's
    # merged micro-batch sketches must therefore equal batch countDistinct
    rows = []
    for m, n_vals in ((0, 17), (1, 29), (2, 8)):
        for i in range(n_vals * 2):  # every value seen twice
            rows.append((f"2024-01-01 00:{m:02d}:{(i * 7) % 60:02d}", f"v{i % n_vals}"))
    df = spark.createDataFrame(rows, "ts string, val string").select(
        F.col("ts").cast("timestamp").alias("timestamp"), "val"
    )
    want = sorted(
        (r["start"].isoformat(), r["n"])
        for r in df.groupBy(F.window("timestamp", "60 seconds").alias("window"))
        .agg(F.countDistinct("val").alias("n"))
        .select(F.col("window.start").alias("start"), "n")
        .collect()
    )
    src = str(tmp_path / "dca_parity")
    third = len(rows) // 3
    _write_batches(
        [df.limit(third), df.offset(third).limit(third), df.offset(2 * third)], src
    )
    s = SStream.files(
        spark,
        src,
        schema="timestamp timestamp, val string",
        max_files_per_trigger=1,
    ).distinct_count_approx("val", window=60)
    q = s.to_memory("t_dca_parity", output_mode="complete")
    try:
        q.processAllAvailable()
        got = sorted(
            (r["start"].isoformat(), r["est_distinct"])
            for r in spark.sql(
                "SELECT window.start AS start, est_distinct FROM t_dca_parity"
            ).collect()
        )
    finally:
        q.stop()
    assert got == want, (got, want)


def test_dq_monitor_cumulative_batch_parity(spark, tmp_path):
    # 3 files -> 3 micro-batches (maxFilesPerTrigger=1): the cumulative
    # totals after processAllAvailable must equal the batch dq gate's
    # conditional sums over the SAME rows (shared null-as-violation rule)
    src = str(tmp_path / "dq_src")
    rows = [
        (0, "good text", "en"),
        (1, None, "en"),          # null text
        (2, "ok", "xx"),          # bad lang
        (3, "fine", None),        # null lang -> violation
        (4, "also good", "de"),
        (5, None, "zz"),          # both
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    df.repartition(3).write.mode("overwrite").parquet(src)

    checks = {
        "null_text": F.col("text").isNull(),
        "bad_lang": ~F.col("lang").isin("de", "en", "es", "fr", "zh"),
    }
    s = SStream.files(
        spark, src, schema="doc_id long, text string, lang string",
        max_files_per_trigger=1,
    ).dq_monitor(checks)
    q = s.to_memory("t_dq", output_mode="complete")
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM t_dq").collect()
    finally:
        q.stop()
    assert len(got) == 1
    r = got[0]
    expect = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[
            F.sum(F.when(F.coalesce(c, F.lit(True)), 1).otherwise(0))
            .cast("long")
            .alias(n)
            for n, c in checks.items()
        ],
    ).collect()[0]
    assert r["n_rows"] == expect["n_rows"] == 6
    assert r["null_text"] == expect["null_text"] == 2
    assert r["bad_lang"] == expect["bad_lang"] == 3


def test_heavy_hitters_kill_and_resume_from_checkpoint(spark, tmp_path):
    # the other half of the exactly-once claim: kill a stateful query
    # mid-stream and resume it from its checkpoint — the SpaceSaving
    # summaries must CONTINUE (batch-1 counts survive the restart) and
    # batch 1 must not be re-emitted (offsets recovered too)
    src = str(tmp_path / "hh_res_src")
    ckpt = str(tmp_path / "hh_res_ckpt")
    os.makedirs(src, exist_ok=True)

    def pipeline():
        return SStream.files(
            spark, src, schema="item string", max_files_per_trigger=1
        ).heavy_hitters("item", k=8, slots=1)

    emitted: list[tuple[int, list]] = []

    def capture(batch_df, batch_id):
        emitted.append((batch_id, batch_df.collect()))

    b1 = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 2 + [("c",)], "item string"
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    q1 = pipeline().foreach_batch(capture, output_mode="update", checkpoint=ckpt)
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()  # the kill
    pre = {r["item"]: r["est_cnt"] for _, rows in emitted for r in rows}
    assert pre == {"a": 5, "b": 2, "c": 1}

    emitted.clear()
    b2 = spark.createDataFrame([("a",)] * 3 + [("d",)] * 2, "item string")
    b2.coalesce(1).write.mode("append").parquet(src)
    q2 = pipeline().foreach_batch(capture, output_mode="update", checkpoint=ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    post_rows = [r for _, rows in emitted for r in rows]
    post = {r["item"]: (r["est_cnt"], r["max_err"]) for r in post_rows}
    # cumulative ACROSS the restart: a = 5 (pre-kill) + 3 (post-resume)
    assert post["a"] == (8, 0)
    assert post["d"] == (2, 0)
    # counters stayed exact and the slot total spans both batches
    assert all(r["slot_total"] == 13 for r in post_rows)
    # batch 1 was not replayed: exactly one post-resume micro-batch
    assert len(emitted) == 1


def test_dq_monitor_kill_and_resume_from_checkpoint(spark, tmp_path):
    # the cumulative DQ counters are ONE state row; killing the monitor
    # and resuming from its checkpoint must continue the running totals
    # over post-restart arrivals, not restart them from zero
    src = str(tmp_path / "dq_res_src")
    ckpt = str(tmp_path / "dq_res_ckpt")
    os.makedirs(src, exist_ok=True)
    checks_sql = {
        "null_text": "text IS NULL",
        "bad_lang": "lang NOT IN ('de', 'en', 'es', 'fr', 'zh')",
    }

    def pipeline():
        return SStream.files(
            spark, src, schema="doc_id long, text string, lang string",
            max_files_per_trigger=1,
        ).dq_monitor({n: F.expr(c) for n, c in checks_sql.items()})

    emitted: list[tuple[int, list]] = []

    def capture(batch_df, batch_id):
        emitted.append((batch_id, batch_df.collect()))

    b1 = spark.createDataFrame(
        [(0, "good", "en"), (1, None, "en"), (2, "ok", "xx")],
        "doc_id long, text string, lang string",
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    q1 = pipeline().foreach_batch(capture, output_mode="update", checkpoint=ckpt)
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()  # the kill
    assert emitted and emitted[-1][1][0]["n_rows"] == 3

    emitted.clear()
    b2 = spark.createDataFrame(
        [(3, "fine", None), (4, None, "zz"), (5, "also good", "de")],
        "doc_id long, text string, lang string",
    )
    b2.coalesce(1).write.mode("append").parquet(src)
    q2 = pipeline().foreach_batch(capture, output_mode="update", checkpoint=ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert len(emitted) == 1  # batch 1 not replayed
    r = emitted[0][1][0]
    # totals CONTINUE across the restart: 3 + 3 rows, 1+1 null_text
    # (rows 1, 4), 1+2 bad_lang (rows 2, 3-null-lang, 4)
    assert (r["n_rows"], r["null_text"], r["bad_lang"]) == (6, 2, 3)


def test_cms_monitor_matches_batch_counters(spark, tmp_path):
    # the streaming counter grid after two micro-batches must equal the
    # batch cms_counters over the SAME rows — CMS mergeability under
    # micro-batching (counters add, no approximation drift)
    from kioss_spark.operators.sketch import cms_counters

    src = str(tmp_path / "cms_src")
    os.makedirs(src, exist_ok=True)
    b1 = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)], "item string"
    )
    b2 = spark.createDataFrame([("a",)] * 2 + [("d",)] * 4, "item string")
    b1.coalesce(1).write.mode("append").parquet(src)
    s = SStream.files(
        spark, src, schema="item string", max_files_per_trigger=1
    ).cms_monitor("item", d=4, w=8)
    q = s.to_memory("t_cms", output_mode="complete")
    try:
        q.processAllAvailable()
        b2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {
            (r["row"], r["bucket"]): r["n"]
            for r in spark.sql("SELECT * FROM t_cms").collect()
        }
    finally:
        q.stop()
    want = {
        (r["row"], r["bucket"]): r["n"]
        for r in cms_counters(b1.unionByName(b2), F.col("item"), d=4, w=8).collect()
    }
    assert got == want
    # grid-boundedness: every hash row's counters sum to the stream length
    for j in range(4):
        assert sum(n for (row, _), n in got.items() if row == j) == 15


def _dropped_by_watermark(q) -> int:
    return sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in (p.get("stateOperators") or [])
    )


def test_window_agg_drops_and_surfaces_late_rows(spark, tmp_path):
    # the late-data contract has TWO halves: rows older than the
    # watermark must be dropped from the aggregates (batch 1's window
    # stays frozen) AND the drop must be observable in query progress
    # (numRowsDroppedByWatermark) — a silently shrinking aggregate is
    # the failure mode watermark observability exists to catch
    import os

    src = str(tmp_path / "late_win_src")
    os.makedirs(src, exist_ok=True)
    b1 = spark.createDataFrame(
        [("2024-01-01 00:00:05",), ("2024-01-01 00:00:20",),
         ("2024-01-01 00:00:59",), ("2024-01-01 00:03:00",)],
        "ts string",
    ).select(F.col("ts").cast("timestamp").alias("timestamp"))
    b1.coalesce(1).write.mode("append").parquet(src)
    s = SStream.files(
        spark, src, schema="timestamp timestamp", max_files_per_trigger=1
    ).window_agg(60, F.count(F.lit(1)).alias("n"))
    q = s.to_memory("t_late_win", output_mode="update")
    try:
        q.processAllAvailable()
        # after batch 1 the watermark is max_event - 60s = 00:02:00, so
        # the [00:00, 00:01) window is closed; 00:00:30 is LATE, 00:03:10
        # is on time and keeps the batch non-empty
        b2 = spark.createDataFrame(
            [("2024-01-01 00:00:30",), ("2024-01-01 00:03:10",)], "ts string"
        ).select(F.col("ts").cast("timestamp").alias("timestamp"))
        b2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {}
        for r in spark.sql(
            "SELECT window.start AS start, n FROM t_late_win"
        ).collect():
            key = r["start"].isoformat()
            got[key] = max(got.get(key, 0), r["n"])
        dropped = _dropped_by_watermark(q)
    finally:
        q.stop()
    # the late 00:00:30 row must NOT have re-opened the closed window...
    assert got["2024-01-01T00:00:00"] == 3, got
    # ...and the window holding the on-time row grew to 2
    assert got["2024-01-01T00:03:00"] == 2, got
    # the drop is SURFACED, not silent
    assert dropped == 1, dropped


def test_dq_monitor_windowed_drops_and_surfaces_late_rows(spark, tmp_path):
    # the windowed DQ gate: per-window violation counts freeze at the
    # watermark, the late violation is dropped AND counted in progress —
    # so a compliance report can state exactly how many rows it excluded
    import os

    src = str(tmp_path / "late_dq_src")
    os.makedirs(src, exist_ok=True)
    b1 = spark.createDataFrame(
        [("2024-01-01 00:00:10", 5), ("2024-01-01 00:00:40", -1),
         ("2024-01-01 00:03:00", 7)],
        "ts string, value int",
    ).select(F.col("ts").cast("timestamp").alias("timestamp"), "value")
    b1.coalesce(1).write.mode("append").parquet(src)
    s = SStream.files(
        spark, src, schema="timestamp timestamp, value int",
        max_files_per_trigger=1,
    ).dq_monitor({"neg_value": F.col("value") < 0}, window=60)
    q = s.to_memory("t_late_dq", output_mode="update")
    try:
        q.processAllAvailable()
        # watermark is now 00:02:00; a late VIOLATION at 00:00:45 must
        # not mutate the closed window's report
        b2 = spark.createDataFrame(
            [("2024-01-01 00:00:45", -9), ("2024-01-01 00:03:20", 1)],
            "ts string, value int",
        ).select(F.col("ts").cast("timestamp").alias("timestamp"), "value")
        b2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {}
        for r in spark.sql(
            "SELECT window.start AS start, n_rows, neg_value FROM t_late_dq"
        ).collect():
            key = r["start"].isoformat()
            prev = got.get(key, (0, 0))
            got[key] = max(prev, (r["n_rows"], r["neg_value"]))
        dropped = _dropped_by_watermark(q)
    finally:
        q.stop()
    assert got["2024-01-01T00:00:00"] == (2, 1), got  # frozen: late -9 excluded
    assert got["2024-01-01T00:03:00"] == (2, 0), got
    assert dropped == 1, dropped


def test_window_agg_sliding_overlapping_windows(spark, tmp_path):
    # slide= was implemented in round 6 but never pinned: a 60s window
    # sliding by 30s must assign each event to BOTH overlapping windows,
    # and counts must match the batch F.window() semantics exactly
    src = str(tmp_path / "slide_src")
    rows = [("2024-01-01 00:00:10",), ("2024-01-01 00:00:40",),
            ("2024-01-01 00:01:10",)]
    df = spark.createDataFrame(rows, "ts string").select(
        F.col("ts").cast("timestamp").alias("timestamp")
    )
    df.coalesce(1).write.mode("overwrite").parquet(src)
    s = SStream.files(
        spark, src, schema="timestamp timestamp"
    ).window_agg(60, F.count(F.lit(1)).alias("n"), slide=30)
    q = s.to_memory("t_slide", output_mode="complete")
    try:
        q.processAllAvailable()
        got = {
            r["start"].isoformat(): r["n"]
            for r in spark.sql(
                "SELECT window.start AS start, n FROM t_slide"
            ).collect()
        }
    finally:
        q.stop()
    # event 00:00:10 -> windows starting 23:59:30 and 00:00:00;
    # 00:00:40 -> 00:00:00 (wait: also 00:00:30); 00:01:10 -> 00:00:30? no:
    # windows are [start, start+60) for start in multiples of 30
    assert got == {
        "2023-12-31T23:59:30": 1,  # covers 00:00:10
        "2024-01-01T00:00:00": 2,  # covers 00:00:10, 00:00:40
        "2024-01-01T00:00:30": 2,  # covers 00:00:40, 00:01:10
        "2024-01-01T00:01:00": 1,  # covers 00:01:10
    }, got


def test_bm25_streaming_ingest_kill_and_resume(spark, tmp_path):
    # the sparse index stays fresh under a document stream: each
    # micro-batch folds into the stored stats by the additive merge law
    # (operators/retrieval.py bm25_index_sink), the query is KILLED
    # between batches and resumed from its checkpoint, and the
    # post-restart index must serve scores EQUAL to a from-scratch batch
    # computation over everything ingested — plus an at-least-once
    # redelivery of the last batch must change nothing (the
    # transactional batch-id versioning)
    from kioss_spark.operators import retrieval

    src = str(tmp_path / "bm25_src")
    ckpt = str(tmp_path / "bm25_ckpt")
    state = str(tmp_path / "bm25_state")
    os.makedirs(src, exist_ok=True)

    def pipeline():
        s = SStream.files(
            spark, src, schema="doc_id long, text string",
            max_files_per_trigger=1,
        )
        inv = s._df.select(
            "doc_id",
            F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias(
                "term"
            ),
        )
        return (
            inv.writeStream.foreachBatch(retrieval.bm25_index_sink(state))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    docs1 = [(1, "sun moon star"), (2, "sun sun sea"), (3, "sky sea moon sky")]
    docs2 = [(4, "star star sun"), (5, "moon sea")]
    spark.createDataFrame(docs1, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(src)
    q1 = pipeline()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()  # the kill
    v1, tfdl1, _, g1 = retrieval.read_bm25_index(spark, state)
    assert v1 == 0 and g1.collect()[0]["n_docs"] == 3

    spark.createDataFrame(docs2, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(src)
    q2 = pipeline()  # resume from the same checkpoint
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    v2, tfdl, df, g = retrieval.read_bm25_index(spark, state)
    assert v2 == 1  # batch 0 not replayed: offsets recovered

    # post-restart scores == the batch oracle over the full corpus
    q = spark.createDataFrame(
        [(0, "sun"), (0, "moon"), (1, "sea")], "query_id long, term string"
    )
    served = sorted(
        (r["query_id"], r["doc_id"], r["score_e6"])
        for r in retrieval.bm25_score_topk(tfdl, df, g, q, k=10).collect()
    )
    docs_all = {d: t.split() for d, t in docs1 + docs2}
    expect = []
    for qid, terms in [(0, ["sun", "moon"]), (1, ["sea"])]:
        for d, s in retrieval.bm25_score_py(docs_all, terms).items():
            expect.append((qid, d, s))
    assert served == sorted(expect)

    # at-least-once redelivery of the LAST batch: same version recomputed
    # from the same inputs (or skipped) — the index must not double-count
    replay = spark.createDataFrame(docs2, "doc_id long, text string").select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias(
            "term"
        ),
    )
    retrieval.bm25_index_sink(state)(replay, 1)
    v3, tfdl3, df3, g3, bounds3 = retrieval.read_bm25_index(
        spark, state, with_bounds=True
    )
    assert v3 == 1
    served3 = sorted(
        (r["query_id"], r["doc_id"], r["score_e6"])
        for r in retrieval.bm25_score_topk(tfdl3, df3, g3, q, k=10).collect()
    )
    assert served3 == served
    # round-12: the stored max-score bounds ride the same versioned state
    # (max-merge law) — after kill, resume, AND replay they equal a
    # from-scratch bounds build over the full corpus
    scratch_bounds = retrieval.bm25_term_bounds(tfdl3)
    assert sorted(map(tuple, bounds3.collect())) == sorted(
        map(tuple, scratch_bounds.collect())
    )
    # and the pruned serving path over the STORED index (stored bounds,
    # no corpus pass) matches the unpruned scores exactly
    pruned = sorted(
        (r["query_id"], r["doc_id"], r["score_e6"])
        for r in retrieval.bm25_maxscore_topk(
            tfdl3, df3, g3, q, k=10, bounds=bounds3
        ).collect()
    )
    assert pruned == served


def test_kmv_state_streaming_kill_and_resume(spark, tmp_path):
    # the sketch warehouse stays fresh under a token stream: each
    # micro-batch merges into the stored KMV state by the set-union law
    # (operators/sketch.py kmv_state_sink). The query is KILLED between
    # batches and resumed from its checkpoint; post-restart estimates
    # must equal a from-scratch computation over everything ingested.
    # Unlike bm25_index_sink there is NO batch-id skip gate — the merge
    # is idempotent, so an out-of-band redelivery changes nothing.
    from kioss_spark.operators import sketch

    src = str(tmp_path / "kmv_src")
    ckpt = str(tmp_path / "kmv_ckpt")
    state = str(tmp_path / "kmv_state")
    os.makedirs(src, exist_ok=True)

    def pipeline():
        s = SStream.files(
            spark, src, schema="g string, v string",
            max_files_per_trigger=1,
        )
        return (
            s._df.writeStream.foreachBatch(
                sketch.kmv_state_sink(state, "v", by=["g"], k=8)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    batch1 = [("a", f"t{i}") for i in range(20)] + [("b", "t1")]
    batch2 = [("a", f"u{i}") for i in range(20)] + [("c", "t2")]
    spark.createDataFrame(batch1, "g string, v string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q1 = pipeline()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()  # the kill
    v1, st1 = sketch.read_kmv_state(spark, state)
    assert v1 == 0 and st1.count() == 2  # groups a, b

    spark.createDataFrame(batch2, "g string, v string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q2 = pipeline()  # resume from the same checkpoint
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    v2, st2 = sketch.read_kmv_state(spark, state)
    assert v2 == 1  # batch 0 not replayed: offsets recovered

    # post-restart state == from-scratch over the full ingest
    full = spark.createDataFrame(batch1 + batch2, "g string, v string")
    scratch = {
        r["g"]: r["hashes"]
        for r in sketch.kmv_state(full, F.col("v"), by=["g"], k=8).collect()
    }
    assert {r["g"]: r["hashes"] for r in st2.collect()} == scratch

    # at-least-once redelivery of the LAST batch: the idempotent merge
    # writes a NEW version with IDENTICAL content — no skip gate needed
    sketch.kmv_state_sink(state, "v", by=["g"], k=8)(
        spark.createDataFrame(batch2, "g string, v string"), 1
    )
    v3, st3 = sketch.read_kmv_state(spark, state)
    assert v3 == 2
    assert {r["g"]: r["hashes"] for r in st3.collect()} == scratch


def test_manifest_sink_streaming_exactly_once_visibility(spark, tmp_path):
    # the stats_index manifest is the SOURCE OF TRUTH for a streaming
    # parquet table (operators/skew.py manifest_sink): each batch's
    # files become visible only when its manifest version commits, so a
    # kill between batches, a resume, and a crash-window simulation all
    # keep manifest readers exact; skipping_scan over the live manifest
    # equals full-scan-and-filter
    from kioss_spark.operators.skew import (
        manifest_sink,
        read_manifest,
        read_via_manifest,
        skipping_scan,
    )

    src = str(tmp_path / "mf_src")
    ckpt = str(tmp_path / "mf_ckpt")
    data = str(tmp_path / "mf_data")
    manifest = str(tmp_path / "mf_manifest")
    os.makedirs(src, exist_ok=True)

    def pipeline():
        s = SStream.files(
            spark, src, schema="x long, payload string",
            max_files_per_trigger=1,
        )
        return (
            s._df.writeStream.foreachBatch(
                manifest_sink(data, manifest, ["x"])
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    b1 = [(i, f"p{i}") for i in range(100)]
    b2 = [(i, f"p{i}") for i in range(100, 250)]
    spark.createDataFrame(b1, "x long, payload string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q1 = pipeline()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()  # the kill
    assert read_via_manifest(spark, manifest).count() == 100

    spark.createDataFrame(b2, "x long, payload string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q2 = pipeline()  # resume from the same checkpoint
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    # the manifest-defined table is exactly everything ingested
    got = sorted(map(tuple, read_via_manifest(spark, manifest).collect()))
    assert got == sorted(b1 + b2)

    # skipping_scan over the live manifest == full filter
    idx = read_manifest(spark, manifest)
    pruned = skipping_scan(spark, data, ranges={"x": (40, 140)}, index=idx)
    assert sorted(map(tuple, pruned.collect())) == sorted(
        (x, p) for x, p in b1 + b2 if 40 <= x <= 140
    )

    # crash-window simulation: a data directory WITHOUT a snapshot that
    # lists it is invisible (write order: data first, snapshot commits)
    spark.createDataFrame(
        [(999, "uncommitted")], "x long, payload string"
    ).write.mode("overwrite").parquet(f"{data}/batch_99")
    assert read_via_manifest(spark, manifest).count() == 250
    # the replay never touches the crashed directory (the ADVICE r11
    # replay race): it writes a FRESH uniquely-named one and commits a
    # snapshot pointing at it — the orphan stays on disk for vacuum
    manifest_sink(data, manifest, ["x"])(
        spark.createDataFrame([(999, "committed")], "x long, payload string"),
        99,
    )
    rows = read_via_manifest(spark, manifest)
    assert rows.count() == 251
    assert rows.where("x = 999").collect()[0]["payload"] == "committed"
    # a re-replay of the now-marker-committed batch is a no-op
    manifest_sink(data, manifest, ["x"])(
        spark.createDataFrame([(999, "dup")], "x long, payload string"),
        99,
    )
    rows2 = read_via_manifest(spark, manifest)
    assert rows2.count() == 251
    assert rows2.where("x = 999").collect()[0]["payload"] == "committed"
    # vacuum collects the crashed orphan directory; the served table is
    # bit-identical before/after
    from kioss_spark.operators.skew import vacuum

    before = sorted(map(tuple, read_via_manifest(spark, manifest).collect()))
    audit = vacuum(spark, data, manifest).collect()[0]
    assert audit["files_deleted"] >= 1  # the batch_99 orphan part-file
    after = sorted(map(tuple, read_via_manifest(spark, manifest).collect()))
    assert after == before
    assert not os.path.exists(f"{data}/batch_99")
