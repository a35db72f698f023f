"""Time-series regularization — dense-grid gap-fill + LOCF.

The hypertable operator family's missing member next to the hourly rollup
(queries/relational.py rollup_hourly_events) and the as-of join
(operators/asof.py): resample an already-bucketed per-key series onto a
dense per-key grid (every ``step`` seconds between that key's first and
last observation), zero-filling counts and forward-filling (last
observation carried forward) measure columns — TimescaleDB's
``time_bucket_gapfill`` + ``locf`` shape, expressed as narrow Spark
column algebra.

Scale design: the grid is generated per key with ``sequence`` + ``explode``
(narrow — no shuffle, fan-out bounded by span/step per key); the span
lookup is one keyed agg; the join back to observations is keyed on
(key, bucket); LOCF is a keyed running ``last(ignorenulls)`` window —
never a global window. Grid cardinality is keys x span/step: at 100 TB
bound the span (WHERE on the time column, pushed to the scan) before
gap-filling, exactly as a time-series store bounds gapfill queries.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["gapfill_locf", "rate_anomaly"]


def rate_anomaly(
    per_bucket: DataFrame,
    key: str = "user_id",
    bucket: str = "bucket",
    count_col: str = "cnt",
    trailing: int = 3,
) -> DataFrame:
    """Per-key event-rate anomaly score: each (key, bucket) count compared
    to the mean of the previous ``trailing`` observed buckets —
    ``anomaly_e6 = floor(1e6 * cnt * trail_k / trail_n)`` (current rate
    over trailing mean, 1e6 = exactly the trailing average). The burst /
    outage detector a monitoring or abuse pipeline runs per entity; the
    z-score variant needs a stddev whose float accumulation is engine-
    dependent, so this ships the rational-integer form (bit-exact in SQL)
    — ordering by anomaly score is what thresholding consumes anyway.

    Scale shape: input is the already-bucketed per-key count table (one
    keyed agg upstream); the trailing frame is a keyed ROWS window
    (PARTITION BY key ORDER BY bucket, deterministic because (key,
    bucket) is unique) — never a global window. Buckets with no trailing
    history (``trail_k`` 0) emit anomaly NULL-as-0 with ``trail_k`` 0 so
    the consumer can mask the warm-up. Integer arithmetic only."""
    w = (
        Window.partitionBy(key)
        .orderBy(bucket)
        .rowsBetween(-trailing, -1)
    )
    trail_n = F.coalesce(F.sum(count_col).over(w), F.lit(0)).cast("long")
    trail_k = F.count(count_col).over(w).cast("long")
    return per_bucket.select(
        F.col(key),
        F.col(bucket),
        F.col(count_col).cast("long").alias(count_col),
        trail_n.alias("trail_n"),
        trail_k.alias("trail_k"),
        F.when(
            trail_n > 0,
            F.floor(F.lit(1000000.0) * F.col(count_col) * trail_k / trail_n),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("anomaly_e6"),
    )


def gapfill_locf(
    per_bucket: DataFrame,
    keys: Sequence[str],
    bucket: str = "bucket",
    step: int = 3600,
    zero_cols: Sequence[str] = (),
    locf_cols: Sequence[str] = (),
) -> DataFrame:
    """Densify ``per_bucket`` (one row per (keys, bucket) observation,
    bucket in epoch seconds) onto every ``step``-aligned bucket between
    each key's min and max observed bucket. ``zero_cols`` fill gaps with
    0 (counts); ``locf_cols`` carry the last observed value forward
    (never NULL: each key's grid starts at its first observation).
    Adds ``is_gap`` marking synthesized rows.
    """
    klist = list(keys)
    span = per_bucket.groupBy(*klist).agg(
        F.min(bucket).alias("__b0__"), F.max(bucket).alias("__b1__")
    )
    grid = span.select(
        *klist,
        F.explode(
            F.sequence(F.col("__b0__"), F.col("__b1__"), F.lit(step))
        ).alias(bucket),
    )
    joined = grid.join(per_bucket, klist + [bucket], "left")
    w = (
        Window.partitionBy(*klist)
        .orderBy(bucket)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out_cols = [*klist, bucket]
    gap_probe = zero_cols[0] if zero_cols else (locf_cols[0] if locf_cols else None)
    for c in zero_cols:
        out_cols.append(F.coalesce(F.col(c), F.lit(0)).alias(c))
    for c in locf_cols:
        out_cols.append(F.last(F.col(c), ignorenulls=True).over(w).alias(c))
    if gap_probe is None:
        raise ValueError("gapfill_locf needs at least one zero_col or locf_col")
    out_cols.append(F.col(gap_probe).isNull().alias("is_gap"))
    return joined.select(*out_cols)
