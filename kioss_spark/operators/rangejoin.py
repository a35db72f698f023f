"""Range (interval) join: points joined to the intervals containing them.

Spark has no native range-join strategy — a plain ``ts BETWEEN s AND e``
predicate without an equi-key plans as BroadcastNestedLoopJoin (quadratic,
the classic 100 TB killer). The scale-correct design is *chunking*: bucket
time into fixed windows, explode each interval over the chunks it overlaps,
tag each point with its single chunk, and equi-join on (keys..., chunk)
before applying the exact range predicate.

Cost model: the interval side is copied ``len/W + 1`` times (W = chunk
width); the join becomes a keyed hash shuffle with bounded fan-out instead
of a cartesian product. Pick W near the median interval length: wider W
means fewer copies but more false candidates per chunk, narrower W the
reverse. A (point, interval) pair shares exactly ONE chunk — the point has
one chunk and the interval covers it once — so no post-join dedup is
needed.

Reference parity note: the reference has no joins at all (SURVEY.md §2.5);
this is engine-extension surface, same family as operators.asof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kioss_spark.functions.timeutil import epoch_us

__all__ = ["interval_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    keys: tuple = (),
    chunk_seconds: int = 600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point_ts <= end`` (and equal ``keys``, if given).

    Both inputs must have disjoint column names apart from ``keys``.
    ``how='left'`` keeps unmatched points (interval columns null).
    """
    # epoch arithmetic via timeutil.epoch_us: timestamps are canonical
    # TIMESTAMP_NTZ (unix_micros hard-fails on NTZ, and implicit coercion
    # would be session-timezone-dependent)
    w = int(chunk_seconds) * 1_000_000  # micros
    p = points.withColumn("__chunk__", F.floor(epoch_us(F.col(point_ts)) / w))
    i = intervals.withColumn(
        "__chunk__",
        F.explode(
            F.sequence(
                F.floor(epoch_us(F.col(start_col)) / w),
                F.floor(epoch_us(F.col(end_col)) / w),
            )
        ),
    )
    on = [*keys, "__chunk__"]
    in_range = (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    if how == "inner":
        return p.join(i, on, "inner").where(in_range).drop("__chunk__")
    if how == "left":
        # left: the range predicate must live IN the join condition so a
        # point whose chunks match but ranges don't still survives as null
        matched = p.join(i, on, "inner").where(in_range)
        only_p = points.join(
            matched.select(*[F.col(c) for c in points.columns]).distinct(),
            list(points.columns),
            "left_anti",
        )
        for c in matched.columns:
            if c not in points.columns and c != "__chunk__":
                only_p = only_p.withColumn(c, F.lit(None).cast(dict(matched.dtypes)[c]))
        return matched.drop("__chunk__").unionByName(only_p, allowMissingColumns=True)
    raise ValueError(f"interval_join: unsupported how={how!r} (inner|left)")
