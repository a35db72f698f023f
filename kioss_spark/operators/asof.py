"""Generic as-of join — Spark has no native one (SURVEY.md §2.5).

``asof_join(left, right, ...)`` answers "for each left row, the most recent
right row at or before it" (direction='backward'; 'forward' is the mirror)
per key — the trades/quotes join, the last-signup-before-event join, the
config-active-at-time join.

Physical design (the part that matters at 100 TB): NEVER materialize
(left × candidate-right) pairs. Both sides are unioned and shuffled ONCE on
the key; within each key partition a running ``last(..., ignorenulls)``
window ordered by (time, side) carries the right payload forward onto left
rows. Cost = one keyed shuffle + one sort — same as a single groupBy, and
AQE's skew handling applies to the key shuffle as usual. A pairwise
range-join formulation is O(|L|·|R|) per key and dies on hot keys.

Reference parity: the reference has no join at all (it is a linear-stream
library); this is §2.5 "capabilities ours must add". DuckDB's native
ASOF JOIN is the correctness oracle (see queries/relational.py
asof_last_purchase).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Union[str, Sequence[str]],
    values: Optional[Sequence[str]] = None,
    direction: str = "backward",
    tolerance: Optional[Column] = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the nearest preceding (backward) or
    following (forward) right row's ``values`` columns, matched per ``by``
    key on ordering column ``on`` (inclusive).

    ``tolerance``: optional max distance (an interval Column for timestamps,
    e.g. ``F.expr("INTERVAL 1 HOUR")``); matches farther than it are nulled.
    Value columns arrive suffixed when they collide with left's names.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [by] if isinstance(by, str) else list(by)
    if values is None:
        values = [c for c in right.columns if c not in keys and c != on]
    out_names = {
        v: (v + suffix if v in left.columns else v) for v in values
    }
    r_on = "__asof_on__" + suffix

    r = right.select(
        *keys,
        F.col(on).alias(r_on),
        *[F.col(v).alias(out_names[v]) for v in values],
        F.lit(0).alias("__side__"),
    )
    l = left.select(
        "*",
        F.lit(1).alias("__side__"),
    )
    unioned = l.unionByName(r.withColumn(on, F.col(r_on)), allowMissingColumns=True)

    # right rows sort before left rows at the same `on` value -> inclusive
    order = [F.col(on), F.col("__side__")]
    if direction == "forward":
        order = [F.col(on).desc(), F.col("__side__")]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last(F.col(r_on), ignorenulls=True).over(w).alias("__m_on__"),
        *[
            F.last(F.col(out_names[v]), ignorenulls=True).over(w).alias("__m_" + v)
            for v in values
        ],
    )
    result = carried.where(F.col("__side__") == 1)
    if tolerance is not None:
        dist_ok = (
            F.col(on) - F.col("__m_on__") <= tolerance
            if direction == "backward"
            else F.col("__m_on__") - F.col(on) <= tolerance
        )
    keep = [c for c in left.columns]
    sel = [F.col(c) for c in keep]
    for v in values:
        matched = F.col("__m_" + v)
        if tolerance is not None:
            matched = F.when(dist_ok, matched)
        sel.append(matched.alias(out_names[v]))
    return result.select(*sel)
