"""Session-independent timestamp algebra.

The driver's test tables store wall-clock timestamps (parquet
``isAdjustedToUTC=false``), which Spark 4 reads as ``TIMESTAMP_NTZ`` and
DuckDB as naive ``TIMESTAMP``. Two classes of bugs appear the moment code
mixes NTZ with session-zoned ``TIMESTAMP``:

1. ``F.unix_micros`` (and friends) require ``TIMESTAMP`` and hard-fail on
   NTZ (``DATATYPE_MISMATCH`` — the round-2 ``sessionize_events`` crash).
2. Implicit NTZ↔TIMESTAMP coercion goes through the *session timezone*
   (``F.lit(s).cast("timestamp")`` compared against an NTZ column;
   ``F.date_trunc`` on an NTZ column returns a session-zoned TIMESTAMP), so
   results silently depend on ``spark.sql.session.timeZone`` — correct under
   one session, wrong under another.

The rules this module encodes:

- the canonical event-time type across the engine is **TIMESTAMP_NTZ**
  (wall-clock — what parquet stores and what the DuckDB oracle computes on);
- epoch arithmetic uses ``timestamp_diff``/``timestamp_add`` against an NTZ
  epoch literal — pure wall-clock arithmetic, no timezone ever consulted;
- timestamp literals are cast to ``timestamp_ntz``, never ``timestamp``;
- query outputs never carry raw session-zoned TIMESTAMP columns (emit NTZ,
  epoch integers, or formatted strings instead).

All expressions here stay inside whole-stage codegen (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ntz_lit", "epoch_us", "epoch_s", "ntz_from_epoch_us", "to_ntz"]


def _epoch() -> Column:
    """NTZ epoch literal — the zero point for wall-clock epoch arithmetic."""
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ntz_lit(value: str) -> Column:
    """A wall-clock timestamp literal (``TIMESTAMP_NTZ``).

    Comparing this against an NTZ column never consults the session
    timezone; ``F.lit(value).cast("timestamp")`` would.
    """
    return F.lit(value).cast("timestamp_ntz")


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch of an NTZ wall-clock value (bigint).

    ``timestamp_diff(MICROSECOND, ntz_epoch, ts)`` is wall-clock
    subtraction — identical in every session timezone, and identical to
    DuckDB's ``epoch_us(ts)`` on the same naive value. (``F.unix_micros``
    is NOT usable here: it requires session-zoned TIMESTAMP input.)
    """
    return F.timestamp_diff("MICROSECOND", _epoch(), _c(col))


def epoch_s(col: Column | str) -> Column:
    """Whole seconds since epoch of an NTZ value (bigint, floor)."""
    return F.floor(epoch_us(col) / F.lit(1_000_000)).cast("long")


def ntz_from_epoch_us(col: Column | str) -> Column:
    """Epoch-microseconds (bigint) → ``TIMESTAMP_NTZ`` wall clock.

    Split into SECOND + MICROSECOND adds because ``timestamp_add``'s
    quantity is 32-bit: epoch micros (~1.7e15) overflow it, epoch seconds
    (~1.7e9) don't (good through 2038; the driver data is 2024).
    """
    us = _c(col)
    return F.timestamp_add(
        "MICROSECOND",
        (us % F.lit(1_000_000)).cast("int"),
        F.timestamp_add("SECOND", (us / F.lit(1_000_000)).cast("int"), _epoch()),
    )


def to_ntz(df: DataFrame, colname: str) -> DataFrame:
    """Normalize a column to canonical ``TIMESTAMP_NTZ`` whatever the reader
    delivered:

    - ``timestamp_ntz``: kept as-is (the Spark 4 default read of the
      driver's TIMESTAMP(NANOS) parquet — truncates to micros exactly like
      DuckDB's ``CAST(ts AS TIMESTAMP)``, verified value-for-value at
      sf0.001/sf0.01);
    - ``bigint``: epoch nanos (the ``spark.sql.legacy.parquet.nanosAsLong``
      read — a session-build-time conf; setting it at runtime is a no-op in
      Spark 4.1);
    - ``timestamp``: session-zoned instant, rendered as its UTC wall clock
      (to_utc_timestamp against the current session zone, then the NTZ cast
      re-applies that zone — the offsets cancel, leaving the UTC rendering
      regardless of session timezone).
    """
    dtype = dict(df.dtypes).get(colname)
    if dtype == "timestamp_ntz" or dtype is None:
        return df
    if dtype == "bigint":
        return df.withColumn(colname, ntz_from_epoch_us(F.expr(f"`{colname}` DIV 1000")))
    if dtype == "timestamp":
        return df.withColumn(
            colname,
            F.to_utc_timestamp(F.col(colname), F.current_timezone()).cast(
                "timestamp_ntz"
            ),
        )
    raise TypeError(f"to_ntz: cannot normalize {colname!r} of type {dtype}")
