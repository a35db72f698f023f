"""Sources — the reference's ``Stream(source)`` accepts any Iterable or a
zero-arg callable re-invoked per iteration (reference: streamable/stream.py:51-67,
streamable/visitors/iterator.py:146-159). Spark-first equivalents: file scans
(parquet/csv/json/orc — columnar, predicate-pushdown), ``spark.range``,
``spark.createDataFrame`` for in-memory iterables, and ``readStream`` for
unbounded sources.

Everything here returns a plain DataFrame; the ``Stream`` facade wraps it.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

#: canonical driver test tables (see /root/repo/TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan; Catalyst pushes filters & prunes columns into it."""
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)  # never inferSchema at scale: full extra pass
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver test table, e.g. load_table(spark, sf_dir, 'lineitem').

    ``events.ts`` is stored as TIMESTAMP(NANOS, isAdjustedToUTC=false); the
    canonical in-engine type is ``TIMESTAMP_NTZ`` (wall clock — matches the
    DuckDB oracle's naive TIMESTAMP semantics in every session timezone).
    Spark 4's default read already delivers NTZ micros with the same
    truncation DuckDB applies; sessions built with the legacy
    ``nanosAsLong`` flag deliver epoch-nanos bigint instead — ``to_ntz``
    normalizes every variant (see kioss_spark.functions.timeutil).
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from kioss_spark.functions.timeutil import to_ntz

        df = to_ntz(df, "ts")
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def from_iterable(
    spark: SparkSession, it: Iterable[Any], schema=None, column: str = "value"
) -> DataFrame:
    """In-memory iterable source (the reference's primary source kind).

    Scalar elements become a single ``value`` column; dict elements become one
    column per key; tuple/Row elements follow the given schema.
    """
    data = list(it)
    if not data:
        if schema is None:
            raise ValueError("empty iterable requires an explicit schema")
        return spark.createDataFrame([], schema=schema)
    first = data[0]
    if schema is None and not isinstance(first, (dict, tuple, list)):
        return spark.createDataFrame([(x,) for x in data], schema=[column])
    n_fields = len(schema.fields) if hasattr(schema, "fields") else None
    if n_fields == 1 and not isinstance(first, (dict, tuple)):
        # single-column schema: each element IS the column value (a list
        # element is an ArrayType value, not a multi-field row)
        return spark.createDataFrame([(x,) for x in data], schema=schema)
    return spark.createDataFrame(data, schema=schema)


def from_callable(spark: SparkSession, fn, schema=None, column: str = "value") -> DataFrame:
    """Callable source — reference re-invokes it at each iteration start
    (streamable/visitors/iterator.py:146-159). DataFrame lineage already
    re-executes its source on each action, so invoking once per plan build
    gives the same re-iterability contract.
    """
    return from_iterable(spark, fn(), schema=schema, column=column)


def spark_range(spark: SparkSession, n: int, column: str = "value") -> DataFrame:
    return spark.range(n).withColumnRenamed("id", column)
