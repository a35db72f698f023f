"""Query registry — the driver-facing catalog behind ``__spark_entry__``.

Each entry pairs a Spark builder ``(spark, sf_dir) -> DataFrame`` with an
equivalent DuckDB oracle SQL (or None for genuinely non-SQL-expressible ops,
which the driver checks rows-only). Column names and types are aligned on
both sides because the driver hashes values after sorting columns by name.

Float discipline: Spark and DuckDB sum doubles in different orders, so raw
double aggregates differ in the last ulp; every float aggregate is rounded
(2-4 decimals) on BOTH sides before comparison.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL, None => rows-only check


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: Optional[str]):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(name, fn, oracle)
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    """Import every query module (side effect: fills REGISTRY)."""
    from kioss_spark.queries import relational  # noqa: F401

    try:
        from kioss_spark.queries import llm  # noqa: F401
    except ImportError:  # pragma: no cover - built incrementally
        pass
    return REGISTRY
