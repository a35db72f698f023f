"""SQL interface: register the driver tables as temp views so the engine
serves ``spark.sql`` users directly — the declaration style Catalyst treats
identically to the DataFrame API (one logical plan, same optimizer).

The reference has no SQL surface; Spark-first, SQL is free and some
pipelines are easier to review as text. Every view goes through
``load_table`` so the canonical-type normalization (``events.ts`` →
TIMESTAMP_NTZ) applies to SQL queries too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kioss_spark.sources import TABLES, load_table

__all__ = ["register_views", "sql"]


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple = TABLES, prefix: str = ""
) -> None:
    """Create (or replace) a local temp view per driver table."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"{prefix}{name}")


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run a SQL query against freshly-registered driver-table views."""
    register_views(spark, sf_dir)
    return spark.sql(query)
