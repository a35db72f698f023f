"""Function adapters + scalar function library.

The reference ships three adapters (star / sidify / async_sidify,
streamable/util/functiontools.py) and otherwise delegates all scalar work to
user lambdas. Spark-first, the scalar library is ``pyspark.sql.functions``;
this package adds the adapters plus the text/vector functions the LLM-data
operators need.
"""

from kioss_spark.functions.adapters import async_sidify, sidify, star

__all__ = ["star", "sidify", "async_sidify"]
