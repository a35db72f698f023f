"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()`` maps
each implemented operator (SURVEY.md §2) to a (spark, sf_dir) -> DataFrame
builder; ``oracle_sql()`` gives the DuckDB-equivalent SQL per query (omitted
only for genuinely non-SQL-expressible ops — the driver then records a
rows-only check).

Implementation lives in kioss_spark.queries.* — this file is the thin
driver-facing shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# Spark python workers build sys.path from the environment, not the driver's
# sys.path — export before any SparkSession exists so package callables
# (pickled by reference) can unpickle worker-side regardless of harness cwd.
if _REPO not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = os.pathsep.join(
        p for p in (_REPO, os.environ.get("PYTHONPATH", "")) if p
    )

from kioss_spark.queries import load_all  # noqa: E402


def _ensure_shipped(spark: SparkSession) -> None:
    """Make kioss_spark importable on Spark python workers regardless of how
    the harness built its session (cwd, PYTHONPATH, creation order): zip the
    package once and addPyFile it — workers prepend shipped files to
    sys.path. Engine-internal mapInPandas closures reference
    kioss_spark.errors by module, so this is load-bearing for every
    Python-path operator."""
    sc = spark.sparkContext
    if getattr(sc, "_kioss_spark_shipped", False):
        return
    import shutil
    import tempfile

    zip_base = os.path.join(tempfile.mkdtemp(prefix="kioss_spark_ship_"), "kioss_spark")
    archive = shutil.make_archive(zip_base, "zip", root_dir=_REPO, base_dir="kioss_spark")
    try:
        sc.addPyFile(archive)
    except Exception:  # already added under the same name in this session
        pass
    sc._kioss_spark_shipped = True


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    registry = load_all()
    return _wrap(registry["q1_pricing_summary"].fn)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(q.fn) for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
