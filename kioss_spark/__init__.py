"""kioss_spark — a PySpark-native analytics engine with the capabilities of
``bonnal-enzo/kioss`` (now ``ebonnal/streamable``), re-expressed Spark-first.

The reference (read-only at /root/reference) is a lazy, fluent, pull-based
iterable-pipeline DSL (reference: streamable/stream.py:51-67). This package
recreates that developer experience and its semantic contracts on top of the
Spark DataFrame API — declarative plans optimized by Catalyst, columnar
execution by Tungsten — plus the relational/LLM-data operators a 100 TB
training-data pipeline needs (joins, aggregations, windows, dedup families,
similarity search, text analysis, multimodal columns).

Public surface:
    Stream          — the fluent batch facade (kioss_spark.stream)
    SStream         — the streaming dialect (kioss_spark.streaming)
    star, sidify    — function adapters (kioss_spark.functions.adapters)
    get_spark       — tuned local SparkSession builder (kioss_spark.session)
    operators       — LLM-data operators: dedup / similarity / text /
                      multimodal / curation / contamination / privacy /
                      skew (kioss_spark.operators)
    register_views  — driver tables as temp views for spark.sql users
                      (kioss_spark.sql)
    timeutil        — session-independent TIMESTAMP_NTZ algebra
                      (kioss_spark.functions.timeutil)
    PlanVisitor     — public plan-walk hook (kioss_spark.plans)
"""

from kioss_spark.session import get_spark
from kioss_spark.stream import Stream
from kioss_spark.streaming import SStream
from kioss_spark.functions.adapters import sidify, star
from kioss_spark.plans import PlanVisitor
from kioss_spark.sql import register_views

__version__ = "0.3.0"

__all__ = [
    "Stream",
    "SStream",
    "get_spark",
    "star",
    "sidify",
    "PlanVisitor",
    "register_views",
    "__version__",
]
