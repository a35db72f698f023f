"""Streaming dialect — the reference is streaming-shaped (unbounded sources,
processing-time batching, rate limiting, incremental progress; SURVEY.md §2.5)
without streaming formalisms. Structured Streaming supplies those:
watermarks, event-time windows, stateful dedup. See
kioss_spark.streaming.dialect.SStream.
"""

from kioss_spark.streaming.dialect import SStream  # noqa: F401
