"""Streaming dialect — the reference is streaming-shaped (unbounded sources,
processing-time batching, rate limiting, incremental progress; SURVEY.md §2.5)
without streaming formalisms. Structured Streaming supplies those:
watermarks, event-time windows, stateful dedup. Filled in by
kioss_spark.streaming.dialect.
"""
