"""Relational + LLM-data operators beyond the reference's surface.

The reference has no joins/aggregations/windows (SURVEY.md §2.5) — Catalyst
provides them free. This package holds what Spark does *not* ship:
deduplication families, similarity search, text analysis, multimodal column
plumbing — each designed for 100 TB (shuffle-on-key, broadcast small sides,
inverted-index joins instead of cross joins).
"""
