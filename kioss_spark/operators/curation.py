"""Corpus-curation operators: deterministic sampling and token budgeting.

Training-data pipelines cut corpora two ways the other operator files don't
cover: *sampling* (take a reproducible fraction) and *budgeting* (take the
best documents until a token quota fills). Both must be deterministic —
re-running the pipeline on the same snapshot must pick the same documents,
and an auditor must be able to reproduce the selection in another engine —
so neither uses ``rand()``/``sample()``: selection is a pure function of
content (md5-derived hash buckets) or of an explicit quality ranking.

Reference parity note: the closest reference construct is
``Stream.skip/truncate`` (count-based prefixes, streamable/stream.py:358-393);
these are their corpus-level, key-aware analogs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kioss_spark.operators.text import h60

__all__ = ["hash_sample", "token_budget_cap"]


def hash_sample(df: DataFrame, rate_bp: int, key_col: str = "text") -> DataFrame:
    """Keep rows whose content hash lands in the first ``rate_bp`` of 10,000
    basis-point buckets (rate_bp=250 -> 2.5%).

    Narrow (filter only — no shuffle, no rand()); the hash is md5-derived,
    so any engine reproduces the exact same sample. Sampling by CONTENT
    hash also makes the selection stable under repartitioning, row order,
    and incremental reruns — none of which hold for ``DataFrame.sample``.
    """
    bucket = F.pmod(h60(F.col(key_col)), F.lit(10000))
    return df.where(bucket < rate_bp)


def token_budget_cap(
    scored: DataFrame,
    budget: int,
    group_col: str = "source",
    tokens_col: str = "bpe",
    quality_col: str = "quality_e6",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group quality-ranked token budgeting: walk each group's docs
    best-first and keep them while the running token total stays within
    ``budget`` (the classic per-source quota mix for a training corpus).

    One keyed window (partitionBy group, orderBy quality desc with the id
    as a deterministic tie-break) computes the running sum — a single
    shuffle on the group key, map-side nothing to combine but the window
    frame is the default running frame (no full-partition buffering).
    Groups are independent, so skew equals the largest single source;
    sub-partition salting is not applicable (running sums are inherently
    sequential per group) — at 100 TB shard oversized sources upstream
    (e.g. by crawl snapshot) before budgeting.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(quality_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("__cum__", F.sum(tokens_col).over(w))
        .where(F.col("__cum__") <= budget)
        .drop("__cum__")
    )
