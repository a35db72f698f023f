"""Benchmark decontamination: flag training documents that share long
word n-grams with an evaluation/benchmark set.

Every serious training-data pipeline runs this before shipping a corpus
(the GPT-3 and PaLM papers both document 8-to-13-gram overlap filters);
the reference has no analog — closest is ``Stream.filter``
(/root/reference/streamable/stream.py:189-199) with an opaque predicate,
which cannot express a corpus-vs-corpus semi-join.

Scale design: the eval side of the join is a BENCHMARK SUITE — constant
size by construction (it does not grow with the corpus), so it gets a
hard ``broadcast`` hint per this repo's broadcast policy (hints only on
constant-size relations). The train side streams through a map-side
hash-semi-join: no shuffle of the 100 TB token stream at all. Shingles
are 60-bit md5 hashes (8 bytes) rather than strings, so the broadcast
table and the probe keys stay small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kioss_spark.operators.text import h60, shingles, tokens

__all__ = ["ngram_overlap"]


def ngram_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-train-document count of distinct word ``n``-grams that also
    occur anywhere in ``eval_df``.

    Returns ``(id_col, n_shingles, n_overlap, contaminated)`` with one row
    per train document (``n_overlap = 0`` for clean docs).

    ``broadcast_eval=True`` (default) is correct when the eval side is a
    benchmark suite (constant-size). Pass ``False`` for corpus-vs-corpus
    decontamination, where AQE should pick the join strategy.

    Single-pass shape: the train side is scanned (and shingled) exactly
    once — ``explode_outer`` keeps zero-shingle docs alive as a null row,
    the broadcast LEFT join marks hits per shingle, and one grouped
    aggregation recovers both the shingle count and the overlap count.
    No second scan, no re-join against a base relation.
    """
    sh = shingles(tokens(F.col(text_col)), n=n)  # distinct per doc
    tr_inv = train.select(
        F.col(id_col), F.explode_outer(sh).alias("__g__")
    ).select(id_col, h60(F.col("__g__")).alias("__h__"))
    ev = (
        eval_df.select(F.explode(shingles(tokens(F.col(text_col)), n=n)).alias("__g__"))
        .select(h60(F.col("__g__")).alias("__h__"))
        .distinct()
        .withColumn("__hit__", F.lit(1))
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (
        tr_inv.join(ev, "__h__", "left")
        .groupBy(id_col)
        .agg(
            F.count("__h__").alias("n_shingles"),
            F.count("__hit__").alias("n_overlap"),
        )
        .withColumn("contaminated", F.col("n_overlap") > 0)
    )
