"""Mergeable cardinality sketches — deterministic, oracle-exact.

``kmv_distinct`` implements the K-Minimum-Values distinct-count estimator
(Bar-Yossef et al. 2002; the KMV/bottom-k form surveyed in Beyer et al.,
"On Synopses for Distinct-Value Estimation Under Multiset Operations",
SIGMOD 2007): hash every value uniformly into [0, 2^60), keep the k
smallest distinct hashes per group; with m_k the k-th smallest, estimate
|D| ~= (k-1) * 2^60 / m_k. Standard error ~ 1/sqrt(k-2).

Why not ``approx_count_distinct``: Spark's HLL++ and DuckDB's HLL are
different sketches with different registers — their estimates can never
hash-match across engines. KMV built on the md5-derived ``h60`` family is
bit-deterministic in BOTH engines (hash, ordering, and the final IEEE
double division all agree), so an *approximate* operator gets an *exact*
oracle gate — same discipline as MinHash-LSH/SimHash in operators/dedup.

Scale design: the sketch is MERGEABLE (union = k smallest of the union of
sketches), so the natural 100 TB shape is partial-sketch-then-merge. The
``partial=True`` path keeps only the per-Arrow-batch k smallest hashes per
group before the keyed rank (bounded output per batch, same pattern as
cosine_topk's partial top-k), so the shuffle carries ~k * batches rows per
group instead of every distinct hash. Groups with fewer than k distinct
values return the EXACT count (the sketch stores them all).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kioss_spark.operators.text import h60

__all__ = ["kmv_distinct"]

#: hash domain size (h60 is 60 bits) — exactly representable as a double
_DOMAIN = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    value: Column,
    by: Optional[Sequence[str]] = None,
    k: int = 64,
    partial: bool = True,
) -> DataFrame:
    """Per-group distinct-count estimate of ``value`` via a k-minimum-values
    sketch. Returns one row per group: (by..., n_kept, est_distinct).

    ``n_kept < k`` means the group had fewer than k distinct values and
    ``est_distinct`` IS the exact distinct count. The estimator divides in
    IEEE double ((k-1) * 2^60 / m_k, floored) so DuckDB reproduces it
    bit-for-bit.
    """
    keys = list(by or [])
    hashed = df.select(*keys, h60(value).alias("__h__"))
    if partial:
        # per-batch DISTINCT bottom-k per group BEFORE the global dedup
        # shuffle: any of the k smallest distinct global hashes is also in
        # its own batch's distinct bottom-k, so the shuffle carries ~k rows
        # per (group, batch) instead of every distinct hash occurrence
        def _local_bottomk(batches):
            for pdf in batches:
                uniq = pdf.drop_duplicates(keys + ["__h__"])
                if keys:
                    yield (
                        uniq.sort_values(keys + ["__h__"])
                        .groupby(keys, sort=False)
                        .head(k)
                    )
                else:
                    yield uniq.nsmallest(k, "__h__")

        hashed = hashed.mapInPandas(_local_bottomk, schema=hashed.schema)
    hashed = hashed.dropDuplicates(keys + ["__h__"])
    w = (
        Window.partitionBy(*keys).orderBy("__h__")
        if keys
        else Window.partitionBy(F.lit(1)).orderBy("__h__")
    )
    ranked = hashed.withColumn("__r__", F.row_number().over(w)).where(
        F.col("__r__") <= k
    )
    grouped = ranked.groupBy(*keys) if keys else ranked.groupBy()
    agg = grouped.agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("__h__").alias("__mk__"),
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.floor(F.lit(float(k - 1)) * F.lit(_DOMAIN) / F.col("__mk__")))
    return agg.select(
        *keys, "n_kept", est.cast("long").alias("est_distinct")
    )
