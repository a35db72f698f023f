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

__all__ = ["ngram_overlap", "transitive_reach"]


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


def transitive_reach(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 2,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Min-hop BFS distance from a seed set through an undirected pair
    graph: ``(id_col, hop)`` for every node within ``max_hops`` of a seed
    (seeds themselves at hop 0).

    Why it exists: contamination spreads transitively — a near-duplicate
    of a benchmark-overlapping document carries the same leaked content
    even if its own n-grams were perturbed past the direct filter. Serious
    pipelines therefore drop the near-dup NEIGHBORHOOD of flagged docs,
    not just the flagged docs (same reasoning for takedown/PII blast
    radius). The reference has no graph surface at all.

    Scale shape mirrors ``dedup.connected_components``: the symmetric edge
    list is persisted once (its lineage is the candidate-pair pipeline —
    each BFS level joins against it), each level is one keyed join +
    distinct + anti-join against the already-reached set, and levels are
    checkpointed so level k does not replay levels 1..k-1. The frontier
    monotonically shrinks into the unreached set; with max_hops small
    (2-3 in practice) this is a handful of |E|-bounded jobs. Early-out
    when a frontier goes empty.

    Each level's checkpoint is LAZY and the empty-frontier probe is a
    FULL count: the count materializes every partition (making the
    lineage cut effective — a limit(1) probe would compute only some
    partitions and leave the checkpoint un-truncated) while doubling as
    the probe, so each level costs one job, not two (round-5 driver-
    overhead shave; mirrors dedup.connected_components).
    """
    from pyspark import StorageLevel

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        frontier = (
            seeds.select(F.col(id_col).alias("id"))
            .distinct()
            .withColumn("hop", F.lit(0))
            .localCheckpoint(eager=False)
        )
        reached = frontier
        for hop in range(1, max_hops + 1):
            nxt = (
                sym.join(frontier, sym["src"] == frontier["id"])
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(reached.select("id"), "id", "left_anti")
                .withColumn("hop", F.lit(hop))
                .localCheckpoint(eager=False)
            )
            if nxt.count() == 0:
                break
            reached = reached.union(nxt)
            frontier = nxt
    finally:
        sym.unpersist()
    return reached.select(
        F.col("id").alias(id_col), F.col("hop").cast("long").alias("hop")
    )
