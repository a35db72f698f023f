"""Fuzzy string matching — edit-distance joins without all-pairs.

FastSS / SymSpell-style deletion neighborhoods (Bocek et al. 2007,
"Fast Similarity Search in Large Dictionaries"): two strings are within
edit distance 1 (insert / delete / substitute) **iff** their
{self} ∪ {one-char-deletion variants} sets intersect — so the candidate
generator is an EQUI-JOIN on variants (keyed shuffle, fan-out = string
length per row), and the exact ``levenshtein`` verification touches
candidates only. Never a quadratic name-pair product: the entity-
resolution primitive (product titles, author names, URL hosts) at corpus
scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ed1_neighborhood", "ed1_pairs"]


def ed1_neighborhood(s: Column) -> Column:
    """``{s} ∪ deletion-1 variants of s`` as a distinct array — the FastSS
    index key set for edit distance 1. Pure column algebra (sequence over
    positions + two substrings per variant), no Python."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substring(s, F.lit(1), i - 1),
            F.substring(s, i + 1, F.length(s)),
        ),
    )
    return F.array_distinct(F.concat(F.array(s), dels))


def ed1_pairs(df: DataFrame, col: str, verify_max: int = 1) -> DataFrame:
    """All unordered pairs of DISTINCT ``col`` values within edit
    distance ``verify_max`` (<= 1 for completeness of the deletion-1
    candidate scheme; larger values verify more but may miss candidates).
    Returns (name_a, name_b, dist).

    Plan shape: distinct values -> explode neighborhood (narrow, fan-out
    = length) -> variant-keyed self-equi-join -> distinct candidate
    pairs -> JVM levenshtein verify on candidates only."""
    vals = df.select(F.col(col).alias("name")).distinct()
    inv = vals.select(
        "name", F.explode(ed1_neighborhood(F.col("name"))).alias("__v__")
    ).distinct()
    cands = (
        inv.alias("a")
        .join(inv.alias("b"), on="__v__")
        .where(F.col("a.name") < F.col("b.name"))
        .select(
            F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b")
        )
        .distinct()
    )
    dist = F.levenshtein("name_a", "name_b")
    return cands.select(
        "name_a", "name_b", dist.cast("long").alias("dist")
    ).where(F.col("dist") <= verify_max)
