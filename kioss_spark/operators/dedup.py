"""Deduplication families for LLM training-data pipelines.

Four escalating strategies, all shuffle-architected for 100 TB:

- **exact** — hash-groupBy on a normalized content hash. One shuffle on the
  hash (map-side partial agg), keep-first = ``min(doc_id)``. Never a window.
- **n-gram Jaccard (exact)** — inverted-index similarity join: explode
  shingles, self-join on shingle (the candidate generator), count shared
  shingles per pair, compute J = |∩| / (|A|+|B|−|∩|). Shuffles on shingle
  then on pair — both keyed, both spillable; NO all-pairs cross join.
- **MinHash-LSH (approximate)** — K=32 signature rows, b=8 bands × r=4:
  candidates are pairs sharing one band bucket; verified with exact Jaccard.
  The shuffle key is the band hash, so cost is ~(docs × bands), independent
  of the pair count. Banding math: P(candidate) = 1 − (1 − J^r)^b.
- **SimHash (approximate)** — 60-bit signature from per-bit majority vote of
  shingle hashes; 4 bands × 15 bits give candidates (pigeonhole: any pair at
  Hamming distance ≤ 3 shares a band), verified with ``bit_count(xor) <= d``.

All hashing is md5-derived (see operators.text.h60), so the DuckDB oracle
reproduces even the approximate pipelines bit-for-bit — approximation error
is deterministic and identical across engines.

Reference parity note: the reference's only dedup is ``Stream.distinct``
(hash-set, single process — /root/reference/streamable/iterators.py:98-114);
these operators are the scale-out extension the brief requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kioss_spark.operators.text import h60, salted_h60, shingles, tokens

__all__ = [
    "exact_dedup",
    "jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "simhash_pairs",
]


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by normalized-content hash; survivor = lowest id.

    Returns (content_hash, keep_id, n_copies). Pure hash aggregation:
    map-side combine, one shuffle, no window, no collect.
    """
    h = F.md5(F.lower(F.trim(F.col(text_col)))).alias("content_hash")
    return docs.groupBy(h).agg(
        F.min(id_col).cast("long").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def _shingled(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        shingles(tokens(F.col(text_col)), n=n).alias("sh"),
    ).where(F.size("sh") > 0)


def jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via inverted-index join.

    explode(shingle) → self-join on shingle → per-pair shared count →
    J = shared / (|A| + |B| − shared). The shingle join is the candidate
    generator: only pairs sharing ≥1 shingle are ever materialized.
    """
    sh = _shingled(docs, text_col, id_col, n)
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    inv = sh.select("doc_id", F.explode("sh").alias("shingle"))
    shared = (
        inv.alias("a")
        .join(inv.alias("b"), on="shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    # float discipline: report floor(J*1e6) as int (identical doubles on both
    # engines -> identical floors; no rounding-mode dependence), and threshold
    # on the integerized value
    j = F.col("n_shared") / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_shared"))
    return (
        shared.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a", "doc_b", "n_shared",
            F.floor(j * 1000000).cast("long").alias("jaccard_e6"),
        )
        .where(F.col("jaccard_e6") >= int(threshold * 1_000_000))
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 32, n: int = 3
) -> DataFrame:
    """(doc_id, sh, sig) where sig is the K-row MinHash signature:
    sig[i] = min over shingles of md5-family hash i. All column algebra —
    one projection, zero shuffles."""
    sh = _shingled(docs, text_col, id_col, n)
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("sh"), lambda s, i=i: salted_h60(s, i)))
            for i in range(k)
        ]
    )
    return sh.select("doc_id", "sh", sig.alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band-bucket candidates, exact-Jaccard
    verified. Shuffle cost ∝ docs × bands (candidate generation) plus the
    (small) verified-candidate join — never all-pairs."""
    r = k // bands
    sigs = minhash_signatures(docs, text_col, id_col, k=k, n=n)
    band_cols = F.array(
        *[
            F.md5(
                F.array_join(
                    F.transform(F.slice("sig", b * r + 1, r), lambda x: x.cast("string")),
                    ",",
                )
            )
            for b in range(bands)
        ]
    )
    buckets = sigs.select("doc_id", F.posexplode(band_cols).alias("band", "bh"))
    cands = (
        buckets.alias("a")
        .join(buckets.alias("b"), on=["band", "bh"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = sigs.select("doc_id", "sh")
    inter = F.size(F.array_intersect(F.col("sa.sh"), F.col("sb.sh")))
    j = inter / (F.size(F.col("sa.sh")) + F.size(F.col("sb.sh")) - inter)
    return (
        cands.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sh.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", F.floor(j * 1000000).cast("long").alias("jaccard_e6"))
        .where(F.col("jaccard_e6") >= int(threshold * 1_000_000))
    )


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 60, n: int = 3
) -> DataFrame:
    """(doc_id, simhash) — 60-bit majority-vote signature over shingle
    hashes, computed scalably: explode → one groupBy(doc) with 60 conditional
    sums (map-side partial agg), then assemble bits. No per-doc Python."""
    sh = _shingled(docs, text_col, id_col, n)
    hashed = sh.select("doc_id", F.explode("sh").alias("s")).select(
        "doc_id", h60(F.col("s")).alias("h")
    )
    sums = hashed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"b{b}")
            for b in range(bits)
        ],
    )
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") * 2 >= F.col("n"), F.lit(1).cast("long") * (1 << b)).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    return sums.select("doc_id", sim.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: 4 bands × 15 bits → candidates (any pair with
    Hamming ≤ 3 shares at least one band by pigeonhole), verified with
    bit_count(a XOR b). Shuffle key = (band, 15-bit chunk)."""
    sigs = simhash_signatures(docs, text_col, id_col, n=n)
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), k * 15).bitwiseAND(F.lit(32767))
                    for k in range(4)
                ]
            )
        ).alias("band", "chunk"),
    )
    cands = (
        bands.alias("a")
        .join(bands.alias("b"), on=["band", "chunk"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return cands.where(F.col("hamming") <= max_hamming)
