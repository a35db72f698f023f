"""Deduplication families for LLM training-data pipelines.

Four escalating strategies, all shuffle-architected for 100 TB:

- **exact** — hash-groupBy on a normalized content hash. One shuffle on the
  hash (map-side partial agg), keep-first = ``min(doc_id)``. Never a window.
- **n-gram Jaccard (exact)** — PPJoin-style prefix-filtered similarity join
  (Xiao et al., WWW'08, public algorithm): global rare-first shingle order,
  candidates only from prefix shingles (lossless for J >= t), exact verify.
- **MinHash-LSH (approximate)** — K=32 signature rows, b=8 bands × r=4:
  candidates are pairs sharing one band bucket; verified with exact Jaccard.
  Banding math: P(candidate) = 1 − (1 − J^r)^b.
- **SimHash (approximate)** — 60-bit signature from per-bit majority vote of
  shingle hashes; 4 bands × 15 bits give candidates (pigeonhole: any pair at
  Hamming distance ≤ 3 shares a band), verified with ``bit_count(xor)``.

Physical design: everything is built on a flat **(doc_id, shingle) inverted
index** produced NARROWLY — ``arrays_zip`` of shifted ``slice``s of the
token array, then one explode — so the token stream itself never shuffles
(the earlier window-lead design shuffled every token; at 100 TB the token
stream is ~100x the doc stream and that shuffle is the dedup bottleneck).
The ONE wide op on the document side is an upfront ``repartition(P, doc_id)``
of the raw docs; every doc-local step after it (the ``distinct`` to set
semantics, the per-doc signature aggregation) satisfies its clustering
requirement from that same exchange, so Spark inserts NO further shuffle
until the candidate joins. Higher-order array functions (`transform`, ...)
are interpreted per-row in Spark (measured ~5x slower here than the
zip-slice form, which stays inside codegen). Exact-intersection
verification is a keyed pair-count aggregation over candidate docs only
(semi-join first — candidates << corpus), never an array_intersect.

All hashing is md5-derived (see operators.text.h60), so the DuckDB oracle
reproduces even the approximate pipelines bit-for-bit — approximation error
is deterministic and identical across engines.

Reference parity note: the reference's only dedup is ``Stream.distinct``
(hash-set, single process — /root/reference/streamable/iterators.py:98-114);
these operators are the scale-out extension the brief requires.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kioss_spark.operators.text import h60, tokens

__all__ = [
    "exact_dedup",
    "shingle_stream",
    "shingle_index",
    "minhash_bands_expr",
    "jaccard_pairs",
    "containment_pairs",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "incremental_minhash_pairs",
    "simhash_signatures",
    "simhash_pairs",
    "connected_components",
    "shingle_stream_pos",
    "substring_spans",
    "incremental_jaccard_pairs",
]

#: default word-n-gram width. 4-grams keep the candidate space sparse even on
#: low-entropy corpora (a 30-word vocabulary has 8.1e5 possible 4-grams vs
#: 2.7e4 3-grams — document frequency per shingle drops ~30x).
DEFAULT_N = 4

#: MinHash universal-hash family over the 31-bit md5-derived base hash:
#: f_i(h) = (A[i]*h + B[i]) mod P — one md5 per shingle, then pure integer
#: arithmetic for the whole family (32 multiply-add-mods instead of 32 md5s,
#: ~100x cheaper, and products stay < 2^62 so int64 never overflows).
#: Constants are fixed (deterministic LCG) so the DuckDB oracle regenerates
#: the exact same family.
MINHASH_P = 2147483647  # 2^31 - 1 (prime)
H31_MASK = MINHASH_P


def _family(k: int) -> list[tuple[int, int]]:
    seed = 0x5DEECE66D
    out = []
    x = seed
    for _ in range(k):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = 1 + x % (MINHASH_P - 1)
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = x % MINHASH_P
        out.append((a, b))
    return out


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


def _docs_clustered(docs: DataFrame, id_col: str) -> DataFrame:
    """Repartition the raw docs by id ONCE — the only wide op on the
    document side. Doc rows are tiny next to their token streams, and the
    resulting HashPartitioning(doc_id) satisfies the clustering requirement
    of every downstream doc-local distinct/groupBy (subset clustering), so
    the ~100x-larger shingle stream never shuffles. Width = max(cores,
    spark.sql.shuffle.partitions) — the operator-parallelism knob a cluster
    already tunes; the scan's own width is untouched upstream. The explicit
    count opts this exchange out of AQE coalescing (a 5000-doc corpus would
    otherwise collapse to one partition and serialize the whole index
    build). NOTE: never probe ``df.rdd.getNumPartitions()`` for this — the
    Python-side ``.rdd`` conversion builds a serialization pipeline per
    call and measurably destabilizes downstream job times."""
    sess = docs.sparkSession
    p = max(
        sess.sparkContext.defaultParallelism,
        int(sess.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    return docs.repartition(p, F.col(id_col))


def shingle_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_N,
) -> DataFrame:
    """(doc_id, shingle) word-n-gram MULTISET — narrow, never shuffled.

    ``arrays_zip`` of ``n`` shifted ``slice``s of the token array gives each
    n-gram's words side-by-side in one struct row; explode + concat_ws
    flattens. All codegen-friendly built-ins; no window (the previous
    design's window-lead shuffled the entire token stream), no higher-order
    functions (interpreted per element, measured ~5x slower).

    Whitespace-normalized split (trim + ``' +'``) reproduces exactly the
    "drop empty tokens, shingle over survivors" semantics of the reference
    tokenizer (operators.text.tokens).
    """
    arr = F.split(F.trim(F.col(text_col)), " +")
    width = F.greatest(F.size(arr) - F.lit(n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(arr, i + 1, width) for i in range(n)])
    return _docs_clustered(docs, id_col).select(
        F.col(id_col).alias("doc_id"), F.explode(zipped).alias("z")
    ).select(
        "doc_id",
        F.concat_ws(" ", *[F.col("z")[str(i)] for i in range(n)]).alias("shingle"),
    )


def shingle_stream_pos(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_N,
) -> DataFrame:
    """(doc_id, pos, shingle) — the positional variant of
    ``shingle_stream`` for span-level dedup: ``pos`` is the 0-based token
    index where the n-gram starts. Same narrow arrays_zip build, same
    tokenizer semantics; ``posexplode`` instead of ``explode`` is the only
    difference, so the stream still never shuffles."""
    arr = F.split(F.trim(F.col(text_col)), " +")
    width = F.greatest(F.size(arr) - F.lit(n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(arr, i + 1, width) for i in range(n)])
    return _docs_clustered(docs, id_col).select(
        F.col(id_col).alias("doc_id"), F.posexplode(zipped).alias("pos", "z")
    ).select(
        "doc_id",
        "pos",
        F.concat_ws(" ", *[F.col("z")[str(i)] for i in range(n)]).alias("shingle"),
    )


def substring_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Substring-level duplication scoring à la Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"): flag
    every length-``n`` token window whose exact text occurs in at least
    ``min_docs`` distinct documents, then report per document how much of
    it is covered by flagged windows.

    Returns ``(doc_id, n_tok, dup_windows, dup_cov_e6)`` — one row per
    document; ``dup_cov_e6 = floor(covered_tokens / n_tok * 1e6)`` where
    ``covered_tokens`` is the size of the UNION of the flagged windows'
    token spans (overlapping windows are not double-counted). Documents
    shorter than ``n`` tokens score 0. Span-level dedup catches verbatim
    boilerplate pasted into otherwise-distinct documents — below the
    whole-document Jaccard radar, exactly the case document-level dedup
    misses. The reference has no analog (closest is Stream.map with an
    opaque per-element function, /root/reference/streamable/stream.py).

    Scale shape: the positional n-gram stream is built narrow (never
    shuffled at creation), then shuffles exactly twice on the gram key —
    once for the distinct-doc frequency aggregate, once to join the
    duplicated-gram set back. The span-union is per-doc local: explode the
    flagged windows into token positions, distinct, count — all inside one
    doc_id partitioning. No all-pairs anything: cost is O(corpus tokens +
    flagged positions), the same asymptotic as the suffix-array pipeline
    Lee et al. run, expressed as two keyed shuffles."""
    grams = shingle_stream_pos(docs, text_col, id_col, n)
    dup = (
        grams.select("shingle", "doc_id")
        .distinct()
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("shingle")
    )
    flagged = grams.join(dup, "shingle")
    nw = flagged.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dup_windows"))
    cov = (
        flagged.select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))).alias(
                "cp"
            ),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("ncov"))
    )
    # NULL text: tokens() yields NULL and size(NULL) is NULL (sizeOfNull
    # defaults false in Spark 4) — coalesce to 0 so such rows follow the
    # documented "shorter than n tokens" convention like empty arrays do.
    ntok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.size(tokens(F.col(text_col))), F.lit(0)).alias("n_tok"),
    )
    return (
        ntok.join(nw, "doc_id", "left")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tok").cast("long").alias("n_tok"),
            F.coalesce("dup_windows", F.lit(0)).cast("long").alias("dup_windows"),
            F.when(
                F.col("n_tok") > 0,
                F.floor(
                    F.coalesce("ncov", F.lit(0)) / F.col("n_tok") * 1000000
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("dup_cov_e6"),
        )
    )


def shingle_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_N,
    materialize: bool = True,
) -> DataFrame:
    """Distinct (doc_id, shingle) inverted index of word n-grams.

    ``shingle_stream`` + distinct. The distinct's hash aggregate runs
    entirely inside the doc-level partitioning established upstream
    (HashPartitioning(doc_id) satisfies ClusteredDistribution(doc_id,
    shingle)) — zero additional shuffle.

    ``materialize=True`` materializes the index once via eager
    ``localCheckpoint``: every dedup plan references it several times
    (frequency agg, prefix join, pair verify) and Spark re-executes common
    subplans per reference. localCheckpoint stores computed partitions in
    the block manager and truncates lineage — measured ~8x faster to build
    than ``.persist()``'s columnar cache for this shape. On a real cluster
    (executor loss risk) the equivalent durable move is writing the index
    once to a bucketed table and reading it back.
    """
    out = shingle_stream(docs, text_col, id_col, n).distinct()
    if materialize:
        out = out.localCheckpoint(eager=True)
    return out


def _sizes(inv: DataFrame) -> DataFrame:
    return inv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))


def _verified_pairs(cands: DataFrame, inv: DataFrame, threshold: float) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs against the inverted
    index: count shared shingles per pair (keyed joins + one aggregation —
    no array intersection, no recomputed shingle arrays).

    The index is first semi-joined down to candidate docs: candidates are a
    vanishing fraction of the corpus after LSH/prefix filtering, so the
    verify joins touch a sliver of the index instead of shuffling all of it
    twice. (Per-doc sizes are unaffected — the semi-join filters whole
    ``inv`` must be the MATERIALIZED index (see shingle_index): it is
    referenced three times here (both sides of the shared-shingle join +
    the size aggregate), each reference re-executing an unmaterialized
    plan. Exactly one checkpoint (the index) — measured: chaining further
    eager checkpoints (candidates, semi-joined subsets) or broadcasting a
    candidate-derived subplan destabilizes job times badly (2-10x swings).
    Cluster-scale variant when candidates << corpus: persist candidate ids
    once, semi-join the index down to candidate docs before these joins —
    trades one extra index pass for pair joins that touch only candidate
    docs."""
    sizes = _sizes(inv)
    shared = (
        cands.join(inv.alias("ia"), F.col("doc_a") == F.col("ia.doc_id"))
        .join(
            inv.alias("ib"),
            (F.col("doc_b") == F.col("ib.doc_id"))
            & (F.col("ia.shingle") == F.col("ib.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    # float discipline: floor(J*1e6) as int — identical doubles on both
    # engines -> identical floors; threshold applied to the integerized value
    j = F.col("n_shared") / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_shared"))
    return (
        shared.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.floor(j * 1000000).cast("long").alias("jaccard_e6"),
        )
        .where(F.col("jaccard_e6") >= int(threshold * 1_000_000))
    )


def jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_N,
    threshold: float = 0.5,
    inv: Optional[DataFrame] = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs (J >= threshold) via PPJoin
    prefix filtering.

    If J(A,B) >= t then |A∩B| >= t·|A∪B| >= t·|A|, so under ANY global
    order the first |A| − ⌈t·|A|⌉ + 1 shingles of A must hit B's prefix —
    joining on prefix shingles is lossless. Ordering rare-first (ascending
    document frequency) makes prefix shingles low-frequency, collapsing the
    candidate count. Result is identical to a naive inverted-index join.

    ``inv``: optionally reuse a prebuilt ``shingle_index`` (one corpus
    materialization shared across pipelines, e.g. the LSH recall audit
    runs this AND the banded form over the same index).
    """
    if inv is None:
        inv = shingle_index(docs, text_col, id_col, n)
    prefix = _prefix(inv, threshold)
    cands = (
        prefix.alias("a")
        .join(prefix.alias("b"), on="shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _verified_pairs(cands, inv, threshold)


def _prefix(inv: DataFrame, threshold: float) -> DataFrame:
    """Rare-first PPJoin prefix of the inverted index: the first
    ``n_sh - ceil(t*n_sh) + 1`` shingles per doc in ascending-document-
    frequency order. Document frequency via a count window (ONE shuffle
    keyed on shingle — a groupBy+join would shuffle the index twice for
    the same answer); then n_sh + rare-first rank share the SAME doc_id
    shuffle: Spark plans both windows over one Exchange(doc_id)."""
    wdf = Window.partitionBy("shingle")
    wdoc = Window.partitionBy("doc_id")
    wrank = Window.partitionBy("doc_id").orderBy(F.col("df"), F.col("shingle"))
    return (
        inv.withColumn("df", F.count(F.lit(1)).over(wdf))
        .withColumn("n_sh", F.count(F.lit(1)).over(wdoc))
        .withColumn("__r__", F.row_number().over(wrank))
        .where(F.col("__r__") <= F.col("n_sh") - F.ceil(F.col("n_sh") * threshold) + 1)
        .select("doc_id", "shingle")
    )


def incremental_jaccard_pairs(
    docs: DataFrame,
    is_new,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_N,
    threshold: float = 0.5,
    inv: Optional[DataFrame] = None,
) -> DataFrame:
    """Incremental near-dup pairs: every J >= threshold pair with AT LEAST
    ONE endpoint in the new batch (``is_new`` a boolean Column over
    ``docs``) — the production daily-crawl shape, where today's documents
    are deduped against the accumulated corpus WITHOUT re-pairing the
    corpus against itself.

    Returns ``(doc_a, doc_b, n_shared, jaccard_e6, both_new)``;
    ``both_new`` distinguishes new-vs-new pairs from new-vs-corpus hits
    (a new doc with only ``both_new = false`` partners is a re-crawl of
    existing content; one with ``both_new = true`` partners is a same-day
    duplicate).

    Lossless by the same prefix theorem as ``jaccard_pairs``: a
    qualifying pair shares a prefix shingle, and one of its endpoints is
    new, so joining prefix(new) against prefix(all) finds it. The join is
    |prefix(new)| x keyed — per-batch cost is O(batch candidates), never
    O(corpus^2); old x old pairs are structurally excluded, not filtered.
    At scale the corpus-side index and prefix are precomputed once and
    stored bucketed by shingle (see shingle_index); each daily run then
    shuffles only the new batch's shingle stream."""
    if inv is None:
        inv = shingle_index(docs, text_col, id_col, n)
    prefix = _prefix(inv, threshold)
    new_ids = docs.where(is_new).select(F.col(id_col).alias("doc_id"))
    pnew = prefix.join(new_ids, "doc_id")
    cands = (
        pnew.alias("a")
        .join(prefix.alias("b"), on="shingle")
        .where(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
        )
        .distinct()
    )
    verified = _verified_pairs(cands, inv, threshold)
    flag = new_ids.withColumn("__new__", F.lit(True))
    return (
        verified.join(
            flag.select(F.col("doc_id").alias("doc_a"), F.col("__new__").alias("__na__")),
            "doc_a",
            "left",
        )
        .join(
            flag.select(F.col("doc_id").alias("doc_b"), F.col("__new__").alias("__nb__")),
            "doc_b",
            "left",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "jaccard_e6",
            (F.coalesce("__na__", F.lit(False)) & F.coalesce("__nb__", F.lit(False))).alias(
                "both_new"
            ),
        )
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_N,
    threshold: float = 0.8,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT pairs: (doc_inner, doc_outer) with
    ``C(inner→outer) = |S_inner ∩ S_outer| / |S_inner| >= threshold``.

    Jaccard misses subset duplication — a paragraph pasted into a larger
    document scores J = |A|/|B| ≈ 0 however exact the copy — which is why
    corpus pipelines check containment alongside it (the same quantity
    suffix-array dedup targets). Containment admits the same PPJoin prefix
    bound on the INNER side only: C >= t ⇒ |∩| >= t·|inner|, so one of
    inner's first ``|inner| − ⌈t·|inner|⌉ + 1`` rare-first shingles must
    hit the outer doc. The outer side has no such bound (nothing relates t
    to |outer|), so candidates come from inner-prefix × full index — still
    keyed on rare prefix shingles, never all-pairs.

    Output is directional: both (a→b) and (b→a) can appear (near-equal
    docs contain each other).
    """
    inv = shingle_index(docs, text_col, id_col, n)
    wdf = Window.partitionBy("shingle")
    wdoc = Window.partitionBy("doc_id")
    wrank = Window.partitionBy("doc_id").orderBy(F.col("df"), F.col("shingle"))
    prefix = (
        inv.withColumn("df", F.count(F.lit(1)).over(wdf))
        .withColumn("n_sh", F.count(F.lit(1)).over(wdoc))
        .withColumn("__r__", F.row_number().over(wrank))
        .where(F.col("__r__") <= F.col("n_sh") - F.ceil(F.col("n_sh") * threshold) + 1)
        .select("doc_id", "shingle")
    )
    cands = (
        prefix.alias("a")
        .join(inv.alias("b"), on="shingle")
        .where(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sizes = _sizes(inv)
    shared = (
        cands.join(inv.alias("ia"), F.col("doc_a") == F.col("ia.doc_id"))
        .join(
            inv.alias("ib"),
            (F.col("doc_b") == F.col("ib.doc_id"))
            & (F.col("ia.shingle") == F.col("ib.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    c = F.col("n_shared") / F.col("sa.n_sh")
    return (
        shared.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .select(
            F.col("doc_a").alias("doc_inner"),
            F.col("doc_b").alias("doc_outer"),
            "n_shared",
            F.floor(c * 1000000).cast("long").alias("containment_e6"),
        )
        .where(F.col("containment_e6") >= int(threshold * 1_000_000))
    )


def _signatures(inv: DataFrame, k: int) -> DataFrame:
    """K-member MinHash signature rows (doc_id, h0..h{k-1}) over a shingle
    index: md5 ONCE per index row, then the integer multiply-add-mod
    family on h31; one groupBy(doc) with K min-aggregates (map-side
    combine, state = K longs per doc)."""
    fam = _family(k)
    base = inv.select(
        "doc_id", h60(F.col("shingle")).bitwiseAND(F.lit(H31_MASK)).alias("h31")
    )
    hashed = base.select(
        "doc_id",
        *[
            ((F.lit(a) * F.col("h31") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"h{i}")
            for i, (a, b) in enumerate(fam)
        ],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(k)]
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 32,
    n: int = DEFAULT_N,
) -> DataFrame:
    """The MinHash signature TABLE as a first-class artifact: (doc_id,
    h0..h{k-1}) — what an incremental dedup deployment persists between
    snapshots (band-join new signatures against the stored table instead
    of re-shingling the corpus; ``incremental_jaccard_pairs`` is the
    paired query-time form). Deterministic family (fixed LCG-derived
    multiply-add-mod constants), so signatures are stable across runs,
    engines, and corpus growth — safe to store and merge.

    Scale shape: one md5 per (doc, distinct shingle), K integer hashes
    per index row, one doc-keyed agg with map-side combine. Docs with no
    shingles (< n tokens) produce no row, mirroring the LSH operator's
    candidate domain."""
    return _signatures(shingle_index(docs, text_col, id_col, n), k)


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 32,
    bands: int = 8,
    n: int = DEFAULT_N,
    threshold: float = 0.5,
    inv: Optional[DataFrame] = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band-bucket candidates, exact-Jaccard
    verified. Signature = one groupBy(doc) with K min-aggregates over the
    materialized index (map-side combine; state = K longs per doc; the
    groupBy rides the index's doc_id clustering). Shuffle cost ∝ docs ×
    bands for candidates — never all-pairs. The single index checkpoint
    feeds signatures, candidate self-join, and verification.
    ``inv``: optionally reuse a prebuilt ``shingle_index``."""
    if inv is None:
        inv = shingle_index(docs, text_col, id_col, n)
    buckets = _band_buckets(_signatures(inv, k), k, bands)
    cands = (
        buckets.alias("a")
        .join(buckets.alias("b"), on=["band", "bh"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _verified_pairs(cands, inv, threshold)


def _band_buckets(sig_rows: DataFrame, k: int, bands: int) -> DataFrame:
    """(doc_id, band, bh) LSH bucket keys: the K signature values split
    into ``bands`` groups of r = k/bands, each md5'd into one bucket hash."""
    r = k // bands
    band_arr = F.array(
        *[
            F.md5(F.concat_ws(",", *[F.col(f"h{b * r + i}").cast("string") for i in range(r)]))
            for b in range(bands)
        ]
    )
    return sig_rows.select("doc_id", F.posexplode(band_arr).alias("band", "bh"))


def incremental_minhash_pairs(
    docs: DataFrame,
    is_new,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 32,
    bands: int = 8,
    n: int = DEFAULT_N,
    threshold: float = 0.5,
    inv: Optional[DataFrame] = None,
) -> DataFrame:
    """Incremental MinHash-LSH dedup — ``incremental_jaccard_pairs``'s
    contract (every verified pair with >= 1 endpoint in the new batch,
    corpus x corpus structurally excluded) with LSH BANDING as the
    candidate generator instead of the exact prefix filter. This is the
    form that pairs with the persisted ``minhash_signatures`` artifact:
    the corpus side contributes only its (stored) band buckets —
    bands(new) x bands(all) is the whole join — so a daily run computes
    signatures for the batch alone and never re-shingles the corpus.
    Candidate recall is the banding approximation (measured 100% vs exact
    J>=0.5 on the fixture, RECALL.md); verification is exact Jaccard, so
    precision is 1.0.

    Returns ``(doc_a, doc_b, n_shared, jaccard_e6, both_new)`` exactly
    like the prefix-filtered form."""
    if inv is None:
        inv = shingle_index(docs, text_col, id_col, n)
    buckets = _band_buckets(_signatures(inv, k), k, bands)
    new_ids = docs.where(is_new).select(F.col(id_col).alias("doc_id"))
    bnew = buckets.join(new_ids, "doc_id")
    cands = (
        bnew.alias("a")
        .join(buckets.alias("b"), on=["band", "bh"])
        .where(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
        )
        .distinct()
    )
    verified = _verified_pairs(cands, inv, threshold)
    flag = new_ids.withColumn("__new__", F.lit(True))
    return (
        verified.join(
            flag.select(F.col("doc_id").alias("doc_a"), F.col("__new__").alias("__na__")),
            "doc_a",
            "left",
        )
        .join(
            flag.select(F.col("doc_id").alias("doc_b"), F.col("__new__").alias("__nb__")),
            "doc_b",
            "left",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "jaccard_e6",
            (F.coalesce("__na__", F.lit(False)) & F.coalesce("__nb__", F.lit(False))).alias(
                "both_new"
            ),
        )
    )


def simhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    n: int = DEFAULT_N,
) -> DataFrame:
    """(doc_id, simhash) — majority-vote signature over shingle hashes:
    flat index → one groupBy(doc) with ``bits`` conditional sums (map-side
    partial agg), then assemble bits. No per-doc Python, no arrays."""
    inv = shingle_index(docs, text_col, id_col, n)
    hashed = inv.select("doc_id", h60(F.col("shingle")).alias("h"))
    sums = hashed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"b{b}")
            for b in range(bits)
        ],
    )
    sim = None
    for b in range(bits):
        term = F.when(
            F.col(f"b{b}") * 2 >= F.col("n"), F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return sums.select("doc_id", sim.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n: int = DEFAULT_N,
) -> DataFrame:
    """SimHash near-dup pairs: ``max_hamming + 1`` bands over the 60-bit
    signature → candidates (any pair within Hamming ``max_hamming`` shares
    at least one band by pigeonhole — exact recall at the stated radius),
    verified with bit_count(a XOR b). Shuffle key = (band, chunk).

    Radius-vs-regime (measured at sf0.01, RECALL.md): Hamming ≤ 3 on a
    60-bit signature is a TIGHT radius — recall vs exact Jaccard is ~52%
    at J ≥ 0.8 and still only ~54% at J ≥ 0.9 on this fixture (its
    31-word vocabulary gives shingle-hash votes high variance, so even
    very similar docs flip 4-6 signature bits). Widening to
    ``max_hamming=5`` (6 × 10-bit bands) lifts J ≥ 0.8 recall to 72%
    measured, at ~2^5 more candidates per band-collision class (still
    verified exactly, so precision stays 1.0). For J ≥ 0.5-regime dedup
    use MinHash-LSH (measured 100% recall there), which bands the
    Jaccard space directly; SimHash's niche is cheap signatures (one
    long per doc) and Hamming set-ups like incremental re-scans.

    ``60 % (max_hamming + 1)`` must be 0 (valid: 1, 2, 3, 4, 5, 9, 11,
    14, 19, 29, 59 for the 60-bit signature)."""
    n_bands = max_hamming + 1
    if 60 % n_bands != 0:
        raise ValueError(
            f"max_hamming={max_hamming} needs {n_bands} equal bands over 60 "
            "bits; pick max_hamming so that (max_hamming + 1) divides 60"
        )
    width = 60 // n_bands
    mask = (1 << width) - 1
    sigs = simhash_signatures(docs, text_col, id_col, n=n)
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), k * width).bitwiseAND(F.lit(mask))
                    for k in range(n_bands)
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


def connected_components(
    edges: DataFrame,
    ids: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Min-label propagation connected components: (id, cluster_id) where
    cluster_id is the smallest id reachable through ``edges``. The graph
    is confined to ``ids``: an edge endpoint outside ``ids`` neither
    receives a label nor bridges two ids-nodes.

    The driver loop iterates O(component diameter) rounds — near-dup
    clusters are short chains, so single digits in practice — while the
    data never leaves the cluster: each round is one keyed shuffle
    (neighbor min per node) exactly like GraphX/GraphFrames CC. Lineage is
    truncated per round with an eager localCheckpoint (an iterative
    algorithm re-plans from its previous materialized state; without the
    cut, round k replays rounds 1..k-1).

    Scale shape (and why there are three extra moves around the loop):

    - The symmetric edge list is **persisted once** before the loop. Its
      lineage is the whole candidate-pair pipeline (PPJoin / LSH join);
      every round joins against it, and without the persist each round
      would re-execute that pipeline from the parquet scan up. Unpersisted
      after the loop — the final labels are checkpointed, so nothing
      downstream re-reads it.
    - Only nodes that appear in an edge enter the loop. Everything else is
      a singleton cluster by construction, and in a near-dup corpus that
      is the overwhelming majority — at 100 TB the loop iterates over the
      duplicate-pair node set (|pairs|-sized), not the corpus. Singletons
      are stitched back with one left join at the end.
    - The convergence probe IS the materializing action: each round's
      state is a LAZY localCheckpoint (plan truncated to a LogicalRDD
      immediately; partitions cached on first full computation), and the
      full count of changed rows both materializes the round and answers
      "did anything change?" — ONE job per round where eager-checkpoint +
      separate probe cost two (round-5: the fixed ~1 s/round driver
      overhead dominated fixture-scale graph queries). The count must be
      a FULL count, not limit(1): a partial scan would leave partitions
      uncomputed, and an un-materialized lazy checkpoint does not
      truncate lineage, so the next round would replay the pipeline.

    Deterministic: integer ids, min-label — no floats anywhere.
    """
    from pyspark import StorageLevel

    # confine the graph to `ids` BEFORE symmetrizing: an edge endpoint
    # outside `ids` must neither receive a label nor bridge two ids-nodes
    # (the pre-round-4 contract — labels existed only for ids and
    # propagation never left the ids set)
    idset = ids.select(F.col(id_col).alias("__id__"))
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .join(idset, F.col("src") == F.col("__id__"), "left_semi")
        .join(idset, F.col("dst") == F.col("__id__"), "left_semi")
    )
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        labels = (
            sym.select(F.col("src").alias("id"))
            .distinct()
            .select("id", F.col("id").alias("label"))
        )
        # ONE propagation step per materialization. (Round-5 note: a
        # 2-steps-per-materialization variant was measured 14% SLOWER at
        # the 10x synthetic corpus — the un-materialized intermediate
        # step is consumed twice by the outer step, and its join+agg
        # subplan re-executes where ReuseExchange does not dedupe it.
        # Batching only helps when per-round driver cost dominates,
        # i.e. toy fixtures; at scale the data path rules.)
        #
        # Round-15 fusion: the propagated labels and the nodes' own labels
        # are UNIONED before a single min-agg instead of groupBy + a
        # trailing left join back to `labels` — min over (own label ∪
        # neighbor labels) is exactly least(own, min-neighbors), and the
        # self row doubles as the carrier of the previous label (`old` is
        # non-null only on self rows, one per node, so min-ignoring-nulls
        # recovers it). One exchange per round instead of two, and one
        # fewer broadcast-build job per round at fixture scale.
        label_t = dict(labels.dtypes)["label"]
        for _ in range(max_iter):
            prop = sym.join(labels, sym["src"] == labels["id"]).select(
                F.col("dst").alias("nid"),
                F.col("label"),
                F.lit(None).cast(label_t).alias("old"),
            )
            own = labels.select(
                F.col("id").alias("nid"),
                F.col("label"),
                F.col("label").alias("old"),
            )
            new = (
                prop.unionByName(own)
                .groupBy("nid")
                .agg(F.min("label").alias("label"), F.min("old").alias("old"))
                .select(F.col("nid").alias("id"), "label", "old")
                .localCheckpoint(eager=False)
            )
            changed = new.where(F.col("label") != F.col("old")).count()
            labels = new.select("id", "label")
            if changed == 0:
                break
    finally:
        sym.unpersist()
    return (
        ids.select(F.col(id_col).alias("id"))
        .join(labels, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("label", "id").alias("cluster_id"),
        )
    )


def minhash_bands_expr(
    text: Column, k: int = 32, bands: int = 8, n: int = DEFAULT_N
) -> Column:
    """LSH band buckets of ONE document as a pure column expression:
    ``array<struct<band bigint, bh string>>`` — the same (band, bh) keys
    as ``_band_buckets`` over the stored signature table, but computed
    per ROW with higher-order functions (transform + array_min) instead
    of an explode + groupBy. That makes it legal in a STREAMING
    projection (no aggregation, so no watermark/output-mode constraints):
    a stream of new documents computes its buckets inline and
    stream-static-joins the persisted corpus bucket table — the
    streaming twin of ``incremental_minhash_pairs``.

    Exact-parity contract with the batch path (pinned by unit test):
    same shingle definition, same h60-derived h31, same multiply-add-mod
    family, same band concat/md5. Cost per row is O(shingles * k) inside
    codegen'd higher-order evals — heavier per row than the batch
    agg form, which is why the BATCH corpus side should keep using
    ``minhash_signatures``; this expression is for the (small) live
    side. Documents with no shingles (< n tokens) yield NULL signature
    members; filter them upstream (``size(tokens(text)) >= n``), as the
    batch index drops them structurally."""
    from kioss_spark.operators.text import shingles

    sh = shingles(tokens(text), n=n, distinct=True)
    h31s = F.transform(
        sh, lambda s: h60(s).bitwiseAND(F.lit(H31_MASK))
    )
    fam = _family(k)

    # factory, NOT default-arg capture: PySpark derives higher-order-fn
    # arity from the lambda SIGNATURE, so `lambda h, a=a, b=b:` would be
    # bound as a 3-argument lambda and fail analysis
    def _member(a: int, b: int):
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)

    hs = [F.array_min(F.transform(h31s, _member(a, b))) for (a, b) in fam]
    r = k // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.md5(
                    F.concat_ws(
                        ",", *[hs[b * r + i].cast("string") for i in range(r)]
                    )
                ).alias("bh"),
            )
            for b in range(bands)
        ]
    )
