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

__all__ = [
    "kmv_distinct",
    "kmv_state",
    "kmv_merge_states",
    "kmv_estimate",
    "read_kmv_state",
    "kmv_state_sink",
    "theta_overlap_matrix",
    "hll_rollup",
    "kll_quantiles",
    "heavy_hitters",
    "cms_counters",
    "cms_estimate",
]

#: hash domain size (h60 is 60 bits) — exactly representable as a double
_DOMAIN = float(1 << 60)


def _kmv_bottomk(
    df: DataFrame, value: Column, keys: list, k: int, partial: bool
) -> DataFrame:
    """Shared KMV pipeline: per-group k smallest DISTINCT h60 hashes as
    rows (keys..., __h__) — consumed by ``kmv_distinct`` (estimate) and
    ``kmv_state`` (persistable sketch state)."""
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
    return hashed.withColumn("__r__", F.row_number().over(w)).where(
        F.col("__r__") <= k
    )


def kmv_distinct(
    df: DataFrame,
    value: Column,
    by: Optional[Sequence[str]] = None,
    k: int = 256,
    partial: bool = True,
) -> DataFrame:
    """Per-group distinct-count estimate of ``value`` via a k-minimum-values
    sketch. Returns one row per group: (by..., n_kept, est_distinct).

    ``n_kept < k`` means the group had fewer than k distinct values and
    ``est_distinct`` IS the exact distinct count. The estimator divides in
    IEEE double ((k-1) * 2^60 / m_k, floored) so DuckDB reproduces it
    bit-for-bit.

    Sizing: relative stderr ≈ 1/sqrt(k-1) — k=64 ≈ 12.7% (measured max
    error 27% at sf0.1, RECALL.md), k=256 ≈ 6.3% (the default), k=1024 ≈
    3.1%. Cost is linear in k per group (the shuffle carries ~k rows per
    group-batch), so k=256 is still tiny; prefer ``theta_overlap_matrix``
    /``F.theta_sketch_agg`` (measured 1.6% max) when set algebra or
    tighter error matters — KMV's value is that its estimator is exactly
    reproducible in plain SQL.
    """
    keys = list(by or [])
    ranked = _kmv_bottomk(df, value, keys, k, partial)
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


def kmv_state(
    df: DataFrame,
    value: Column,
    by: Optional[Sequence[str]] = None,
    k: int = 256,
    partial: bool = True,
) -> DataFrame:
    """The persistable KMV sketch STATE: one row per group,
    (by..., hashes) where ``hashes`` is the ASCENDING-sorted array of the
    group's k smallest distinct h60 hashes (shorter than k when the group
    has fewer distinct values — then the state IS the exact value set's
    hashes).

    This is the column a sketch WAREHOUSE stores: per-shard/per-day
    states written once at ingest, any later rollup or refresh is a
    cheap ``kmv_merge_states`` over the tiny state tables — no corpus
    re-scan (the manifest-style incremental pattern of
    ``bm25_index_ingest``, for cardinality).  O(k) per group regardless
    of corpus size; same one-combine shape as ``kmv_distinct``."""
    keys = list(by or [])
    ranked = _kmv_bottomk(df, value, keys, k, partial)
    grouped = ranked.groupBy(*keys) if keys else ranked.groupBy()
    return grouped.agg(
        F.sort_array(F.collect_list("__h__")).alias("hashes")
    )


def kmv_merge_states(
    a: DataFrame, b: DataFrame, by: Optional[Sequence[str]] = None,
    k: int = 256,
) -> DataFrame:
    """Merge two KMV state tables: full-outer join on the group keys,
    union the hash arrays, keep the k smallest distinct — EXACTLY the
    state a from-scratch build over the union of the inputs produces
    (bottom-k(distinct(A u B)) == bottom-k(bottom-k(A) u bottom-k(B)):
    any of the union's k smallest hashes is within the k smallest of its
    own side).

    The merge law is IDEMPOTENT and commutative (set union), so —
    unlike ``bm25_merge_stats``'s additive law — replaying a batch is a
    no-op and the streaming maintainer needs no versioned exactly-once
    plumbing: at-least-once delivery is already exact.  Cost: state-grain
    join (groups x k), independent of corpus size."""
    keys = list(by or [])
    a2 = a.select(*keys, F.col("hashes").alias("__ha__"))
    b2 = b.select(*keys, F.col("hashes").alias("__hb__"))
    joined = (
        a2.join(b2, on=keys, how="full_outer")
        if keys
        else a2.crossJoin(b2)
    )
    empty = F.array().cast("array<long>")
    merged = F.slice(
        F.array_sort(
            F.array_distinct(
                F.concat(
                    F.coalesce(F.col("__ha__"), empty),
                    F.coalesce(F.col("__hb__"), empty),
                )
            )
        ),
        1,
        k,
    )
    return joined.select(*keys, merged.alias("hashes"))


def read_kmv_state(spark, state_dir: str):
    """Load the latest COMPLETE version of a ``kmv_state_sink`` state
    directory: ``(version, state_df)``, or ``(-1, None)`` when none
    exists.  Completeness = the parquet writer's ``_SUCCESS`` marker —
    a torn write (crash mid-version) is never visible to readers.
    Listing goes through the Hadoop FS API (portable to any defaultFS)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        return -1, None
    versions = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("v")):
            continue
        try:
            v = int(name[1:])
        except ValueError:
            continue
        if fs.exists(
            jvm.org.apache.hadoop.fs.Path(f"{state_dir}/v{v}/_SUCCESS")
        ):
            versions.append(v)
    if not versions:
        return -1, None
    v = max(versions)
    return v, spark.read.parquet(f"{state_dir}/v{v}")


def kmv_state_sink(
    state_dir: str,
    value_col: str,
    by: Optional[Sequence[str]] = None,
    k: int = 256,
):
    """``foreachBatch`` maintainer that keeps a KMV sketch warehouse
    fresh under a stream — the cardinality twin of
    ``retrieval.bm25_index_sink``, structurally SIMPLER because the
    set-union merge law is idempotent: a replayed batch re-merges to the
    identical state, so there is NO batch-id skip gate; at-least-once
    delivery is already exact.  What remains is torn-write safety:
    each merge writes a NEW monotonically-numbered version directory
    (never overwriting the version it read), and ``read_kmv_state``
    only surfaces versions with a ``_SUCCESS`` marker — so a crash
    mid-write leaves the previous version serving.  O(batch + state)
    per trigger."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        version, stored = read_kmv_state(spark, state_dir)
        b = kmv_state(batch_df, F.col(value_col), by=by, k=k)
        merged = b if stored is None else kmv_merge_states(
            stored, b, by=by, k=k
        )
        merged.write.mode("overwrite").parquet(
            f"{state_dir}/v{version + 1}"
        )

    return merge


def kmv_estimate(state: DataFrame, by: Optional[Sequence[str]] = None,
                 k: int = 256) -> DataFrame:
    """Distinct-count estimate from a KMV state table — the same
    estimator (and the same IEEE-double arithmetic, so the DuckDB oracle
    reproduces it bit-for-bit) as ``kmv_distinct``: exact count when the
    state holds fewer than k hashes, else (k-1) * 2^60 / m_k floored.
    Returns (by..., n_kept, est_distinct); zero shuffles — pure column
    algebra over the state rows."""
    keys = list(by or [])
    n_kept = F.size("hashes").cast("long")
    est = F.when(n_kept < k, n_kept.cast("double")).otherwise(
        F.floor(
            F.lit(float(k - 1)) * F.lit(_DOMAIN)
            / F.element_at("hashes", -1)
        )
    )
    return state.select(
        *keys,
        n_kept.alias("n_kept"),
        est.cast("long").alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Apache Datasketches family (Spark 4 built-ins: theta / HLL / KLL)
#
# These complement kmv_distinct: KMV is the cross-engine-reproducible sketch
# (oracle-exact at ANY scale); the Datasketches built-ins are the
# industry-standard mergeable binary sketches with JVM-side set algebra.
# Their estimates are EXACT while the sketch is below its retention
# capacity (theta: k=4096 retained hashes; HLL: sparse mode; KLL: fewer
# items than k) and approximate beyond it — each wrapper documents the
# regime, and the gated queries ride fixtures inside the exact regime so
# the oracle checks real values, while at 100 TB the same plan degrades
# gracefully to (mergeable, bounded-error) estimates instead of OOM.
# ---------------------------------------------------------------------------


def theta_overlap_matrix(
    df: DataFrame, value: Column, by: str, lg_k: int = 12
) -> DataFrame:
    """Pairwise set-overlap matrix between groups via theta sketches:
    one ``theta_sketch_agg`` per group, then JVM-side
    union/intersection/difference estimates for every unordered group
    pair (group_a < group_b). Returns (group_a, group_b, n_a, n_b,
    n_union, n_intersect, n_diff_ab, jaccard_e6).

    The cross-source overlap/contamination audit a corpus needs: with G
    groups the pairwise stage touches G^2/2 SKETCHES (bytes), never
    re-scanning the corpus — the scan is one map-side-combining keyed
    aggregation, and sketches are mergeable so partial aggregation
    composes across 100 TB of input splits. Estimates are exact while
    each group retains < 2^lg_k distinct hashes (theta exact mode);
    beyond that they carry the standard ~1/sqrt(k) relative error.
    """
    sk = df.groupBy(by).agg(
        F.theta_sketch_agg(value, F.lit(lg_k)).alias("__sk__"),
        F.theta_sketch_estimate(F.theta_sketch_agg(value, F.lit(lg_k)))
        .cast("long")
        .alias("__n__"),
    )
    a = sk.select(
        F.col(by).alias("group_a"),
        F.col("__sk__").alias("__ska__"),
        F.col("__n__").alias("n_a"),
    )
    b = sk.select(
        F.col(by).alias("group_b"),
        F.col("__sk__").alias("__skb__"),
        F.col("__n__").alias("n_b"),
    )
    # the per-group sketch table is tiny (one row per group) — broadcast
    # the self-join so the pairwise stage never shuffles
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    u = F.theta_sketch_estimate(F.theta_union("__ska__", "__skb__")).cast("long")
    i = F.theta_sketch_estimate(F.theta_intersection("__ska__", "__skb__")).cast(
        "long"
    )
    d = F.theta_sketch_estimate(F.theta_difference("__ska__", "__skb__")).cast("long")
    return pairs.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        u.alias("n_union"),
        i.alias("n_intersect"),
        d.alias("n_diff_ab"),
        F.floor(i * F.lit(1000000) / u).cast("long").alias("jaccard_e6"),
    )


def hll_rollup(
    df: DataFrame,
    value: Column,
    fine: Sequence[str],
    coarse: Sequence[str],
    lg_k: int = 12,
) -> DataFrame:
    """Two-level mergeable distinct-count rollup: HLL partial sketches at
    the ``fine`` grain, ``hll_union_agg`` merged up to the ``coarse``
    grain — the shape a 100 TB per-shard profile uses (shard-level
    sketches persisted once, every coarser rollup is a cheap sketch
    merge, no corpus re-scan). Returns (coarse..., n_parts,
    est_distinct). Estimates are exact in HLL's sparse regime (distinct
    count well under 2^lg_k) and ~1.6% (lg_k=12) beyond.
    """
    fine_sk = df.groupBy(*fine).agg(
        F.hll_sketch_agg(value, F.lit(lg_k)).alias("__sk__")
    )
    return (
        fine_sk.groupBy(*coarse)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.hll_sketch_estimate(F.hll_union_agg("__sk__"))
            .cast("long")
            .alias("est_distinct"),
        )
    )


def kll_quantiles(
    df: DataFrame,
    value: Column,
    by: Optional[Sequence[str]] = None,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    k: int = 1024,
) -> DataFrame:
    """Per-group quantiles of a bigint measure via a KLL sketch — the
    mergeable bounded-memory quantile summary (Karnin-Lang-Liberty 2016).
    Returns (by..., n, q_50, q_90, ... one column per requested quantile,
    labeled by percentage with an e-suffix for fractional parts).

    While a group holds fewer than ~k items the sketch retains them all
    and each quantile is the EXACT order statistic (datasketches
    inclusive rank rule == DuckDB ``quantile_disc``); beyond that rank
    error is ~1.65% * (200/k)^0.9. One map-side-combining keyed agg; the
    per-group state is O(k) regardless of corpus size.
    """
    keys = list(by or [])
    v = value.cast("bigint")
    grouped = df.groupBy(*keys) if keys else df.groupBy()
    agg = grouped.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.kll_sketch_agg_bigint(v, F.lit(k)).alias("__sk__"),
    )
    cols = [*keys, "n"]
    for q in quantiles:
        pct = q * 100
        label = f"q_{int(pct)}" if float(pct).is_integer() else (
            "q_" + f"{pct:g}".replace(".", "_")
        )
        cols.append(
            F.kll_sketch_get_quantile_bigint(F.col("__sk__"), F.lit(float(q)))
            .cast("long")
            .alias(label)
        )
    return agg.select(*cols)


def heavy_hitters(
    df: DataFrame,
    value: Column,
    k: int = 64,
    partial: bool = True,
) -> DataFrame:
    """EXACT phi-heavy hitters (phi = 1/k): every value whose frequency
    exceeds N/k, with its exact count and corpus share. Returns
    (item, cnt, share_e6), share integerized as floor(1e6 * cnt / N).

    Two-pass summary-then-recount — the standard distributed exact form
    (Misra-Gries 1982 / SpaceSaving, Metwally et al. 2005, run as the
    candidate pass of the two-round scheme in Berinde et al. 2010):

    1. **Candidate pass** (bounded state): per Arrow batch, keep only
       values with local count * k > batch size. Pigeonhole guarantees
       losslessness — if a value's GLOBAL count exceeds N/k, then in at
       least one batch its local count exceeds that batch's n/k, so the
       union of per-batch survivors is a superset of the true heavy
       hitters. Each batch emits at most k-1 candidates, so the candidate
       set is O(k * batches) regardless of corpus size, and the pass is a
       vectorized value_counts, never a Python loop over rows.
    2. **Recount pass** (exact): broadcast-semi-join the stream to the
       candidate set (constant-size build side), one map-side-combining
       keyed agg for exact counts, filter cnt * k > N.

    The naive alternative — groupBy every distinct value — shuffles the
    full distinct domain (token vocabulary at 100 TB); here the only keyed
    shuffle is over candidate rows. N rides the candidate scan itself
    (per-batch sentinel totals in the same Arrow pass, materialized once
    at <= k rows/batch), so the operator costs exactly TWO corpus scans:
    candidates+N, then the semi-joined recount. ``partial=False`` skips pass 1 (exact but
    full-vocabulary shuffle; only for tiny domains/tests).
    """
    # NULL items are excluded up front: the pandas value_counts candidate
    # pass drops NaN while a Spark groupBy would count the null key, so
    # without this filter the partial and non-partial paths would disagree
    # on null-bearing inputs (N excludes nulls by the same rule)
    vals = df.select(value.cast("string").alias("item")).where(
        F.col("item").isNotNull()
    )
    if partial:
        # each batch yields its local heavy candidates (cnt*k > batch size)
        # PLUS one sentinel row (item NULL) carrying the batch size, so N
        # comes out of this same scan — the recount pass is then the only
        # other full scan (2 total; a separate count() agg would be a 3rd)
        def _local_hh(batches):
            import pandas as pd

            for pdf in batches:
                vc = pdf["item"].value_counts()
                hh = vc[vc * k > len(pdf)].index.to_frame(
                    index=False, name="item"
                )
                hh["n_batch"] = 0
                yield pd.concat(
                    [hh, pd.DataFrame({"item": [None], "n_batch": [len(pdf)]})],
                    ignore_index=True,
                )

        pass1 = vals.mapInPandas(_local_hh, schema="item string, n_batch long")
        pass1 = pass1.localCheckpoint(eager=True)
        cand = (
            pass1.where(F.col("item").isNotNull())
            .select("item")
            .dropDuplicates(["item"])
        )
        total = pass1.where(F.col("item").isNull()).agg(
            F.sum("n_batch").cast("long").alias("__n__")
        )
        filtered = vals.join(F.broadcast(cand), "item", "left_semi")
    else:
        filtered = vals
        total = vals.agg(F.count(F.lit(1)).cast("long").alias("__n__"))
    counts = filtered.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * k > F.col("__n__"))
        .select(
            "item",
            "cnt",
            F.floor(F.lit(1000000.0) * F.col("cnt") / F.col("__n__"))
            .cast("long")
            .alias("share_e6"),
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch — point-frequency estimates in fixed memory
# ---------------------------------------------------------------------------


def cms_counters(
    df: DataFrame, value: Column, d: int = 4, w: int = 32
) -> DataFrame:
    """Count-min sketch counter table (Cormode-Muthukrishnan 2005) over a
    value stream: ``d`` independent md5-salted hash rows × ``w`` buckets,
    each bucket the COUNT of stream items hashing into it. Returns
    (row, bucket, n) — at most d·w rows regardless of stream size or
    cardinality, which is the whole point: the keyed shuffle's key domain
    is the d·w counter grid (map-side combine collapses the stream before
    it moves), never the vocabulary. Mergeable across shards/days by
    simple (row, bucket) addition.

    Error contract: estimates only OVERcount (collisions add), with
    overshoot ≤ e·N/w at confidence 1-e^-d. The fixture queries size w
    BELOW the vocabulary on purpose so collisions actually occur and the
    oracle checks real overestimates; production sizing is w = ceil(e/ε)
    for target ε·N error (w=2^20 rows × d=4 = 32 MiB of longs for any
    corpus size)."""
    from kioss_spark.operators.text import salted_h60

    keys = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("row"),
                F.pmod(salted_h60(value, j), F.lit(w)).cast("long").alias("bucket"),
            )
            for j in range(d)
        ]
    )
    return (
        df.select(F.explode(keys).alias("k"))
        .groupBy(F.col("k.row").alias("row"), F.col("k.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def cms_estimate(
    probes: DataFrame,
    counters: DataFrame,
    value_col: str = "tok",
    d: int = 4,
    w: int = 32,
) -> DataFrame:
    """Point-frequency estimate for each probe value: min over the d rows
    of that value's bucket counters (absent buckets count 0, so
    never-seen values estimate 0). The probe side explodes to d lookup
    keys and LEFT-joins the counter table — d·w rows, broadcast — then a
    probe-keyed min: cost is O(|probes|·d) at any corpus size."""
    from kioss_spark.operators.text import salted_h60

    v = F.col(value_col)
    keys = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("row"),
                F.pmod(salted_h60(v, j), F.lit(w)).cast("long").alias("bucket"),
            )
            for j in range(d)
        ]
    )
    exploded = probes.select(v.alias(value_col), F.explode(keys).alias("k")).select(
        value_col, F.col("k.row").alias("row"), F.col("k.bucket").alias("bucket")
    )
    joined = exploded.join(F.broadcast(counters), ["row", "bucket"], "left")
    return joined.groupBy(value_col).agg(
        F.min(F.coalesce(F.col("n"), F.lit(0).cast("long"))).cast("long").alias("est_n")
    )
