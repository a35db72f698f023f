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

__all__ = [
    "snapshot_diff",
    "scd2_history",
    "apply_changeset",
    "hash_sample",
    "stratified_sample",
    "token_budget_cap",
    "hash_split",
    "pack_contiguous",
    "importance_score",
    "shard_shuffle",
    "interleave_weighted",
    "class_balance_weights",
    "quantile_strata_sample",
    "quota_sample",
]


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


def stratified_sample(
    df: DataFrame,
    rates_bp: dict[str, int],
    group_col: str = "lang",
    key_col: str = "text",
    default_bp: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling: each ``group_col`` value gets its
    own basis-point keep rate (the standard rebalancing move — e.g. keep
    all of a rare language, downsample the dominant one).

    The stratum rate table is a handful of literals, so it compiles to a
    CASE chain — the whole operator stays a narrow filter over the scan
    (no join, no shuffle, nothing to broadcast). Like :func:`hash_sample`,
    selection is a pure function of content, so the sample is stable under
    repartitioning and reruns and reproducible in any engine.
    """
    bucket = F.pmod(h60(F.col(key_col)), F.lit(10000))
    rate = F.lit(default_bp)
    for group, bp in sorted(rates_bp.items()):
        rate = F.when(F.col(group_col) == group, F.lit(bp)).otherwise(rate)
    return df.where(bucket < rate)


def shard_shuffle(
    df: DataFrame,
    n_shards: int,
    seed: str = "shuffle",
    key_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global permutation for training-order shuffling,
    expressed scale-safely as ``(shard, pos)``: shard = hash bucket of the
    content (seeded), pos = rank within the shard by (hash, id). Reading
    shards in order [0..n_shards) and each shard by ``pos`` visits the
    corpus in a reproducible pseudorandom order.

    Scale plan: ONE hash-partitioned shuffle on ``shard`` feeds
    per-partition windows — there is deliberately no global
    ``row_number`` (single-partition scale-killer; see Stream._ranked).
    With ``n_shards`` in the thousands a 100 TB corpus gives ~GB-sized
    shards, each sorted independently; the trainer's data loader consumes
    shards as files, which is exactly how Pile/C4-style corpora ship.
    Collision ties within a shard break on ``id_col``, keeping the
    permutation total and deterministic.
    """
    h = h60(F.concat(F.lit(f"{seed}|"), F.col(key_col)))
    w = Window.partitionBy("shard").orderBy("__h__", id_col)
    return (
        df.withColumn("__h__", h)
        .withColumn("shard", F.pmod(F.col("__h__"), F.lit(n_shards)).cast("long"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("__h__")
    )


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


def hash_split(
    df: DataFrame,
    key_col: str = "text",
    train_bp: int = 9000,
    val_bp: int = 500,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment from content-hash basis
    points (defaults: 90/5/5).

    The property that matters for training pipelines: a document's split is
    a pure function of its CONTENT — stable under repartitioning, corpus
    growth, and re-runs, and reproducible in any engine. rand()-based
    splits silently leak val into train on every recompute; this cannot.
    Narrow (no shuffle): a projection over the scan.
    """
    bucket = F.pmod(h60(F.col(key_col)), F.lit(10000))
    label = (
        F.when(bucket < train_bp, F.lit("train"))
        .when(bucket < train_bp + val_bp, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(split_col, label)


def pack_contiguous(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    tokens_col: str = "n_tok",
    id_col: str = "doc_id",
    bin_col: str = "bin",
) -> DataFrame:
    """Contiguous sequence packing: per group, walk documents in id order
    and assign each to the training bin where its token offset starts
    (``bin = floor(start_offset / budget)``).

    This is the shuffle-light form of sequence packing: one keyed window
    (cumulative tokens per group) instead of a stateful first-fit packer,
    and fully deterministic integer arithmetic. Bins are budget-sized by
    offset; a document straddling a boundary stays in the bin where it
    starts, so overflow is bounded by one document (standard for
    chunk-by-offset packing — the trainer's sample cutter handles the
    tail). First-fit-decreasing would pack ~1% tighter but needs
    sequential state per bin; at 100 TB the windowed form wins.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = F.col(tokens_col).cast("long")
    start = F.sum(tok).over(w) - tok
    return df.withColumn(bin_col, F.floor(start / F.lit(budget)).cast("long"))


def importance_score(
    df: DataFrame,
    target,
    id_col: str = "doc_id",
    tokens_col: str = "t",
    n_buckets: int = 4096,
) -> DataFrame:
    """Hashed-unigram importance scoring (DSIR-style, Xie et al. 2023
    "Data Selection for Language Models via Importance Resampling"): score
    each document by how much more its tokens look like a TARGET slice of
    the corpus than like the corpus overall.

    Per hash bucket ``b`` the weight is the Laplace-smoothed probability
    gap, integerized so summation is order-independent::

        w_e6(b) = floor(1e6*(tcnt+1)/(ttot+B)) - floor(1e6*(ccnt+1)/(ctot+B))

    and a document's score is the sum of ``w_e6`` over its token instances
    (linear surrogate for the log-likelihood ratio — log would make the
    cross-engine float contract unverifiable; the integer form is exact).

    Scale plan: one explode of the token stream feeds a groupBy on the
    hash bucket — map-side combine collapses every task's contribution to
    <= ``n_buckets`` rows, so the shuffle is O(tasks x buckets) regardless
    of corpus size. The bucket-weight table is CONSTANT-size
    (``n_buckets`` rows), so it takes a hard broadcast hint back onto the
    token stream; the final aggregation shuffles on the document id.
    Nothing in the plan grows super-linearly with corpus size.

    ``target`` is a boolean Column marking target-domain rows. Returns
    ``(id_col, n_tok, score_e6)``; zero-token documents drop out (they
    have no tokens to score).
    """
    b = df.select(
        id_col,
        F.col(tokens_col).alias("__t__"),
        target.alias("__tgt__"),
    ).select(
        id_col,
        "__tgt__",
        F.explode("__t__").alias("__tk__"),
    ).select(
        id_col,
        "__tgt__",
        F.pmod(h60(F.col("__tk__")), F.lit(n_buckets)).alias("__bkt__"),
    )
    counts = b.groupBy("__bkt__").agg(
        F.count(F.lit(1)).alias("__ccnt__"),
        F.sum(F.col("__tgt__").cast("long")).alias("__tcnt__"),
    )
    tots = counts.agg(
        F.sum("__ccnt__").alias("__ctot__"), F.sum("__tcnt__").alias("__ttot__")
    )
    weights = counts.crossJoin(F.broadcast(tots)).select(
        "__bkt__",
        (
            F.floor(
                (F.col("__tcnt__") + 1) * 1000000.0 / (F.col("__ttot__") + n_buckets)
            ).cast("long")
            - F.floor(
                (F.col("__ccnt__") + 1) * 1000000.0 / (F.col("__ctot__") + n_buckets)
            ).cast("long")
        ).alias("__w_e6__"),
    )
    return (
        b.join(F.broadcast(weights), "__bkt__")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum("__w_e6__").alias("score_e6"),
        )
    )


def interleave_weighted(
    df: DataFrame,
    by: str,
    weights: dict,
    order_hash: Column,
    id_col: str = "doc_id",
    default_weight: float = 1.0,
    shard_bits: int = 8,
) -> DataFrame:
    """Deterministic weighted interleave — the training-data MIXING schedule:
    group ``by`` (source/domain/language), emit each group's rows at evenly
    spaced mix positions proportional to 1/weight, so a weight-2.0 group
    appears twice as often per unit of schedule as a weight-1.0 one
    (the deterministic form of temperature/mixture sampling).

    Appends (r_in_group, mix_key_e6): rank within group by
    (``order_hash``, ``id_col``) — a 60-bit h60-style hash giving the
    pseudorandom visit order — and the integerized schedule key
    ``floor(r * 1e6 / w)``. A consumer materializes the training order by
    sorting on (mix_key_e6, by, r) per output shard, never globally.

    Scale shape: a plain ``row_number() over (partition by group)`` puts
    each group's entire corpus through ONE task — the single-partition
    scale-killer this engine bans (see Stream._ranked). Instead the rank is
    two-phase on h-RANGE shards: shard = top ``shard_bits`` bits of the
    hash (shards partition the hash axis in order, so within-group rank =
    per-shard rank + a prefix offset over earlier shards). The big shuffle
    is keyed by (group, shard) — 2^shard_bits tasks per group — and the
    offset table is groups x shards rows riding a broadcast join. Weights
    ride a literal map; ``1e6 * r`` and the IEEE division are exact in both
    engines, so the schedule is oracle-reproducible bit-for-bit against the
    naive single-window SQL form.
    """
    pairs = []
    for k, v in weights.items():
        pairs += [F.lit(k), F.lit(float(v))]
    wmap = F.create_map(*pairs) if pairs else None
    w_col = (
        F.coalesce(wmap[F.col(by)], F.lit(float(default_weight)))
        if wmap is not None
        else F.lit(float(default_weight))
    )
    # h60 is 60 bits; top shard_bits of it give hash-ordered ranges
    shard = F.shiftright(order_hash, 60 - shard_bits)
    hashed = df.withColumn("__h__", order_hash).withColumn("__s__", shard)
    counts = hashed.groupBy(by, "__s__").agg(F.count(F.lit(1)).alias("__n__"))
    w_off = (
        Window.partitionBy(by)
        .orderBy("__s__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        by, "__s__", F.coalesce(F.sum("__n__").over(w_off), F.lit(0)).alias("__off__")
    )
    w_loc = Window.partitionBy(by, "__s__").orderBy("__h__", id_col)
    ranked = (
        hashed.join(F.broadcast(offsets), on=[by, "__s__"])
        .withColumn(
            "r_in_group",
            (F.col("__off__") + F.row_number().over(w_loc)).cast("long"),
        )
        .drop("__h__", "__s__", "__off__")
    )
    return ranked.withColumn(
        "mix_key_e6",
        F.floor(F.col("r_in_group") * 1000000 / w_col).cast("long"),
    )


def class_balance_weights(df: DataFrame, label_col: str = "label") -> DataFrame:
    """Inverse-frequency resampling weights per class: ``weight_e6 =
    floor(1e6 * total / (n_labels * n))`` — the standard class-balanced
    loss/sampling weight (each class's weights sum to ~total/n_labels).
    Returns one row per label: (label, n, weight_e6).

    Scale shape: one keyed agg with map-side combine (label-cardinality
    output), the corpus totals ride a broadcast crossJoin of a one-row
    aggregate — the same constant-size-stats pattern as dsir_importance.
    Integer arithmetic only, so the oracle is bit-exact."""
    per = df.groupBy(label_col).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = per.agg(
        F.sum("n").cast("long").alias("__total__"),
        F.count(F.lit(1)).cast("long").alias("__n_labels__"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        F.col(label_col),
        F.col("n"),
        F.floor(
            F.lit(1000000.0) * F.col("__total__") / (F.col("__n_labels__") * F.col("n"))
        )
        .cast("long")
        .alias("weight_e6"),
    )


def quantile_strata_sample(
    df: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    rates_bp: tuple = (4000, 3000, 2000, 1000),
) -> DataFrame:
    """Deterministic stratified sample over data-driven QUARTILE strata of
    ``value_col`` (e.g. oversample short documents, downsample long ones):
    stratum boundaries are exact quartiles, selection within each stratum
    is a content-hash bucket test at ``rates_bp[stratum]`` basis points —
    no ``rand()``, reproducible in SQL.

    Exact quantiles WITHOUT a global sort of the data: the value
    histogram (``groupBy(value)``, bounded cardinality — document lengths,
    not documents) gets a cumulative count via a single-partition window
    over that *histogram-sized* table (the same constant-size-stats
    exception as every quantile subplan in this repo; the corpus itself
    is never globally sorted), boundaries fall out as conditional
    aggregates, and the broadcast join back assigns strata in one narrow
    pass. Total: one histogram shuffle + one broadcast join at any
    corpus size.

    Returns (id, value, stratum, kept): every row with its stratum, and
    ``kept`` 1/0 so the caller can filter or audit rate adherence."""
    v = F.col(value_col)
    hist = df.groupBy(v.alias("__v__")).agg(F.count(F.lit(1)).alias("__c__"))
    w = Window.orderBy("__v__").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("__v__", F.sum("__c__").over(w).alias("__cum__"))
    bounds = cum.crossJoin(
        F.broadcast(hist.agg(F.sum("__c__").alias("__tot__")))
    ).agg(
        F.min(F.when(F.col("__cum__") * 4 >= F.col("__tot__"), F.col("__v__"))).alias("__b1__"),
        F.min(F.when(F.col("__cum__") * 2 >= F.col("__tot__"), F.col("__v__"))).alias("__b2__"),
        F.min(F.when(F.col("__cum__") * 4 >= F.col("__tot__") * 3, F.col("__v__"))).alias("__b3__"),
    )
    stratum = (
        F.when(v <= F.col("__b1__"), F.lit(0))
        .when(v <= F.col("__b2__"), F.lit(1))
        .when(v <= F.col("__b3__"), F.lit(2))
        .otherwise(F.lit(3))
        .cast("long")
    )
    rate = F.element_at(
        F.array(*[F.lit(int(r)) for r in rates_bp]), stratum.cast("int") + 1
    )
    kept = (
        F.pmod(h60(F.col(id_col).cast("string")), F.lit(10000)) < rate
    )
    return df.crossJoin(F.broadcast(bounds)).select(
        F.col(id_col),
        v.alias("value"),
        stratum.alias("stratum"),
        kept.cast("long").alias("kept"),
    )


def snapshot_diff(
    prev: DataFrame,
    curr: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Corpus version diff: classify every id across two snapshots as
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` by comparing a
    content hash — the audit a daily-refresh pipeline runs before
    retraining decisions (how much actually moved?) and the batch analog
    of a MERGE source-vs-target classification.

    One keyed full-outer join on the id. In production both snapshots are
    written bucketed by id, so this is a zero-shuffle sort-merge of
    co-located buckets; hashes (16-byte md5 here) travel instead of
    payloads, so the join carries ~32 bytes/doc regardless of document
    size."""
    # presence tracked by explicit marker columns, NOT hash nullness — a
    # snapshot with a nullable hash column would otherwise misclassify
    # (prev-only row with NULL hash -> 'added')
    #
    # NULL-hash semantics: 'changed' uses eqNullSafe, so NULL vs non-NULL
    # counts as changed and NULL vs NULL as unchanged. Plain SQL `!=`
    # (as in the corpus_snapshot_diff oracle) would send any NULL hash to
    # 'unchanged' — no divergence there because that query's md5 hashes
    # are never NULL, but an oracle over nullable hashes must mirror this
    # with IS DISTINCT FROM.
    p = prev.select(
        F.col(id_col), F.col(hash_col).alias("__hp__"), F.lit(True).alias("__in_p__")
    )
    c = curr.select(
        F.col(id_col), F.col(hash_col).alias("__hc__"), F.lit(True).alias("__in_c__")
    )
    status = (
        F.when(F.col("__in_p__").isNull(), F.lit("added"))
        .when(F.col("__in_c__").isNull(), F.lit("removed"))
        .when(~F.col("__hp__").eqNullSafe(F.col("__hc__")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return p.join(c, id_col, "full_outer").select(
        F.col(id_col), status.alias("status")
    )


def apply_changeset(
    corpus: DataFrame,
    changes: DataFrame,
    id_col: str = "doc_id",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC changeset to a corpus snapshot — the MERGE/upsert a
    daily-refresh pipeline runs to roll snapshot N into N+1 without
    rewriting unchanged documents. ``changes`` carries the corpus columns
    plus ``op``: ``'delete'`` removes the id, ``'upsert'`` replaces-or-
    inserts the row. Unknown ops raise. If the changeset carries several
    rows for one id, the winner is the min-op row (``'delete'`` <
    ``'upsert'`` lexically) then min over remaining columns —
    deterministic, engine-reproducible.

    Shape: one keyed dedup over the changeset (tiny), one LEFT ANTI join
    of the corpus against changed ids, one union with the upsert rows —
    the corpus is scanned once and never shuffled on content. With both
    sides bucketed by id the anti join is a co-located merge; only the
    changeset (days' churn, not the corpus) ever moves."""
    data_cols = [c for c in corpus.columns if c != id_col]
    bad = changes.where(~F.col(op_col).isin("delete", "upsert"))
    # validate eagerly on the changeset only (constant-size scan)
    n_bad = bad.limit(1).count()
    if n_bad:
        row = bad.limit(1).collect()[0]
        raise ValueError(
            f"apply_changeset: unknown op {row[op_col]!r} for id {row[id_col]!r}"
        )
    one = changes.groupBy(id_col).agg(
        F.min(
            F.struct(F.col(op_col).alias("op"), *[F.col(c) for c in data_cols])
        ).alias("__w__")
    )
    kept = corpus.join(one.select(id_col), id_col, "left_anti")
    upserts = one.where(F.col("__w__.op") == "upsert").select(
        F.col(id_col), *[F.col(f"__w__.{c}").alias(c) for c in data_cols]
    )
    return kept.unionByName(upserts.select(*corpus.columns))


def quota_sample(
    df: DataFrame,
    weights: dict,
    total: int,
    by: str = "source",
    key_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-quota mixture sampling by the largest-remainder method
    (Hamilton apportionment): given target group weights (e6-scaled,
    summing to 1e6) and a total sample size, select EXACTLY
    ``base_g + bonus_g`` rows per group — ``base_g = (total * w_g) div
    1e6``, with the ``total - Σ base`` leftover seats going to the
    largest fractional remainders (group name as the deterministic
    tiebreak). The interleave operator (``interleave_weighted``) orders
    an epoch by mixture RATE; this one cuts a sample with exact COUNTS —
    what a benchmark/eval subset or a fixed token budget needs, where
    rate-based mixing over- or under-shoots per group.

    Within each group, selection is the first ``n_g`` rows by content
    hash (h60, id tiebreak) — deterministic, reproducible, no rand().
    Groups with fewer rows than their quota contribute everything they
    have (the shortfall is reported, not silently redistributed — quota
    reallocation is a policy decision, not a sampler's).

    Returns the selected rows as (id, group, rn, quota_n). One keyed
    rank window over only the weighted groups (others are filtered
    before the shuffle); the apportionment table is |groups| rows,
    broadcast into the selection join."""
    from kioss_spark.operators.text import h60

    wsum = sum(int(w) for w in weights.values())
    if wsum != 1_000_000:
        # under-summed weights make leftover exceed the group count (the
        # +1-per-group bonus pass silently under-fills the EXACT total);
        # over-summed weights overshoot with negative leftover
        raise ValueError(
            f"quota_sample weights must sum to 1_000_000 (e6 scale), got {wsum}"
        )
    sess = df.sparkSession
    wrows = [(g, int(w)) for g, w in sorted(weights.items())]
    wdf = sess.createDataFrame(wrows, f"{by} string, w_e6 long")
    ideal = wdf.select(
        by,
        (F.lit(int(total)) * F.col("w_e6")).alias("num"),
    ).select(
        by,
        F.expr("num div 1000000").cast("long").alias("base_n"),
        F.pmod("num", F.lit(1000000)).cast("long").alias("rem"),
    )
    leftover = F.lit(int(total)) - F.sum("base_n").over(Window.partitionBy())
    rw = Window.partitionBy().orderBy(F.col("rem").desc(), F.col(by))
    quota = ideal.select(
        by,
        "base_n",
        F.row_number().over(rw).alias("rrank"),
        leftover.alias("leftover"),
    ).select(
        by,
        (
            F.col("base_n")
            + F.when(F.col("rrank") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("quota_n"),
    )
    ranked = df.join(F.broadcast(quota), by).select(
        F.col(id_col),
        F.col(by),
        F.col("quota_n"),
        F.row_number()
        .over(
            Window.partitionBy(by).orderBy(h60(F.col(key_col)), F.col(id_col))
        )
        .alias("rn"),
    )
    return ranked.where(F.col("rn") <= F.col("quota_n"))


def scd2_history(
    snaps: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "content_hash",
    version_col: str = "version",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history reconstruction: collapse
    a long (version, id, content_hash) snapshot table into validity
    intervals ``(id, content_hash, v_from, v_to)`` — one row per
    contiguous run of versions where the document existed with the same
    content. The lineage table every compliance/provenance question about
    a training corpus reduces to ("which text did doc X carry when
    snapshot v was cut?"), and the warehouse-classic SCD2 shape built
    from append-only snapshots instead of CDC feeds.

    Semantics: a run BREAKS when the content hash changes (eqNullSafe —
    NULL vs non-NULL is a change, the snapshot_diff discipline) OR when
    the id is absent from an intermediate version (presence gap: absence
    closes the interval; reappearance opens a new one, even with
    identical content — the document's absence from a shipped snapshot
    is itself history).

    Gaps-and-islands in two windows over (id, version): a start flag
    (hash differs from lag, or version > lag+1, or first row), its
    running sum as the island id, then one group-by per island for
    (min, max) version. All three shuffles share the id key — in
    production snapshots are bucketed by id, so the windows and the agg
    are co-located, zero wide exchanges; state per id is its version
    count, never corpus-sized."""
    w = Window.partitionBy(id_col).orderBy(version_col)
    lag_h = F.lag(F.col(hash_col)).over(w)
    lag_v = F.lag(F.col(version_col)).over(w)
    start = (
        F.when(lag_v.isNull(), F.lit(1))
        .when(F.col(version_col) != lag_v + 1, F.lit(1))
        .when(~F.col(hash_col).eqNullSafe(lag_h), F.lit(1))
        .otherwise(F.lit(0))
    )
    grp = F.sum("__start__").over(
        Window.partitionBy(id_col)
        .orderBy(version_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        snaps.select(
            F.col(id_col), F.col(hash_col), F.col(version_col),
            start.alias("__start__"),
        )
        .withColumn("__grp__", grp)
        .groupBy(id_col, hash_col, "__grp__")
        .agg(
            F.min(version_col).cast("long").alias("v_from"),
            F.max(version_col).cast("long").alias("v_to"),
        )
        .drop("__grp__")
    )
