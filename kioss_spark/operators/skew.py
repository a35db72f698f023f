"""Skew- and layout-management utilities — the shuffle levers for 100 TB.

- ``salted_agg``: two-stage aggregation for skewed grouping keys. Stage 1
  groups on (key, salt) — the hot key's rows spread over ``salt_buckets``
  reducers; stage 2 merges the per-salt partials on the bare key (tiny:
  ``salt_buckets`` rows per key). Correct for any algebraic aggregate
  (sum/count/min/max; avg = sum+count merged at stage 2).
- ``salted_join``: replicate-and-salt for joining a skewed fact key against
  a small-ish dimension: fact rows get a random-but-deterministic salt,
  dimension rows are exploded ``salt_buckets`` ways, join key becomes
  (key, salt). AQE's skew-join handles the same problem adaptively when
  statistics reveal it; explicit salting is the plan-level guarantee.
- ``write_bucketed`` / ``read_bucketed``: co-located joins via bucketed
  tables — both sides bucketed by the join key into the same bucket count
  join WITHOUT a shuffle (SortMergeJoin over pre-bucketed scans).

Salts are deterministic (hash of the row's other columns mod buckets, or a
provided column) so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "salted_agg",
    "salted_join",
    "write_bucketed",
    "read_bucketed",
    "zvalue",
    "file_layout_audit",
    "compact_parquet",
    "pruning_effectiveness_audit",
    "stats_index",
    "stats_index_merge",
    "skipping_scan",
    "compact_incremental",
    "manifest_sink",
    "read_manifest",
    "read_via_manifest",
]


def salted_agg(
    df: DataFrame,
    key: str,
    value: str,
    salt_buckets: int = 16,
    salt_on: Optional[Column] = None,
) -> DataFrame:
    """Skew-safe sum/count over a hot grouping key.

    Returns (key, total, n). Two keyed shuffles, both balanced: stage 1 on
    (key, salt) spreads the hot key across ``salt_buckets`` reducers; stage 2
    merges ``salt_buckets`` partial rows per key.
    """
    salt = (
        F.pmod(salt_on, F.lit(salt_buckets))
        if salt_on is not None
        else F.pmod(F.xxhash64(F.col(value)), F.lit(salt_buckets))
    )
    partial = (
        df.withColumn("__salt__", salt)
        .groupBy(key, "__salt__")
        .agg(F.sum(value).alias("__t__"), F.count(F.lit(1)).alias("__n__"))
    )
    return partial.groupBy(key).agg(
        F.sum("__t__").alias("total"), F.sum("__n__").alias("n")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    salt_on: Optional[Column] = None,
) -> DataFrame:
    """Join a skew-keyed fact against a dimension with replicate-and-salt.

    The dimension is exploded ``salt_buckets`` ways (affordable when
    |dim| × buckets stays small); the fact's hot key spreads across buckets.
    Prefer ``F.broadcast(dim)`` when the dim fits in memory — salting is for
    the in-between regime (too big to broadcast, key too skewed for a plain
    shuffle join).
    """
    salt = (
        F.pmod(salt_on, F.lit(salt_buckets))
        if salt_on is not None
        else F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets))
    )
    f = fact.withColumn("__salt__", salt)
    d = dim.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return f.join(d, on=[key, "__salt__"]).drop("__salt__")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 16,
    sort_by: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Persist with a bucketed layout: repeated joins/aggs on ``bucket_by``
    then read pre-partitioned data — no shuffle at query time. This is the
    durable form of the repartition the dedup operators do per-query."""
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        # a crashed previous writer can leave an orphan managed location the
        # catalog no longer tracks; clear it through the Hadoop FS API
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(warehouse, table.split(".")[-1])
        fs = path.getFileSystem(hconf)
        if fs.exists(path):
            fs.delete(path, True)
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def zvalue(a, b, bits: int = 16):
    """Morton/Z-order value of two non-negative integer columns: their low
    ``bits`` bits interleaved (a in even positions, b in odd) — the
    space-filling-curve key behind multi-dimensional data layout
    (Delta/Iceberg OPTIMIZE ZORDER BY): range-partitioning or sorting by
    z-value co-locates rows close in BOTH dimensions, so min/max file
    statistics prune scans for predicates on EITHER column, where sorting
    by one column alone leaves the other column's values scattered across
    every file.

    Rendered as one SQL-string expression (2*bits shift-mask-or terms) —
    pure integer codegen, zero shuffle, identical arithmetic in any
    engine. Clamp/bucket inputs to ``bits`` beforehand (values >= 2^bits
    wrap via the masking, which destroys locality but not correctness).
    Each operand is cast to BIGINT inside the generated SQL: the default
    ``bits=16`` emits shifts up to ``<< 31``, which would wrap in 32-bit
    INT arithmetic before any outer cast could widen it.
    """
    from kioss_spark.operators.similarity import _sql_col

    a_sql = f"CAST({_sql_col(a)} AS BIGINT)"
    b_sql = f"CAST({_sql_col(b)} AS BIGINT)"
    terms = []
    for i in range(bits):
        terms.append(f"((({a_sql} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b_sql} >> {i}) & 1) << {2 * i + 1})")
    return F.expr("CAST(" + " + ".join(terms) + " AS BIGINT)")


def file_layout_audit(spark: SparkSession, path: str) -> DataFrame:
    """Small-files / size-skew audit of a written parquet layout — the
    post-write health check for the ``write_parquet(target_mb=)`` /
    ``maxRecordsPerFile`` levers: at 100 TB a table written as millions
    of KB-files kills scans on listing + open overhead, and one hot
    oversized file kills parallelism, so writer discipline needs a
    MEASURED audit, not faith.

    One narrow pass over the scan's hidden ``_metadata`` column (file
    path and on-disk size ride the reader — no filesystem listing job,
    no driver loop), a file-grain agg, then single-row global stats:

    (n_files, n_rows, rows_min, rows_max, bytes_min, bytes_max,
     bytes_total, rows_skew_e4, bytes_skew_e4)

    where ``*_skew_e4 = max * 10000 DIV avg`` — 10000 means perfectly
    even; alert thresholds are a deployment policy (2x is a common line).
    The agg runs at FILE grain (sublinear in rows), the final reduce at
    1 row; both integer-exact."""
    df = spark.read.parquet(path).select(
        F.col("_metadata.file_path").alias("__file__"),
        F.col("_metadata.file_size").alias("__size__"),
    )
    per_file = df.groupBy("__file__").agg(
        F.count(F.lit(1)).cast("long").alias("rows"),
        F.first("__size__").cast("long").alias("bytes"),
    )
    return per_file.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("rows").cast("long").alias("n_rows"),
        F.min("rows").cast("long").alias("rows_min"),
        F.max("rows").cast("long").alias("rows_max"),
        F.min("bytes").cast("long").alias("bytes_min"),
        F.max("bytes").cast("long").alias("bytes_max"),
        F.sum("bytes").cast("long").alias("bytes_total"),
        F.expr(
            "CAST(max(rows) * 10000 * count(*) DIV sum(rows) AS BIGINT)"
        ).alias("rows_skew_e4"),
        F.expr(
            "CAST(max(bytes) * 10000 * count(*) DIV sum(bytes) AS BIGINT)"
        ).alias("bytes_skew_e4"),
    )


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_mb: float = 128.0,
    mode: str = "error",
    cluster_by=None,
    zbits: int = 16,
) -> DataFrame:
    """Small-files compaction — the maintenance action
    ``file_layout_audit`` motivates (the OPTIMIZE [ZORDER] of
    Delta/Iceberg, expressed on plain parquet): read the fragmented
    layout, size the output from the layout's ACTUAL on-disk bytes (the
    ``_metadata`` file sizes — exact, unlike plan-statistics estimates,
    because the source is already parquet-encoded), and rewrite to
    ``ceil(bytes / target)`` near-equal files.

    ``cluster_by`` picks the rewrite's data layout:

    - ``None`` (plain OPTIMIZE): round-robin ``repartition`` — equalizes
      file sizes regardless of source fragmentation, but scatters every
      column's values across every file, so min/max file statistics
      prune nothing afterwards.
    - one column: ``repartitionByRange`` + ``sortWithinPartitions`` on
      it — each file covers a disjoint value range; point/range
      predicates on that column skip every non-overlapping file.
    - two integer columns (OPTIMIZE ZORDER): range-partition + sort on
      their interleaved ``zvalue`` — files become near-square tiles of
      the 2-D value grid, so predicates on EITHER column prune (each
      tile spans ~1/sqrt(n_files) of each dimension), where
      single-column sorting leaves the other column unclustered.
      ``zbits`` low bits of each operand are interleaved; clamp/bucket
      wider domains first (``zvalue`` docstring).

    Returns the ``file_layout_audit`` of the NEW layout so callers can
    assert the size contract in the same breath; measure the CLUSTERING
    contract with ``pruning_effectiveness_audit`` (round-robin ~1e4,
    clustered collapses).  Range partitioning samples the z-values
    (Spark's RangePartitioner) — still one shuffle, same as round-robin.
    At 100 TB run it per partition directory, not per table."""
    if target_mb <= 0:
        raise ValueError(f"target_mb must be > 0 (got {target_mb})")
    df = spark.read.parquet(src_path)
    total_bytes = (
        df.select(F.col("_metadata.file_path").alias("f"),
                  F.col("_metadata.file_size").alias("s"))
        .groupBy("f").agg(F.first("s").alias("s"))
        .agg(F.sum("s").alias("b")).collect()[0]["b"]
    ) or 0
    n_files = max(
        1, -(-int(total_bytes) // max(1, int(target_mb * 1024 * 1024)))
    )
    if cluster_by:
        cols = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
        if len(cols) == 1:
            key = F.col(cols[0])
        elif len(cols) == 2:
            key = zvalue(cols[0], cols[1], bits=zbits)
        else:
            raise ValueError(
                f"cluster_by supports 1 or 2 columns (got {len(cols)}); "
                "z-interleaving beyond 2 dims dilutes per-dim locality "
                "below usefulness at this file count"
            )
        out = df.repartitionByRange(n_files, key).sortWithinPartitions(key)
    else:
        out = df.repartition(n_files)
    out.write.mode(mode).parquet(dst_path)
    return file_layout_audit(spark, dst_path)


def pruning_effectiveness_audit(
    spark: SparkSession, path: str, cols, probes: int = 32
) -> DataFrame:
    """How well does a layout's file-level min/max prune? — the measured
    clustering check ``compact_parquet(cluster_by=)`` is graded by (the
    size half is ``file_layout_audit``; this is the skipping half, the
    number OPTIMIZE ZORDER exists to improve).

    For each audited column: build per-FILE min/max (one file-grain agg
    over the scan's ``_metadata``), derive ``probes`` equally spaced
    integer probe points across the column's global [min, max] (exact
    integer lerp — engine-reproducible), and count, per probe, the
    files whose [min, max] contains it — exactly the files a reader
    with a ``col = probe`` predicate must open.  Reports, per column:

    (col, n_files, avg_files_hit_e4, max_files_hit_e4)

    e4-scaled fractions of n_files: 10000 means every probe opens every
    file (round-robin's signature — each file spans the whole range);
    a range/z-clustered layout collapses toward 10000/n_files (1-D) or
    ~10000/sqrt(n_files) per dimension (2-D z-order tiles).

    Scale shape: per-file stats are FILE-grain (sublinear in rows); the
    probe table is ``probes`` rows and broadcasts into the containment
    join, so the pair work is n_files x probes — never rows, never
    file-pairs."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    df = spark.read.parquet(path)
    out = None
    for c in cols:
        per_file = (
            df.select(
                F.col("_metadata.file_path").alias("__file__"),
                F.col(c).cast("long").alias("__v__"),
            )
            .groupBy("__file__")
            .agg(F.min("__v__").alias("lo"), F.max("__v__").alias("hi"))
        )
        g = per_file.agg(
            F.min("lo").alias("glo"),
            F.max("hi").alias("ghi"),
            F.count(F.lit(1)).cast("long").alias("n_files"),
        )
        # probe i = glo + (ghi - glo) * i DIV (probes - 1): exact integer
        # lerp, endpoints included; the tiny probe table broadcasts into
        # a cross join so zero-hit probes still contribute (sum of 0s)
        probe = (
            g.select(
                "n_files",
                F.explode(
                    F.expr(
                        f"transform(sequence(0, {probes - 1}), i -> "
                        f"glo + (ghi - glo) * CAST(i AS BIGINT) "
                        f"DIV {probes - 1})"
                    )
                ).alias("p"),
            )
            .distinct()
        )
        hits = (
            per_file.crossJoin(F.broadcast(probe))
            .groupBy("p", "n_files")
            .agg(
                F.sum(
                    F.when(
                        (F.col("lo") <= F.col("p"))
                        & (F.col("p") <= F.col("hi")),
                        1,
                    ).otherwise(0)
                )
                .cast("long")
                .alias("files_hit")
            )
        )
        res = hits.agg(
            F.lit(c).alias("col"),
            F.max("n_files").cast("long").alias("n_files"),
            F.expr(
                "CAST(sum(files_hit * 10000 DIV n_files) DIV count(1) "
                "AS BIGINT)"
            ).alias("avg_files_hit_e4"),
            F.expr(
                "CAST(max(files_hit) * 10000 DIV max(n_files) AS BIGINT)"
            ).alias("max_files_hit_e4"),
        )
        out = res if out is None else out.unionByName(res)
    return out


def stats_index(spark: SparkSession, path: str, cols) -> DataFrame:
    """Per-file min/max/null-count statistics table — the data-skipping
    manifest of Delta/Iceberg (their per-file ``stats`` / manifest
    entries), built for plain parquet from ONE file-grain agg over the
    scan's hidden ``_metadata`` column (no filesystem listing job, no
    footer-reading driver loop).

    Output is LONG format, one row per (file, col):

    (file_path, file_bytes, file_rows, col, lo, hi, n_nulls)

    ``lo``/``hi`` are the column's min/max over the file's NON-NULL
    values, cast to BIGINT (integer-domain columns — same contract as
    ``pruning_effectiveness_audit``); an all-null file carries NULL
    lo/hi. The long format is what ``skipping_scan`` joins against and
    what incremental maintenance appends to: a new file's stats row is
    computable from that file alone (file-grain, O(new files) — the
    reason Delta can commit manifests without rereading the table).

    Scale shape: one scan of the audited columns, one file-grain agg
    (sublinear in rows: n_files x n_cols output), no joins."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    df = spark.read.parquet(path)
    # integer-domain contract ENFORCED: casting a string/array column to
    # long yields NULLs, which would make every file look all-null and
    # silently drop rows from pruned scans — fail loudly instead
    numeric_ok = ("byte", "short", "int", "long", "float", "double",
                  "decimal", "date", "timestamp", "boolean")
    for c in cols:
        t = df.schema[c].dataType.typeName()
        if not t.startswith(numeric_ok):
            raise ValueError(
                f"stats_index column {c!r} has non-numeric type {t}: "
                "min/max skipping stats are integer-domain (cast or "
                "bucket the column first)"
            )
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("long")).alias(f"__lo_{c}"),
            F.max(F.col(c).cast("long")).alias(f"__hi_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
        ]
    per_file = (
        df.select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.file_size").alias("__size__"),
            *[F.col(c) for c in cols],
        )
        .groupBy("file_path")
        .agg(
            F.first("__size__").cast("long").alias("file_bytes"),
            F.count(F.lit(1)).cast("long").alias("file_rows"),
            *aggs,
        )
    )
    # wide -> long: stack(n, 'col1', lo1, hi1, nn1, 'col2', ...)
    stack_args = ", ".join(
        f"'{c}', `__lo_{c}`, `__hi_{c}`, `__nn_{c}`" for c in cols
    )
    return per_file.select(
        "file_path",
        "file_bytes",
        "file_rows",
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (col, lo, hi, n_nulls)"
        ),
    )


def skipping_scan(
    spark: SparkSession,
    path: str,
    col=None,
    lo=None,
    hi=None,
    index: Optional[DataFrame] = None,
    ranges: Optional[dict] = None,
) -> DataFrame:
    """Exact-answer-preserving pruned scan: read ONLY the files whose
    per-file [min, max] overlaps the requested range(s), then apply the
    predicate — returns exactly the rows a full scan + filter would
    (min/max skipping is conservative: a skipped file provably contains
    no qualifying row; all-null files carry NULL lo/hi, and a range
    predicate never matches NULL, so skipping them is exact too).

    Single-column form: ``skipping_scan(spark, p, "u", lo=4, hi=11)``.
    Multi-column form (AND of ranges — the predicate shape z-order
    layouts exist to serve, each dimension's overlap fraction
    MULTIPLIES): ``skipping_scan(spark, p, ranges={"u": (4, 11),
    "h": (32, None)})`` — a file is a candidate only if it overlaps
    EVERY range (None = unbounded side).

    This is the query half of the Delta/Iceberg manifest pattern: the
    candidate file list comes from the (tiny, file-grain) stats table —
    built here on the fly, or passed in via ``index=`` when maintained
    incrementally (``stats_index_merge``) — and the driver-side collect
    of that list is EXACTLY what Delta's planner does when it prunes
    ``add`` actions from the log: bounded by n_files, never rows.
    Spark's own row-group min/max pushdown then prunes WITHIN the chosen
    files; this layer saves the file opens + footer reads + task
    scheduling that dominate fragmented 100 TB scans.

    Pair with ``compact_parquet(cluster_by=...)``: on a round-robin
    layout every file overlaps every predicate (nothing skips); on a
    range/z-clustered layout the candidate list collapses to
    ~overlap-fraction x n_files per dimension (measured:
    pruning_effectiveness_audit)."""
    if ranges is None:
        if col is None:
            raise ValueError("skipping_scan needs col= or ranges=")
        ranges = {col: (lo, hi)}
    if not ranges or all(
        lo is None and hi is None for lo, hi in ranges.values()
    ):
        raise ValueError("skipping_scan needs at least one bound (lo/hi)")
    idx = index if index is not None else stats_index(
        spark, path, list(ranges)
    )
    # a passed-in index must COVER every predicate column: a missing col
    # would zero the per-file match count and silently return an empty
    # (wrong) result instead of a full one — fail loudly (tiny distinct)
    if index is not None:
        idx_cols = {r["col"] for r in idx.select("col").distinct().collect()}
        missing = [c for c in ranges if c not in idx_cols]
        if missing:
            raise ValueError(
                f"skipping_scan index has no stats for {missing}: "
                f"rebuild the index with these columns (has {sorted(idx_cols)})"
            )
    # a file survives iff it overlaps EVERY bounded range: OR the per-col
    # overlap tests over the long-format rows, then require all of them
    overlap = F.lit(False)
    for c, (c_lo, c_hi) in ranges.items():
        t = F.col("col") == c
        if c_hi is not None:
            t = t & (F.col("lo") <= F.lit(c_hi))
        if c_lo is not None:
            t = t & (F.col("hi") >= F.lit(c_lo))
        overlap = overlap | t
    cand = (
        idx.where(overlap)
        .groupBy("file_path")
        .agg(F.count(F.lit(1)).alias("__n__"))
        .where(F.col("__n__") == len(ranges))
    )
    files = [r["file_path"] for r in cand.select("file_path").collect()]
    pred = None
    for c, (c_lo, c_hi) in ranges.items():
        for p2 in (
            (F.col(c) >= F.lit(c_lo)) if c_lo is not None else None,
            (F.col(c) <= F.lit(c_hi)) if c_hi is not None else None,
        ):
            if p2 is not None:
                pred = p2 if pred is None else (pred & p2)
    if not files:
        # schema-stable empty result without touching any data file
        # (recursiveFileLookup: also works on manifest-backed nested
        # layouts like manifest_sink's batch_N subdirectories)
        return (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(path)
            .where(F.lit(False))
        )
    return spark.read.parquet(*files).where(pred)


def stats_index_merge(existing: DataFrame, new_files: DataFrame) -> DataFrame:
    """Incremental manifest maintenance: parquet files are IMMUTABLE, so
    a file's stats row never changes and the merge law is a plain UNION
    of long-format rows — index(old files) ∪ stats_index(new files) ==
    stats_index(all files), O(new files) per ingest (the reason Delta
    commits manifests without rereading the table).  ``new_files`` is
    ``stats_index`` run over just the appended files' paths."""
    return existing.unionByName(new_files)


def compact_incremental(
    spark: SparkSession,
    path: str,
    target_mb: float = 128.0,
    small_file_mb: Optional[float] = None,
) -> DataFrame:
    """Incremental (bin-pack) compaction IN PLACE: rewrite only the files
    smaller than ``small_file_mb`` (default ``target_mb / 2``) into
    ~``target_mb`` files and delete the originals, leaving every
    already-well-sized file untouched — the default mode of Delta/Iceberg
    OPTIMIZE, where ``compact_parquet`` is the full rewrite.  At 100 TB
    the difference is the whole point: steady-state maintenance touches
    only the small tail each run (bytes_rewritten ~ small-file bytes,
    not table bytes).

    Mechanics: one file-grain ``_metadata`` agg finds the small files
    (n_files-bounded driver list, the manifest pattern); their rows are
    read back (only those files), written to a scratch dir sized from
    their ACTUAL bytes, and the new part-files are MOVED into ``path``
    via the Hadoop FS API before the originals are deleted.

    NOT transactional (plain parquet has no log): a reader racing the
    move-then-delete window can see duplicates. Run it per partition
    directory under the table's maintenance lock, exactly like
    Hive-style compaction; Delta/Iceberg buy atomicity with their commit
    log, which is out of scope for a plain-directory layout.

    Returns one row: (n_files, n_rows, bytes_total, files_rewritten,
    files_kept, bytes_rewritten) — the post-compaction layout audit plus
    the incremental-cost counters the maintenance scheduler tracks."""
    if target_mb <= 0:
        raise ValueError(f"target_mb must be > 0 (got {target_mb})")
    small_bytes_cap = int(
        (small_file_mb if small_file_mb is not None else target_mb / 2)
        * 1024 * 1024
    )
    per_file = (
        spark.read.parquet(path)
        .select(
            F.col("_metadata.file_path").alias("f"),
            F.col("_metadata.file_size").alias("s"),
        )
        .groupBy("f")
        .agg(F.first("s").alias("s"))
        .collect()
    )
    # in-place compaction moves new files into the ROOT of ``path``; on
    # a hive-partitioned layout (files under key=value subdirs) that
    # would silently strip rows' partition values — run it per partition
    # DIRECTORY instead (pass the leaf dir), enforced here
    root = path.rstrip("/")
    for r in per_file:
        rel = r["f"].split(root + "/", 1)[-1]
        if "/" in rel:
            raise ValueError(
                f"compact_incremental on a nested/partitioned layout "
                f"(found {rel!r} under {path}): compact each leaf "
                "partition directory separately"
            )
    smalls = [r["f"] for r in per_file if r["s"] < small_bytes_cap]
    small_bytes = sum(r["s"] for r in per_file if r["s"] < small_bytes_cap)
    kept = len(per_file) - len(smalls)

    def _result():
        audit = file_layout_audit(spark, path)
        return audit.select(
            "n_files",
            "n_rows",
            "bytes_total",
            F.lit(len(smalls)).cast("long").alias("files_rewritten"),
            F.lit(kept).cast("long").alias("files_kept"),
            F.lit(int(small_bytes)).cast("long").alias("bytes_rewritten"),
        )

    if len(smalls) < 2:
        # nothing to bin-pack: 0 or 1 small file gains nothing
        return file_layout_audit(spark, path).select(
            "n_files",
            "n_rows",
            "bytes_total",
            F.lit(0).cast("long").alias("files_rewritten"),
            F.lit(len(per_file)).cast("long").alias("files_kept"),
            F.lit(0).cast("long").alias("bytes_rewritten"),
        )
    n_new = max(
        1, -(-int(small_bytes) // max(1, int(target_mb * 1024 * 1024)))
    )
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)
    scratch = jvm.org.apache.hadoop.fs.Path(
        path.rstrip("/") + "__compact_tmp"
    )
    if fs.exists(scratch):
        fs.delete(scratch, True)
    spark.read.parquet(*smalls).repartition(n_new).write.mode(
        "overwrite"
    ).parquet(scratch.toString())
    # move the new part-files in FIRST, then delete the originals: a
    # crash between the two leaves duplicates (recoverable by re-running
    # dedup/compaction), never data loss
    for st in fs.listStatus(scratch):
        name = st.getPath().getName()
        if name.startswith("part-"):
            fs.rename(
                st.getPath(),
                jvm.org.apache.hadoop.fs.Path(path, "compacted-" + name),
            )
    for f in smalls:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f), False)
    fs.delete(scratch, True)
    return _result()


def manifest_sink(data_dir: str, manifest_dir: str, cols):
    """``foreachBatch`` writer that keeps a ``stats_index`` manifest as
    the SOURCE OF TRUTH for a streaming parquet table — the plain-parquet
    version of Delta's log commit, giving exactly-once VISIBILITY
    without a transaction log:

    - each micro-batch writes its rows to ``{data_dir}/batch_{id}``
      (mode=overwrite: a replayed batch rewrites the same directory —
      idempotent);
    - THEN its per-file stats rows (``stats_index`` over just the new
      directory, O(batch)) overwrite ``{manifest_dir}/v{id}``.

    Readers (``read_via_manifest`` / ``skipping_scan(index=...)``) read
    ONLY manifest-listed files, so a crash between the two writes leaves
    the batch's files INVISIBLE until the replay commits both — data
    files without manifest rows are uncommitted, never lost rows.  The
    reverse order would be wrong twice: a manifest row without its file
    breaks the read, and readers racing an append could otherwise see a
    file the stats do not yet cover."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        out = f"{data_dir}/batch_{batch_id}"
        batch_df.write.mode("overwrite").parquet(out)
        stats_index(spark, out, cols).write.mode("overwrite").parquet(
            f"{manifest_dir}/v{batch_id}"
        )

    return write


def read_manifest(spark: SparkSession, manifest_dir: str) -> DataFrame:
    """All committed manifest rows (the long-format ``stats_index``
    table): the union of every version directory's stats."""
    return spark.read.option("recursiveFileLookup", "true").parquet(
        manifest_dir
    )


def read_via_manifest(spark: SparkSession, manifest_dir: str) -> DataFrame:
    """The table AS DEFINED BY its manifest: read exactly the files the
    manifest lists (n_files-bounded driver list, like Delta replaying
    ``add`` actions). Uncommitted data files are invisible by
    construction."""
    files = [
        r["file_path"]
        for r in read_manifest(spark, manifest_dir)
        .select("file_path")
        .distinct()
        .collect()
    ]
    if not files:
        raise ValueError(f"empty manifest at {manifest_dir}")
    return spark.read.parquet(*files)
