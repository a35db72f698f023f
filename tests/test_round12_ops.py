"""Round-12 operator pins.

- stats_index typed bounds: the ADVICE-flagged fractional truncation is
  gone (floor/ceil conservative widening), timestamp/date columns get
  explicit epoch units instead of an AnalysisException, and string
  columns get Delta-style truncated min/max with round-up-exclusive hi.
- skipping_scan typed probes: fractional / datetime / date / string
  bounds all prune exactly; kind mismatches fail loudly.
- manifest lifecycle: snapshot commits, vacuum, manifest-aware
  compaction (reader isolation + crash-orphan collection).
"""

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F


def _files_read(df):
    return df.select(F.col("_metadata.file_path")).distinct().count()


def _full_filter(spark, path, pred):
    return sorted(map(tuple, spark.read.parquet(path).where(pred).collect()))


# ---------------------------------------------------------------------------
# fractional bounds — the ADVICE r11 scenario verbatim: a file holding
# [4.6, 4.9] must survive a lo=4.5 probe (the old BIGINT cast stored
# hi=4 and silently dropped it)
# ---------------------------------------------------------------------------


def test_skipping_scan_fractional_file_bounds_are_conservative(
    spark, tmp_path
):
    from kioss_spark.operators.skew import skipping_scan, stats_index

    path = str(tmp_path / "frac")
    spark.createDataFrame(
        [(1, 0.1), (2, 0.4)], "id long, v double"
    ).coalesce(1).write.parquet(path)
    spark.createDataFrame(
        [(3, 4.6), (4, 4.9)], "id long, v double"
    ).coalesce(1).write.mode("append").parquet(path)

    idx = stats_index(spark, path, ["v"])
    by_file = {}
    for r in idx.collect():
        by_file[r["file_path"]] = (r["lo"], r["hi"])
    # conservative widening: [4.6, 4.9] stores [4, 5], never [4, 4]
    assert (4, 5) in by_file.values()
    assert (0, 1) in by_file.values()

    pruned = skipping_scan(spark, path, "v", lo=4.5, hi=5.0, index=idx)
    assert sorted(map(tuple, pruned.collect())) == [(3, 4.6), (4, 4.9)]
    # and the other file still prunes away
    assert _files_read(pruned) == 1


def test_skipping_scan_fractional_probe_bounds_floor_and_ceil(spark, tmp_path):
    from kioss_spark.operators.skew import skipping_scan

    path = str(tmp_path / "fracprobe")
    rows = [(i, i / 10.0) for i in range(200)]
    spark.createDataFrame(rows, "id long, v double").repartition(
        4, "id"
    ).sortWithinPartitions("v").write.parquet(path)
    got = skipping_scan(spark, path, "v", lo=3.25, hi=7.75)
    want = _full_filter(
        spark, path, (F.col("v") >= 3.25) & (F.col("v") <= 7.75)
    )
    assert sorted(map(tuple, got.collect())) == want


def test_stats_index_decimal_overflow_clamps_conservatively(spark, tmp_path):
    from kioss_spark.operators.skew import skipping_scan, stats_index

    path = str(tmp_path / "decwide")
    big = Decimal("123456789012345678901234567.89")  # > int64 after ceil
    spark.createDataFrame(
        [(1, Decimal("1.50")), (2, big)], "id long, v decimal(38,2)"
    ).coalesce(1).write.parquet(path)
    r = {x["col"]: x for x in stats_index(spark, path, ["v"]).collect()}["v"]
    assert r["lo"] == 1  # floor(1.50)
    assert r["hi"] == 2 ** 63 - 1  # clamped, which only widens
    got = skipping_scan(spark, path, "v", lo=2, hi=None)
    assert sorted(map(tuple, got.collect())) == [(2, big)]


# ---------------------------------------------------------------------------
# timestamp / date bounds — the r11 whitelist advertised support but
# CAST(date AS BIGINT) raised at plan time; now both get explicit epoch
# units and datetime/date probe bounds
# ---------------------------------------------------------------------------


def test_skipping_scan_timestamp_bounds_exact_and_pruning(spark, tmp_path):
    from kioss_spark.operators.skew import skipping_scan, stats_index

    path = str(tmp_path / "ts")
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    early = [(i, base + dt.timedelta(hours=i)) for i in range(48)]
    late = [(i, base + dt.timedelta(days=30, hours=i)) for i in range(48)]
    schema = "id long, ts timestamp"
    spark.createDataFrame(early, schema).coalesce(1).write.parquet(path)
    spark.createDataFrame(late, schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)

    lo = dt.datetime(2024, 3, 1, 5, 30, 0)
    hi = dt.datetime(2024, 3, 2, 1, 0, 0)
    idx = stats_index(spark, path, ["ts"])
    got = skipping_scan(spark, path, "ts", lo=lo, hi=hi, index=idx)
    want = _full_filter(
        spark, path, (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
    )
    assert sorted(map(tuple, got.collect())) == want
    assert len(want) == 20  # 05:30..23:00 day one + 00:00..01:00 day two
    assert _files_read(got) == 1  # the late file pruned


def test_skipping_scan_date_bounds_exact(spark, tmp_path):
    from kioss_spark.operators.skew import skipping_scan, stats_index

    path = str(tmp_path / "dates")
    d0 = dt.date(2024, 1, 1)
    a = [(i, d0 + dt.timedelta(days=i)) for i in range(30)]
    b = [(i, d0 + dt.timedelta(days=200 + i)) for i in range(30)]
    spark.createDataFrame(a, "id long, d date").coalesce(1).write.parquet(path)
    spark.createDataFrame(b, "id long, d date").coalesce(1).write.mode(
        "append"
    ).parquet(path)
    r = {x["col"]: x for x in stats_index(spark, path, ["d"]).collect()}
    lo, hi = dt.date(2024, 1, 10), dt.date(2024, 1, 20)
    got = skipping_scan(spark, path, "d", lo=lo, hi=hi)
    want = _full_filter(
        spark, path, (F.col("d") >= F.lit(lo)) & (F.col("d") <= F.lit(hi))
    )
    assert sorted(map(tuple, got.collect())) == want
    assert len(want) == 11
    assert _files_read(got) == 1


# ---------------------------------------------------------------------------
# string bounds — Delta's 32-char truncation with round-up-exclusive hi
# ---------------------------------------------------------------------------


def test_stats_index_string_truncation_rounds_up_hi(spark, tmp_path):
    from kioss_spark.operators.skew import stats_index

    path = str(tmp_path / "strtrunc")
    long_max = "z" * 31 + "b" + "zzzz"  # 36 chars, truncates
    spark.createDataFrame(
        [("apple",), (long_max,)], "s string"
    ).coalesce(1).write.parquet(path)
    r = stats_index(spark, path, ["s"]).collect()[0]
    assert r["lo"] is None and r["hi"] is None  # numeric bounds unused
    assert r["lo_str"] == "apple"
    # hi rounds up the last kept char: z*31 + 'b' -> z*31 + 'c', a
    # STRICT upper bound for every string sharing the 32-prefix
    assert r["hi_str"] == "z" * 31 + "c"
    assert not r["hi_inexact"]
    assert long_max < r["hi_str"]


def test_stats_index_string_unroundable_char_marks_hi_inexact(
    spark, tmp_path
):
    from kioss_spark.operators.skew import skipping_scan, stats_index

    path = str(tmp_path / "strhi")
    s = "a" * 31 + "ÿ" + "tail"  # 32nd char codepoint 255: no round-up
    spark.createDataFrame([(s,), ("a",)], "s string").coalesce(
        1
    ).write.parquet(path)
    r = stats_index(spark, path, ["s"]).collect()[0]
    assert r["hi_inexact"]
    assert r["hi_str"] == "a" * 31 + "ÿ"
    # inexact hi must never skip: a probe ABOVE the stored prefix but
    # below the true max still finds the row
    got = skipping_scan(spark, path, "s", lo="a" * 31 + "ÿ" + "a")
    assert [t[0] for t in got.collect()] == [s]


def test_skipping_scan_string_exact_and_prunes(spark, tmp_path):
    from kioss_spark.operators.skew import skipping_scan, stats_index

    path = str(tmp_path / "strscan")
    rows = [(i, f"key_{c}{i:04d}") for i, c in zip(range(300), "abcdef" * 50)]
    df = spark.createDataFrame(rows, "id long, k string")
    df.repartition(6).sortWithinPartitions("k").write.parquet(path)
    # cluster by k so files hold disjoint-ish ranges
    clustered = str(tmp_path / "strclustered")
    spark.read.parquet(path).repartitionByRange(6, "k").write.parquet(
        clustered
    )
    idx = stats_index(spark, clustered, ["k"])
    got = skipping_scan(spark, clustered, "k", lo="key_b", hi="key_c￿",
                        index=idx)
    want = _full_filter(
        spark,
        clustered,
        (F.col("k") >= "key_b") & (F.col("k") <= "key_c￿"),
    )
    assert sorted(map(tuple, got.collect())) == want
    assert len(want) == 100  # the b and c thirds
    n_files = idx.select("file_path").distinct().count()
    assert _files_read(got) < n_files


def test_skipping_scan_string_truncated_boundary_is_exact(spark, tmp_path):
    from kioss_spark.operators.skew import skipping_scan

    path = str(tmp_path / "strbound")
    in_file = "a" * 31 + "b" + "zzzz"
    spark.createDataFrame(
        [("a" * 10,), (in_file,)], "s string"
    ).coalesce(1).write.parquet(path)
    # probe lo sits ABOVE the 32-char prefix but BELOW the true max: the
    # rounded-up hi keeps the file (prefix-only hi would wrongly skip)
    got = skipping_scan(spark, path, "s", lo="a" * 31 + "bz")
    assert [t[0] for t in got.collect()] == [in_file]
    # probe lo above the rounded-up bound skips the file exactly
    empty = skipping_scan(spark, path, "s", lo="a" * 31 + "cZ")
    assert empty.count() == 0


def test_skipping_scan_boolean_column(spark, tmp_path):
    from kioss_spark.operators.skew import skipping_scan

    path = str(tmp_path / "flags")
    spark.createDataFrame(
        [(1, False), (2, False)], "id long, f boolean"
    ).coalesce(1).write.parquet(path)
    spark.createDataFrame(
        [(3, True), (4, False)], "id long, f boolean"
    ).coalesce(1).write.mode("append").parquet(path)
    got = skipping_scan(spark, path, "f", lo=True, hi=True)
    assert sorted(map(tuple, got.collect())) == [(3, True)]
    assert _files_read(got) == 1


def test_skipping_scan_kind_mismatch_raises(spark, tmp_path):
    from kioss_spark.operators.skew import skipping_scan, stats_index

    num_path = str(tmp_path / "numtab")
    spark.range(10).select(F.col("id").alias("x")).write.parquet(num_path)
    str_path = str(tmp_path / "strtab")
    spark.createDataFrame([("a",), ("b",)], "s string").write.parquet(
        str_path
    )
    with pytest.raises(ValueError, match="holds numeric stats"):
        skipping_scan(
            spark, num_path, "x", lo="a",
            index=stats_index(spark, num_path, ["x"]),
        )
    with pytest.raises(ValueError, match="holds string stats"):
        skipping_scan(
            spark, str_path, "s", lo=1,
            index=stats_index(spark, str_path, ["s"]),
        )
    with pytest.raises(ValueError, match="mix string"):
        skipping_scan(spark, num_path, "x", lo=1, hi="z")


def test_skipping_scan_string_all_null_file_skipped_exactly(spark, tmp_path):
    from kioss_spark.operators.skew import skipping_scan

    path = str(tmp_path / "strnulls")
    spark.createDataFrame(
        [("alpha", 1), ("beta", 2)], "s string, id long"
    ).coalesce(1).write.parquet(path)
    spark.createDataFrame(
        [(None, 3)], "s string, id long"
    ).coalesce(1).write.mode("append").parquet(path)
    got = skipping_scan(spark, path, "s", lo="a", hi="c")
    assert sorted(map(tuple, got.collect())) == [("alpha", 1), ("beta", 2)]
    assert _files_read(got) == 1


# ---------------------------------------------------------------------------
# manifest lifecycle — snapshot commits, manifest-aware compaction
# (reader isolation), vacuum (crash-orphan + superseded-version GC),
# time-travel reads
# ---------------------------------------------------------------------------


def _commit_batches(spark, data, manifest, n_batches=4, rows_per=50):
    from kioss_spark.operators.skew import manifest_sink

    sink = manifest_sink(data, manifest, ["x"])
    all_rows = []
    for b in range(n_batches):
        rows = [(b * rows_per + i, f"p{b}_{i}") for i in range(rows_per)]
        all_rows += rows
        sink(
            spark.createDataFrame(rows, "x long, payload string")
            .repartition(3),
            b,
        )
    return all_rows


def test_compact_manifest_rewrites_smalls_and_preserves_reads(
    spark, tmp_path
):
    from kioss_spark.operators.skew import (
        compact_manifest,
        read_manifest,
        read_via_manifest,
        skipping_scan,
    )

    data = str(tmp_path / "cm_data")
    manifest = str(tmp_path / "cm_manifest")
    all_rows = _commit_batches(spark, data, manifest)

    before = sorted(map(tuple, read_via_manifest(spark, manifest).collect()))
    assert before == sorted(all_rows)
    n_files_before = (
        read_manifest(spark, manifest).select("file_path").distinct().count()
    )
    assert n_files_before == 12  # 4 batches x 3 parts

    audit = compact_manifest(spark, data, manifest, target_mb=64.0).collect()[
        0
    ]
    assert audit["files_rewritten"] == 12
    assert audit["n_new_files"] == 1
    after = sorted(map(tuple, read_via_manifest(spark, manifest).collect()))
    assert after == before  # bit-identical table across the compaction
    n_files_after = (
        read_manifest(spark, manifest).select("file_path").distinct().count()
    )
    assert n_files_after == 1
    # the snapshot's stats still serve skipping_scan exactly
    got = skipping_scan(
        spark, data, "x", lo=60, hi=110,
        index=read_manifest(spark, manifest),
    )
    assert sorted(map(tuple, got.collect())) == [
        t for t in sorted(all_rows) if 60 <= t[0] <= 110
    ]


def test_compact_manifest_reader_isolation_and_time_travel(spark, tmp_path):
    from kioss_spark.operators.skew import (
        compact_manifest,
        read_via_manifest,
        vacuum,
    )

    data = str(tmp_path / "iso_data")
    manifest = str(tmp_path / "iso_manifest")
    all_rows = _commit_batches(spark, data, manifest, n_batches=3)

    # a reader pinned BEFORE the compaction (snapshot v2 = 3rd batch)
    pinned = read_via_manifest(spark, manifest, snapshot=2)
    compact_manifest(spark, data, manifest, target_mb=64.0)
    # compaction deleted nothing: the pinned reader still materializes
    assert sorted(map(tuple, pinned.collect())) == sorted(all_rows)
    # time travel to the FIRST snapshot still works pre-vacuum
    assert read_via_manifest(spark, manifest, snapshot=0).count() == 50

    # vacuum with retain_last=1 collects the compacted inputs; the
    # current table is unchanged.  v3 checkpointed log (round 14): the
    # retained head is a DELTA whose fold needs the chain down to the
    # v0 checkpoint, so no version dir is deletable yet — but the DATA
    # files only the dead versions referenced are collected, and
    # time-traveling into those versions now fails loudly at SCAN time
    # (Delta's log-outlives-files behavior).
    before = sorted(map(tuple, read_via_manifest(spark, manifest).collect()))
    audit = vacuum(spark, data, manifest, retain_last=1).collect()[0]
    assert audit["files_deleted"] == 9  # 3 batches x 3 parts all rewritten
    assert audit["snapshots_deleted"] == 0  # chain retained for the fold
    assert sorted(
        map(tuple, read_via_manifest(spark, manifest).collect())
    ) == before
    # time travel below the retention line: the manifest still resolves
    # (the log survives for the fold) but the data files are gone — the
    # scan fails loudly, rows are never silently partial
    with pytest.raises(Exception, match="PATH_NOT_FOUND|does not exist"):
        read_via_manifest(spark, manifest, snapshot=0).collect()


def test_vacuum_retains_requested_snapshots(spark, tmp_path):
    from kioss_spark.operators.skew import (
        compact_manifest,
        read_via_manifest,
        vacuum,
    )

    data = str(tmp_path / "ret_data")
    manifest = str(tmp_path / "ret_manifest")
    all_rows = _commit_batches(spark, data, manifest, n_batches=3)
    compact_manifest(spark, data, manifest, target_mb=64.0)

    # retain_last=2 keeps snapshot v2 (pre-compaction) alive, so the
    # batch files it lists must survive the vacuum; v3 log: v0/v1 are
    # the retained chain's fold base and survive too (zero dirs die)
    audit = vacuum(spark, data, manifest, retain_last=2).collect()[0]
    assert audit["files_deleted"] == 0
    assert audit["snapshots_deleted"] == 0
    assert sorted(
        map(tuple, read_via_manifest(spark, manifest, snapshot=2).collect())
    ) == sorted(all_rows)
    with pytest.raises(ValueError):
        vacuum(spark, data, manifest, retain_last=0)


def test_compact_manifest_noop_on_healthy_layout(spark, tmp_path):
    from kioss_spark.operators.skew import compact_manifest, read_manifest

    data = str(tmp_path / "noop_data")
    manifest = str(tmp_path / "noop_manifest")
    _commit_batches(spark, data, manifest, n_batches=2)
    # every file is already >= small_file_mb: nothing rewrites, the
    # current snapshot stands
    audit = compact_manifest(
        spark, data, manifest, target_mb=64.0, small_file_mb=1e-9
    ).collect()[0]
    assert audit["files_rewritten"] == 0
    assert audit["snapshot"] == 1
    assert (
        read_manifest(spark, manifest).select("file_path").distinct().count()
        == 6
    )


# ---------------------------------------------------------------------------
# max-score (MaxScore/WAND-family) pruned BM25 — provably lossless:
# bit-for-bit equality with the unpruned scorer, while the scored
# posting set strictly shrinks on a skewed vocabulary
# ---------------------------------------------------------------------------


def _zipf_corpus(spark, n_docs=600, seed=11):
    import random

    random.seed(seed)
    common = [f"the{i}" for i in range(4)]
    mid = [f"m{i}" for i in range(20)]
    rare = [f"r{i}" for i in range(8)]
    rows = []
    for d in range(n_docs):
        words = [random.choice(common) for _ in range(random.randrange(8, 40))]
        words += [random.choice(mid) for _ in range(random.randrange(0, 4))]
        if d % 4 == 0:
            words.append(random.choice(rare))
        rows += [(d, w) for w in words]
    return spark.createDataFrame(rows, "doc_id long, term string")


def _qset(spark):
    return spark.createDataFrame(
        [
            (0, "r0"), (0, "the0"), (0, "the1"),   # rare + two common
            (1, "the2"), (1, "the3"),              # all-common
            (2, "r1"), (2, "m0"), (2, "the0"),     # rare + mid + common
            (3, "r2"),                             # single-term
            (4, "r3"), (4, "r4"),                  # two rares
            (5, "nosuchterm"), (5, "the1"),        # missing vocab entry
        ],
        "query_id long, term string",
    )


def test_maxscore_topk_equals_unpruned_and_prunes(spark):
    from kioss_spark.operators import retrieval

    inv = _zipf_corpus(spark)
    tfdl, df, g = retrieval.bm25_stats(inv)
    tfdl = tfdl.persist()
    queries = _qset(spark)
    for k in (3, 10):
        base = sorted(
            map(
                tuple,
                retrieval.bm25_score_topk(tfdl, df, g, queries, k=k)
                .collect(),
            )
        )
        pruned = sorted(
            map(
                tuple,
                retrieval.bm25_maxscore_topk(tfdl, df, g, queries, k=k)
                .collect(),
            )
        )
        assert pruned == base
        assert len(base) > 0
    # the scored posting set STRICTLY shrinks (skewed vocabulary: the
    # rare essential lists bound theta above the common-term bound sums)
    full_cnt = tfdl.join(queries.join(df, "term"), "term").count()
    cand_cnt = retrieval._maxscore_matched(tfdl, df, g, queries, 3).count()
    assert cand_cnt < full_cnt
    tfdl.unpersist()


def test_maxscore_topk_small_corpus_no_theta_still_exact(spark):
    # fewer than k docs match anything: theta_lb undefined, pruning off,
    # result still exact
    from kioss_spark.operators import retrieval

    rows = [(0, "a"), (0, "b"), (1, "a"), (2, "c")]
    inv = spark.createDataFrame(rows, "doc_id long, term string")
    tfdl, df, g = retrieval.bm25_stats(inv)
    queries = spark.createDataFrame(
        [(0, "a"), (0, "c")], "query_id long, term string"
    )
    base = sorted(
        map(tuple, retrieval.bm25_score_topk(tfdl, df, g, queries, k=10)
            .collect())
    )
    pruned = sorted(
        map(tuple, retrieval.bm25_maxscore_topk(tfdl, df, g, queries, k=10)
            .collect())
    )
    assert pruned == base
    assert len(base) == 3


def test_bm25_term_bounds_merge_law(spark):
    from kioss_spark.operators import retrieval

    inv = _zipf_corpus(spark, n_docs=200)
    a = inv.where(F.col("doc_id") % 2 == 0)
    b = inv.where(F.col("doc_id") % 2 == 1)
    ta, _, _ = retrieval.bm25_stats(a)
    tb, _, _ = retrieval.bm25_stats(b)
    tall, _, _ = retrieval.bm25_stats(inv)
    merged = retrieval.bm25_merge_bounds(
        retrieval.bm25_term_bounds(ta), retrieval.bm25_term_bounds(tb)
    )
    scratch = retrieval.bm25_term_bounds(tall)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, scratch.collect())
    )


def test_maxscore_bound_dominates_every_posting_score(spark):
    # the pruning is lossless BECAUSE bound_e6 >= every per-posting
    # score_e6 of that term; verify the inequality holds corpus-wide
    from kioss_spark.operators import retrieval
    from kioss_spark.operators.retrieval import (
        _SCORE_E6_SQL,
        _TFP_E4_SQL,
        _TFP_UB_E4_SQL,
    )

    inv = _zipf_corpus(spark, n_docs=300, seed=5)
    tfdl, df, g = retrieval.bm25_stats(inv)
    per_term = (
        tfdl.join(df, "term")
        .join(retrieval.bm25_term_bounds(tfdl), "term")
        .crossJoin(F.broadcast(g))
        .withColumn(
            "idf_e6",
            F.expr(
                "CAST(1000000 * (2 * n_docs - 2 * df + 1) AS BIGINT) "
                "DIV CAST(2 * df + 1 AS BIGINT)"
            ),
        )
        .withColumn("__tfp__", F.expr(_TFP_E4_SQL))
        .withColumn("score_e6", F.expr(_SCORE_E6_SQL))
        .withColumn("__ub__", F.expr(_TFP_UB_E4_SQL))
        .withColumn(
            "bound_e6",
            F.expr(
                "CAST((idf_e6 DIV 10000) * __ub__ "
                "+ ((idf_e6 % 10000) * __ub__) DIV 10000 AS BIGINT)"
            ),
        )
    )
    viol = per_term.where(F.col("score_e6") > F.col("bound_e6")).count()
    assert viol == 0


def test_bm25_positional_merge_law(spark):
    # the additive merge law EXTENDS to positional postings: document
    # sets are disjoint, so the postings union never merges two rows and
    # each doc's sorted position array is already final — merged stats
    # equal a from-scratch positional build, arrays included
    from kioss_spark.operators import retrieval

    rows = []
    text = {
        0: "a b a c", 1: "b c b", 2: "a a a", 3: "c b a", 4: "b b c c",
        5: "a c", 6: "c c c b", 7: "b a",
    }
    for d, t in text.items():
        rows += [(d, w, i + 1) for i, w in enumerate(t.split())]
    inv = spark.createDataFrame(rows, "doc_id long, term string, pos long")
    a = inv.where(F.col("doc_id") % 2 == 0)
    b = inv.where(F.col("doc_id") % 2 == 1)
    merged = retrieval.bm25_merge_stats(
        *retrieval.bm25_stats_positional(a),
        *retrieval.bm25_stats_positional(b),
    )
    scratch = retrieval.bm25_stats_positional(inv)
    for m, s in zip(merged, scratch):
        assert sorted(
            map(lambda r: tuple(tuple(x) if isinstance(x, list) else x
                                for x in r), m.collect())
        ) == sorted(
            map(lambda r: tuple(tuple(x) if isinstance(x, list) else x
                                for x in r), s.collect())
        )


# ---------------------------------------------------------------------------
# member_index / member_scan — exact block-Bloom point lookups (the
# needle-in-a-haystack shape min/max stats cannot serve)
# ---------------------------------------------------------------------------


def test_member_scan_exact_and_prunes(spark, tmp_path):
    from kioss_spark.operators.skew import member_index, member_scan

    path = str(tmp_path / "members")
    rows = [(i, i % 37, f"p{i}") for i in range(2000)]
    # cluster by k so each key lands in few files; 8 files
    spark.createDataFrame(rows, "id long, k long, payload string") \
        .repartition(8, "k").write.parquet(path)
    idx = member_index(spark, path, ["k"], buckets=4096)
    got = member_scan(spark, path, "k", [3, 17, 36], index=idx)
    want = _full_filter(spark, path, F.col("k").isin([3, 17, 36]))
    assert sorted(map(tuple, got.collect())) == want
    n_files = idx.select("file_path").distinct().count()
    assert _files_read(got) < n_files  # clustered: most files skip


def test_member_scan_absent_value_reads_nothing(spark, tmp_path):
    from kioss_spark.operators.skew import member_index, member_scan

    path = str(tmp_path / "members_absent")
    spark.createDataFrame(
        [(i, i % 5) for i in range(100)], "id long, k long"
    ).coalesce(2).write.parquet(path)
    idx = member_index(spark, path, ["k"], buckets=4096)
    out = member_scan(spark, path, "k", [999999], index=idx)
    assert out.count() == 0
    assert out.columns == ["id", "k"]


def test_member_scan_string_column_and_nulls(spark, tmp_path):
    from kioss_spark.operators.skew import member_index, member_scan

    path = str(tmp_path / "members_str")
    spark.createDataFrame(
        [("a", 1), ("b", 2), (None, 3)], "s string, id long"
    ).coalesce(1).write.parquet(path)
    spark.createDataFrame(
        [("c", 4), ("d", 5)], "s string, id long"
    ).coalesce(1).write.mode("append").parquet(path)
    got = member_scan(spark, path, "s", ["a", "zzz"])
    assert sorted(map(tuple, got.collect())) == [("a", 1)]
    assert _files_read(got) == 1  # second file provably lacks 'a'


def test_member_index_merge_law(spark, tmp_path):
    from kioss_spark.operators.skew import (
        member_index,
        member_index_merge,
        member_scan,
    )

    path = str(tmp_path / "members_merge")
    spark.createDataFrame(
        [(i, i % 11) for i in range(500)], "id long, k long"
    ).repartition(3, "k").write.parquet(path)
    old = member_index(spark, path, ["k"])
    # append new immutable files; index only them, merge
    spark.createDataFrame(
        [(i, 100 + (i % 3)) for i in range(500, 600)], "id long, k long"
    ).repartition(2, "k").write.mode("append").parquet(path)
    all_files = {
        r["file_path"]
        for r in member_index(spark, path, ["k"]).select("file_path")
        .distinct().collect()
    }
    old_files = {
        r["file_path"] for r in old.select("file_path").distinct().collect()
    }
    import functools

    new_paths = sorted(all_files - old_files)
    new_rows = functools.reduce(
        member_index_merge,
        [member_index(spark, p, ["k"]) for p in new_paths],
    )
    merged = member_index_merge(old, new_rows)
    scratch = member_index(spark, path, ["k"])
    assert sorted(
        map(lambda r: (r["file_path"], r["col"], tuple(r["members"])),
            merged.collect())
    ) == sorted(
        map(lambda r: (r["file_path"], r["col"], tuple(r["members"])),
            scratch.collect())
    )
    # and the merged index serves lookups exactly
    got = member_scan(spark, path, "k", [101], index=merged)
    want = _full_filter(spark, path, F.col("k") == 101)
    assert sorted(map(tuple, got.collect())) == want


def test_member_scan_guards(spark, tmp_path):
    from kioss_spark.operators.skew import member_index, member_scan

    path = str(tmp_path / "members_guard")
    spark.range(10).select(
        F.col("id").alias("x"), (F.col("id") % 2).alias("y")
    ).write.parquet(path)
    idx = member_index(spark, path, ["x"])
    with pytest.raises(ValueError, match="no membership rows for 'y'"):
        member_scan(spark, path, "y", [1], index=idx)
    with pytest.raises(ValueError, match="at least one probe value"):
        member_scan(spark, path, "x", [])
    spark.range(3).select(F.array(F.lit(1)).alias("a")).write.parquet(
        str(tmp_path / "arrmem")
    )
    with pytest.raises(ValueError, match="unsupported nested type"):
        member_index(spark, str(tmp_path / "arrmem"), ["a"])


# ---------------------------------------------------------------------------
# clustered (z-order) manifest compaction + the file-grain change feed
# ---------------------------------------------------------------------------


def test_compact_manifest_cluster_by_improves_pruning(spark, tmp_path):
    from kioss_spark.operators.skew import (
        compact_manifest,
        manifest_sink,
        read_manifest,
        read_via_manifest,
    )

    data = str(tmp_path / "zc_data")
    manifest = str(tmp_path / "zc_manifest")
    sink = manifest_sink(data, manifest, ["x"])
    all_rows = []
    for b in range(4):
        # each batch spans the WHOLE x-domain -> every file overlaps
        # every range probe before compaction
        rows = [(i * 4 + b, f"p{b}_{i}") for i in range(200)]
        all_rows += rows
        sink(
            spark.createDataFrame(rows, "x long, payload string")
            .repartition(3),
            b,
        )

    def candidates(lo, hi):
        idx = read_manifest(spark, manifest).where(F.col("col") == "x")
        return (
            idx.where((F.col("lo") <= hi) & (F.col("hi") >= lo))
            .select("file_path").distinct().count()
        )

    before = sorted(map(tuple, read_via_manifest(spark, manifest).collect()))
    n_before = candidates(100, 199)  # 1/8 of the domain
    assert n_before == 12  # round-robin batches: EVERY file is a candidate
    audit = compact_manifest(
        spark, data, manifest, target_mb=0.01, cluster_by="x"
    ).collect()[0]
    assert audit["files_rewritten"] == 12
    after = sorted(map(tuple, read_via_manifest(spark, manifest).collect()))
    assert after == before  # content identical across clustered rewrite
    n_new = audit["n_new_files"]
    if n_new > 2:
        # clustered: the 1/8 range hits a strict subset of files through
        # the SAME live manifest
        assert candidates(100, 199) < n_new


def test_manifest_diff_and_changes(spark, tmp_path):
    from kioss_spark.operators.skew import (
        compact_manifest,
        manifest_diff,
        manifest_sink,
        read_manifest_changes,
    )

    data = str(tmp_path / "cdf_data")
    manifest = str(tmp_path / "cdf_manifest")
    sink = manifest_sink(data, manifest, ["x"])
    b0 = [(i, f"a{i}") for i in range(40)]
    b1 = [(100 + i, f"b{i}") for i in range(40)]
    b2 = [(200 + i, f"c{i}") for i in range(40)]
    for bid, rows in enumerate((b0, b1, b2)):
        sink(
            spark.createDataFrame(rows, "x long, payload string")
            .repartition(2),
            bid,
        )
    # catch-up from snapshot 0 (just b0) to snapshot 2 (all three):
    # exactly b1 + b2's rows, never b0's
    got = sorted(
        map(tuple, read_manifest_changes(spark, manifest, 0).collect())
    )
    assert got == sorted(b1 + b2)
    d = manifest_diff(spark, manifest, 0)
    assert d.where("change = 'remove'").count() == 0  # appends only
    assert d.where("change = 'add'").select("file_path").distinct() \
        .count() == 4  # 2 batches x 2 part-files

    # compaction folds post-snapshot-0 batch files into mixed
    # batch_id-NULL rewrites: file-grain catch-up from v0 is now
    # UNSOUND and must fail loudly instead of silently dropping rows
    # (the naive feed returned [] here — this guard is what the test
    # originally caught)
    compact_manifest(spark, data, manifest, target_mb=64.0)
    with pytest.raises(ValueError, match="compacted away"):
        read_manifest_changes(spark, manifest, 0)
    d2 = manifest_diff(spark, manifest, 0)
    # the descriptive diff stays available: vs v0 the compacted file is
    # the one 'add' (batch_id NULL) and v0's own two part-files the
    # 'remove's (b1/b2's files were never IN v0)
    assert d2.where("change = 'add' AND batch_id IS NULL").select(
        "file_path").distinct().count() == 1
    assert d2.where("change = 'remove'").select("file_path").distinct() \
        .count() == 2
    # vs the PRE-compaction snapshot (v2: all six batch files) the
    # rewrite reads as six removes + one add
    d3 = manifest_diff(spark, manifest, 2)
    assert d3.where("change = 'add'").count() == 1
    assert d3.where("change = 'remove'").select("file_path").distinct() \
        .count() == 6
    # and catch-up from v2 is still SOUND (nothing added after v2 was
    # folded): zero new rows
    assert read_manifest_changes(spark, manifest, 2).count() == 0
    # same-snapshot diff is empty; catching up from the post-compaction
    # snapshot sees nothing new
    _, all_seqs = __import__(
        "kioss_spark.operators.skew", fromlist=["_snapshot_seqs"]
    )._snapshot_seqs(spark, manifest)
    latest = max(all_seqs)
    assert manifest_diff(spark, manifest, latest, latest).count() == 0
    empty = read_manifest_changes(spark, manifest, latest)
    assert empty.count() == 0
    assert empty.columns == ["x", "payload"]


def test_manifest_diff_vacuumed_snapshot_raises(spark, tmp_path, monkeypatch):
    from kioss_spark.operators import skew
    from kioss_spark.operators.skew import (
        manifest_diff,
        manifest_sink,
        vacuum,
    )

    # v3 log: version dirs below the oldest retained snapshot's BASE
    # CHECKPOINT are the deletable ones — shrink the checkpoint
    # interval so the head (v2) is itself a checkpoint and v0/v1 die
    monkeypatch.setattr(skew, "_CHECKPOINT_INTERVAL", 2)
    data = str(tmp_path / "gone_data")
    manifest = str(tmp_path / "gone_manifest")
    sink = manifest_sink(data, manifest, ["x"])
    for b in range(3):
        sink(
            spark.createDataFrame(
                [(b * 10 + i, "p") for i in range(10)],
                "x long, payload string",
            ),
            b,
        )
    vacuum(spark, data, manifest, retain_last=1)
    with pytest.raises(ValueError, match="not committed"):
        manifest_diff(spark, manifest, 0)


def test_skipping_scan_ntz_bounds_exact_under_hostile_session_tz(
    spark, tmp_path
):
    # TIMESTAMP_NTZ is the engine's canonical event-time type
    # (functions/timeutil.py); its stats are WALL-CLOCK epoch seconds
    # and must prune identically under ANY session timezone — the
    # cast-through-session path would shift bounds and silently skip
    # qualifying files (round-12 self-audit find)
    from kioss_spark.operators.skew import skipping_scan, stats_index

    path = str(tmp_path / "ntz")
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    early = [(i, base + dt.timedelta(hours=i)) for i in range(48)]
    late = [(i, base + dt.timedelta(days=30, hours=i)) for i in range(48)]
    schema = "id long, ts timestamp_ntz"
    spark.createDataFrame(early, schema).coalesce(1).write.parquet(path)
    spark.createDataFrame(late, schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    assert (
        spark.read.parquet(path).schema["ts"].dataType.typeName()
        == "timestamp_ntz"
    )
    lo = dt.datetime(2024, 3, 1, 5, 30, 0)
    hi = dt.datetime(2024, 3, 2, 1, 0, 0)
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in (old_tz, "America/New_York", "Asia/Kolkata"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            idx = stats_index(spark, path, ["ts"])
            r = {x["col"]: x for x in idx.collect()}["ts"]
            assert r["kind"] == "ts_ntz"
            got = skipping_scan(spark, path, "ts", lo=lo, hi=hi, index=idx)
            rows = sorted(map(tuple, got.collect()))
            assert len(rows) == 20  # 05:30..23:00 day 1 + 00:00..01:00 d2
            assert rows[0][0] == 6 and rows[-1][0] == 25
            assert _files_read(got) == 1  # the late file pruned, every tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    # aware datetimes have no sound NTZ meaning: loud failure
    with pytest.raises(ValueError, match="timezone-aware"):
        skipping_scan(
            spark, path, "ts",
            lo=dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc),
        )


# ---------------------------------------------------------------------------
# stats-only aggregation (count/min/max from the manifest, zero data
# reads) + the consume-as-you-commit catch-up loop
# ---------------------------------------------------------------------------


def test_manifest_stats_agg_exact_and_guarded(spark, tmp_path):
    from kioss_spark.operators.skew import manifest_sink, manifest_stats_agg

    data = str(tmp_path / "sa_data")
    manifest = str(tmp_path / "sa_manifest")
    sink = manifest_sink(data, manifest, ["x", "v"])
    rows = []
    for b in range(3):
        part = [
            (b * 100 + i, float(i) + 0.5 if i % 7 else None)
            for i in range(60)
        ]
        rows += part
        sink(
            spark.createDataFrame(part, "x long, v double").repartition(2),
            b,
        )
    got = manifest_stats_agg(spark, manifest, ["x"]).collect()[0]
    xs = [x for x, _ in rows]
    assert got["n_rows"] == len(rows)
    assert got["x_min"] == min(xs) and got["x_max"] == max(xs)
    assert got["x_nulls"] == 0
    # fractional kind: widened bounds must NOT serve as exact aggregates
    with pytest.raises(ValueError, match="conservative"):
        manifest_stats_agg(spark, manifest, ["v"])
    with pytest.raises(ValueError, match="no stats for 'zz'"):
        manifest_stats_agg(spark, manifest, ["zz"])


def test_manifest_stats_agg_all_null_and_null_counts(spark, tmp_path):
    from kioss_spark.operators.skew import manifest_sink, manifest_stats_agg

    data = str(tmp_path / "nl_data")
    manifest = str(tmp_path / "nl_manifest")
    sink = manifest_sink(data, manifest, ["x"])
    sink(
        spark.createDataFrame(
            [(1,), (2,), (None,)], "x long"
        ).coalesce(1),
        0,
    )
    sink(
        spark.createDataFrame(
            [(None,), (None,)], "x long"
        ).coalesce(1),
        1,
    )
    got = manifest_stats_agg(spark, manifest, ["x"]).collect()[0]
    assert got["n_rows"] == 5
    assert got["x_min"] == 1 and got["x_max"] == 2  # null files fall out
    assert got["x_nulls"] == 3


def test_manifest_catch_up_loop_equals_full_table(spark, tmp_path):
    # consume-as-you-commit: after every batch the consumer catches up
    # from its last-seen snapshot; the accumulated feed equals the full
    # table (no row lost, none served twice) — the incremental-consumer
    # contract the change feed exists for
    from kioss_spark.operators.skew import (
        _snapshot_seqs,
        manifest_sink,
        read_manifest_changes,
        read_via_manifest,
    )

    data = str(tmp_path / "loop_data")
    manifest = str(tmp_path / "loop_manifest")
    sink = manifest_sink(data, manifest, ["x"])
    consumed = []
    last_seen = None
    for b in range(4):
        rows = [(b * 50 + i, f"p{b}_{i}") for i in range(50)]
        sink(
            spark.createDataFrame(rows, "x long, payload string")
            .repartition(2),
            b,
        )
        latest = _snapshot_seqs(spark, manifest)[0][-1]
        if last_seen is None:
            consumed += [
                tuple(r)
                for r in read_via_manifest(spark, manifest, latest).collect()
            ]
        else:
            consumed += [
                tuple(r)
                for r in read_manifest_changes(
                    spark, manifest, last_seen, latest
                ).collect()
            ]
        last_seen = latest
    full = sorted(
        map(tuple, read_via_manifest(spark, manifest).collect())
    )
    assert sorted(consumed) == full
    assert len(consumed) == len(set(consumed)) == 200
