"""Round-11 operator tests: BM25 DECIMAL headroom, clustered (z-order)
compaction + pruning-effectiveness audit, and the partitioned
size-targeted write fix."""

import random

import pytest
from pyspark.sql import functions as F

from kioss_spark.operators import retrieval
from kioss_spark.operators.skew import (
    compact_parquet,
    file_layout_audit,
    pruning_effectiveness_audit,
)
from kioss_spark.stream import Stream


# ---------------------------------------------------------------------------
# BM25 integer headroom (round-10 ADVICE: idf_e6 * tfp_e4 wraps int64 near
# N ~ 6e8 docs; both scaled products now run in DECIMAL(38,0))
# ---------------------------------------------------------------------------


def test_bm25_score_exact_past_int64_headroom(spark):
    # synthetic stats table with n_docs past the int64 wrap point for
    # idf_e6 * tfp_e4 (df=1 gives idf_e6 ~ 6.7e5 * N; N = 2e9 puts the
    # product near 3e19 > 2^63-1 ~ 9.2e18); the Python oracle uses
    # unbounded ints, so agreement proves the DECIMAL path is exact, not
    # wrapped
    n_docs = 2_000_000_000
    n_toks = 50 * n_docs
    tfdl = spark.createDataFrame(
        [(1, "rare", 7, 50), (2, "rare", 2, 40), (2, "hot", 9, 40)],
        "doc_id long, term string, tf long, dl long",
    )
    df = spark.createDataFrame(
        [("rare", 1), ("hot", n_docs // 2)], "term string, df long"
    )
    g = spark.createDataFrame(
        [(n_docs, n_toks)], "n_docs long, n_toks long"
    )
    q = spark.createDataFrame([(0, "rare"), (0, "hot")],
                              "query_id long, term string")
    out = {
        r["doc_id"]: r["score_e6"]
        for r in retrieval.bm25_score_topk(tfdl, df, g, q, k=10).collect()
    }

    def py_score(tf, dl, dfv):
        idf_e6 = (1_000_000 * (2 * n_docs - 2 * dfv + 1)) // (2 * dfv + 1)
        tfp_e4 = (10_000 * 44 * n_toks * tf) // (
            20 * n_toks * tf + 6 * n_toks + 18 * n_docs * dl
        )
        return (idf_e6 * tfp_e4) // 10_000

    expect = {
        1: py_score(7, 50, 1),
        2: py_score(2, 40, 1) + py_score(9, 40, n_docs // 2),
    }
    assert out == expect
    # and the rare-term product really is past int64 (the wrap regime)
    idf_e6 = (1_000_000 * (2 * n_docs - 2 + 1)) // 3
    assert idf_e6 * py_tfp_max() > 2**63 - 1


def py_tfp_max():
    # tf-part ceiling: 44/20 e4-scaled
    return 22_000


def test_bm25_fuzz_still_matches_python_after_decimal_widening(spark):
    rng = random.Random(11)
    vocab = ["ant", "bee", "cat", "dog", "elk", "fox"]
    docs = {
        d: [rng.choice(vocab) for _ in range(rng.randint(1, 9))]
        for d in range(30)
    }
    inv = spark.createDataFrame(
        [(d, t) for d, ws in docs.items() for t in ws],
        "doc_id long, term string",
    )
    tfdl, df, g = retrieval.bm25_stats(inv)
    q = spark.createDataFrame(
        [(0, "ant"), (0, "fox"), (1, "cat")], "query_id long, term string"
    )
    out = retrieval.bm25_score_topk(tfdl, df, g, q, k=30).collect()
    for qid, qterms in [(0, ["ant", "fox"]), (1, ["cat"])]:
        expect = sorted(
            retrieval.bm25_score_py(docs, qterms).items(),
            key=lambda kv: (-kv[1], kv[0]),
        )
        got = [
            (int(r["doc_id"]), int(r["score_e6"]))
            for r in sorted(
                (r for r in out if r["query_id"] == qid),
                key=lambda r: r["rnk"],
            )
        ]
        assert got == expect


# ---------------------------------------------------------------------------
# positional index + phrase / proximity BM25
# ---------------------------------------------------------------------------


def _pos_corpus(rng, n_docs=30, vocab=("sun", "moon", "star", "sky", "sea")):
    return {
        d: [rng.choice(vocab) for _ in range(rng.randint(2, 14))]
        for d in range(n_docs)
    }


def _phrase_expect(docs, terms, slop, k=30):
    """Python-side ranking under bm25_phrase_topk semantics."""
    from collections import Counter

    n_docs = len(docs)
    dls = {d: len(ws) for d, ws in docs.items()}
    n_toks = sum(dls.values())
    dfs = Counter()
    for ws in docs.values():
        dfs.update(set(ws))
    idf = {
        t: (1_000_000 * (2 * n_docs - 2 * dfs[t] + 1)) // (2 * dfs[t] + 1)
        for t in dfs
    }
    out = []
    for d, ws in docs.items():
        pos = {}
        for i, t in enumerate(ws, start=1):
            pos.setdefault(t, []).append(i)
        hits = retrieval.phrase_hits_py(pos, list(terms), slop=slop)
        if hits < 1:
            continue
        bow = retrieval.bm25_score_py(docs, sorted(set(terms)))[d]
        idf_sum = sum(idf[t] for t in terms)
        score = bow + (hits * idf_sum * 22_000) // 10_000
        out.append((d, hits, score))
    out.sort(key=lambda x: (-x[2], x[0]))
    return out[:k]


@pytest.mark.parametrize("slop", [0, 2])
def test_bm25_phrase_topk_matches_python(spark, slop):
    rng = random.Random(17 + slop)
    docs = _pos_corpus(rng)
    inv = spark.createDataFrame(
        [(d, t, i) for d, ws in docs.items() for i, t in enumerate(ws, 1)],
        "doc_id long, term string, pos long",
    )
    tfdl, df, g = retrieval.bm25_stats_positional(inv)
    phrases = spark.createDataFrame(
        [(0, ["sun", "moon"]), (1, ["sea", "sky", "star"]), (2, ["moon"])],
        "query_id long, terms array<string>",
    )
    out = retrieval.bm25_phrase_topk(tfdl, df, g, phrases, k=30, slop=slop)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["n_hits"], r["score_e6"])
        )
    for qid, terms in [(0, ["sun", "moon"]), (1, ["sea", "sky", "star"]),
                       (2, ["moon"])]:
        expect = _phrase_expect(docs, terms, slop)
        assert sorted(got.get(qid, []), key=lambda x: (-x[2], x[0])) == expect, (
            qid, slop,
        )


def test_phrase_hits_py_examples():
    pos = {"a": [1, 5, 9], "b": [2, 11], "c": [3]}
    assert retrieval.phrase_hits_py(pos, ["a", "b"]) == 1          # 1->2
    assert retrieval.phrase_hits_py(pos, ["a", "b", "c"]) == 1     # 1,2,3
    assert retrieval.phrase_hits_py(pos, ["a", "b"], slop=1) == 2  # 9->11 too
    assert retrieval.phrase_hits_py(pos, ["b", "a"]) == 0
    assert retrieval.phrase_hits_py(pos, ["a", "zz"]) == 0
    assert retrieval.phrase_hits_py(pos, ["a"]) == 3


def test_bm25_phrase_no_require_ranks_all_candidates(spark):
    docs = {0: ["x", "y"], 1: ["x", "z", "y"], 2: ["z"]}
    inv = spark.createDataFrame(
        [(d, t, i) for d, ws in docs.items() for i, t in enumerate(ws, 1)],
        "doc_id long, term string, pos long",
    )
    tfdl, df, g = retrieval.bm25_stats_positional(inv)
    phrases = spark.createDataFrame(
        [(0, ["x", "y"])], "query_id long, terms array<string>"
    )
    strict = retrieval.bm25_phrase_topk(tfdl, df, g, phrases, k=10).collect()
    assert [r["doc_id"] for r in strict] == [0]  # only doc 0 has "x y"
    boosted = retrieval.bm25_phrase_topk(
        tfdl, df, g, phrases, k=10, require_phrase=False
    ).collect()
    # doc 1 has both terms but not adjacent: ranked, zero hits, below doc 0
    by_doc = {r["doc_id"]: r for r in boosted}
    assert set(by_doc) == {0, 1}
    assert by_doc[1]["n_hits"] == 0
    assert by_doc[0]["score_e6"] > by_doc[1]["score_e6"]


# ---------------------------------------------------------------------------
# IR quality harness (retrieval_quality): the measured hybrid-vs-lane pins
# ---------------------------------------------------------------------------


def _quality_rows(spark, sf):
    from kioss_spark.queries import load_all

    rows = load_all()["retrieval_quality"].fn(spark, sf).collect()
    by_lane = {}
    for r in rows:
        by_lane.setdefault(r["lane"], {})[r["query_id"]] = r
    assert set(by_lane) == {"sparse", "dense", "hybrid"}
    return by_lane


def test_retrieval_quality_hybrid_dominates_smoke(spark):
    # sf0.001: hybrid >= max(lane) on EVERY query and EVERY metric (the
    # round-10 verdict's asked-for pin, measured not asserted)
    by_lane = _quality_rows(spark, "/root/testdata/sf0.001")
    for q, h in by_lane["hybrid"].items():
        s, d = by_lane["sparse"][q], by_lane["dense"][q]
        assert h["hits_at10"] == h["n_rel"], (q, h)  # full blended recall
        for metric in ("hits_at10", "mrr_e6", "ndcg_e6"):
            assert h[metric] >= max(s[metric], d[metric]), (q, metric)


def test_retrieval_quality_coverage_and_fusion_tax_sf001(spark):
    # sf0.01 has single-modality queries (a query's only lexical partner
    # is another held-out query) where fusing a no-signal sparse lane
    # costs rank quality — the pin is HONEST about that: hybrid's
    # COVERAGE dominates everywhere, its nDCG wins outright wherever the
    # qrels span both modalities, and the single-modality fusion tax is
    # bounded.
    by_lane = _quality_rows(spark, "/root/testdata/sf0.01")
    hyb, den, spr = by_lane["hybrid"], by_lane["dense"], by_lane["sparse"]
    for q, h in hyb.items():
        # (a) hybrid recovers the ENTIRE blended qrel set on every query
        assert h["hits_at10"] == h["n_rel"], (q, h)
        assert h["hits_at10"] >= max(
            den[q]["hits_at10"], spr[q]["hits_at10"]
        )
        if h["n_rel"] == 6:  # dual-modality qrels: outright nDCG win
            assert h["ndcg_e6"] > max(den[q]["ndcg_e6"], spr[q]["ndcg_e6"]), q
        else:  # single-modality: bounded fusion tax vs the perfect lane
            assert h["ndcg_e6"] >= 700_000, (q, h)
    mean = lambda d, m: sum(r[m] for r in d.values()) // len(d)  # noqa: E731
    assert mean(hyb, "ndcg_e6") >= (
        max(mean(den, "ndcg_e6"), mean(spr, "ndcg_e6")) * 85
    ) // 100


# ---------------------------------------------------------------------------
# clustered (z-order) compaction + pruning-effectiveness audit
# ---------------------------------------------------------------------------


def _grid_df(spark, n=4096):
    # two independent uniform dimensions — the shape z-order exists for
    return spark.range(n).select(
        (F.col("id") * 2654435761 % 1024).alias("x"),
        (F.col("id") * 40503 % 1024).alias("y"),
        F.col("id").alias("payload"),
    )


def test_compact_zorder_sizes_and_prunes_both_dims(spark, tmp_path):
    src = str(tmp_path / "frag")
    _grid_df(spark).repartition(64).write.parquet(src)  # 64 tiny files

    rr = str(tmp_path / "rr")
    zo = str(tmp_path / "zo")
    audit_rr = compact_parquet(spark, src, rr, target_mb=0.01).collect()[0]
    audit_zo = compact_parquet(
        spark, src, zo, target_mb=0.01, cluster_by=["x", "y"], zbits=10
    ).collect()[0]

    # (a) both rewrites still hit the size target: same file count regime
    # (sized from identical on-disk bytes) and bounded skew
    assert audit_rr["n_files"] >= 4 and audit_zo["n_files"] >= 4
    assert abs(audit_rr["n_files"] - audit_zo["n_files"]) <= 2
    assert audit_zo["bytes_skew_e4"] < 30_000

    # (b) the pruning metric collapses for BOTH dimensions under z-order
    prr = {r["col"]: r for r in
           pruning_effectiveness_audit(spark, rr, ["x", "y"]).collect()}
    pzo = {r["col"]: r for r in
           pruning_effectiveness_audit(spark, zo, ["x", "y"]).collect()}
    for c in ("x", "y"):
        # round-robin: every file spans ~the whole domain -> ~10000
        assert prr[c]["avg_files_hit_e4"] > 9_000, (c, prr[c])
        # z-order tiles: each probe hits a strict subset of files
        assert pzo[c]["avg_files_hit_e4"] < prr[c]["avg_files_hit_e4"] // 2, (
            c, pzo[c], prr[c],
        )


def test_compact_single_column_range_clusters_that_column(spark, tmp_path):
    src = str(tmp_path / "frag1")
    _grid_df(spark).repartition(32).write.parquet(src)
    dst = str(tmp_path / "byx")
    compact_parquet(spark, src, dst, target_mb=0.01, cluster_by="x")
    p = {r["col"]: r for r in
         pruning_effectiveness_audit(spark, dst, ["x", "y"]).collect()}
    n_files = p["x"]["n_files"]
    if n_files > 1:
        # x is range-partitioned: disjoint-ish per-file ranges
        assert p["x"]["avg_files_hit_e4"] < 9_000
        # y stays unclustered: ~every file spans the y domain
        assert p["y"]["avg_files_hit_e4"] > 9_000


def test_compact_cluster_by_validates_arity(spark, tmp_path):
    # round 14: cluster_by accepts ANY width via zvalue_n (K-dim Morton
    # interleave, default bits = 62//K) — the old 2-column ceiling is
    # gone; what still validates is the interleave-width bound itself
    from kioss_spark.operators.skew import zvalue_n

    src = str(tmp_path / "frag2")
    _grid_df(spark, 64).write.parquet(src)
    audit = compact_parquet(
        spark, src, str(tmp_path / "k3"), cluster_by=["x", "y", "payload"]
    )
    assert audit.count() >= 1  # 3-dim clustered rewrite lands
    with pytest.raises(ValueError, match="fit 62"):
        zvalue_n(["a", "b", "c"], bits=21)
    with pytest.raises(ValueError, match=">= 2 columns"):
        zvalue_n(["a"])


def test_pruning_audit_fully_clustered_single_file(spark, tmp_path):
    # one file == every probe hits exactly that file: avg == max == 10000
    p = str(tmp_path / "one")
    spark.range(100).coalesce(1).write.parquet(p)
    row = pruning_effectiveness_audit(spark, p, "id").collect()[0]
    assert row["n_files"] == 1
    assert row["avg_files_hit_e4"] == 10_000
    assert row["max_files_hit_e4"] == 10_000


# ---------------------------------------------------------------------------
# partitioned size-targeted writes (round-10 ADVICE)
# ---------------------------------------------------------------------------


def test_write_parquet_partition_by_with_target_mb_no_file_explosion(
    spark, tmp_path
):
    base = str(tmp_path / "parted")
    n_vals = 8
    df = spark.range(20_000).select(
        (F.col("id") % n_vals).alias("k"), F.col("id").alias("v")
    )
    # a tiny target forces a large n_files estimate; round-robin would
    # write up to n_files x n_vals files — keyed repartition caps it at
    # one file per partition value
    Stream.from_df(df).write_parquet(
        base, partition_by="k", target_mb=0.001, compression_ratio=1.0
    )
    audit = file_layout_audit(spark, base).collect()[0]
    assert audit["n_files"] == n_vals
    assert audit["n_rows"] == 20_000


def test_write_parquet_tiny_target_mb_no_zero_division(spark, tmp_path):
    # target_mb < ~1e-6 used to truncate the divisor to 0 past the >0 guard
    p = str(tmp_path / "tiny")
    Stream.range(spark, 10).write_parquet(p, target_mb=1e-9)
    assert file_layout_audit(spark, p).collect()[0]["n_rows"] == 10


def test_compact_tiny_target_mb_no_zero_division(spark, tmp_path):
    src = str(tmp_path / "src_tiny")
    spark.range(10).write.parquet(src)
    out = compact_parquet(
        spark, src, str(tmp_path / "dst_tiny"), target_mb=1e-9
    ).collect()[0]
    assert out["n_rows"] == 10


# ---------------------------------------------------------------------------
# stats_index / skipping_scan — the data-skipping manifest + pruned scan
# (exactness vs a full scan + filter; physical file-open collapse on a
# clustered layout; conservative-correct on round-robin and all-null files)
# ---------------------------------------------------------------------------


def _files_read(df):
    return df.select(F.col("_metadata.file_path")).distinct().count()


def test_stats_index_shape_and_values(spark, tmp_path):
    from kioss_spark.operators.skew import stats_index

    path = str(tmp_path / "si")
    _grid_df(spark, n=1024).repartition(4).write.parquet(path)
    idx = stats_index(spark, path, ["x", "y"]).collect()
    n_files = len({r["file_path"] for r in idx})
    assert len(idx) == 2 * n_files  # long format: one row per (file, col)
    for r in idx:
        assert r["col"] in ("x", "y")
        assert r["n_nulls"] == 0
        assert 0 <= r["lo"] <= r["hi"] <= 1023
        assert r["file_rows"] > 0 and r["file_bytes"] > 0
    # per-file rows sum to the table
    per_file = {r["file_path"]: r["file_rows"] for r in idx}
    assert sum(per_file.values()) == 1024


def test_skipping_scan_exact_on_clustered_layout_and_prunes(spark, tmp_path):
    from kioss_spark.operators.skew import skipping_scan, stats_index

    src = str(tmp_path / "frag")
    _grid_df(spark).repartition(32).write.parquet(src)
    dst = str(tmp_path / "byx")
    compact_parquet(spark, src, dst, target_mb=0.01, cluster_by="x")

    full = spark.read.parquet(dst).where(
        (F.col("x") >= 100) & (F.col("x") <= 227)
    )
    idx = stats_index(spark, dst, ["x"])
    pruned = skipping_scan(spark, dst, "x", lo=100, hi=227, index=idx)

    # exactness: identical multiset of rows
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, full.collect())
    )
    # physical collapse: the range covers 1/8 of the x-domain; on a
    # range-clustered layout the candidate list must be a strict subset
    n_files = file_layout_audit(spark, dst).collect()[0]["n_files"]
    if n_files > 2:
        assert _files_read(pruned) < n_files


def test_skipping_scan_exact_on_roundrobin_layout(spark, tmp_path):
    from kioss_spark.operators.skew import skipping_scan

    src = str(tmp_path / "frag_rr")
    _grid_df(spark).repartition(16).write.parquet(src)
    dst = str(tmp_path / "rr")
    compact_parquet(spark, src, dst, target_mb=0.01)  # round-robin
    full = sorted(
        map(
            tuple,
            spark.read.parquet(dst)
            .where((F.col("y") >= 512) & (F.col("y") <= 600))
            .collect(),
        )
    )
    pruned = sorted(
        map(
            tuple,
            skipping_scan(spark, dst, "y", lo=512, hi=600).collect(),
        )
    )
    assert pruned == full  # nothing skips, nothing lost


def test_skipping_scan_empty_candidates_schema_stable(spark, tmp_path):
    from kioss_spark.operators.skew import skipping_scan

    path = str(tmp_path / "dom")
    _grid_df(spark, n=256).write.parquet(path)
    out = skipping_scan(spark, path, "x", lo=5000, hi=6000)  # outside domain
    assert out.count() == 0
    assert out.columns == spark.read.parquet(path).columns


def test_skipping_scan_all_null_file_is_skipped_exactly(spark, tmp_path):
    from kioss_spark.operators.skew import skipping_scan

    path = str(tmp_path / "nulls")
    spark.range(100).select(
        F.col("id").alias("x"), F.lit("a").alias("tag")
    ).coalesce(1).write.parquet(path)
    spark.range(50).select(
        F.lit(None).cast("long").alias("x"), F.lit("b").alias("tag")
    ).coalesce(1).write.mode("append").parquet(path)

    full = sorted(
        map(
            tuple,
            spark.read.parquet(path)
            .where((F.col("x") >= 10) & (F.col("x") <= 20))
            .collect(),
        )
    )
    pruned = skipping_scan(spark, path, "x", lo=10, hi=20)
    assert sorted(map(tuple, pruned.collect())) == full
    # the all-null file has NULL lo/hi -> never a candidate
    assert _files_read(pruned) == 1


def test_skipping_scan_requires_a_bound(spark, tmp_path):
    from kioss_spark.operators.skew import skipping_scan

    path = str(tmp_path / "nobound")
    spark.range(10).select(F.col("id").alias("x")).write.parquet(path)
    with pytest.raises(ValueError, match="at least one bound"):
        skipping_scan(spark, path, "x")


def test_skipping_scan_one_sided_bounds(spark, tmp_path):
    from kioss_spark.operators.skew import skipping_scan

    path = str(tmp_path / "onesided")
    _grid_df(spark, n=512).repartition(4).write.parquet(path)
    lo_only = skipping_scan(spark, path, "x", lo=900)
    hi_only = skipping_scan(spark, path, "x", hi=100)
    base = spark.read.parquet(path)
    assert lo_only.count() == base.where(F.col("x") >= 900).count()
    assert hi_only.count() == base.where(F.col("x") <= 100).count()


# ---------------------------------------------------------------------------
# kmv_state / kmv_merge_states / kmv_estimate — the mergeable sketch
# warehouse (set-union merge law: idempotent, commutative, and exactly
# equal to a from-scratch build over the union)
# ---------------------------------------------------------------------------


def _kmv_fixture(spark, seed, n, tag):
    random.seed(seed)
    rows = [(tag, f"w{random.randrange(4000)}") for _ in range(n)]
    return spark.createDataFrame(rows, "g string, v string")


def test_kmv_merge_equals_from_scratch(spark):
    from kioss_spark.operators.sketch import (
        kmv_distinct,
        kmv_estimate,
        kmv_merge_states,
        kmv_state,
    )

    a = _kmv_fixture(spark, 1, 600, "x").union(_kmv_fixture(spark, 2, 20, "y"))
    b = _kmv_fixture(spark, 3, 600, "x").union(_kmv_fixture(spark, 4, 900, "z"))
    k = 32
    merged = kmv_merge_states(
        kmv_state(a, F.col("v"), by=["g"], k=k),
        kmv_state(b, F.col("v"), by=["g"], k=k),
        by=["g"],
        k=k,
    )
    scratch = kmv_state(a.union(b), F.col("v"), by=["g"], k=k)
    assert {r["g"]: r["hashes"] for r in merged.collect()} == {
        r["g"]: r["hashes"] for r in scratch.collect()
    }
    # estimates agree with the one-shot operator on the union, per group
    est_m = {r["g"]: (r["n_kept"], r["est_distinct"])
             for r in kmv_estimate(merged, by=["g"], k=k).collect()}
    est_s = {r["g"]: (r["n_kept"], r["est_distinct"])
             for r in kmv_distinct(a.union(b), F.col("v"), by=["g"], k=k).collect()}
    assert est_m == est_s
    # groups from only one side survive the outer join ('y' only in a,
    # 'z' only in b); 'y' has < k distinct values -> exact count
    assert set(est_m) == {"x", "y", "z"}
    y_exact = a.union(b).where("g = 'y'").select("v").distinct().count()
    assert est_m["y"] == (y_exact, y_exact)


def test_kmv_merge_idempotent_and_commutative(spark):
    from kioss_spark.operators.sketch import kmv_merge_states, kmv_state

    k = 16
    sa = kmv_state(_kmv_fixture(spark, 5, 300, "x"), F.col("v"), by=["g"], k=k)
    sb = kmv_state(_kmv_fixture(spark, 6, 300, "x"), F.col("v"), by=["g"], k=k)
    ab = kmv_merge_states(sa, sb, by=["g"], k=k).collect()
    ba = kmv_merge_states(sb, sa, by=["g"], k=k).collect()
    assert [r["hashes"] for r in ab] == [r["hashes"] for r in ba]
    # replaying a batch (at-least-once delivery) is a no-op — the property
    # that lets the streaming maintainer be a plain overwrite, where
    # bm25_index_sink's additive law needs versioned exactly-once plumbing
    merged = kmv_merge_states(sa, sb, by=["g"], k=k)
    replay = kmv_merge_states(merged, sb, by=["g"], k=k).collect()
    assert [r["hashes"] for r in replay] == [r["hashes"] for r in ab]


def test_kmv_state_ungrouped_and_short_state(spark):
    from kioss_spark.operators.sketch import kmv_estimate, kmv_state

    df = spark.createDataFrame([("g", f"v{i}") for i in range(10)],
                               "g string, v string")
    st = kmv_state(df, F.col("v"), by=None, k=64)
    rows = st.collect()
    assert len(rows) == 1
    assert len(rows[0]["hashes"]) == 10  # fewer than k -> full hash set
    assert rows[0]["hashes"] == sorted(rows[0]["hashes"])
    est = kmv_estimate(st, by=None, k=64).collect()[0]
    assert (est["n_kept"], est["est_distinct"]) == (10, 10)


def test_skipping_scan_multidim_exact_and_multiplicative(spark, tmp_path):
    # AND-of-ranges over a z-ordered layout: each dimension's overlap
    # fraction multiplies — the predicate shape OPTIMIZE ZORDER serves
    from kioss_spark.operators.skew import skipping_scan, stats_index

    src = str(tmp_path / "frag2d")
    _grid_df(spark, n=8192).repartition(32).write.parquet(src)
    dst = str(tmp_path / "zo2d")
    compact_parquet(
        spark, src, dst, target_mb=0.005, cluster_by=["x", "y"], zbits=10
    )
    idx = stats_index(spark, dst, ["x", "y"])
    ranges = {"x": (0, 255), "y": (256, 511)}  # a quarter x a quarter
    pruned = skipping_scan(spark, dst, ranges=ranges, index=idx)
    full = spark.read.parquet(dst).where(
        (F.col("x") >= 0) & (F.col("x") <= 255)
        & (F.col("y") >= 256) & (F.col("y") <= 511)
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, full.collect())
    )
    n_files = file_layout_audit(spark, dst).collect()[0]["n_files"]
    got_2d = _files_read(pruned)
    if n_files >= 8:
        # 2-D candidates must be fewer than either 1-D cut alone
        got_x = _files_read(
            skipping_scan(spark, dst, ranges={"x": (0, 255)}, index=idx)
        )
        got_y = _files_read(
            skipping_scan(spark, dst, ranges={"y": (256, 511)}, index=idx)
        )
        assert got_2d < min(got_x, got_y), (got_2d, got_x, got_y, n_files)


def test_skipping_scan_one_sided_range_in_dict_form(spark, tmp_path):
    from kioss_spark.operators.skew import skipping_scan

    path = str(tmp_path / "dictform")
    _grid_df(spark, n=512).repartition(4).write.parquet(path)
    out = skipping_scan(spark, path, ranges={"x": (900, None)})
    base = spark.read.parquet(path).where(F.col("x") >= 900)
    assert out.count() == base.count()
    with pytest.raises(ValueError, match="at least one bound"):
        skipping_scan(spark, path, ranges={"x": (None, None)})


def test_stats_index_merge_equals_from_scratch(spark, tmp_path):
    # file immutability makes the manifest merge a plain union:
    # index(old) u stats(new files) == index(all) — O(new) per ingest
    from kioss_spark.operators.skew import stats_index, stats_index_merge

    path = str(tmp_path / "grow")
    _grid_df(spark, n=1000).coalesce(2).write.parquet(path)
    old_idx = stats_index(spark, path, ["x", "y"]).collect()
    old_files = {r["file_path"] for r in old_idx}

    spark.range(1000, 1500).select(
        (F.col("id") * 2654435761 % 1024).alias("x"),
        (F.col("id") * 40503 % 1024).alias("y"),
        F.col("id").alias("payload"),
    ).coalesce(1).write.mode("append").parquet(path)

    all_idx = stats_index(spark, path, ["x", "y"])
    new_paths = [
        r["file_path"]
        for r in all_idx.select("file_path").distinct().collect()
        if r["file_path"] not in old_files
    ]
    assert len(new_paths) == 1
    new_stats = stats_index(spark, ",".join(new_paths), ["x", "y"]) \
        if False else stats_index(spark, new_paths[0], ["x", "y"])
    old_df = spark.createDataFrame(old_idx, all_idx.schema)
    merged = stats_index_merge(old_df, new_stats)

    def key(rows):
        return sorted((r["file_path"], r["col"], r["lo"], r["hi"],
                       r["n_nulls"], r["file_rows"]) for r in rows)

    assert key(merged.collect()) == key(all_idx.collect())


# ---------------------------------------------------------------------------
# compact_incremental — bin-pack ONLY the small files, in place
# ---------------------------------------------------------------------------


def test_compact_incremental_rewrites_only_smalls(spark, tmp_path):
    from kioss_spark.operators.skew import compact_incremental

    path = str(tmp_path / "mix")
    # one big file + many small ones
    _grid_df(spark, n=60_000).coalesce(1).write.parquet(path)
    _grid_df(spark, n=600).repartition(12).write.mode("append").parquet(path)

    before = {
        r["f"]: r["s"]
        for r in spark.read.parquet(path)
        .select(F.col("_metadata.file_path").alias("f"),
                F.col("_metadata.file_size").alias("s"))
        .groupBy("f").agg(F.first("s").alias("s")).collect()
    }
    big = {f for f, s in before.items() if s == max(before.values())}
    rows_before = sorted(map(tuple, spark.read.parquet(path).collect()))

    cap = max(before.values())  # everything but the big file is "small"
    out = compact_incremental(
        spark, path, target_mb=cap / 1024 / 1024,
        small_file_mb=(cap - 1) / 1024 / 1024,
    ).collect()[0]

    after = {
        r["f"]
        for r in spark.read.parquet(path)
        .select(F.col("_metadata.file_path").alias("f")).distinct().collect()
    }
    # rows preserved exactly
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == rows_before
    # the big file is untouched (same physical path survives)
    assert big <= after
    # every small file is gone, replaced by fewer compacted files
    assert out["files_rewritten"] == len(before) - 1
    assert out["files_kept"] == 1
    assert out["n_files"] < len(before)
    # incremental cost: bytes_rewritten is the smalls' bytes, not the table's
    small_bytes = sum(s for f, s in before.items() if f not in big)
    assert out["bytes_rewritten"] == small_bytes
    assert out["bytes_rewritten"] < sum(before.values())


def test_compact_incremental_noop_when_nothing_small(spark, tmp_path):
    from kioss_spark.operators.skew import compact_incremental

    path = str(tmp_path / "healthy")
    _grid_df(spark, n=2000).coalesce(2).write.parquet(path)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    out = compact_incremental(
        spark, path, target_mb=128.0, small_file_mb=1e-6
    ).collect()[0]
    assert out["files_rewritten"] == 0 and out["bytes_rewritten"] == 0
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == before


def test_bm25_tfp_decimal_branch_exact_past_int64(spark):
    # n_toks * tf > 2.09e13 forces the adaptive tf-ratio into its
    # DECIMAL branch (the int64 branch would wrap); the unbounded-int
    # Python oracle proves the branch is exact, and a row BELOW the
    # bound (int64 branch) must agree with it on the same corpus stats
    n_docs = 5_000_000
    n_toks = 100_000_000_000_000  # 1e14: n_toks*tf passes 2.09e13 at tf=1
    tfdl = spark.createDataFrame(
        [(1, "w", 3, 60), (2, "w", 1, 40)],
        "doc_id long, term string, tf long, dl long",
    )
    df = spark.createDataFrame([("w", 2)], "term string, df long")
    g = spark.createDataFrame([(n_docs, n_toks)], "n_docs long, n_toks long")
    q = spark.createDataFrame([(0, "w")], "query_id long, term string")
    out = {
        r["doc_id"]: r["score_e6"]
        for r in retrieval.bm25_score_topk(tfdl, df, g, q, k=10).collect()
    }

    def py_score(tf, dl):
        idf_e6 = (1_000_000 * (2 * n_docs - 2 * 2 + 1)) // (2 * 2 + 1)
        tfp_e4 = (10_000 * 44 * n_toks * tf) // (
            20 * n_toks * tf + 6 * n_toks + 18 * n_docs * dl
        )
        return (idf_e6 * tfp_e4) // 10_000

    assert out == {1: py_score(3, 60), 2: py_score(1, 40)}
    # confirm the bound really was crossed (decimal branch exercised)
    assert n_toks * 1 > 20_900_000_000_000


def test_stats_index_rejects_unorderable_column(spark, tmp_path):
    # string columns gained real truncated min/max stats in round 12;
    # the loud-failure guard now covers the genuinely unorderable types
    # (nested/binary), whose NULL stats would make every file look
    # all-null and silently drop rows from pruned scans
    from kioss_spark.operators.skew import stats_index

    path = str(tmp_path / "arrcol")
    spark.range(10).select(
        F.col("id").alias("x"), F.array(F.lit(1), F.lit(2)).alias("tag")
    ).write.parquet(path)
    with pytest.raises(ValueError, match="unsupported type"):
        stats_index(spark, path, ["tag"])


def test_skipping_scan_rejects_index_missing_predicate_col(spark, tmp_path):
    from kioss_spark.operators.skew import skipping_scan, stats_index

    path = str(tmp_path / "partial_idx")
    _grid_df(spark, n=256).write.parquet(path)
    idx = stats_index(spark, path, ["x"])  # no y stats
    with pytest.raises(ValueError, match="no stats for \\['y'\\]"):
        skipping_scan(spark, path, ranges={"x": (0, 100), "y": (0, 100)},
                      index=idx)


def test_compact_incremental_rejects_partitioned_layout(spark, tmp_path):
    from kioss_spark.operators.skew import compact_incremental

    path = str(tmp_path / "parted")
    _grid_df(spark, n=256).withColumn(
        "p", F.col("x") % 2
    ).write.partitionBy("p").parquet(path)
    with pytest.raises(ValueError, match="partitioned layout"):
        compact_incremental(spark, path, target_mb=1.0)
