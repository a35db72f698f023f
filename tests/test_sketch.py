"""KMV distinct-count sketch: exactness below k, estimator accuracy above,
partial-path equivalence, mergeable-shape plan sanity."""

from pyspark.sql import functions as F

from kioss_spark.operators.sketch import kmv_distinct


def test_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", i % 10) for i in range(100)], ["g", "x"]
    )
    out = kmv_distinct(df, value=F.col("x").cast("string"), by=["g"], k=64)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["n_kept"] == 10
    assert rows[0]["est_distinct"] == 10  # fewer than k distinct -> exact


def test_estimate_above_k(spark):
    n = 5000
    df = spark.range(n).select(F.lit("g").alias("g"), F.col("id").cast("string").alias("x"))
    out = kmv_distinct(df, value=F.col("x"), by=["g"], k=64).collect()[0]
    assert out["n_kept"] == 64
    # std error ~ 1/sqrt(k-2) ~ 12.7%; allow 4 sigma
    assert abs(out["est_distinct"] - n) / n < 0.51


def test_partial_matches_full(spark):
    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("string").alias("x"),
    )
    full = kmv_distinct(df, F.col("x"), by=["g"], k=32, partial=False)
    part = kmv_distinct(df, F.col("x"), by=["g"], k=32, partial=True)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, part.collect()))


def test_global_sketch_no_group(spark):
    df = spark.range(300).select(F.col("id").cast("string").alias("x"))
    out = kmv_distinct(df, F.col("x"), by=None, k=64).collect()[0]
    assert out["n_kept"] == 64
    assert abs(out["est_distinct"] - 300) / 300 < 0.55


# ---------------------------------------------------------------------------
# Datasketches built-ins (theta / HLL / KLL)
# ---------------------------------------------------------------------------

def test_theta_overlap_exact_regime(spark):
    # g1 = {0..99}, g2 = {50..149}: intersect 50, union 150, diff_ab 50
    rows = [("g1", str(i)) for i in range(100)] + [
        ("g2", str(i)) for i in range(50, 150)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    from kioss_spark.operators.sketch import theta_overlap_matrix

    out = theta_overlap_matrix(df, F.col("v"), by="g").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["group_a"], r["group_b"]) == ("g1", "g2")
    assert (r["n_a"], r["n_b"]) == (100, 100)
    assert (r["n_union"], r["n_intersect"], r["n_diff_ab"]) == (150, 50, 50)
    assert r["jaccard_e6"] == 50 * 1000000 // 150


def test_theta_disjoint_and_duplicates_ignored(spark):
    # duplicates must not affect set cardinality; disjoint -> jaccard 0
    rows = [("a", "x"), ("a", "x"), ("a", "y"), ("b", "z")]
    df = spark.createDataFrame(rows, ["g", "v"])
    from kioss_spark.operators.sketch import theta_overlap_matrix

    r = theta_overlap_matrix(df, F.col("v"), by="g").collect()[0]
    assert (r["n_a"], r["n_b"], r["n_intersect"], r["jaccard_e6"]) == (2, 1, 0, 0)


def test_hll_rollup_merge_equals_direct(spark):
    # distinct values overlap across fine parts: the merged coarse estimate
    # must equal a directly-computed coarse sketch (mergeability), and be
    # exact in the sparse regime
    rows = [("l1", f"s{i % 4}", str(i % 37)) for i in range(500)]
    df = spark.createDataFrame(rows, ["lang", "source", "tok"])
    from kioss_spark.operators.sketch import hll_rollup

    out = hll_rollup(
        df, F.col("tok"), fine=["lang", "source"], coarse=["lang"]
    ).collect()
    assert len(out) == 1
    assert out[0]["n_parts"] == 4
    assert out[0]["est_distinct"] == 37
    direct = df.groupBy("lang").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("tok")).alias("d")
    ).collect()[0]["d"]
    assert out[0]["est_distinct"] == direct


def test_kll_quantiles_exact_below_k(spark):
    # 1..100 per group: q50=50, q90=90, q99=99 under the inclusive rank rule
    df = spark.createDataFrame(
        [("g", i) for i in range(1, 101)], ["g", "x"]
    )
    from kioss_spark.operators.sketch import kll_quantiles

    r = kll_quantiles(df, F.col("x"), by=["g"], k=1024).collect()[0]
    assert r["n"] == 100
    assert (r["q_50"], r["q_90"], r["q_99"]) == (50, 90, 99)


def test_kll_bounded_error_above_k(spark):
    # n >> k: estimates must stay within the documented rank-error bound
    n = 50_000
    df = spark.range(1, n + 1).select(F.lit("g").alias("g"), F.col("id").alias("x"))
    from kioss_spark.operators.sketch import kll_quantiles

    r = kll_quantiles(df, F.col("x"), by=["g"], quantiles=(0.5,), k=256).collect()[0]
    assert abs(r["q_50"] - n // 2) / n < 0.02


def test_theta_union_agg_global_rollup(spark):
    # per-group theta sketches merged with theta_union_agg == global
    # distinct (exact regime) — the re-profile-without-rescan path
    rows = [(f"g{i % 4}", str(i % 53)) for i in range(400)]
    df = spark.createDataFrame(rows, ["g", "v"])
    sk = df.groupBy("g").agg(F.theta_sketch_agg("v").alias("sk"))
    est = sk.agg(
        F.theta_sketch_estimate(F.theta_union_agg("sk")).cast("long").alias("n")
    ).collect()[0]["n"]
    assert est == 53


# --- heavy hitters ---------------------------------------------------------

from collections import Counter

from pyspark.sql import functions as F

from kioss_spark.operators.sketch import heavy_hitters


def _hh_model(items, k):
    n = len(items)
    c = Counter(items)
    return {
        it: (cnt, 1000000 * cnt // n) for it, cnt in c.items() if cnt * k > n
    }


def _hh_run(spark, items, k, partial=True, parts=8):
    df = spark.createDataFrame(
        [(x,) for x in items], "item string"
    ).repartition(parts)
    return {
        r["item"]: (r["cnt"], r["share_e6"])
        for r in heavy_hitters(df, F.col("item"), k=k, partial=partial).collect()
    }


def test_heavy_hitters_exact_on_skewed_stream(spark):
    items = ["the"] * 500 + ["of"] * 200 + ["and"] * 90 + [
        f"rare{i}" for i in range(400)
    ]
    model = _hh_model(items, k=8)
    assert model  # fixture really has phi-heavy items
    assert _hh_run(spark, items, k=8) == model


def test_heavy_hitters_partial_pass_is_lossless(spark):
    # spread across many partitions so per-batch counts are far below the
    # global ones — the pigeonhole superset guarantee must still hold
    items = ["a"] * 300 + ["b"] * 150 + [f"x{i}" for i in range(550)]
    full = _hh_run(spark, items, k=16, partial=False, parts=16)
    part = _hh_run(spark, items, k=16, partial=True, parts=16)
    assert part == full == _hh_model(items, k=16)


def test_heavy_hitters_no_hitters(spark):
    items = [f"u{i}" for i in range(100)]
    assert _hh_run(spark, items, k=4) == {}


def test_heavy_hitters_null_items_excluded_both_paths(spark):
    # nulls must not count toward N or appear as items, identically in
    # the partial and non-partial paths (pandas value_counts drops NaN;
    # the explicit filter makes the Spark path match)
    rows = [("a",)] * 6 + [(None,)] * 10 + [("b",)] * 2
    df = spark.createDataFrame(rows, "item string").repartition(4)
    # N = 8 non-null items: only "a" clears cnt*k > N (6*3 > 8; 2*3 < 8);
    # if nulls leaked into N (18), "a" would fail 6*3 > 18 — so this
    # asserts the exclusion on both sides of the inequality
    want = {"a": (6, 1000000 * 6 // 8)}
    for partial in (True, False):
        got = {
            r["item"]: (r["cnt"], r["share_e6"])
            for r in heavy_hitters(
                df, F.col("item"), k=3, partial=partial
            ).collect()
        }
        assert got == want, partial


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def _cms_stream(spark):
    rows = [(w,) for w, n in [("a", 50), ("b", 20), ("c", 5), ("d", 1)] for _ in range(n)]
    return spark.createDataFrame(rows, "tok string")


def test_cms_counters_row_sums_equal_stream_size(spark):
    from pyspark.sql import functions as F

    from kioss_spark.operators.sketch import cms_counters

    stream = _cms_stream(spark)
    c = cms_counters(stream, F.col("tok"), d=4, w=8)
    sums = {r["row"]: r["s"] for r in
            c.groupBy("row").agg(F.sum("n").alias("s")).collect()}
    assert sums == {0: 76, 1: 76, 2: 76, 3: 76}


def test_cms_exact_when_wide_overcounts_when_narrow(spark):
    from pyspark.sql import functions as F

    from kioss_spark.operators.sketch import cms_counters, cms_estimate

    stream = _cms_stream(spark)
    probes = stream.select("tok").distinct()
    exact = {"a": 50, "b": 20, "c": 5, "d": 1}
    # wide sketch (w >> vocab): no collisions, estimates are exact
    wide = cms_estimate(
        probes, cms_counters(stream, F.col("tok"), d=4, w=4096), "tok", d=4, w=4096
    )
    got = {r["tok"]: r["est_n"] for r in wide.collect()}
    assert got == exact
    # w=2 with 4 values: every row has a collision -> CMS only OVERcounts,
    # and at least one estimate strictly exceeds its exact count
    narrow = cms_estimate(
        probes, cms_counters(stream, F.col("tok"), d=4, w=2), "tok", d=4, w=2
    )
    got2 = {r["tok"]: r["est_n"] for r in narrow.collect()}
    assert all(got2[t] >= exact[t] for t in exact), got2
    assert any(got2[t] > exact[t] for t in exact), got2


def test_cms_never_seen_probe_estimates_zero(spark):
    from pyspark.sql import functions as F

    from kioss_spark.operators.sketch import cms_counters, cms_estimate

    stream = _cms_stream(spark)
    counters = cms_counters(stream, F.col("tok"), d=4, w=4096)
    probes = spark.createDataFrame([("zzz_never",)], "tok string")
    got = cms_estimate(probes, counters, "tok", d=4, w=4096).collect()
    assert [(r["tok"], r["est_n"]) for r in got] == [("zzz_never", 0)]
