"""Corpus-safety operator tests: decontamination, PII, stratified
sampling, shard shuffle — semantics plus plan-shape guards."""

from pyspark.sql import functions as F

from kioss_spark.operators.contamination import ngram_overlap
from kioss_spark.operators.curation import shard_shuffle, stratified_sample
from kioss_spark.operators.privacy import pii_scan, redact


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_ngram_overlap_flags_shared_ngrams_only(spark):
    train = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),          # contains eval 6-gram a..f
            (2, "z y x w v u t s"),          # disjoint
            (3, "b c d e f g extra words"),  # shares b..g
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "a b c d e f g q r")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in ngram_overlap(train, ev, n=6).collect()
    }
    # doc1 shingles {a..f, b..g, c..h}; eval has {a..f, b..g, c..q, d..r}
    assert got[1] == (2, True)
    assert got[2] == (0, False)
    assert got[3] == (1, True)  # only "b c d e f g" is shared
    assert len(got) == 3


def test_ngram_overlap_short_docs_are_clean(spark):
    train = spark.createDataFrame([(1, "too short")], "doc_id long, text string")
    ev = spark.createDataFrame([(2, "a b c d e f")], "doc_id long, text string")
    rows = ngram_overlap(train, ev, n=6).collect()
    assert rows[0]["n_shingles"] == 0 and not rows[0]["contaminated"]


def test_ngram_overlap_broadcasts_eval_side(spark):
    train = spark.createDataFrame(
        [(i, f"w{i} a b c d e f") for i in range(50)], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(0, "a b c d e f")], "doc_id long, text string")
    plan = _physical(ngram_overlap(train, ev, n=6))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def test_pii_redact_all_three_kinds(spark):
    df = spark.createDataFrame(
        [(1, "mail me at bob.smith+x@corp.example.org or 10.1.2.3 acct 4111111111111111 end")],
        "doc_id long, text string",
    )
    cols = pii_scan(F.col("text"))
    row = df.select(
        cols["n_email"].alias("e"),
        cols["n_ipv4"].alias("i"),
        cols["n_idnum"].alias("d"),
        cols["redacted"].alias("r"),
    ).collect()[0]
    assert (row["e"], row["i"], row["d"]) == (1, 1, 1)
    assert row["r"] == "mail me at <EMAIL> or <IP> acct <ID> end"


def test_pii_redact_leaves_clean_text_alone(spark):
    df = spark.createDataFrame(
        [(1, "plain words only 123 and v1.2 here")], "doc_id long, text string"
    )
    assert df.select(redact(F.col("text")).alias("r")).collect()[0]["r"] == (
        "plain words only 123 and v1.2 here"
    )


def test_pii_scan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "x@y.io")], "doc_id long, text string")
    cols = pii_scan(F.col("text"))
    plan = _physical(df.select(*(c.alias(k) for k, c in cols.items())))
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------


def test_stratified_sample_rates_respected(spark):
    rows = [(i, "keep" if i % 2 else "drop", f"text number {i}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = stratified_sample(df, {"keep": 10000, "drop": 0}, group_col="lang").collect()
    assert {r["lang"] for r in got} == {"keep"}
    assert len(got) == 200  # rate 10000bp keeps every row of the stratum


def test_stratified_sample_no_shuffle(spark):
    df = spark.createDataFrame(
        [(1, "en", "t")], "doc_id long, lang string, text string"
    )
    plan = _physical(stratified_sample(df, {"en": 5000}))
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# shard shuffle
# ---------------------------------------------------------------------------


def test_shard_shuffle_total_deterministic_permutation(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i} body") for i in range(100)], "doc_id long, text string"
    )
    a = [(r["shard"], r["pos"], r["doc_id"]) for r in shard_shuffle(df, 4).collect()]
    # (shard, pos) is a key: every position assigned exactly once
    assert len({(s, p) for s, p, _ in a}) == 100
    # per-shard positions are 1..n contiguous
    from collections import defaultdict

    per = defaultdict(list)
    for s, p, _ in a:
        per[s].append(p)
    for s, ps in per.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # deterministic across physical layouts
    b = [(r["shard"], r["pos"], r["doc_id"]) for r in shard_shuffle(df.repartition(7), 4).collect()]
    assert sorted(a) == sorted(b)
    # a different seed yields a different permutation
    c = [(r["shard"], r["pos"], r["doc_id"]) for r in shard_shuffle(df, 4, seed="other").collect()]
    assert sorted(a) != sorted(c)


def test_shard_shuffle_no_global_single_partition_window(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string"
    )
    plan = _physical(shard_shuffle(df, 8))
    # the window must be keyed on shard, never Exchange SinglePartition
    assert "SinglePartition" not in plan
