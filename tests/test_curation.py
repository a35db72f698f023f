"""Curation-operator unit tests: determinism is the contract."""

from pyspark.sql import functions as F

from kioss_spark.operators.curation import hash_split, pack_contiguous


def test_hash_split_deterministic_and_partition_stable(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i} with some text") for i in range(300)],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    # same content, different physical layout -> identical assignment
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(7)).collect()
    }
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}
    # ~90% train with generous slack (hash buckets, 300 samples)
    frac = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.75 < frac < 1.0


def test_hash_split_is_content_function_not_row_function(spark):
    # duplicate content -> same split, regardless of id
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other text")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    assert rows[1] == rows[2]


def test_pack_contiguous_bins_by_start_offset(spark):
    # one group, budget 10: tokens 4,4,4 -> starts 0,4,8 -> bins 0,0,0;
    # next doc starts at 12 -> bin 1
    rows = [(i, "s", 4) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok int")
    got = {
        r["doc_id"]: r["bin"] for r in pack_contiguous(df, budget=10).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 1}


def test_pack_contiguous_groups_independent(spark):
    df = spark.createDataFrame(
        [(1, "a", 600), (2, "a", 600), (1, "b", 600)],
        "doc_id long, source string, n_tok int",
    )
    got = {
        (r["source"], r["doc_id"]): r["bin"]
        for r in pack_contiguous(df, budget=512).collect()
    }
    # each group restarts at offset 0
    assert got[("a", 1)] == 0 and got[("a", 2)] == 1 and got[("b", 1)] == 0


def test_ivf_multiprobe_recovers_sign_boundary_neighbor(spark):
    # query and its true nearest neighbor straddle the sign boundary on
    # dimension 1 (+0.01 vs -0.01): single-probe IVF puts them in different
    # cells and misses the match; Hamming-1 multi-probe recovers it
    from pyspark.sql import functions as F

    from kioss_spark.operators import similarity

    rows = [
        (0, [0.01, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),   # query
        (16, [-0.01, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),  # near-dup, flipped sign
        (17, [1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0]),  # far away
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    nn = similarity.with_norm(df)
    q = nn.where(F.col("vec_id") < 16)
    c = nn.where(F.col("vec_id") >= 16)
    single = {r["cand_id"] for r in similarity.ivf_topk(q, c, k=1).collect()}
    multi = {r["cand_id"] for r in similarity.ivf_multiprobe_topk(q, c, k=1).collect()}
    assert 16 not in single  # sign boundary loss
    assert multi == {16}     # recovered by the Hamming-1 probe


def test_snapshot_diff_classifies_all_four_states(spark):
    from kioss_spark.operators.curation import snapshot_diff

    prev = spark.createDataFrame(
        [(1, "h1"), (2, "h2"), (3, "h3")], "doc_id long, content_hash string"
    )
    curr = spark.createDataFrame(
        [(2, "h2"), (3, "h3x"), (4, "h4")], "doc_id long, content_hash string"
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(prev, curr).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


# --- apply_changeset -------------------------------------------------------

import pytest

from kioss_spark.operators.curation import apply_changeset


def _merge(spark, corpus_rows, change_rows):
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, payload string")
    changes = spark.createDataFrame(
        change_rows, "doc_id long, payload string, op string"
    )
    return {
        r["doc_id"]: r["payload"]
        for r in apply_changeset(corpus, changes).collect()
    }


def test_apply_changeset_delete_upsert_insert(spark):
    corpus = [(1, "a"), (2, "b"), (3, "c")]
    changes = [(2, None, "delete"), (3, "c2", "upsert"), (9, "new", "upsert")]
    assert _merge(spark, corpus, changes) == {1: "a", 3: "c2", 9: "new"}


def test_apply_changeset_conflicts_resolve_deterministically(spark):
    corpus = [(1, "a"), (2, "b")]
    # delete beats upsert for one id; among upserts the min payload wins
    changes = [
        (1, "x", "upsert"),
        (1, None, "delete"),
        (2, "z", "upsert"),
        (2, "y", "upsert"),
    ]
    assert _merge(spark, corpus, changes) == {2: "y"}


def test_apply_changeset_unknown_op_raises(spark):
    corpus = [(1, "a")]
    with pytest.raises(ValueError, match="unknown op"):
        _merge(spark, corpus, [(1, "a", "replace")])


def test_apply_changeset_empty_changeset_is_identity(spark):
    corpus = [(1, "a"), (2, "b")]
    assert _merge(spark, corpus, []) == {1: "a", 2: "b"}


# --- quota_sample ----------------------------------------------------------

from kioss_spark.operators.curation import quota_sample


def _quota_fixture(spark, sizes):
    rows = []
    i = 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((i, g, f"text {i}"))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_quota_sample_largest_remainder_exact_counts(spark):
    # weights 1/3,1/3,1/3 of 10 -> bases 3,3,3 and ONE leftover seat going
    # to the largest remainder (tie -> lexically first source)
    df = _quota_fixture(spark, {"a": 20, "b": 20, "c": 20})
    w = {"a": 333334, "b": 333333, "c": 333333}
    got = quota_sample(df, w, total=10).groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    assert sum(counts.values()) == 10
    assert counts == {"a": 4, "b": 3, "c": 3}


def test_quota_sample_shortfall_not_redistributed(spark):
    # source 'a' can only supply 2 of its 8-seat quota; b keeps its own
    # quota (no silent reallocation)
    df = _quota_fixture(spark, {"a": 2, "b": 50})
    got = quota_sample(df, {"a": 800000, "b": 200000}, total=10)
    counts = {r["source"]: r["count"] for r in got.groupBy("source").count().collect()}
    assert counts == {"a": 2, "b": 2}


def test_quota_sample_deterministic_across_partitionings(spark):
    df = _quota_fixture(spark, {"a": 30, "b": 30})
    w = {"a": 600000, "b": 400000}
    ids1 = {r["doc_id"] for r in quota_sample(df.repartition(1), w, 12).collect()}
    ids2 = {r["doc_id"] for r in quota_sample(df.repartition(13), w, 12).collect()}
    assert ids1 == ids2 and len(ids1) == 12


def test_quota_sample_rejects_bad_weight_sum(spark):
    # regression for the weight-sum validation (curation.py): under-summed
    # weights silently under-fill the exact total; over-summed overshoot.
    import pytest

    df = _quota_fixture(spark, {"a": 10, "b": 10})
    with pytest.raises(ValueError, match="1_000_000"):
        quota_sample(df, {"a": 500000, "b": 400000}, total=5)  # sums to 0.9e6
    with pytest.raises(ValueError, match="1_000_000"):
        quota_sample(df, {"a": 700000, "b": 400000}, total=5)  # sums to 1.1e6
