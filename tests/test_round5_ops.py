"""Unit tests for the round-5 operator additions: Gopher rule flags,
class-balance weights, quantile-strata sampling, rate anomaly,
hard-negative mining, frame dedup."""

from pyspark.sql import functions as F

from kioss_spark.operators import similarity as S
from kioss_spark.operators.curation import (
    class_balance_weights,
    quantile_strata_sample,
)
from kioss_spark.operators.multimodal import frame_dedup, frame_sample
from kioss_spark.operators.text import gopher_flags, tokens
from kioss_spark.operators.timeseries import rate_anomaly


def _flags(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string").select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    n_tok, f_len, f_mean, f_stop, f_uniq, f_alpha = gopher_flags(F.col("t"))
    row = df.select(
        n_tok.alias("n"),
        f_len.alias("len"),
        f_mean.alias("mean"),
        f_stop.alias("stop"),
        f_uniq.alias("uniq"),
        f_alpha.alias("alpha"),
    ).collect()[0]
    return row


def test_gopher_flags_good_doc(spark):
    r = _flags(spark, "the quick brown fox jumps over a lazy dog today")
    assert r["n"] == 10
    assert r["len"] and r["mean"] and r["stop"] and r["uniq"] and r["alpha"]


def test_gopher_flags_empty_doc(spark):
    r = _flags(spark, "")
    # empty: fails length, vacuously passes the ratio flags (0 >= 0)
    assert r["n"] == 0
    assert not r["len"]
    assert r["mean"] and r["uniq"] and r["alpha"]
    assert not r["stop"]


def test_gopher_flags_mean_length_violation(spark):
    # single-char tokens -> mean length 1 < 2
    r = _flags(spark, "a b c d e f g h")
    assert r["len"] and not r["mean"]


def test_gopher_flags_non_alpha(spark):
    # >10% pure-numeric tokens fails the 90% alphabetic rule
    r = _flags(spark, "the 1 2 3 4 5 6 7 8 9")
    assert not r["alpha"]


def test_class_balance_weights_exact(spark):
    df = spark.createDataFrame(
        [(0,)] * 6 + [(1,)] * 3 + [(2,)] * 1, "label long"
    )
    out = {r["label"]: r for r in class_balance_weights(df, "label").collect()}
    # total=10, n_labels=3: weight = floor(1e6 * 10 / (3 * n))
    assert out[0]["weight_e6"] == 555555
    assert out[1]["weight_e6"] == 1111111
    assert out[2]["weight_e6"] == 3333333
    assert sum(r["n"] for r in out.values()) == 10


def test_quantile_strata_boundaries_and_determinism(spark):
    rows = [(i, v) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8])]
    df = spark.createDataFrame(rows, "doc_id long, value long")
    out = quantile_strata_sample(df, "value", "doc_id").collect()
    strata = {r["value"]: r["stratum"] for r in out}
    # exact quartiles of 1..8: b1=2, b2=4, b3=6
    assert strata == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 3, 8: 3}
    again = {(r["doc_id"], r["kept"]) for r in
             quantile_strata_sample(df, "value", "doc_id").collect()}
    assert {(r["doc_id"], r["kept"]) for r in out} == again


def test_rate_anomaly_warmup_and_burst(spark):
    rows = [(1, b, c) for b, c in [(0, 2), (1, 2), (2, 2), (3, 8)]]
    df = spark.createDataFrame(rows, "user_id long, bucket long, cnt long")
    out = {r["bucket"]: r for r in
           rate_anomaly(df, key="user_id", bucket="bucket", count_col="cnt").collect()}
    # bucket 0: no trailing history
    assert out[0]["trail_k"] == 0 and out[0]["anomaly_e6"] == 0
    # bucket 1: trailing = [2] -> ratio exactly 1.0
    assert out[1]["trail_k"] == 1 and out[1]["anomaly_e6"] == 1_000_000
    # bucket 3: cnt=8 vs trailing mean of (2,2,2) -> 4x
    assert out[3]["trail_k"] == 3 and out[3]["anomaly_e6"] == 4_000_000


def test_hard_negatives_label_filter_and_k(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(3)
    emb = rng.standard_normal((30, 8)).astype(float)
    # candidate 20 is nearly identical to query 0 but SAME label -> excluded
    emb[20] = emb[0] + 0.001
    labels = [i % 3 for i in range(30)]
    labels[20] = labels[0]
    pdf = pd.DataFrame(
        {"vec_id": np.arange(30, dtype="int64"), "label": labels, "v": list(emb)}
    )
    nn = spark.createDataFrame(pdf).withColumn(
        "nv", F.sqrt(S._dot(F.col("v"), F.col("v")))
    )
    q = nn.where(F.col("vec_id") < 3)
    c = nn.where(F.col("vec_id") >= 3)
    out = S.hard_negatives(q, c, k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        assert len(rs) == 2
        for r in rs:
            assert r["cand_label"] != r["query_label"]
    assert all(r["cand_id"] != 20 for r in by_q[0])


def test_frame_dedup_survivor_and_threshold(spark):
    # doc 2 and doc 5 share identical text -> identical frames; doc 9 unique
    txt = "x" * 100
    df = spark.createDataFrame(
        [(2, txt), (5, txt), (9, "y" * 100)], "doc_id long, text string"
    )
    out = frame_dedup(frame_sample(df)).collect()
    assert out, "shared frames must be detected"
    for r in out:
        assert r["n_occ"] >= 2 and r["n_docs"] == 2
        assert r["keep_doc"] == 2  # lexicographically first occurrence
    # unique doc's frames are absent (n_occ >= 2 filter)
    assert all(r["keep_doc"] != 9 for r in out)


def test_minhash_signatures_stable_and_dup_equal(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "z y x w v u t s")],
        "doc_id long, text string",
    )
    from kioss_spark.operators.dedup import minhash_signatures

    sigs = {r["doc_id"]: tuple(r[f"h{i}"] for i in range(32))
            for r in minhash_signatures(df, k=32).collect()}
    # identical docs -> identical signatures; different docs -> different
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]
    # deterministic across invocations (storable artifact contract)
    again = {r["doc_id"]: tuple(r[f"h{i}"] for i in range(32))
             for r in minhash_signatures(df, k=32).collect()}
    assert sigs == again


# --- property-based models (hypothesis) -----------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=8, deadline=None)
@given(vals=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=40))
def test_quantile_strata_matches_python_model(spark, vals):
    """Stratum assignment must equal the histogram-cumsum model: boundary
    b_q = min value whose cumulative count reaches ceil-q of the total."""
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "doc_id long, value long")
    out = {r["doc_id"]: r["stratum"] for r in
           quantile_strata_sample(df, "value", "doc_id").collect()}
    svals = sorted(vals)
    n = len(svals)

    def boundary(num, den):
        cum = 0
        from collections import Counter
        for v in sorted(set(svals)):
            cum += Counter(svals)[v]
            if cum * den >= n * num:
                return v
        return svals[-1]

    b1, b2, b3 = boundary(1, 4), boundary(1, 2), boundary(3, 4)
    for i, v in enumerate(vals):
        expect = 0 if v <= b1 else 1 if v <= b2 else 2 if v <= b3 else 3
        assert out[i] == expect, (v, b1, b2, b3)


@settings(max_examples=8, deadline=None)
@given(counts=st.lists(st.integers(min_value=1, max_value=20), min_size=1, max_size=12))
def test_rate_anomaly_matches_python_model(spark, counts):
    rows = [(1, b, c) for b, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "user_id long, bucket long, cnt long")
    out = {r["bucket"]: r for r in
           rate_anomaly(df, key="user_id", bucket="bucket", count_col="cnt",
                        trailing=3).collect()}
    for b, c in enumerate(counts):
        window = counts[max(0, b - 3):b]
        tn, tk = sum(window), len(window)
        assert out[b]["trail_n"] == tn and out[b]["trail_k"] == tk
        expect = int(1000000.0 * c * tk / tn) if tn > 0 else 0
        assert out[b]["anomaly_e6"] == expect


@settings(max_examples=6, deadline=None)
@given(sizes=st.lists(st.integers(min_value=1, max_value=15), min_size=2, max_size=6))
def test_class_balance_weights_property(spark, sizes):
    """Each class's weight*count is ~total/n_labels (within floor error)."""
    rows = [(lbl,) for lbl, n in enumerate(sizes) for _ in range(n)]
    df = spark.createDataFrame(rows, "label long")
    out = class_balance_weights(df, "label").collect()
    total, k = sum(sizes), len(sizes)
    for r in out:
        assert r["weight_e6"] == int(1000000.0 * total / (k * r["n"]))


def test_gopher_flags_uppercase_alpha(spark):
    # regression for case-insensitive flag_alpha (text.py): an
    # uppercase-only token like "NASA" is alphabetic under Gopher's rule
    r = _flags(spark, "NASA THE BIG ROCKET WENT TO THE MOON TODAY OK")
    assert r["n"] == 10
    assert r["alpha"]
