"""Dedup operators — unit coverage for the narrow shingle construction and
the pair pipelines on hand-computed corpora (the oracle gate covers them at
fixture scale; these pin the edge semantics)."""

from pyspark.sql import functions as F

from kioss_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _shingles(spark, text, n=4):
    df = _docs(spark, [(1, text)])
    return sorted(
        r["shingle"] for r in dedup.shingle_stream(df, n=n).collect()
    )


def test_shingle_stream_basic(spark):
    # 5 tokens, 4-grams -> 2 shingles, in-row order
    assert _shingles(spark, "a b c d e") == ["a b c d", "b c d e"]


def test_shingle_stream_multispace_and_trim(spark):
    # empty tokens never appear inside shingles: "a  b" == "a b"
    assert _shingles(spark, "  a  b   c d  e ") == ["a b c d", "b c d e"]


def test_shingle_stream_short_and_empty_docs(spark):
    # < n tokens -> no shingles; empty/whitespace text -> no rows
    df = _docs(spark, [(1, "a b c"), (2, ""), (3, "   "), (4, "a b c d")])
    got = {(r["doc_id"], r["shingle"]) for r in dedup.shingle_stream(df).collect()}
    assert got == {(4, "a b c d")}


def test_shingle_stream_is_multiset_index_is_set(spark):
    df = _docs(spark, [(1, "x y x y x y x y")])  # "x y x y" appears 3x...
    stream = dedup.shingle_stream(df).collect()
    assert len(stream) == 5  # ...in a 5-shingle multiset
    index = dedup.shingle_index(df, materialize=False).collect()
    assert len(index) == 2  # {"x y x y", "y x y x"}


def test_shingle_stream_plan_has_one_exchange_no_window(spark):
    df = _docs(spark, [(1, "a b c d e")])
    plan = dedup.shingle_stream(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # only the doc-level repartition
    assert "Window" not in plan  # token stream itself never shuffles


def test_index_distinct_reuses_doc_partitioning(spark):
    # the distinct's aggregate must ride the doc_id exchange: still ONE
    # exchange in the whole index plan (subset clustering)
    df = _docs(spark, [(1, "a b c d e"), (2, "a b c d")])
    plan = dedup.shingle_index(df, materialize=False)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_exact_dedup_normalizes_and_keeps_min_id(spark):
    df = _docs(spark, [(5, "Hello World"), (2, "  hello world "), (9, "other")])
    rows = {r["keep_id"]: r["n_copies"] for r in dedup.exact_dedup(df).collect()}
    assert rows == {2: 2, 9: 1}


def test_jaccard_pairs_exact_threshold(spark):
    # doc1/doc2: 5-token docs sharing 4 tokens -> shingle sets {2}∩{2}:
    # J("a b c d e" vs "a b c d f") = |{a b c d}| / |{a b c d e, b c d e,
    # a b c d f, b c d f}... compute: s1={abcd,bcde}, s2={abcd,bcdf},
    # inter=1, union=3 -> J=1/3; with threshold 0.3 the pair survives,
    # with 0.5 it does not.
    df = _docs(spark, [(1, "a b c d e"), (2, "a b c d f"), (3, "zz yy xx ww vv")])
    lo = dedup.jaccard_pairs(df, threshold=0.3).collect()
    assert [(r["doc_a"], r["doc_b"], r["n_shared"], r["jaccard_e6"]) for r in lo] == [
        (1, 2, 1, 333333)
    ]
    hi = dedup.jaccard_pairs(df, threshold=0.5).collect()
    assert hi == []


def test_minhash_catches_identical_docs(spark):
    # identical shingle sets share every band -> always a candidate, J=1
    df = _docs(spark, [(1, "p q r s t u"), (2, "p q r s t u"), (3, "m n o p q")])
    got = [(r["doc_a"], r["doc_b"], r["jaccard_e6"]) for r in dedup.minhash_lsh_pairs(df).collect()]
    assert got == [(1, 2, 1000000)]


def test_simhash_identical_docs_hamming_zero(spark):
    df = _docs(spark, [(1, "p q r s t u"), (2, "p q r s t u"), (3, "aa bb cc dd ee")])
    got = [(r["doc_a"], r["doc_b"], r["hamming"]) for r in dedup.simhash_pairs(df).collect()]
    assert got == [(1, 2, 0)]


def test_connected_components_chain_and_singletons(spark):
    # chain 1-2-3 (transitive: 1!~3 still one cluster), pair 10-11,
    # singletons 20, 21
    from pyspark.sql import functions as F

    from kioss_spark.operators import dedup

    ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 20, 21)], "doc_id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(edges, ids).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 21}


def test_connected_components_converges_on_long_chain(spark):
    # a 12-node chain needs ~log-diameter rounds of min-label propagation;
    # all nodes must still collapse to the head
    ids = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "doc_a long, doc_b long"
    )
    from kioss_spark.operators import dedup

    rows = dedup.connected_components(edges, ids).collect()
    assert all(r["cluster_id"] == 0 for r in rows)


def test_containment_catches_subset_duplication(spark):
    # doc 1 is pasted verbatim inside doc 2 (with a long unrelated tail):
    # Jaccard is small (|A|/|B|), containment(1 -> 2) is exactly 1.0
    inner = "w1 w2 w3 w4 w5 w6"
    outer = inner + " t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12 t13 t14 t15 t16"
    df = _docs(spark, [(1, inner), (2, outer)])
    pairs = {
        (r["doc_inner"], r["doc_outer"]): r["containment_e6"]
        for r in dedup.containment_pairs(df, threshold=0.8).collect()
    }
    assert pairs == {(1, 2): 1_000_000}
    # Jaccard at the same threshold misses it entirely
    assert dedup.jaccard_pairs(df, threshold=0.8).count() == 0


def test_containment_is_directional(spark):
    # near-equal docs contain each other -> both directions emitted
    a = "w1 w2 w3 w4 w5 w6 w7"
    df = _docs(spark, [(1, a), (2, a)])
    got = {
        (r["doc_inner"], r["doc_outer"]) for r in dedup.containment_pairs(df).collect()
    }
    assert got == {(1, 2), (2, 1)}


def test_containment_below_threshold_absent(spark):
    # 2 of 4 shingles shared -> C = 0.5 < 0.8 in both directions
    df = _docs(spark, [(1, "a b c d e f g"), (2, "c d e f x y z")])
    assert dedup.containment_pairs(df, threshold=0.8).count() == 0


def test_substring_spans_flags_shared_window_only(spark):
    # docs 1 and 2 share the verbatim 8-token run w1..w8 at different
    # offsets; doc 3 is unrelated. Coverage counts the span union, and the
    # unique remainder of each doc stays unflagged.
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    df = _docs(
        spark,
        [
            (1, shared + " u1 u2 u3 u4"),            # 12 toks, spans 0-7
            (2, "v1 v2 " + shared),                   # 10 toks, spans 2-9
            (3, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),    # no shared window
        ],
    )
    got = {
        r["doc_id"]: (r["n_tok"], r["dup_windows"], r["dup_cov_e6"])
        for r in dedup.substring_spans(df, n=8, min_docs=2).collect()
    }
    assert got[1] == (12, 1, 666666)   # 8/12 covered
    assert got[2] == (10, 1, 800000)   # 8/10 covered
    assert got[3] == (10, 0, 0)


def test_substring_spans_overlapping_windows_union_not_double_counted(spark):
    # 9 shared tokens = two overlapping flagged 8-windows; union = 9, not 16
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9"
    df = _docs(spark, [(1, shared + " a1"), (2, shared + " b1")])
    got = {
        r["doc_id"]: (r["n_tok"], r["dup_windows"], r["dup_cov_e6"])
        for r in dedup.substring_spans(df, n=8, min_docs=2).collect()
    }
    # windows at pos 0 and 1 both flagged; covered = 9 of 10 tokens
    assert got[1] == (10, 2, 900000)
    assert got[2] == (10, 2, 900000)


def test_substring_spans_short_docs_score_zero(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c")])
    got = {r["doc_id"]: r["dup_cov_e6"] for r in dedup.substring_spans(df, n=8).collect()}
    assert got == {1: 0, 2: 0}


def test_transitive_reach_hops_and_cutoff(spark):
    # seed 1; chain 1-2-3-4: hop(2)=1, hop(3)=2, 4 beyond max_hops=2;
    # the 99-100 component is disconnected from the seed and must be absent
    from kioss_spark.operators.contamination import transitive_reach

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (99, 100)], "doc_a long, doc_b long"
    )
    seeds = spark.createDataFrame([(1,)], "doc_id long")
    got = {r["doc_id"]: r["hop"] for r in transitive_reach(edges, seeds, max_hops=2).collect()}
    assert got == {1: 0, 2: 1, 3: 2}


def test_transitive_reach_min_hop_over_multiple_paths(spark):
    # two seeds; node 3 reachable at hop 1 from seed 4 and hop 2 from seed 1
    from kioss_spark.operators.contamination import transitive_reach

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 3)], "doc_a long, doc_b long"
    )
    seeds = spark.createDataFrame([(1,), (4,)], "doc_id long")
    got = {r["doc_id"]: r["hop"] for r in transitive_reach(edges, seeds, max_hops=3).collect()}
    assert got == {1: 0, 4: 0, 2: 1, 3: 1}


def test_incremental_pairs_excludes_corpus_vs_corpus(spark):
    # docs 1,2 are old near-identical (an old-old pair the full dedup would
    # emit); doc 3 is NEW and duplicates old doc 1; docs 4,5 are both NEW
    # duplicates of each other. Only pairs touching a new doc may appear.
    base = "t1 t2 t3 t4 t5 t6 t7 t8"
    other = "z1 z2 z3 z4 z5 z6 z7 z8"
    df = _docs(
        spark,
        [(1, base), (2, base), (3, base), (4, other), (5, other)],
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["both_new"]
        for r in dedup.incremental_jaccard_pairs(
            df, F.col("doc_id").isin(3, 4, 5), threshold=0.5
        ).collect()
    }
    assert got == {(1, 3): False, (2, 3): False, (4, 5): True}


def test_incremental_minhash_subset_of_exact_incremental(spark):
    """LSH-incremental pairs must be a subset of the exact prefix-filtered
    incremental pairs (banding can only LOSE candidates; verification is
    identical), with identical values on the shared pairs and the same
    both_new flags."""
    from pyspark.sql import functions as F

    rows = []
    base = "the quick brown fox jumps over a lazy dog near the old mill race"
    for i in range(24):
        rows.append((i, base if i % 5 == 0 else base.replace("dog", f"cat{i}")))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # split by id so the identical-doc group straddles the batch boundary
    is_new = F.col("doc_id") % 3 == 1
    exact = {
        (r["doc_a"], r["doc_b"]): (r["jaccard_e6"], r["both_new"])
        for r in dedup.incremental_jaccard_pairs(df, is_new, threshold=0.5).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): (r["jaccard_e6"], r["both_new"])
        for r in dedup.incremental_minhash_pairs(df, is_new, threshold=0.5).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert exact[k] == v
    # on near-identical docs the banding finds them (J=1 pairs collide in
    # every band) — the subset is non-trivial
    assert lsh


# --- minhash_bands_expr (per-row streaming-safe form) ----------------------


def test_minhash_bands_expr_matches_batch_band_buckets(spark):
    from pyspark.sql import functions as F

    from kioss_spark.operators.dedup import (
        _band_buckets,
        minhash_bands_expr,
        minhash_signatures,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "entirely different words compose this sample text here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    batch = {
        (r["doc_id"], r["band"], r["bh"])
        for r in _band_buckets(minhash_signatures(docs, k=32), 32, 8).collect()
    }
    perrow = {
        (r["doc_id"], r["b"]["band"], r["b"]["bh"])
        for r in docs.select(
            "doc_id", F.explode(minhash_bands_expr(F.col("text"))).alias("b")
        ).collect()
    }
    assert perrow == batch and len(batch) == 24  # 3 docs x 8 bands
