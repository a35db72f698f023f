"""Unit tests for the round-7 operator additions: cluster-stratified
sampling and vocabulary drift."""

from pyspark.sql import functions as F

from kioss_spark.operators.similarity import cluster_stratified_sample
from kioss_spark.operators.text import vocab_drift


def _two_cluster_corpus(spark, n=40, dim=4):
    # two well-separated clusters around +10 and -10 on every coordinate
    rows = []
    for i in range(n):
        base = 10.0 if i % 2 == 0 else -10.0
        rows.append((i, [base + (i % 7) * 0.01] * dim))
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_cluster_stratified_caps_every_cell(spark):
    corpus = _two_cluster_corpus(spark)
    got = cluster_stratified_sample(corpus, n_centroids=2, per_cell=3).collect()
    per_cell = {}
    for r in got:
        per_cell.setdefault(r["cell"], []).append(r["rn"])
    assert len(got) == 6
    for cell, rns in per_cell.items():
        assert sorted(rns) == [1, 2, 3]
    # the two strata must be the two geometric clusters: members of one
    # cell all share the same sign pattern
    ids = {r["vec_id"]: r["cell"] for r in got}
    sides = {}
    for vid, cell in ids.items():
        sides.setdefault(cell, set()).add(vid % 2)
    assert all(len(s) == 1 for s in sides.values()), sides


def test_cluster_stratified_deterministic_across_partitionings(spark):
    corpus = _two_cluster_corpus(spark, n=60)
    a = {
        (r["vec_id"], r["cell"], r["rn"])
        for r in cluster_stratified_sample(
            corpus.repartition(1), n_centroids=2, per_cell=4
        ).collect()
    }
    b = {
        (r["vec_id"], r["cell"], r["rn"])
        for r in cluster_stratified_sample(
            corpus.repartition(13), n_centroids=2, per_cell=4
        ).collect()
    }
    assert a == b and len(a) == 8


def test_vocab_drift_flags_the_shifted_token(spark):
    # epoch 0 (even doc_id) is saturated with "burst"; epoch 1 never has it;
    # "stable" appears identically in both
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "burst burst burst stable common words here"))
        else:
            rows.append((i, "stable common words here and more filler"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = vocab_drift(docs, epoch=(F.col("doc_id") % 2).cast("long"), top_k=5).collect()
    assert got[0]["w"] == "burst"
    assert got[0]["n_a"] == 60 and got[0]["n_b"] == 0
    assert got[0]["chi2_e3"] > 0
    scores = {r["w"]: r["chi2_e3"] for r in got}
    # a perfectly balanced token scores (near) zero and cannot out-rank
    assert scores["burst"] > scores.get("stable", 0)


def test_vocab_drift_balanced_corpus_scores_zero(spark):
    docs = spark.createDataFrame(
        [(i, "same text every time") for i in range(20)],
        "doc_id long, text string",
    )
    got = vocab_drift(docs, epoch=(F.col("doc_id") % 2).cast("long")).collect()
    assert all(r["chi2_e3"] == 0 for r in got), got


def test_recall_at_k_counts_hits(spark):
    from kioss_spark.operators.similarity import recall_at_k

    truth = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], "query_id long, cand_id long"
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 20), (2, 21)], "query_id long, cand_id long"
    )
    got = {r["query_id"]: (r["hits"], r["recall_e2"])
           for r in recall_at_k(truth, approx, k=2).collect()}
    assert got == {1: (1, 50), 2: (2, 100)}


def test_recall_at_k_zero_overlap(spark):
    from kioss_spark.operators.similarity import recall_at_k

    truth = spark.createDataFrame([(1, 10)], "query_id long, cand_id long")
    approx = spark.createDataFrame([(1, 77)], "query_id long, cand_id long")
    got = recall_at_k(truth, approx, k=1).collect()
    assert got[0]["hits"] == 0 and got[0]["recall_e2"] == 0


def test_ivf_index_ingest_counts_and_flags(spark):
    from kioss_spark.operators.similarity import ivf_index_ingest

    # two tight clusters; batch lands entirely in cluster 0's cell
    base_rows = [(i, [10.0 + (i % 5) * 0.01] * 4) for i in range(0, 20, 2)]
    base_rows += [(i, [-10.0 - (i % 5) * 0.01] * 4) for i in range(1, 21, 2)]
    batch_rows = [(100 + i, [10.0] * 4) for i in range(9)]
    base = spark.createDataFrame(base_rows, "vec_id long, v array<double>")
    batch = spark.createDataFrame(batch_rows, "vec_id long, v array<double>")
    got = {r["cell"]: r for r in ivf_index_ingest(base, batch, n_centroids=2).collect()}
    assert sum(r["n_base"] for r in got.values()) == 20
    assert sum(r["n_new"] for r in got.values()) == 9
    # the batch-receiving cell grew 9/10 = 90% -> flagged; the other didn't
    flags = sorted((r["n_new"], r["retrain_flag"]) for r in got.values())
    assert flags == [(0, 0), (9, 1)]
    grown = [r for r in got.values() if r["n_new"] == 9][0]
    assert grown["growth_e6"] == 900000


def test_forget_fanout_chunk_counts_match_chunker(spark):
    from kioss_spark.operators.text import chunk_windows, tokens
    import __spark_entry__ as m

    # n_rows for 'chunks' must equal the real chunker's output size per doc
    df = m.queries()["forget_fanout"](spark, "/root/testdata/sf0.001")
    chunks = df.where(F.col("artifact") == "chunks").select("doc_id", "n_rows")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", F.size(chunk_windows(tokens(F.col("text")))).cast("long").alias("real")
    )
    bad = chunks.join(docs, "doc_id").where(F.col("n_rows") != F.col("real")).count()
    assert bad == 0
    # every forgotten doc appears in all four artifacts
    per_doc = df.groupBy("doc_id").count().collect()
    assert per_doc and all(r["count"] == 4 for r in per_doc)


# ---------------------------------------------------------------------------
# wave 2: governance queries
# ---------------------------------------------------------------------------

SF = "/root/testdata/sf0.001"


def test_dq_audit_all_green_on_fixture(spark):
    from kioss_spark.queries.llm import dq_constraint_audit

    rows = {r["metric"]: r for r in dq_constraint_audit(spark, SF).collect()}
    assert len(rows) == 8
    assert all(r["ok"] == 1 for r in rows.values()), rows
    assert rows["row_count"]["value"] > 0
    for m in rows:
        if m != "row_count":
            assert rows[m]["value"] == 0, (m, rows[m])


def test_dq_audit_catches_injected_violations(spark, tmp_path):
    from kioss_spark.queries.llm import dq_constraint_audit

    bad = spark.createDataFrame(
        [
            (0, "ok text here", "en", "src0", 12),
            (0, "dup id row xx", "en", "src0", 13),          # dup doc_id
            (1, "null lang row", None, "src0", 13),          # lang violation
            (2, "wrong n_chars", "en", "src0", 999),         # inconsistent
            (3, None, "xx", None, -5),  # null text+source, bad lang, oob
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "corpus")
    bad.write.parquet(d + "/documents.parquet")
    rows = {r["metric"]: r for r in dq_constraint_audit(spark, d).collect()}
    assert rows["doc_id_unique"]["value"] == 1 and rows["doc_id_unique"]["ok"] == 0
    assert rows["lang_in_domain"]["value"] == 2  # None + 'xx'
    assert rows["text_complete"]["value"] == 1
    assert rows["source_complete"]["value"] == 1
    # null text makes length(text) NULL -> counts as inconsistent too
    assert rows["n_chars_consistent"]["value"] == 2
    assert rows["n_chars_in_range"]["value"] == 1
    assert rows["row_count"]["ok"] == 1


def test_split_by_cluster_no_pair_crosses(spark):
    from kioss_spark.operators import dedup
    from kioss_spark.queries.llm import _docs, split_by_cluster

    docs = _docs(spark, SF)
    sp = split_by_cluster(spark, SF).select("doc_id", "split")
    pairs = dedup.jaccard_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    crossed = (
        pairs.join(sp.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("split", "sa")
        .join(
            sp.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "sb"),
            "doc_b",
        )
        .where(F.col("sa") != F.col("sb"))
        .count()
    )
    assert crossed == 0


def test_split_by_cluster_singletons_match_hash_split(spark):
    from kioss_spark.operators.curation import hash_split
    from kioss_spark.queries.llm import _docs, split_by_cluster

    docs = _docs(spark, SF)
    sp = split_by_cluster(spark, SF)
    base = hash_split(docs).select("doc_id", F.col("split").alias("doc_split"))
    single = sp.where(F.col("cluster_id") == F.col("doc_id")).join(base, "doc_id")
    n = single.count()
    assert n > 0
    assert single.where(F.col("split") != F.col("doc_split")).count() == 0


def test_quality_pctl_midrank_exact(spark):
    from kioss_spark.queries.llm import quality_pctl_by_source

    got = quality_pctl_by_source(spark, SF).collect()
    assert got
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append((r["quality_e6"], r["pct_e6"]))
    for src, vals in by_src.items():
        n = len(vals)
        scores = sorted(q for q, _ in vals)
        for q, pct in vals:
            below = sum(1 for s in scores if s < q)
            ties = sum(1 for s in scores if s == q)
            assert pct == (2 * below + ties) * 1000000 // (2 * n), (src, q)
            assert 0 < pct < 1000000


def test_forget_apply_audit_balances(spark):
    from pyspark.sql import functions as SF_
    from kioss_spark.operators.text import h60
    from kioss_spark.queries.llm import _docs, forget_apply_audit

    rep = forget_apply_audit(spark, SF).collect()
    assert rep
    for r in rep:
        assert r["n_before"] == r["n_after"] + r["n_deleted"]
        assert r["n_deleted"] >= 0
    expected = (
        _docs(spark, SF)
        .where(SF_.pmod(h60(SF_.col("text")), SF_.lit(100)) == 7)
        .count()
    )
    assert sum(r["n_deleted"] for r in rep) == expected


# ---------------------------------------------------------------------------
# wave 3: product quantization
# ---------------------------------------------------------------------------


def _pq_corpus(spark, n=16, dim=8):
    # n distinct vectors with distinct subspace slices
    rows = []
    for i in range(n):
        v = [float(i + 1) * (j + 1) * 0.1 for j in range(dim)]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_pq_encode_sample_roundtrips_to_zero_error(spark):
    from kioss_spark.operators.similarity import pq_encode, train_pq

    corpus = _pq_corpus(spark, n=16, dim=8)
    cb, sub = train_pq(corpus, m=2, n_codes=16)
    assert sub == 4 and len(cb) == 2 and len(cb[0]) == 16
    got = pq_encode(corpus, cb, sub).collect()
    assert len(got) == 16
    for r in got:
        # every corpus vector IS a codeword: exact reconstruction
        assert r["recon_err_e6"] == 0, r
        # and both subspaces agree on which codeword it is
        assert r["c0"] == r["c1"]


def test_pq_encode_deterministic_across_partitionings(spark):
    from kioss_spark.operators.similarity import pq_encode, train_pq

    corpus = _pq_corpus(spark, n=40, dim=8)
    cb, sub = train_pq(corpus, m=2, n_codes=16)
    a = {
        (r["vec_id"], r["c0"], r["c1"], r["recon_err_e6"])
        for r in pq_encode(corpus.repartition(1), cb, sub).collect()
    }
    b = {
        (r["vec_id"], r["c0"], r["c1"], r["recon_err_e6"])
        for r in pq_encode(corpus.repartition(13), cb, sub).collect()
    }
    assert a == b and len(a) == 40


def test_ivf_pq_adc_exact_when_residual_zero(spark):
    import math

    from kioss_spark.operators.similarity import ivf_pq_topk, train_pq, with_norm
    from pyspark.sql import functions as SF_

    corpus = _pq_corpus(spark, n=16, dim=8).withColumn(
        "nv",
        SF_.sqrt(
            SF_.aggregate(
                SF_.zip_with(SF_.col("v"), SF_.col("v"), lambda x, y: x * y),
                SF_.lit(0.0),
                lambda a2, x: a2 + x,
            )
        ),
    )
    queries = spark.createDataFrame(
        [(100, [0.35] * 8), (101, [1.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8])],
        "vec_id long, v array<double>",
    ).withColumn(
        "nv",
        SF_.sqrt(
            SF_.aggregate(
                SF_.zip_with(SF_.col("v"), SF_.col("v"), lambda x, y: x * y),
                SF_.lit(0.0),
                lambda a2, x: a2 + x,
            )
        ),
    )
    got = ivf_pq_topk(
        queries, corpus, k=3, m=2, n_codes=16, n_centroids=16, nprobe=16
    ).collect()
    vecs = {r["vec_id"]: r["v"] for r in corpus.collect()}
    qvecs = {r["vec_id"]: r["v"] for r in queries.collect()}
    assert got
    for r in got:
        qv, cv = qvecs[r["query_id"]], vecs[r["cand_id"]]
        want = 0
        for j in range(2):
            qs = qv[j * 4 : (j + 1) * 4]
            cs = cv[j * 4 : (j + 1) * 4]
            # same expression the engine (and oracle) uses: three
            # left-folded dots combined as vv - 2*dot + cc — NOT
            # sum((q-c)^2), which floors differently by 1 ulp
            vv = 0.0
            for x in qs:
                vv += x * x
            dot = 0.0
            for x, y in zip(qs, cs):
                dot += x * y
            cc = 0.0
            for x in cs:
                cc += x * x
            want += math.floor((vv - 2 * dot + cc) * 1000000)
        # corpus vectors ARE codewords (residual 0): ADC == true distance
        assert r["adc_d2_e6"] == want, (r, want)
    # with nprobe=16 every cell probed: top-1 by ADC == true nearest by L2
    for qid, qv in qvecs.items():
        best = min(
            vecs, key=lambda cid: sum((a - b) ** 2 for a, b in zip(qv, vecs[cid]))
        )
        top1 = [r["cand_id"] for r in got if r["query_id"] == qid and r["rnk"] == 1]
        assert top1 == [best]
