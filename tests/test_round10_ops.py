"""Round-10 operator tests: BM25 sparse retrieval, perceptual average-hash,
WordPiece segmentation, sized writes.

Reference parity note: the reference engine has none of these surfaces;
they pin §2.5 LLM-pipeline additions against trivial single-process
implementations under the same integer semantics.
"""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from kioss_spark.operators import retrieval
from kioss_spark.queries import load_all

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def _py_corpus(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    return {
        int(r["doc_id"]): [w for w in (r["text"] or "").split(" ") if w]
        for r in rows
    }


def _py_queries(docs):
    """The fixture-derived query set under the same (df desc, term) rank."""
    dfs: Counter = Counter()
    for ws in docs.values():
        dfs.update(set(ws))
    ranked = sorted(dfs, key=lambda t: (-dfs[t], t))[:24]
    qs: dict[int, list[str]] = {}
    for i, t in enumerate(ranked):
        qs.setdefault(i % 8, []).append(t)
    return qs


def test_bm25_topk_matches_python_scorer(spark):
    out = load_all()["bm25_topk"].fn(spark, SF).collect()
    docs = _py_corpus(spark, SF)
    queries = _py_queries(docs)
    for qid, qterms in queries.items():
        scores = retrieval.bm25_score_py(docs, qterms)
        expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        got = [
            (int(r["doc_id"]), int(r["score_e6"]))
            for r in sorted(
                (r for r in out if r["query_id"] == qid),
                key=lambda r: r["rnk"],
            )
        ]
        assert got == expect, f"query {qid}"


def test_bm25_operator_fuzz_small_corpus(spark):
    rng = random.Random(10)
    vocab = ["red", "blue", "green", "ox", "owl", "fig", "yam", "elk"]
    docs = {
        d: [rng.choice(vocab) for _ in range(rng.randint(1, 12))]
        for d in range(40)
    }
    inv = spark.createDataFrame(
        [(d, t) for d, ws in docs.items() for t in ws], "doc_id long, term string"
    )
    tfdl, df, g = retrieval.bm25_stats(inv)
    qdf = spark.createDataFrame(
        [(0, "red"), (0, "ox"), (1, "yam")], "query_id long, term string"
    )
    out = retrieval.bm25_score_topk(tfdl, df, g, qdf, k=40).collect()
    for qid, qterms in [(0, ["red", "ox"]), (1, ["yam"])]:
        scores = retrieval.bm25_score_py(docs, qterms)
        expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        got = [
            (int(r["doc_id"]), int(r["score_e6"]))
            for r in sorted(
                (r for r in out if r["query_id"] == qid),
                key=lambda r: r["rnk"],
            )
        ]
        assert got == expect


# ---------------------------------------------------------------------------
# perceptual average-hash
# ---------------------------------------------------------------------------


def test_average_hash_column_matches_python_fuzz(spark):
    from kioss_spark.operators.multimodal import (
        average_hash_py,
        with_average_hash,
    )

    rng = random.Random(10)
    strs = [""]
    for _ in range(120):
        n = rng.choice([1, 2, 3, 5, 47, 48, 63, 64, 65, 100, 200])
        strs.append(
            "".join(chr(rng.randint(32, 126)) for _ in range(n))
        )
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strs)], "doc_id long, frame string"
    )
    got = {
        r["doc_id"]: r["phash"]
        for r in with_average_hash(df).collect()
    }
    neg = 0
    for i, s in enumerate(strs):
        expect = average_hash_py([ord(c) for c in s])
        assert got[i] == expect, f"case {i!r}: {s!r}"
        neg += expect < 0
    assert neg > 0, "fuzz never exercised the bit-63 two's-complement path"


def test_phash_near_dup_equals_bruteforce(spark):
    from kioss_spark.operators.multimodal import phash_near_dup

    rng = random.Random(11)
    base = [rng.getrandbits(64) - (1 << 63) for _ in range(30)]
    rows = []
    for d, h in enumerate(base):
        rows.append((d, 0, h))
        flip = h
        for b in rng.sample(range(64), rng.randint(0, 4)):
            flip ^= 1 << b
            if flip >= 1 << 63:
                flip -= 1 << 64
            if flip < -(1 << 63):
                flip += 1 << 64
        rows.append((d, 1, flip))
    df = spark.createDataFrame(rows, "doc_id long, frame_idx long, phash long")
    got = {
        (r["doc_a"], r["frame_a"], r["doc_b"], r["frame_b"], r["hamming"])
        for r in phash_near_dup(df, max_hamming=3, bands=4).collect()
    }
    expect = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (da, fa, ha), (db, fb, hb) = rows[i], rows[j]
            if (da, fa) > (db, fb):
                (da, fa, ha), (db, fb, hb) = rows[j], rows[i]
            hd = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
            if hd <= 3:
                expect.add((da, fa, db, fb, hd))
    assert got == expect and expect, "banding must equal brute force"


def test_phash_near_dup_rejects_bad_banding(spark):
    from kioss_spark.operators.multimodal import phash_near_dup

    df = spark.createDataFrame([], "doc_id long, frame_idx long, phash long")
    with pytest.raises(ValueError):
        phash_near_dup(df, max_hamming=4, bands=4)
    with pytest.raises(ValueError):
        phash_near_dup(df, bands=5)


# ---------------------------------------------------------------------------
# WordPiece
# ---------------------------------------------------------------------------


def _wp_fuzz_words(n=200, seed=12):
    from kioss_spark.queries.llm import _UNIGRAM_LMAX

    rng = random.Random(seed)
    alpha = "abcdefghijklmnopqrstuvwy"
    hostile = alpha + "zx'"
    words = []
    for _ in range(n):
        pool = alpha if rng.random() < 0.7 else hostile
        ln = rng.randint(1, _UNIGRAM_LMAX + 2)  # past-lmax fallback too
        words.append("".join(rng.choice(pool) for _ in range(ln)))
    words += ["customer", "window", "column", "qu", "a", "z",
              "w" * _UNIGRAM_LMAX, "w" * (_UNIGRAM_LMAX + 1)]
    return sorted(set(words))


def test_wordpiece_spark_fold_matches_greedy_reference(spark):
    from kioss_spark.operators import wordpiece as W
    from kioss_spark.queries.llm import (
        _UNIGRAM_LMAX,
        _WORDPIECE_CONTS,
        _WORDPIECE_HEADS,
        _WORDPIECE_PMAX,
    )

    words = _wp_fuzz_words()
    df = spark.createDataFrame([(w,) for w in words], "w string")
    pexpr = W.wordpiece_packed_expr(
        _WORDPIECE_HEADS, _WORDPIECE_CONTS, col="w",
        max_piece_len=_WORDPIECE_PMAX, lmax=_UNIGRAM_LMAX,
    )
    out = {
        r["w"]: (r["k"], r["unk"])
        for r in df.select(
            "w",
            F.expr(pexpr).alias("p"),
        )
        .select(
            "w",
            F.expr(W.spark_extract_k("w", "p", _UNIGRAM_LMAX)).alias("k"),
            F.expr(W.spark_extract_unk("w", "p", _UNIGRAM_LMAX)).alias("unk"),
        )
        .collect()
    }
    unks = 0
    for w in words:
        if len(w) > _UNIGRAM_LMAX:
            expect = (len(w), 0)  # the pinned char-fallback contract
        else:
            k, fail = W.greedy_segment(
                w, _WORDPIECE_HEADS, _WORDPIECE_CONTS, _WORDPIECE_PMAX
            )
            expect = (k, fail)
        assert out[w] == expect, f"{w!r}: {out[w]} != {expect}"
        unks += expect[1]
    assert unks > 0, "fuzz never exercised the [UNK] path"


def test_wordpiece_duck_unroll_matches_greedy_reference():
    import duckdb

    from kioss_spark.operators import wordpiece as W
    from kioss_spark.queries.llm import (
        _UNIGRAM_LMAX,
        _WORDPIECE_CONTS,
        _WORDPIECE_HEADS,
        _WORDPIECE_PMAX,
    )

    words = _wp_fuzz_words(seed=13)
    con = duckdb.connect()
    con.execute("CREATE TABLE wc (w VARCHAR)")
    con.executemany("INSERT INTO wc VALUES (?)", [(w,) for w in words])
    dp = W.duck_wp_subquery(
        _WORDPIECE_HEADS, _WORDPIECE_CONTS, _UNIGRAM_LMAX,
        source_sql="(SELECT DISTINCT w FROM wc)",
        max_piece_len=_WORDPIECE_PMAX,
    )
    k = W.duck_extract_k("w", "p", _UNIGRAM_LMAX)
    u = W.duck_extract_unk("w", "p", _UNIGRAM_LMAX)
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"SELECT w, {k}, {u} FROM {dp} dp"
        ).fetchall()
    }
    for w in words:
        if len(w) > _UNIGRAM_LMAX:
            expect = (len(w), 0)
        else:
            expect = W.greedy_segment(
                w, _WORDPIECE_HEADS, _WORDPIECE_CONTS, _WORDPIECE_PMAX
            )
        assert got[w] == expect, f"{w!r}: {got[w]} != {expect}"


def test_wordpiece_training_is_deterministic_and_longest_match(spark):
    from kioss_spark.operators import wordpiece as W

    docs = spark.createDataFrame(
        [(i, "abab abab abc cab" if i % 2 else "abab cabc abc") for i in range(6)],
        "doc_id long, text string",
    )
    m1 = W.train_wordpiece(docs, n_merges=6)
    m2 = W.train_wordpiece(docs, n_merges=6)
    assert m1 == m2
    heads, conts = m1
    # coverage floor: every observed char in both positions
    for c in "abc":
        assert c in heads and c in conts
    # greedy longest-match prefers the longest head piece available
    k_long, _ = W.greedy_segment("abab", heads, conts)
    assert k_long <= 3  # some merge must have reduced 4 chars


# ---------------------------------------------------------------------------
# hybrid RRF fusion
# ---------------------------------------------------------------------------


def test_hybrid_rrf_matches_python_fusion(spark):
    """Fuse the two lanes in plain Python (left-fold dot products match
    the engines to the ulp; BM25 via bm25_score_py) and compare the full
    fused table."""
    import math

    out = load_all()["hybrid_rrf_topk"].fn(spark, SF).collect()

    emb = {
        int(r["vec_id"]): list(r["embedding"])
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    docs = _py_corpus(spark, SF)

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    norms = {i: math.sqrt(dot(v, v)) for i, v in emb.items()}
    dense_rnk: dict[tuple[int, int], int] = {}
    sparse_rnk: dict[tuple[int, int], int] = {}
    corpus_docs = {d: ws for d, ws in docs.items() if d >= 8}
    for qid in range(8):
        ds = [
            (
                math.floor(
                    dot(emb[qid], emb[c]) / (norms[qid] * norms[c]) * 100000
                ),
                c,
            )
            for c in emb
            if c >= 8
        ]
        for rnk, (_, c) in enumerate(
            sorted(ds, key=lambda t: (-t[0], t[1]))[:20], 1
        ):
            dense_rnk[(qid, c)] = rnk
        scores = retrieval.bm25_score_py(
            corpus_docs, sorted(set(docs[qid]))
        )
        for rnk, (c, _) in enumerate(
            sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20], 1
        ):
            sparse_rnk[(qid, c)] = rnk
    expect = {}
    for qid in range(8):
        cands = {
            c for (q, c) in list(dense_rnk) + list(sparse_rnk) if q == qid
        }
        fused = []
        for c in cands:
            rd = dense_rnk.get((qid, c), 0)
            rs = sparse_rnk.get((qid, c), 0)
            rrf = (1_000_000 // (60 + rd) if rd else 0) + (
                1_000_000 // (60 + rs) if rs else 0
            )
            fused.append((rrf, c, rd, rs))
        top = sorted(fused, key=lambda t: (-t[0], t[1]))[:10]
        for rnk, (rrf, c, rd, rs) in enumerate(top, 1):
            expect[(qid, rnk)] = (c, rrf, rd, rs)
    got = {
        (r["query_id"], r["rnk"]): (
            r["cand_id"],
            r["rrf_e6"],
            r["rnk_dense"],
            r["rnk_sparse"],
        )
        for r in out
    }
    assert got == expect


# ---------------------------------------------------------------------------
# sized writes + layout audit
# ---------------------------------------------------------------------------


def test_write_parquet_max_records_per_file(spark, tmp_path):
    from kioss_spark.operators.skew import file_layout_audit
    from kioss_spark.stream import Stream

    base = str(tmp_path / "mrpf")
    Stream.range(spark, 100).map(value=F.col("value")).write_parquet(
        base, max_records_per_file=10
    )
    row = file_layout_audit(spark, base).collect()[0]
    assert row["n_rows"] == 100
    assert row["rows_max"] <= 10, "maxRecordsPerFile cap violated"
    assert row["n_files"] >= 10


def test_write_parquet_target_mb_splits_and_coalesces(spark, tmp_path):
    from kioss_spark.operators.skew import file_layout_audit
    from kioss_spark.stream import Stream

    s = Stream.range(spark, 20_000).map(
        value=F.col("value"), pad=F.expr("repeat('x', 100)")
    )
    many = str(tmp_path / "many")
    s.write_parquet(many, target_mb=0.25, compression_ratio=1.0)
    row = file_layout_audit(spark, many).collect()[0]
    assert row["n_rows"] == 20_000
    assert row["n_files"] > 1, "small target must split the write"
    # round-robin repartition: file sizes near-even (max <= 2x avg)
    assert row["rows_skew_e4"] <= 20_000

    one = str(tmp_path / "one")
    s.write_parquet(one, target_mb=10_000)
    row1 = file_layout_audit(spark, one).collect()[0]
    assert row1["n_files"] == 1, "huge target must coalesce to one file"
    assert row1["bytes_total"] > 0 and row1["bytes_skew_e4"] == 10_000


def test_write_parquet_target_mb_validates(spark, tmp_path):
    from kioss_spark.stream import Stream

    with pytest.raises(ValueError, match="target_mb"):
        Stream.range(spark, 5).write_parquet(
            str(tmp_path / "bad"), target_mb=0
        )


def test_compact_parquet_collapses_small_files(spark, tmp_path):
    from kioss_spark.operators.skew import compact_parquet, file_layout_audit

    src = str(tmp_path / "fragmented")
    # 20 tiny files (the small-files pathology)
    spark.range(2000, numPartitions=1).selectExpr(
        "id", "repeat('x', 50) AS pad"
    ).repartition(20).write.parquet(src)
    assert file_layout_audit(spark, src).collect()[0]["n_files"] == 20

    dst = str(tmp_path / "compacted")
    row = compact_parquet(spark, src, dst, target_mb=64.0).collect()[0]
    assert row["n_files"] == 1  # tiny table, generous target
    assert row["n_rows"] == 2000
    back = spark.read.parquet(dst)
    assert back.count() == 2000
    assert back.selectExpr("sum(id)").collect()[0][0] == sum(range(2000))

    with pytest.raises(ValueError, match="target_mb"):
        compact_parquet(spark, src, str(tmp_path / "bad"), target_mb=-1)


def test_layout_audit_matches_known_layout(spark, tmp_path):
    from kioss_spark.operators.skew import file_layout_audit

    base = str(tmp_path / "known")
    # single input partition -> round-robin deals exactly 30/30/30
    spark.range(90, numPartitions=1).repartition(3).write.parquet(base)
    row = file_layout_audit(spark, base).collect()[0]
    assert row["n_files"] == 3
    assert row["n_rows"] == 90
    assert row["rows_min"] == row["rows_max"] == 30  # round-robin even
    assert row["rows_skew_e4"] == 10_000


def test_bm25_merge_stats_equals_direct(spark):
    """Additive-merge law: stats merged from two disjoint batches must
    equal stats computed from the union — through df, dl, and globals."""
    rng = random.Random(14)
    vocab = ["red", "blue", "ox", "owl", "fig"]
    rows = [
        (d, rng.choice(vocab))
        for d in range(30)
        for _ in range(rng.randint(1, 6))
    ]
    inv = spark.createDataFrame(rows, "doc_id long, term string")
    a = inv.where(F.col("doc_id") % 3 == 0)
    b = inv.where(F.col("doc_id") % 3 != 0)
    m_tfdl, m_df, m_g = retrieval.bm25_merge_stats(
        *retrieval.bm25_stats(a), *retrieval.bm25_stats(b)
    )
    d_tfdl, d_df, d_g = retrieval.bm25_stats(inv)
    assert sorted(map(tuple, m_tfdl.collect())) == sorted(
        map(tuple, d_tfdl.collect())
    )
    assert {tuple(r) for r in m_df.collect()} == {
        tuple(r) for r in d_df.collect()
    }
    assert m_g.collect() == d_g.collect()


def test_bm25_idf_decreases_with_df():
    # common terms must contribute less: same tf/dl, different df
    docs = {0: ["a", "b"], 1: ["a", "c"], 2: ["a", "d"], 3: ["b", "e"]}
    s = retrieval.bm25_score_py(docs, ["a"])  # df=3
    t = retrieval.bm25_score_py(docs, ["e"])  # df=1
    assert t[3] > s[0]


def test_bm25_store_index_parity_and_hygiene(spark):
    """bm25_store_index (round-15: one corpus pass + overlapped writes)
    must persist tables ROW-IDENTICAL to bm25_stats' three outputs —
    df/g are re-derived from the persisted postings relation, so this
    pins the re-derivation algebra — and must leave zero cached blocks
    behind (the persist is call-scoped)."""
    import random

    from kioss_spark.operators import retrieval

    rng = random.Random(15)
    vocab = ["red", "blue", "ox", "owl", "fig", "elm"]
    rows = [
        (d, rng.choice(vocab))
        for d in range(40)
        for _ in range(rng.randint(1, 5))
    ]
    inv = spark.createDataFrame(rows, "doc_id long, term string")
    # delta-based hygiene check: the SESSION may legitimately hold other
    # blocks here (retrieval_quality's latest-call-wins checkpoints
    # survive until its next call by design — see test_cache_hygiene);
    # this test only owns what the bootstrap itself creates
    before = set(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    retrieval.bm25_store_index(
        inv, "t15_tfdl", "t15_df", "t15_g", n_buckets=4
    )
    e_tfdl, e_df, e_g = retrieval.bm25_stats(inv)
    assert sorted(map(tuple, spark.table("t15_tfdl").collect())) == sorted(
        map(tuple, e_tfdl.collect())
    )
    assert sorted(map(tuple, spark.table("t15_df").collect())) == sorted(
        map(tuple, e_df.collect())
    )
    assert spark.table("t15_g").collect() == e_g.collect()
    # call-scoped persist: no NEW blocks outlive the bootstrap
    after = set(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    assert not (after - before)
    for t in ("t15_tfdl", "t15_df", "t15_g"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
