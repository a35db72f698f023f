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


def test_bm25_idf_decreases_with_df():
    # common terms must contribute less: same tf/dl, different df
    docs = {0: ["a", "b"], 1: ["a", "c"], 2: ["a", "d"], 3: ["b", "e"]}
    s = retrieval.bm25_score_py(docs, ["a"])  # df=3
    t = retrieval.bm25_score_py(docs, ["e"])  # df=1
    assert t[3] > s[0]
