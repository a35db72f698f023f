"""Round-8 operator tests: residual product quantization (true IVFPQ).

Reference parity note: the reference engine has no ANN surface; these pin
the §2.5 LLM-pipeline additions (Jégou et al. 2011 §III semantics) against
model computations and the operator's own documented invariants.
"""

import numpy as np
from pyspark.sql import functions as F

from kioss_spark.operators import similarity as S


def _clustered(spark, n=200, dim=32, k=8, noise=0.15, seed=7):
    """Deterministic clustered corpus: k centers on the unit sphere plus
    Gaussian noise — the regime residual PQ exists for (real embedding
    corpora cluster; the isotropic parquet fixture does not)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[rng.integers(0, k, n)] + noise * rng.normal(size=(n, dim))
    rows = [(int(i), [float(x) for x in pts[i]]) for i in range(n)]
    return S.with_norm(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    )


def test_train_pq_residual_zero_offset_is_degenerate(spark):
    # WHY the sample offsets past the coarse sample: each coarse Forgy
    # vector IS its own nearest centroid, so offset=0 residuals are all
    # exactly zero — a codebook that can only say "no displacement"
    nn = _clustered(spark, n=64, dim=32)
    cents = S.train_ivf(nn, n_centroids=16, iters=0)
    cb0, _ = S.train_pq_residual(nn, cents, m=4, n_codes=16, offset=0)
    assert all(x == 0.0 for book in cb0 for _, rv in book for x in rv)
    # the default (offset = n_centroids) trains on fresh vectors
    cb, _ = S.train_pq_residual(nn, cents, m=4, n_codes=16)
    assert any(x != 0.0 for book in cb for _, rv in book for x in rv)


def test_pq_encode_residual_training_sample_roundtrips_to_zero(spark):
    # every offset-sample vector's residual IS a codeword in each
    # subspace, so its reconstruction error is exactly zero
    nn = _clustered(spark, n=64, dim=32)
    cents = S.train_ivf(nn, n_centroids=16, iters=0)
    cb, sub = S.train_pq_residual(nn, cents, m=4, n_codes=16)
    sample_ids = {
        r["vec_id"]
        for r in nn.orderBy(
            F.conv(
                F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15), 16, 10
            ).cast("long"),
            F.col("vec_id"),
        )
        .limit(32)
        .collect()[16:]
    }
    enc = S.pq_encode_residual(nn, cents, cb, sub).collect()
    by_id = {r["vec_id"]: r for r in enc}
    assert all(by_id[i]["recon_err_e6"] == 0 for i in sample_ids)
    assert any(r["recon_err_e6"] > 0 for r in enc)


def test_pq_encode_residual_is_narrow(spark):
    # cell assignment + residual lookup + codes are all literal-folded:
    # no Exchange anywhere in the encode plan
    nn = _clustered(spark, n=64, dim=32)
    cents = S.train_ivf(nn, n_centroids=16, iters=0)
    cb, sub = S.train_pq_residual(nn, cents, m=4, n_codes=16)
    plan = (
        S.pq_encode_residual(nn, cents, cb, sub)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan.split("== Initial Plan ==")[0]


def test_residual_pq_lifts_recall_on_clustered_corpus(spark):
    # the headline IVFPQ claim, measured: per-cell query-residual ADC
    # tables rank candidates better than one shared raw-vector table at
    # equal bits (deterministic corpus, exact cosine truth)
    nn = _clustered(spark, n=200, dim=32, k=8)
    q = nn.where(F.col("vec_id") < 8)
    c = nn.where(F.col("vec_id") >= 8)
    truth = S.cosine_topk(q, c, k=5).select("query_id", "cand_id")

    def mean_recall(approx):
        return (
            S.recall_at_k(truth, approx.select("query_id", "cand_id"), k=5)
            .agg(F.avg("recall_e2"))
            .first()[0]
        )

    raw = mean_recall(S.ivf_pq_topk(q, c, k=5, m=4, n_codes=16))
    res = mean_recall(S.ivf_pq_residual_topk(q, c, k=5, m=4, n_codes=16))
    assert res > raw, f"residual recall {res} <= raw recall {raw}"
