"""Trained-IVF quantizer (round-3 verdict #5): deterministic training,
zero-shuffle assignment, Lloyd refinement bit-stability."""

from pyspark.sql import functions as F

from kioss_spark.operators import similarity as S


def _corpus(spark):
    rows = [
        (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    return S.with_norm(df)


def test_train_ivf_deterministic(spark):
    c = _corpus(spark)
    a = S.train_ivf(c, n_centroids=4, iters=0)
    b = S.train_ivf(c, n_centroids=4, iters=0)
    assert a == b
    assert [cid for cid, _ in a] == [0, 1, 2, 3]


def test_lloyd_refinement_bit_stable(spark):
    # integerized updates: repeated training must be bit-identical
    c = _corpus(spark)
    a = S.train_ivf(c, n_centroids=4, iters=2)
    b = S.train_ivf(c, n_centroids=4, iters=2)
    assert a == b


def test_assignment_is_narrow(spark):
    # centroid assignment folds into codegen: no exchange added on top of
    # the source's own plan
    c = _corpus(spark)
    cents = S.train_ivf(c, n_centroids=4, iters=0)
    assigned = c.withColumn("cell", S.trained_cells(F.col("v"), cents))
    plan = assigned._jdf.queryExecution().sparkPlan().toString()
    assert "Exchange" not in plan
    cells = {r["cell"] for r in assigned.select("cell").collect()}
    assert cells <= {0, 1, 2, 3}


def test_nprobe_returns_nearest_cells(spark):
    c = _corpus(spark)
    cents = S.train_ivf(c, n_centroids=4, iters=0)
    probes = c.select(
        "vec_id", S.trained_cells(F.col("v"), cents, nprobe=2).alias("cells")
    ).collect()
    single = dict(
        c.select(
            "vec_id", S.trained_cells(F.col("v"), cents, nprobe=1).alias("cell")
        ).collect()
    )
    for r in probes:
        assert len(r["cells"]) == 2
        assert r["cells"][0] == single[r["vec_id"]]  # first probe = argmin
        assert len(set(r["cells"])) == 2


def test_trained_topk_scores_match_brute_on_probed_cells(spark):
    c = _corpus(spark)
    q = c.where(F.col("vec_id") < 3)
    corp = c.where(F.col("vec_id") >= 3)
    out = S.ivf_topk_trained(q, corp, k=3, n_centroids=4, iters=0, nprobe=4)
    # nprobe = n_centroids probes EVERY cell -> equals brute force
    brute = S.cosine_topk(q, corp, k=3, partial=False)
    got = {(r["query_id"], r["cand_id"], r["score_e5"]) for r in out.collect()}
    want = {(r["query_id"], r["cand_id"], r["score_e5"]) for r in brute.collect()}
    assert got == want


def test_semantic_dup_pairs_within_cell_only(spark):
    c = _corpus(spark)
    cents = S.train_ivf(c, n_centroids=4, iters=0)
    cell_of = dict(
        c.select(
            "vec_id", S.trained_cells(F.col("v"), cents, nprobe=1).alias("cell")
        ).collect()
    )
    out = S.semantic_dup_pairs(c, threshold=-1.0, n_centroids=4).collect()
    assert out  # threshold -1 keeps every within-cell pair
    for r in out:
        assert r["id_a"] < r["id_b"]
        assert cell_of[r["id_a"]] == cell_of[r["id_b"]] == r["cell"]
    # threshold filters monotonically
    tight = S.semantic_dup_pairs(c, threshold=0.99, n_centroids=4).collect()
    assert len(tight) <= len(out)
    assert all(r["cosine_e5"] >= 99000 for r in tight)


def test_quantize_int8_roundtrip_error_bounded(spark):
    c = _corpus(spark)
    out = S.quantize_int8(c).collect()
    vecs = {r["vec_id"]: r["v"] for r in c.collect()}
    for r in out:
        v = vecs[r["vec_id"]]
        assert all(-127 <= x <= 127 for x in r["q"])
        if r["scale"] == 0:
            assert all(x == 0 for x in r["q"])
            continue
        # dequantized reconstruction error <= half a quantization step
        step = r["scale"] / 127
        for orig, code in zip(v, r["q"]):
            assert abs(orig - code * step) <= step / 2 + 1e-12


def test_semantic_dup_pairs_arrow_scorer_agrees_with_exact(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    emb = rng.standard_normal((60, 8)).astype(float)
    emb[11] = emb[3] + 0.001  # a near-identical pair
    pdf = pd.DataFrame({"vec_id": np.arange(60, dtype="int64"), "embedding": list(emb)})
    nn = S.with_norm(spark.createDataFrame(pdf))
    exact = {
        (r["id_a"], r["id_b"]): r["cosine_e5"]
        for r in S.semantic_dup_pairs(nn, 0.4, n_centroids=4, scorer="exact").collect()
    }
    arrow = {
        (r["id_a"], r["id_b"]): r["cosine_e5"]
        for r in S.semantic_dup_pairs(nn, 0.4, n_centroids=4, scorer="arrow").collect()
    }
    assert exact and (3, 11) in exact
    # membership may legitimately differ ONLY for scores exactly at the
    # threshold boundary (last-ulp fold-order divergence); none here
    assert set(exact) == set(arrow)
    assert all(abs(exact[k] - arrow[k]) <= 1 for k in exact)


def test_dup_pair_default_scorer_is_arrow(spark):
    """Round-4 verdict wrong #3: a user calling the dup-pair operators
    must get the SCALE path (per-cell Arrow matmul) by default, not the
    quadratic-within-cell JVM fold; scorer="exact" remains opt-in for
    oracle bit-parity. Asserted on the physical plan: the arrow path
    plans FlatMapGroupsInPandas, the exact path a cell self-join."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    emb = rng.standard_normal((20, 8)).astype(float)
    pdf = pd.DataFrame({"vec_id": np.arange(20, dtype="int64"), "embedding": list(emb)})
    nn = S.with_norm(spark.createDataFrame(pdf))
    for op, kwargs in (
        (S.embedding_dup_pairs, {"n_bits": 4}),
        (S.semantic_dup_pairs, {"n_centroids": 4}),
    ):
        default_plan = op(nn, 0.4, **kwargs)._jdf.queryExecution().toString()
        assert "FlatMapGroupsInPandas" in default_plan, op.__name__
        exact_plan = op(nn, 0.4, scorer="exact", **kwargs)._jdf.queryExecution().toString()
        assert "FlatMapGroupsInPandas" not in exact_plan, op.__name__


def test_semantic_dup_pairs_multiprobe_superset(spark):
    """nprobe=2 must find every nprobe=1 pair (each vector's nearest cell
    is among its 2 probed cells) plus boundary-straddling extras, with no
    duplicates and every score still >= the threshold."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(5)
    emb = rng.standard_normal((80, 8)).astype(float)
    pdf = pd.DataFrame({"vec_id": np.arange(80, dtype="int64"), "embedding": list(emb)})
    nn = S.with_norm(spark.createDataFrame(pdf))
    p1 = {(r["id_a"], r["id_b"]) for r in
          S.semantic_dup_pairs(nn, 0.3, n_centroids=8, nprobe=1).collect()}
    rows2 = S.semantic_dup_pairs(nn, 0.3, n_centroids=8, nprobe=2).collect()
    p2 = {(r["id_a"], r["id_b"]) for r in rows2}
    assert p1 <= p2
    assert len(rows2) == len(p2), "multi-probe must not emit duplicate pairs"
    assert all(r["cosine_e5"] >= 30000 for r in rows2)


def test_trained_cell_with_dist_matches_cells_and_model(spark):
    # struct.cid == trained_cells argmin; struct.d == integerized d2 to
    # that centroid, recomputed in Python with the same fold order
    nn = _corpus(spark).withColumn(
        "__vv__", S._dot(F.col("v"), F.col("v"))
    )
    cents = S.train_ivf(nn, n_centroids=4, iters=0)
    got = (
        nn.withColumn("cell", S.trained_cells("v", cents, vv=F.col("__vv__")))
        .withColumn("s", S.trained_cell_with_dist("v", cents, vv="__vv__"))
        .select("vec_id", "v", "cell", F.col("s.cid").alias("cid"),
                F.col("s.d").alias("d"))
        .collect()
    )
    import math

    cmap = dict(cents)
    for r in got:
        assert r["cid"] == r["cell"]
        best = min(
            (
                (
                    math.floor(
                        (
                            S._dot_py(r["v"], r["v"])
                            - 2 * S._dot_py(r["v"], cmap[cid])
                            + S._dot_py(cmap[cid], cmap[cid])
                        )
                        * 1000000
                    ),
                    cid,
                )
                for cid in cmap
            ),
        )
        assert (r["d"], r["cid"]) == best


def test_embed_covariance_matches_numpy_model(spark):
    # exact integer sums + one IEEE division: must equal a single-process
    # numpy model bit-for-bit, including across a repartitioned input
    import math

    import numpy as np

    rows = [
        (i, [((i * 13 + j * 5) % 17 - 8) / 7.0 for j in range(6)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(7)
    got = {
        (r["i"], r["j"]): (r["n"], r["sxy"], r["sxi"], r["sxj"], r["cov_e6"])
        for r in S.embed_covariance(df, scale=1000).collect()
    }
    X = np.floor(np.array([v for _, v in rows], dtype=np.float64) * 1000).astype(
        np.int64
    )
    n = X.shape[0]
    sx = X.sum(axis=0)
    sxy = X.T @ X
    want = {}
    for i in range(6):
        for j in range(i, 6):
            cov = math.floor(
                (1.0 * n * sxy[i, j] - 1.0 * sx[i] * sx[j]) / (1.0 * n * n)
            )
            want[(i, j)] = (n, int(sxy[i, j]), int(sx[i]), int(sx[j]), cov)
    assert got == want
    # diagonal is a variance: non-negative
    assert all(v[4] >= 0 for k, v in got.items() if k[0] == k[1])
