"""PageRank — integer-exact parity with a single-process model, plus
structural sanity (hub outranks leaves, symmetry ties)."""

from kioss_spark.operators.graph import SCALE, TELEPORT_E9, pagerank


def _model(edges, iters=3):
    sym = edges + [(b, a) for a, b in edges]
    deg = {}
    for s, _ in sym:
        deg[s] = deg.get(s, 0) + 1
    n = len(deg)
    base = TELEPORT_E9 // n
    rank = {v: SCALE // n for v in deg}
    for _ in range(iters):
        inflow = {}
        for s, d in sym:
            inflow[d] = inflow.get(d, 0) + (17 * rank[s]) // (20 * deg[s])
        rank = {v: base + inflow.get(v, 0) for v in deg}
    return deg, rank


def _run(spark, edges, iters=3):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r["id"]: (r["deg"], r["rank_e9"])
        for r in pagerank(df, iters=iters).collect()
    }


def test_pagerank_matches_python_model_star_plus_chain(spark):
    # star around 0 (hub) plus a 3-chain community
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (10, 11), (11, 12)]
    deg, rank = _model(edges)
    got = _run(spark, edges)
    assert got == {v: (deg[v], rank[v]) for v in deg}


def test_pagerank_hub_outranks_leaves_and_ties_are_exact(spark):
    edges = [(0, 1), (0, 2), (0, 3), (0, 4)]
    got = _run(spark, edges)
    hub = got[0][1]
    leaves = [got[v][1] for v in (1, 2, 3, 4)]
    assert all(hub > leaf for leaf in leaves)
    assert len(set(leaves)) == 1  # symmetric leaves rank identically


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert pagerank(df).collect() == []


# --- triangles -------------------------------------------------------------

from itertools import combinations

from kioss_spark.operators.graph import triangles


def _tri_model(edges):
    es = {tuple(sorted(e)) for e in edges}
    nodes = sorted({v for e in es for v in e})
    count = {v: 0 for v in nodes}
    for x, y, z in combinations(nodes, 3):
        if {(x, y), (x, z), (y, z)} <= es:
            count[x] += 1
            count[y] += 1
            count[z] += 1
    return count


def _tri_run(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {r["id"]: r["n_tri"] for r in triangles(df).collect()}


def test_triangles_matches_brute_force_mixed_graph(spark):
    # a K4 (4 triangles total), a lone triangle, a chain (0 triangles)
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    tri = [(10, 11), (10, 12), (11, 12)]
    chain = [(20, 21), (21, 22), (22, 23)]
    edges = k4 + tri + chain
    assert _tri_run(spark, edges) == _tri_model(edges)


def test_triangles_duplicate_edges_dropped(spark):
    # duplicated + both-orientation edges must not inflate counts
    edges = [(1, 2), (1, 2), (2, 1), (1, 3), (2, 3)]
    got = _tri_run(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangles_skewed_hub_is_bounded(spark):
    # star hub (degree 30, no triangles) + one closed pair at the rim:
    # correctness under heavy skew, hub reports 0
    star = [(0, i) for i in range(1, 31)]
    edges = star + [(1, 2)]
    got = _tri_run(spark, edges)
    model = _tri_model(edges)
    assert got == model
    assert got[0] == 1  # hub closes exactly the (1,2) rim edge


def test_triangles_with_degree_matches_and_rides_same_graph(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["id"]: (r["deg"], r["n_tri"])
        for r in triangles(df, with_degree=True).collect()
    }
    assert got == {0: (2, 1), 1: (2, 1), 2: (3, 1), 3: (1, 0)}
