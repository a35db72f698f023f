"""Graph operators over candidate-pair edge lists (PageRank).

The near-dup pipeline produces a pair graph (PPJoin / LSH edges); this
module ranks nodes within it. Use case: centrality-based survivor
selection — inside a near-dup community the most-connected document is
the canonical copy (the one every variant resembles), a more robust
survivor pick than min-id and cheaper than a quality model. The same
operator ranks any entity graph (domain links, citation edges).

The reference (`/root/reference/streamable/`) has no graph surface at
all; this family (connected components in operators/dedup.py, BFS reach
in operators/contamination.py, PageRank here) exists because corpus
curation at scale is graph-shaped.

Integer discipline: ranks are e9-scaled BIGINTs, damping 0.85 applied as
the exact rational 17/20 with integer floor division — every engine
reproduces the run bit-for-bit (float PageRank sums differ across
reduction orders). A fixed iteration count replaces the usual L1
convergence test for the same reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "triangles"]

#: e9 fixed-point scale for ranks
SCALE = 1_000_000_000
#: (1 - d) * SCALE with d = 0.85
TELEPORT_E9 = 150_000_000


def pagerank(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    iters: int = 3,
) -> DataFrame:
    """Integerized PageRank over the undirected graph of ``edges``:
    ``(id, deg, rank_e9)`` for every node that appears in an edge.

    ``rank_e9`` after each round is
    ``floor((1-d)*1e9 / N) + Σ_in floor(17*rank_u / (20*deg_u))`` —
    d = 0.85 as the rational 17/20, all arithmetic in BIGINT (products
    bounded by 17e9 * fan-in, far under int64), so the result is
    deterministic across engines and across partitionings (integer
    addition commutes; float summation does not). Isolated nodes are not
    ranked (their rank is the teleport constant by definition); restrict
    or join downstream as needed.

    Edge contract — MULTIGRAPH semantics: degrees count edge multiplicity,
    so an edge list containing both ``(a, b)`` and ``(b, a)`` for one
    undirected edge, or duplicate pairs, doubles degree and rank flow
    (parallel edges weight the walk). Feed canonical distinct pairs
    (``doc_a < doc_b``, as every producer in ``operators.dedup`` emits) —
    or apply ``.distinct()`` on the canonicalized list first — unless
    weighting by pair multiplicity is intended.

    Scale shape (mirrors dedup.connected_components): the symmetric edge
    list with per-source out-degree is persisted ONCE — its lineage is the
    candidate-pair pipeline and every round joins against it. Each round
    is one keyed join + one keyed sum + an eager localCheckpoint to stop
    round k replaying rounds 1..k-1. State per round is one row per node.
    Fixed ``iters`` rounds (no convergence probe): deterministic job
    count, and rank ordering stabilizes in a handful of rounds on the
    short-diameter communities a dedup graph contains.
    """
    from pyspark import StorageLevel

    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    withdeg = (
        sym.join(deg, "s")
        .select(F.col("s"), F.col("d"), F.col("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        # node table, N, and the initial ranks all derive from the
        # PERSISTED withdeg — the first action here materializes the
        # candidate-pair pipeline exactly once; deriving them from the
        # raw deg/sym lineage instead would re-execute that pipeline
        # once per consumer (measured 3x on pagerank_dup_graph)
        node_deg = withdeg.select("s", "deg").distinct()
        n = node_deg.count()
        if n == 0:
            return (
                edges.sparkSession.createDataFrame(
                    [], "id long, deg long, rank_e9 long"
                )
            )
        base = TELEPORT_E9 // n
        ranks = node_deg.select(
            F.col("s").alias("id"),
            F.col("deg").cast("long").alias("deg"),
            F.lit(SCALE // n).cast("long").alias("rank"),
        ).localCheckpoint(eager=True)
        # Every round is materialized with an eager localCheckpoint.
        # (Round-5 note: a materialize-every-2nd-step variant was
        # measured 49% SLOWER at the 10x synthetic corpus — the
        # un-materialized intermediate round is consumed twice by the
        # next round (rank side + degree side) and its join+agg subplan
        # re-executes where ReuseExchange does not dedupe it. The
        # eager cut also keeps the returned frame independent of
        # `withdeg`, which is unpersisted on exit.)
        # Round-15 fusion: the per-edge contributions and one zero-valued
        # self row per node are UNIONED before a single sum-agg instead of
        # groupBy + a trailing left join back to `ranks` — Σ(contribs) + 0
        # is exactly coalesce(Σ, 0), and the self row carries `deg`
        # (non-null only there, one per node, so max-ignoring-nulls
        # recovers it). One exchange per round instead of two, and one
        # fewer broadcast-build job per round at fixture scale. Integer
        # addition commutes, so the BIGINT result is bit-identical.
        for step in range(1, iters + 1):
            contrib = (
                withdeg.join(ranks.select("id", "rank"), withdeg["s"] == F.col("id"))
                .select(
                    F.col("d").alias("nid"),
                    F.lit(None).cast("long").alias("deg"),
                    F.expr("(17 * rank) div (20 * deg)").alias("c"),
                )
            )
            own = ranks.select(
                F.col("id").alias("nid"),
                F.col("deg"),
                F.lit(0).cast("long").alias("c"),
            )
            ranks = (
                contrib.unionByName(own)
                .groupBy("nid")
                .agg(F.max("deg").alias("deg"), F.sum("c").alias("inflow"))
                .select(
                    F.col("nid").alias("id"),
                    "deg",
                    (F.lit(base) + F.col("inflow")).cast("long").alias("rank"),
                )
            )
            ranks = ranks.localCheckpoint(eager=True)
    finally:
        withdeg.unpersist()
    return ranks.select("id", "deg", F.col("rank").alias("rank_e9"))


def triangles(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    with_degree: bool = False,
) -> DataFrame:
    """Per-node triangle counts over the undirected simple graph of
    ``edges``: ``(id, n_tri)`` for every node appearing in an edge
    (0 for triangle-free nodes). A triangle = three mutually-adjacent
    nodes; the count is the clique-ness diagnostic of a near-dup
    community (true duplicate clusters are triangle-dense; chains of
    borderline pairs are triangle-free, so survivor policies can treat
    them differently) and the raw material of clustering coefficients.

    Edge contract: canonical distinct pairs (``src < dst``), as every
    producer in ``operators.dedup`` emits; duplicates are dropped
    defensively.

    Scale shape — degree-ordered wedge generation (the MapReduce triangle
    scheme of Suri & Vassilvitskii 2011, WWW: "Counting triangles and the
    curse of the last reducer"): orient each edge from its lower-(deg,id)
    endpoint to its higher one, generate wedges only at each triangle's
    MINIMUM-rank corner, and close them with a semi-join back to the
    oriented edge list. Every wedge center has oriented out-degree
    O(sqrt(|E|)) regardless of raw degree — a celebrity node with a
    million neighbors generates wedges only toward its few
    higher-rank neighbors, so no reducer sees a degree² blowup. Three
    keyed joins + one keyed agg; state never exceeds the wedge set of the
    oriented (not raw) graph.
    """
    # the edge list's lineage is typically the whole candidate-pair
    # pipeline (PPJoin/LSH); it feeds four downstream consumers (degree
    # agg, orientation join, wedge closure, node table), so cut it with
    # one eager localCheckpoint — same persist-your-derivation rule as
    # pagerank/connected_components (measured 3x there)
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("dg"))
    # rank order = (deg, id): orientation that caps oriented out-degree
    ed = (
        e.join(deg.select(F.col("a").alias("x"), F.col("dg").alias("dga")),
               F.col("a") == F.col("x"))
        .drop("x")
        .join(deg.select(F.col("a").alias("x"), F.col("dg").alias("dgb")),
              F.col("b") == F.col("x"))
        .drop("x")
    )
    fwd = F.col("dga") < F.col("dgb")
    tie = (F.col("dga") == F.col("dgb")) & (F.col("a") < F.col("b"))
    oriented = ed.select(
        F.when(fwd | tie, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd | tie, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd | tie, F.col("dgb")).otherwise(F.col("dga")).alias("dgv"),
    )
    o1 = oriented.select("u", F.col("v").alias("v1"), F.col("dgv").alias("dg1"))
    o2 = oriented.select("u", F.col("v").alias("v2"), F.col("dgv").alias("dg2"))
    wedges = o1.join(o2, "u").where(
        (F.col("dg1") < F.col("dg2"))
        | ((F.col("dg1") == F.col("dg2")) & (F.col("v1") < F.col("v2")))
    )
    tri = wedges.join(
        oriented.select(F.col("u").alias("v1"), F.col("v").alias("v2")),
        ["v1", "v2"],
        "left_semi",
    ).select("u", "v1", "v2")
    corners = (
        tri.select(F.col("u").alias("id"))
        .union(tri.select(F.col("v1").alias("id")))
        .union(tri.select(F.col("v2").alias("id")))
    )
    per = corners.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    if with_degree:
        # deg is already materialized off the checkpointed edge list;
        # emitting it costs nothing extra and lets clustering-coefficient
        # consumers avoid re-deriving the (expensive) edge lineage
        nodes = deg.select(F.col("a").alias("id"), F.col("dg"))
        return nodes.join(per, "id", "left").select(
            "id",
            F.col("dg").cast("long").alias("deg"),
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
        )
    nodes = sym.select(F.col("a").alias("id")).distinct()
    return nodes.join(per, "id", "left").select(
        "id", F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri")
    )
