"""Property-based conformance: random operator chains on the Stream facade
must equal a pure-Python model of the reference's pull-iterator semantics
(the reference's own tests assert against list/map/filter one-liners,
/root/reference/tests/test_stream.py — hypothesis generalizes that).

Each example runs real Spark jobs, so example counts are kept small; the
chains still cover order preservation, error-free composition, and the
count-order operators' two-phase implementation across partition counts.
"""

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kioss_spark.stream import Stream


def _double(x):
    return x * 2


def _odd(x):
    return x % 2 == 1


#: (facade op, python model) pairs over int streams
_OPS = {
    "map_fn": (
        lambda s: s.map(_double, returnType=T.LongType()),
        lambda xs: [x * 2 for x in xs],
    ),
    "map_col": (
        lambda s: s.map(F.col("value") + 3),
        lambda xs: [x + 3 for x in xs],
    ),
    "filter_fn": (lambda s: s.filter(_odd), lambda xs: [x for x in xs if _odd(x)]),
    "filter_col": (
        lambda s: s.filter(F.col("value") % 3 != 0),
        lambda xs: [x for x in xs if x % 3 != 0],
    ),
    "skip2": (lambda s: s.skip(2), lambda xs: xs[2:]),
    "truncate5": (lambda s: s.truncate(5), lambda xs: xs[:5]),
    "distinct": (
        lambda s: s.distinct(),
        lambda xs: list(dict.fromkeys(xs)),  # keep-FIRST, order preserved
    ),
}

_chain = st.lists(st.sampled_from(sorted(_OPS)), min_size=0, max_size=4)
_data = st.lists(st.integers(min_value=-50, max_value=50), min_size=0, max_size=25)


@settings(max_examples=12, deadline=None)
@given(xs=_data, chain=_chain)
def test_random_chain_matches_python_model(spark, xs, chain):
    s = Stream.of(spark, xs, schema=T.StructType([T.StructField("value", T.LongType())]))
    model = list(xs)
    for name in chain:
        op, pyop = _OPS[name]
        s = op(s)
        model = pyop(model)
    assert s.collect() == model


@settings(max_examples=8, deadline=None)
@given(
    xs=st.lists(st.integers(0, 99), min_size=0, max_size=40),
    k=st.integers(0, 45),
    parts=st.sampled_from([1, 3, 8]),
)
def test_skip_truncate_any_partitioning(spark, xs, k, parts):
    # the two-phase prefix-sum skip/truncate must be exact for every
    # partition layout, not just the one the optimizer happened to pick
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "seq long, value long"
    )
    s = Stream.from_df(df.repartition(parts), seq="seq").map(F.col("value"))
    assert s.skip(k).collect() == xs[k:]
    assert s.truncate(k).collect() == xs[:k]


@settings(max_examples=6, deadline=None)
@given(xs=st.lists(st.integers(0, 20), min_size=1, max_size=30), size=st.integers(1, 7))
def test_group_size_batches_model(spark, xs, size):
    got = Stream.of(spark, xs).group(size=size).collect()
    expect = [xs[i : i + size] for i in range(0, len(xs), size)]
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(
    xs=st.lists(st.integers(-50, 50), min_size=0, max_size=30),
    threshold=st.integers(-40, 40),
)
def test_validate_catch_model(spark, xs, threshold):
    # errors-as-data round trip: validate(pred) + catch(drop) == filter;
    # validate(pred) + catch(replacement=r) == conditional replacement —
    # for every error position pattern the data generates
    schema = T.StructType([T.StructField("value", T.LongType())])
    pred = F.col("value") >= threshold

    dropped = (
        Stream.of(spark, xs, schema=schema).validate(pred, ValueError).catch(ValueError)
    )
    assert dropped.collect() == [x for x in xs if x >= threshold]

    repaired = (
        Stream.of(spark, xs, schema=schema)
        .validate(pred, ValueError)
        .catch(ValueError, replacement=-999)
    )
    assert repaired.collect() == [x if x >= threshold else -999 for x in xs]


@settings(max_examples=8, deadline=None)
@given(
    xs=st.lists(st.integers(0, 99), min_size=0, max_size=20),
    ys=st.lists(st.integers(0, 99), min_size=0, max_size=20),
)
def test_zip_matches_python_zip(spark, xs, ys):
    schema = T.StructType([T.StructField("value", T.LongType())])
    a = Stream.of(spark, xs, schema=schema)
    b = Stream.of(spark, ys, schema=schema)
    got = [(r["left"], r["right"]) for r in a.zip(b).to_df().collect()]
    assert got == list(zip(xs, ys))


@settings(max_examples=8, deadline=None)
@given(
    a=st.lists(st.integers(0, 60), min_size=1, max_size=40),
    b=st.lists(st.integers(0, 60), min_size=1, max_size=40),
)
def test_theta_overlap_matches_set_algebra(spark, a, b):
    """Exact-regime theta sketches must reproduce Python set algebra for
    any input multisets (duplicates ignored, empty intersections kept)."""
    from kioss_spark.operators.sketch import theta_overlap_matrix

    rows = [("a", str(x)) for x in a] + [("b", str(x)) for x in b]
    df = spark.createDataFrame(rows, "g string, v string")
    r = theta_overlap_matrix(df, F.col("v"), by="g").collect()[0]
    sa, sb = set(a), set(b)
    assert (r["n_a"], r["n_b"]) == (len(sa), len(sb))
    assert r["n_union"] == len(sa | sb)
    assert r["n_intersect"] == len(sa & sb)
    assert r["n_diff_ab"] == len(sa - sb)
    assert r["jaccard_e6"] == len(sa & sb) * 1000000 // len(sa | sb)


@settings(max_examples=8, deadline=None)
@given(xs=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60))
def test_kll_exact_regime_is_order_statistic(spark, xs):
    """Below k, every KLL quantile equals the inclusive-rule order
    statistic ceil(q*n) of the sorted data (== DuckDB quantile_disc)."""
    import math

    from kioss_spark.operators.sketch import kll_quantiles

    df = spark.createDataFrame([("g", x) for x in xs], "g string, x long")
    r = kll_quantiles(df, F.col("x"), by=["g"], quantiles=(0.5, 0.9), k=1024).collect()[0]
    srt = sorted(xs)
    for q, col in ((0.5, "q_50"), (0.9, "q_90")):
        want = srt[max(0, math.ceil(q * len(srt)) - 1)]
        assert r[col] == want, (xs, q, r[col], want)


@settings(max_examples=8, deadline=None)
@given(
    obs=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 12), st.integers(-5, 5)),
        min_size=1, max_size=15, unique_by=lambda t: (t[0], t[1]),
    )
)
def test_gapfill_locf_matches_python_model(spark, obs):
    """Random sparse per-key series: the dense grid, zero-fill, LOCF, and
    gap flags must match a direct Python model."""
    from kioss_spark.operators.timeseries import gapfill_locf

    rows = [(f"k{k}", b * 10, 1, v) for k, b, v in obs]
    df = spark.createDataFrame(rows, "g string, bucket long, n long, x long")
    out = {
        (r["g"], r["bucket"]): (r["n"], r["x"], r["is_gap"])
        for r in gapfill_locf(
            df, keys=["g"], step=10, zero_cols=["n"], locf_cols=["x"]
        ).collect()
    }
    model = {}
    by_key = {}
    for g, b, _, x in [(f"k{k}", b * 10, 1, v) for k, b, v in obs]:
        by_key.setdefault(g, {})[b] = x
    for g, series in by_key.items():
        last = None
        for b in range(min(series), max(series) + 1, 10):
            if b in series:
                last = series[b]
                model[(g, b)] = (1, last, False)
            else:
                model[(g, b)] = (0, last, True)
    assert out == model


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.integers(0, 5), min_size=0, max_size=14),
        min_size=2, max_size=6,
    ),
    n=st.integers(2, 4),
)
def test_substring_spans_matches_python_model(spark, docs, n):
    """Random small-token corpora: flagged-window counts and span-union
    coverage must equal a direct Python model of the Lee-et-al semantics."""
    from kioss_spark.operators.dedup import substring_spans

    texts = [" ".join(f"w{t}" for t in toks) for toks in docs]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_tok"], r["dup_windows"], r["dup_cov_e6"])
        for r in substring_spans(df, n=n, min_docs=2).collect()
    }
    # model
    grams = {}  # gram -> set(doc)
    per_doc = []  # [(toks, [(pos, gram), ...])]
    for i, toks in enumerate(docs):
        g = [
            (p, tuple(toks[p : p + n]))
            for p in range(max(0, len(toks) - n + 1))
        ]
        per_doc.append((toks, g))
        for _, gram in g:
            grams.setdefault(gram, set()).add(i)
    model = {}
    for i, (toks, g) in enumerate(per_doc):
        flagged = [(p, gram) for p, gram in g if len(grams[gram]) >= 2]
        covered = set()
        for p, _ in flagged:
            covered.update(range(p, p + n))
        cov = 0 if not toks else math.floor(len(covered) / len(toks) * 1_000_000)
        model[i] = (len(toks), len(flagged), cov)
    assert out == model, (docs, n)


@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=1, max_size=12,
    ).map(lambda es: [(a, b) for a, b in es if a != b]),
    iters=st.integers(1, 3),
)
def test_pagerank_matches_python_model_random_graphs(spark, edges, iters):
    """Random multigraphs (parallel edges allowed — they weight the walk,
    matching the operator's count semantics): integer-exact parity."""
    from hypothesis import assume

    assume(edges)
    from kioss_spark.operators.graph import SCALE, TELEPORT_E9, pagerank

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["id"]: (r["deg"], r["rank_e9"])
        for r in pagerank(df, iters=iters).collect()
    }
    sym = edges + [(b, a) for a, b in edges]
    deg = {}
    for s, _ in sym:
        deg[s] = deg.get(s, 0) + 1
    nmodel = len(deg)
    base = TELEPORT_E9 // nmodel
    rank = {v: SCALE // nmodel for v in deg}
    for _ in range(iters):
        inflow = {}
        for s, d in sym:
            inflow[d] = inflow.get(d, 0) + (17 * rank[s]) // (20 * deg[s])
        rank = {v: base + inflow.get(v, 0) for v in deg}
    assert got == {v: (deg[v], rank[v]) for v in deg}, (edges, iters)


@settings(max_examples=8, deadline=None)
@given(
    items=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
        min_size=1,
        max_size=60,
    ),
    k=st.integers(min_value=2, max_value=8),
    parts=st.integers(min_value=1, max_value=6),
)
def test_heavy_hitters_matches_counter_model(spark, items, k, parts):
    # exact phi-heavy-hitter contract on arbitrary streams and
    # partitionings: exactly the items with cnt*k > N, with exact counts
    from collections import Counter

    from kioss_spark.operators.sketch import heavy_hitters

    df = spark.createDataFrame([(x,) for x in items], "item string").repartition(
        parts
    )
    got = {
        r["item"]: (r["cnt"], r["share_e6"])
        for r in heavy_hitters(df, F.col("item"), k=k).collect()
    }
    n = len(items)
    want = {
        it: (c, 1000000 * c // n)
        for it, c in Counter(items).items()
        if c * k > n
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    corpus=st.dictionaries(
        st.integers(min_value=0, max_value=15),
        st.text(alphabet="xyz", min_size=0, max_size=3),
        max_size=10,
    ),
    ops=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=19),
            st.sampled_from(["delete", "upsert"]),
            st.text(alphabet="xyz", min_size=0, max_size=3),
        ),
        max_size=12,
    ),
)
def test_apply_changeset_matches_python_merge_model(spark, corpus, ops):
    # model: group ops by id, winner = min (op, payload); delete removes,
    # upsert replaces-or-inserts, untouched ids pass through
    from kioss_spark.operators.curation import apply_changeset

    cdf = spark.createDataFrame(
        list(corpus.items()) or [], "doc_id long, payload string"
    )
    chdf = spark.createDataFrame(
        [(i, p, o) for i, o, p in ops] or [],
        "doc_id long, payload string, op string",
    )
    got = {
        r["doc_id"]: r["payload"] for r in apply_changeset(cdf, chdf).collect()
    }
    winners = {}
    for i, o, p in ops:
        cand = (o, p)
        if i not in winners or cand < winners[i]:
            winners[i] = cand
    want = dict(corpus)
    for i, (o, p) in winners.items():
        if o == "delete":
            want.pop(i, None)
        else:
            want[i] = p
    assert got == want
