"""Plan-shape guards for the TPC-H wave-2 queries: each exists for its
physical shape, so pin that shape — a regression to a shuffled dim join or
a cartesian would pass the value oracle at sf0.01 while being wrong at
100 TB."""

import re

import pytest

from kioss_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name):
    # linear-scaling join sides carry no broadcast hint (module broadcast
    # policy in queries/relational.py): the broadcast decision is AQE's,
    # visible only in the FINAL adaptive plan — execute, then read.
    q = load_all()[name]
    df = q.fn(spark, SF_DIR)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    [
        "q7_volume_shipping",
        "q8_market_share",
        "q10_returned_items",
        "q14_promo_effect",
        "q17_small_quantity",
        "q19_disjunctive_pushdown",
    ],
)
def test_wave2_dims_broadcast_never_cartesian(spark, name):
    # at test SF every join side is tiny, so AQE must land on broadcast
    # joins; at 100 TB the same plan degrades to keyed shuffles, not OOM
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q15_reuses_revenue_agg_for_max(spark):
    # the scalar-max side must not trigger a second lineitem scan pattern:
    # a 1-row broadcast joins the aggregate with itself
    plan = _plan(spark, "q15_top_supplier")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q17_threshold_is_windowed_not_self_join(spark):
    # per-part avg via window over ONE keyed shuffle, not a lineitem
    # self-join: exactly one Window node partitioned by l_partkey
    plan = _plan(spark, "q17_small_quantity")
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("l_partkey" in s for s in specs), plan


def test_q19_quantity_envelope_pushed_to_scan(spark):
    # the 1..30 quantity envelope must reach the lineitem parquet scan
    plan = _plan(spark, "q19_disjunctive_pushdown")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "l_quantity" in m.group(1), plan


def test_q22_anti_join_on_preaggregated_keys(spark):
    plan = _plan(spark, "q22_dormant_customers")
    assert "LeftAnti" in plan, plan
    # orders side reduced to distinct keys before the anti join
    assert "HashAggregate" in plan


# --------------------------------------------------------------------------
# wave 3: q21 / q11 / dsir_importance plan guards
# --------------------------------------------------------------------------


def _final(plan: str) -> str:
    # AQE's toString renders "== Final Plan ==" followed by
    # "== Initial Plan ==": node COUNTS must only see the final section
    return plan.split("== Initial Plan ==")[0]


def test_q21_semi_anti_self_joins_equi_keyed(spark):
    # the EXISTS / NOT EXISTS correlates must compile to equi-keyed
    # semi/anti joins on l_orderkey — never a nested loop or cartesian
    plan = _plan(spark, "q21_sole_late_supplier")
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q11_single_scalar_cross_join_only(spark):
    # the only non-equi join is the 1-row grand-total broadcast; the
    # per-part aggregate must come from ONE lineitem aggregation pattern
    plan = _final(_plan(spark, "q11_important_parts"))
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    # the per-part aggregate exchange is REUSED for the grand total —
    # lineitem is not aggregated twice
    assert "ReusedExchange" in plan, plan
    assert "CartesianProduct" not in plan


def test_dsir_weights_broadcast_onto_token_stream(spark):
    # the 4096-row weight table must broadcast (constant size — hard
    # hint); the doc join likewise; the only BNLJ is the 1-row totals
    plan = _final(_plan(spark, "dsir_importance"))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "CartesianProduct" not in plan


def test_dsir_rank_window_is_partitioned(spark):
    import re as _re

    plan = _plan(spark, "dsir_importance")
    specs = _re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("source" in s for s in specs), plan
