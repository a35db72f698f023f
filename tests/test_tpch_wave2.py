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
