"""Query registry — the driver-facing catalog behind ``__spark_entry__``.

Each entry pairs a Spark builder ``(spark, sf_dir) -> DataFrame`` with an
equivalent DuckDB oracle SQL (or None for genuinely non-SQL-expressible ops,
which the driver checks rows-only). Column names and types are aligned on
both sides because the driver hashes values after sorting columns by name.

Float discipline: Spark and DuckDB sum doubles in different orders, so raw
double aggregates differ in the last ulp; every float aggregate is rounded
(2-4 decimals) on BOTH sides before comparison.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL, None => rows-only check


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: Optional[str]):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(name, fn, oracle)
        return fn

    return deco


# Queries with a green driver CORRECTNESS_r03 row (first-50 snapshot).  The
# driver only samples the first 50 ``load_all()`` entries per round, so we
# rotate: anything WITHOUT a hard driver verdict yet (the r3 tail plus any
# newly added query) is ordered first; the already-verified set follows.
# ROUND-5 TODO: merge the CORRECTNESS_r04 names into these sets. The 50
# never-driver-checked queries exactly fill round 4's snapshot window;
# with r2+r3+r4 combined, 104 of the 111 registered queries will then
# have a hard driver verdict, and the 7 _LOCAL_EVIDENCE_R4 names (added
# after the window filled; local parity evidence for all 111 in
# CHECK_LOCAL_r04.txt) move to the front of round 5's window. Do NOT
# register new queries without checking the window arithmetic again.
_DRIVER_VERIFIED = frozenset(
    {
        "q1_pricing_summary", "rollup_order_counts", "pivot_status_revenue",
        "agg_distinct_stats", "q3_shipping_priority", "q5_nation_revenue",
        "semi_parts_ordered", "anti_customers_no_pending", "asof_last_signup",
        "asof_last_purchase", "zip_customers_suppliers",
        "top3_customers_per_segment", "running_total_per_customer",
        "sessionize_events", "op_map_revenue", "op_filter_highvalue",
        "op_flatten_tokens", "op_groupby_key", "op_group_batches",
        "op_distinct_first", "op_skip_truncate", "op_concat_streams",
        "op_catch_replacement", "op_catch_pyfn", "op_amap_enrich",
        "op_foreach_passthrough", "op_observe_metrics", "q4_order_priority",
        "q6_forecast_revenue", "q13_customer_distribution", "q18_large_orders",
        "set_ops_half_year", "range_join_error_windows", "rollup_hourly_events",
        "q7_volume_shipping", "q8_market_share", "q10_returned_items",
        "q14_promo_effect", "q15_top_supplier", "q17_small_quantity",
        "q19_disjunctive_pushdown", "q22_dormant_customers",
        "q21_sole_late_supplier", "q11_important_parts",
        "skew_salted_event_totals", "sql_balance_quartiles",
        "funnel_click_purchase", "dedup_exact", "dedup_jaccard_pairs",
        "dedup_containment_pairs",
    }
)


#: queries whose only hard driver verdict is from round 2 (VERDICT.md r3
#: "4 had one in r2") — ordered AFTER the never-driver-checked set so the
#: 50-entry driver snapshot prioritizes queries with no verdict in any round
_DRIVER_VERIFIED_R2 = frozenset(
    {"dedup_minhash_lsh", "dedup_simhash", "dedup_cluster_keep", "ann_cosine_topk"}
)


#: registered AFTER round 4's driver snapshot window filled (the 50
#: never-driver-checked names exactly occupy it) — ordered right after that
#: tier so they are next in line for a driver verdict in round 5; their
#: round-4 evidence is the committed local hostile-tz parity sweep
#: (CHECK_LOCAL_r04.txt).
_LOCAL_EVIDENCE_R4 = frozenset(
    {
        "dedup_substring_spans",
        "contamination_reach",
        "split_leakage_pairs",
        "pagerank_dup_graph",
        "dedup_incremental_pairs",
        "winsorize_event_values",
        "corpus_snapshot_diff",
    }
)


def load_all() -> dict[str, QueryDef]:
    """Import every query module (side effect: fills REGISTRY).

    Returns the registry reordered: never-driver-checked queries first,
    then round-2-verified, then round-3-verified (the driver's correctness
    snapshot samples the first 50 entries).
    """
    from kioss_spark.queries import relational  # noqa: F401

    try:
        from kioss_spark.queries import llm  # noqa: F401
    except ImportError:  # pragma: no cover - built incrementally
        pass
    never = {
        k: v
        for k, v in REGISTRY.items()
        if k not in _DRIVER_VERIFIED
        and k not in _DRIVER_VERIFIED_R2
        and k not in _LOCAL_EVIDENCE_R4
    }
    r4new = {k: v for k, v in REGISTRY.items() if k in _LOCAL_EVIDENCE_R4}
    r2 = {k: v for k, v in REGISTRY.items() if k in _DRIVER_VERIFIED_R2}
    r3 = {k: v for k, v in REGISTRY.items() if k in _DRIVER_VERIFIED}
    return {**never, **r4new, **r2, **r3}
