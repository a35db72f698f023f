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


# Queries with a green driver CORRECTNESS row in some past round (the driver
# only samples the first 50 ``load_all()`` entries per round, so we rotate:
# anything WITHOUT a hard driver verdict yet is ordered first; the
# already-verified set follows).  Round-5 state: r2+r3+r4 combined give 103
# green hard verdicts; the 7 _R5_PRIORITY local-evidence names plus the fixed
# ``embed_quantize_int8`` (round 4's only red row — array<int> output the
# driver canonicalizer could not sort, now emitted as CSV string) lead round
# 5's window, followed by any query registered this round.  End-of-round-5
# count: 143 registered, 40 without a hard verdict — the unverified tier
# fills 40 of the 50 window slots, so the window covers every unverified
# query plus 10 re-checks.  The window is near capacity: round 6 must merge
# CORRECTNESS_r05's green names into _DRIVER_VERIFIED (and dissolve
# _R5_PRIORITY) BEFORE registering anything new.
_DRIVER_VERIFIED = frozenset(
    {
        # --- green in CORRECTNESS_r04 ---
        "salted_join_event_weights", "bucketed_user_event_totals",
        "gapfill_hourly_locf", "q9_profit_adapted", "q12_shipclass_adapted",
        "q16_supplier_variety_adapted", "q20_dominant_supplier_adapted",
        "q2_best_supplier_adapted", "fuzzy_part_names", "rolling_7d_user_value",
        "cube_status_segment", "json_props_stats", "dedup_cluster_best",
        "ann_ivf_topk", "ann_ivf_multiprobe", "ann_ivf_trained",
        "dedup_embedding", "text_quality", "lang_id", "token_counts",
        "doc_fingerprint", "quality_repetition", "dsir_importance",
        "mm_image_meta", "mm_frame_sample", "mm_audio_chunks",
        "pipeline_curation", "sample_deterministic", "split_train_val_test",
        "pack_sequences", "budget_cap_per_source", "decontaminate_eval",
        "pii_redact", "sample_stratified", "shuffle_shards", "vocab_top_terms",
        "tfidf_keywords", "profile_corpus", "boilerplate_ngrams",
        "sketch_distinct_tokens", "chunk_text_windows", "mix_weighted_order",
        "sketch_theta_source_overlap", "sketch_hll_lang_rollup",
        "sketch_kll_doclen", "dedup_semantic", "quality_unigram_icf",
        "ann_int8_rescore", "profile_dup_rate",
        # --- green in CORRECTNESS_r03 ---
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


#: round-5 window leaders: the 7 queries registered after round 4's snapshot
#: window filled (round-4 evidence = committed local hostile-tz parity sweep,
#: CHECK_LOCAL_r04.txt) plus ``embed_quantize_int8``, round 4's single red
#: row, re-shaped this round to a driver-canonicalizable output (CSV codes
#: string instead of array<int>).
_R5_PRIORITY = frozenset(
    {
        "dedup_substring_spans",
        "contamination_reach",
        "split_leakage_pairs",
        "pagerank_dup_graph",
        "dedup_incremental_pairs",
        "winsorize_event_values",
        "corpus_snapshot_diff",
        "embed_quantize_int8",
    }
)


def load_all() -> dict[str, QueryDef]:
    """Import every query module (side effect: fills REGISTRY).

    Returns the registry reordered for the driver's 50-entry correctness
    snapshot: round-5 priority queries (no green driver verdict yet) first,
    then anything never driver-checked (new registrations), then
    round-2-verified, then the r3/r4-verified bulk.
    """
    from kioss_spark.queries import relational  # noqa: F401

    try:
        from kioss_spark.queries import llm  # noqa: F401
    except ImportError:  # pragma: no cover - built incrementally
        pass
    prio = {k: v for k, v in REGISTRY.items() if k in _R5_PRIORITY}
    never = {
        k: v
        for k, v in REGISTRY.items()
        if k not in _DRIVER_VERIFIED
        and k not in _DRIVER_VERIFIED_R2
        and k not in _R5_PRIORITY
    }
    r2 = {k: v for k, v in REGISTRY.items() if k in _DRIVER_VERIFIED_R2}
    rest = {k: v for k, v in REGISTRY.items() if k in _DRIVER_VERIFIED}
    return {**prio, **never, **r2, **rest}
