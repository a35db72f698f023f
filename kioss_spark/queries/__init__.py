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


# The driver samples the FIRST 50 ``load_all()`` entries for its per-round
# correctness snapshot, so we rotate the registry each round.  End of round 5:
# all 143 registered queries hold a green hard driver verdict (r05 closed the
# last 40), so from round 6 onward the window is re-verification budget.
# ``_LAST_GREEN_ROUND`` records each query's most recent green driver round;
# ordering is: never-checked (new registrations) first, then stalest-round
# first, and inside the stalest tier the queries whose implementation files
# changed most since their verdict (``_RECHECK_FIRST``) lead.  Each new
# CORRECTNESS_rN's green names must be folded in here at round start.
_GREEN_ROUNDS: dict[int, frozenset] = {
    3: frozenset({
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
    }),
    4: frozenset({
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
    }),
    # CORRECTNESS_r05.json — 50/50 green (includes the four r2-only names
    # and six r3 names the r5 window re-checked).
    5: frozenset({
        "agg_distinct_stats", "ann_cosine_topk", "ann_matryoshka_agreement",
        "bigram_lm_score", "bigram_novelty", "chunk_dedup", "collocations_pmi",
        "contamination_reach", "corpus_apply_changeset", "corpus_snapshot_diff",
        "dedup_cluster_keep", "dedup_incremental_lsh", "dedup_incremental_pairs",
        "dedup_minhash_lsh", "dedup_provenance", "dedup_simhash",
        "dedup_substring_spans", "dup_graph_clustering", "dup_graph_triangles",
        "embed_cluster_profile", "embed_covariance_diag", "embed_outliers",
        "embed_quantize_int8", "entity_resolution_parts", "event_rate_anomaly",
        "event_value_histogram", "funnel_delay_quantiles", "hard_negative_mining",
        "heavy_hitter_tokens", "kanon_risk_docs", "label_balance_weights",
        "length_strata_sample", "minhash_signatures", "mix_quota_sample",
        "mm_frame_dedup", "mm_image_resize", "pagerank_dup_graph",
        "pipeline_incremental_refresh", "pivot_status_revenue",
        "q1_pricing_summary", "q3_shipping_priority", "q5_nation_revenue",
        "quality_ensemble", "quality_gopher_rules", "retention_cohorts",
        "rollup_order_counts", "sequence_view_click_purchase",
        "split_leakage_pairs", "winsorize_event_values", "zorder_event_layout",
    }),
    # CORRECTNESS_r06.json — 50/50 green (the 48 stalest r3-verdict names —
    # the op_* family, zip, dup-pair queries, the TPC-H literal wave — plus
    # the two round-6 registrations).
    6: frozenset({
        "ann_int8_rescore", "ann_ivf_multiprobe", "ann_ivf_topk",
        "ann_ivf_trained", "anti_customers_no_pending", "asof_last_purchase",
        "asof_last_signup", "bpe_segment_corpus", "dedup_containment_pairs",
        "dedup_exact", "dedup_jaccard_pairs", "funnel_click_purchase",
        "op_amap_enrich", "op_catch_pyfn", "op_catch_replacement",
        "op_concat_streams", "op_distinct_first", "op_filter_highvalue",
        "op_flatten_tokens", "op_foreach_passthrough", "op_group_batches",
        "op_groupby_key", "op_map_revenue", "op_observe_metrics",
        "op_skip_truncate", "q10_returned_items", "q11_important_parts",
        "q13_customer_distribution", "q14_promo_effect", "q15_top_supplier",
        "q17_small_quantity", "q18_large_orders", "q19_disjunctive_pushdown",
        "q21_sole_late_supplier", "q22_dormant_customers", "q4_order_priority",
        "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
        "quality_linear_probe", "range_join_error_windows",
        "rollup_hourly_events", "running_total_per_customer",
        "semi_parts_ordered", "sessionize_events", "set_ops_half_year",
        "skew_salted_event_totals", "sql_balance_quartiles",
        "top3_customers_per_segment", "zip_customers_suppliers",
    }),
    # CORRECTNESS_r07.json — 50/50 green (the six post-verdict-changed
    # re-check leaders, the 13 round-7 registrations, and the stalest
    # r4/r5-tier names the r7 window reached).
    7: frozenset({
        "ann_cosine_topk", "ann_index_ingest", "ann_pq_adc", "ann_pq_codes",
        "ann_recall_eval", "boilerplate_ngrams", "bucketed_user_event_totals",
        "budget_cap_per_source", "chunk_text_windows", "cube_status_segment",
        "decontaminate_eval", "dedup_cluster_best", "dedup_embedding",
        "dedup_lsh_recall", "dedup_semantic", "dedup_threshold_sweep",
        "doc_fingerprint", "dq_constraint_audit", "dsir_importance",
        "forget_apply_audit", "forget_fanout", "fuzzy_part_names",
        "gapfill_hourly_locf", "hard_negative_mining", "json_props_stats",
        "lang_id", "mix_quota_sample", "mix_weighted_order", "mm_audio_chunks",
        "mm_frame_sample", "mm_image_meta", "pack_sequences", "pii_redact",
        "pipeline_curation", "probe_calibration_bins", "profile_corpus",
        "profile_dup_rate", "q12_shipclass_adapted",
        "q16_supplier_variety_adapted", "q20_dominant_supplier_adapted",
        "q2_best_supplier_adapted", "q9_profit_adapted", "quality_ensemble",
        "quality_gopher_rules", "quality_pctl_by_source",
        "sample_cluster_stratified", "sketch_cms_tokens", "split_by_cluster",
        "vocab_drift_chi2", "zorder_event_layout",
    }),
    # CORRECTNESS_r08.json — 50/50 green (the three post-verdict-changed
    # re-check leaders, the nine round-8 registrations, and the stalest
    # r4/r5-tier names the r8 window reached).
    8: frozenset({
        "agg_distinct_stats", "ann_matryoshka_agreement", "ann_pq_residual",
        "ann_recall_eval", "bigram_lm_score", "bigram_novelty",
        "bpe_coverage", "bpe_segment_corpus", "chunk_dedup",
        "collocations_pmi", "contamination_reach", "corpus_apply_changeset",
        "corpus_snapshot_diff", "dedup_cluster_keep", "dedup_incremental_lsh",
        "dedup_incremental_pairs", "dedup_lsh_scurve", "dedup_minhash_lsh",
        "dedup_provenance", "dedup_simhash", "dedup_substring_spans",
        "dup_graph_clustering", "dup_graph_triangles", "embed_cluster_profile",
        "embed_covariance_diag", "embed_outliers", "embed_quantize_int8",
        "entity_resolution_parts", "event_rate_anomaly",
        "event_value_histogram", "join_fanout_audit", "quality_repetition",
        "quality_score_drift", "quality_unigram_icf", "rolling_7d_user_value",
        "salted_join_event_weights", "sample_deterministic",
        "sample_stratified", "shuffle_shards", "sketch_distinct_tokens",
        "sketch_hll_lang_rollup", "sketch_kll_doclen",
        "sketch_theta_source_overlap", "split_train_val_test", "text_quality",
        "tfidf_keywords", "token_budget_by_source", "token_counts",
        "vocab_drift_chi2", "vocab_top_terms",
    }),
    # CORRECTNESS_r09.json — 50/50 green (the six round-9 registrations,
    # the op_* reference-parity family re-proven at HEAD, and the stalest
    # r5/r6-tier names the r9 window reached).
    9: frozenset({
        "ann_int8_rescore", "ann_ivf_multiprobe", "ann_ivf_topk",
        "ann_ivf_trained", "ann_pq_opq", "ann_pq_opq_res",
        "anti_customers_no_pending", "asof_last_purchase", "asof_last_signup",
        "corpus_scd2_history", "dedup_containment_pairs", "dedup_exact",
        "dedup_jaccard_pairs", "funnel_click_purchase",
        "funnel_delay_quantiles", "heavy_hitter_tokens", "kanon_risk_docs",
        "label_balance_weights", "length_strata_sample", "minhash_signatures",
        "mm_frame_dedup", "mm_image_resize", "op_amap_enrich", "op_catch_pyfn",
        "op_catch_replacement", "op_concat_streams", "op_distinct_first",
        "op_filter_highvalue", "op_flatten_tokens", "op_foreach_passthrough",
        "op_group_batches", "op_groupby_key", "op_map_revenue",
        "op_observe_metrics", "op_skip_truncate", "pagerank_dup_graph",
        "pipeline_incremental_refresh", "pivot_status_revenue",
        "q10_returned_items", "q1_pricing_summary", "q3_shipping_priority",
        "q5_nation_revenue", "quality_ccnet_buckets", "retention_cohorts",
        "rollup_order_counts", "sequence_view_click_purchase",
        "split_leakage_pairs", "tokenizer_compare", "unigram_segment_corpus",
        "winsorize_event_values",
    }),
    # CORRECTNESS_r10.json — 49/50 hash-green + layout_small_files_audit
    # rows-only BY DESIGN (the six round-10 registrations, the three
    # unigram-oracle recheck leaders, the 24 r6-stale names, and the
    # stalest r7 names the r10 window reached).
    10: frozenset({
        "ann_cosine_topk", "ann_index_ingest", "ann_pq_adc", "ann_pq_codes",
        "bm25_index_ingest", "bm25_topk", "boilerplate_ngrams",
        "bucketed_user_event_totals", "budget_cap_per_source",
        "chunk_text_windows", "cube_status_segment", "decontaminate_eval",
        "dedup_cluster_best", "dedup_embedding", "dedup_lsh_recall",
        "dedup_semantic", "dedup_threshold_sweep", "doc_fingerprint",
        "dq_constraint_audit", "hybrid_rrf_topk", "layout_small_files_audit",
        "mm_phash_dedup", "q11_important_parts", "q13_customer_distribution",
        "q14_promo_effect", "q15_top_supplier", "q17_small_quantity",
        "q18_large_orders", "q19_disjunctive_pushdown",
        "q21_sole_late_supplier", "q22_dormant_customers", "q4_order_priority",
        "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
        "quality_ccnet_buckets", "quality_linear_probe",
        "range_join_error_windows", "rollup_hourly_events",
        "running_total_per_customer", "semi_parts_ordered",
        "sessionize_events", "set_ops_half_year", "skew_salted_event_totals",
        "sql_balance_quartiles", "tokenizer_compare",
        "top3_customers_per_segment", "unigram_segment_corpus",
        "wordpiece_segment_corpus", "zip_customers_suppliers",
    }),
    # CORRECTNESS_r11.json — 49/50 hash-green + layout_zorder_pruning
    # rows-only BY DESIGN (the three DECIMAL-widened BM25 recheck
    # leaders, the seven round-11 registrations, ALL 31 r7-stale names,
    # and the nine stalest r8 names the r11 window reached).
    11: frozenset({
        "agg_distinct_stats", "ann_matryoshka_agreement", "ann_pq_residual",
        "ann_recall_eval", "bigram_lm_score", "bigram_novelty",
        "bm25_index_ingest", "bm25_phrase_topk", "bm25_proximity_topk",
        "bm25_topk", "bpe_coverage", "bpe_segment_corpus", "chunk_dedup",
        "dsir_importance", "forget_apply_audit", "forget_fanout",
        "fuzzy_part_names", "gapfill_hourly_locf", "hard_negative_mining",
        "hybrid_rrf_topk", "json_props_stats", "lang_id",
        "layout_zorder_pruning", "manifest_ingest_scan", "mix_quota_sample",
        "mix_weighted_order", "mm_audio_chunks", "mm_frame_sample",
        "mm_image_meta", "pack_sequences", "pii_redact", "pipeline_curation",
        "probe_calibration_bins", "profile_corpus", "profile_dup_rate",
        "q12_shipclass_adapted", "q16_supplier_variety_adapted",
        "q20_dominant_supplier_adapted", "q2_best_supplier_adapted",
        "q9_profit_adapted", "quality_ensemble", "quality_gopher_rules",
        "quality_pctl_by_source", "retrieval_quality",
        "sample_cluster_stratified", "sketch_cms_tokens",
        "sketch_state_ingest", "skipping_scan_events", "split_by_cluster",
        "zorder_event_layout",
    }),
    # CORRECTNESS_r12.json — 50/50 hash-green, zero err (the first
    # all-green driver window): the three post-verdict-changed recheck
    # leaders, the nine round-12 registrations, and 38 of the 41
    # r8-stale names.  token_counts / vocab_top_terms / vocab_drift_chi2
    # were displaced past the 50-slot window (ROUND12.md's "nothing
    # older than r9" claim was wrong — r13 verdict finding) and lead
    # round 13's window via _RECHECK_FIRST below.
    12: frozenset({
        "bm25_maxscore_topk", "bm25_phrase_index_ingest",
        "collocations_pmi", "contamination_reach", "corpus_apply_changeset",
        "corpus_snapshot_diff", "dedup_cluster_keep", "dedup_incremental_lsh",
        "dedup_incremental_pairs", "dedup_lsh_scurve", "dedup_minhash_lsh",
        "dedup_provenance", "dedup_simhash", "dedup_substring_spans",
        "dup_graph_clustering", "dup_graph_triangles", "embed_cluster_profile",
        "embed_covariance_diag", "embed_outliers", "embed_quantize_int8",
        "entity_resolution_parts", "event_rate_anomaly",
        "event_value_histogram", "join_fanout_audit", "manifest_changes_scan",
        "manifest_compact_scan", "manifest_ingest_scan", "manifest_stats_only",
        "member_scan_events", "quality_repetition", "quality_score_drift",
        "quality_unigram_icf", "retrieval_quality", "rolling_7d_user_value",
        "salted_join_event_weights", "sample_deterministic",
        "sample_stratified", "shuffle_shards", "sketch_distinct_tokens",
        "sketch_hll_lang_rollup", "sketch_kll_doclen",
        "sketch_theta_source_overlap", "skipping_scan_double",
        "skipping_scan_events", "skipping_scan_strings", "skipping_scan_time",
        "split_train_val_test", "text_quality", "tfidf_keywords",
        "token_budget_by_source",
    }),
    # CORRECTNESS_r13.json — 50/50 hash-green, zero err (the second
    # consecutive all-green driver window): the 3 r8-stale leaders, the
    # 5 changed-code recheck leaders, the 7 round-13 registrations, and
    # 35 r9-stale names.  The 12 r9 names the late registrations
    # displaced (r13 verdict recount — ROUND13.md's "8" was computed
    # before 4 late registrations) lead round 14's stale tier.
    13: frozenset({
        "ann_int8_rescore", "ann_ivf_multiprobe", "ann_ivf_topk",
        "ann_ivf_trained", "ann_pq_opq", "ann_pq_opq_res",
        "anti_customers_no_pending", "asof_last_purchase", "asof_last_signup",
        "bm25_topk", "corpus_scd2_history", "dedup_containment_pairs",
        "dedup_exact", "dedup_jaccard_pairs", "facade_member_scan",
        "facade_pruned_scan", "funnel_click_purchase", "funnel_delay_quantiles",
        "heavy_hitter_tokens", "kanon_risk_docs", "label_balance_weights",
        "length_strata_sample", "manifest_changes_scan",
        "manifest_compact_scan", "manifest_delete_feed", "manifest_delete_scan",
        "manifest_evolution_scan", "manifest_merge_scan",
        "manifest_row_changes_scan", "minhash_signatures", "mm_frame_dedup",
        "mm_image_resize", "op_amap_enrich", "op_catch_pyfn",
        "op_catch_replacement", "op_concat_streams", "op_distinct_first",
        "op_filter_highvalue", "op_flatten_tokens", "op_foreach_passthrough",
        "op_group_batches", "op_groupby_key", "op_map_revenue",
        "op_observe_metrics", "op_skip_truncate", "retrieval_quality",
        "skipping_scan_double", "token_counts", "vocab_drift_chi2",
        "vocab_top_terms",
    }),
    # CORRECTNESS_r14.json — 50/50 hash-green, zero err (third consecutive
    # all-green window): the 16 changed-code recheck leaders (manifest/
    # facade/skipping family after the round-14 memo+DV work) plus the
    # r14 registrations and the stalest tier of the r9/r10 names.
    14: frozenset({
        "ann_cosine_topk", "ann_index_ingest", "ann_pq_adc", "ann_pq_codes",
        "boilerplate_ngrams", "bucketed_user_event_totals",
        "budget_cap_per_source", "chunk_text_windows", "cube_status_segment",
        "decontaminate_eval", "dedup_cluster_best", "dedup_embedding",
        "dedup_lsh_recall", "dedup_semantic", "dedup_threshold_sweep",
        "facade_member_scan", "facade_pruned_scan", "facade_pruned_scan_time",
        "manifest_as_of_scan", "manifest_changes_scan", "manifest_clone_scan",
        "manifest_compact_scan", "manifest_delete_feed",
        "manifest_delete_scan", "manifest_evolution_scan",
        "manifest_history_scan", "manifest_ingest_scan", "manifest_merge_scan",
        "manifest_rename_scan", "manifest_restore_scan",
        "manifest_row_changes_scan", "manifest_stats_only",
        "manifest_stream_delete_feed", "member_scan_events",
        "pagerank_dup_graph", "pipeline_incremental_refresh",
        "pivot_status_revenue", "q10_returned_items", "q1_pricing_summary",
        "q3_shipping_priority", "q5_nation_revenue", "retention_cohorts",
        "rollup_order_counts", "sequence_view_click_purchase",
        "skipping_scan_double", "skipping_scan_events",
        "skipping_scan_strings", "skipping_scan_time", "split_leakage_pairs",
        "winsorize_event_values",
    }),
}

#: name -> most recent green driver round
_LAST_GREEN_ROUND: dict[str, int] = {}
for _round in sorted(_GREEN_ROUNDS):
    for _name in _GREEN_ROUNDS[_round]:
        _LAST_GREEN_ROUND[_name] = _round

#: Re-check leaders: queries whose verified implementation changed AFTER
#: their last green verdict, so their stale verdict no longer covers HEAD.
#: Round 13 (window recomputed from ``load_all()`` ORDER this time — the
#: r12 plan trusted its own arithmetic and three names silently fell past
#: the 50-slot sample; tools/rotation_audit.py now prints the actual
#: window + staleness histogram):
#: 1. the three r8-stale names r12's registrations displaced
#:    (``token_counts``, ``vocab_top_terms``, ``vocab_drift_chi2``) lead
#:    outright, per the r12 verdict ask;
#: 2. then the r12-green names whose implementation round 13 changed:
#:    ``skipping_scan_double`` (NaN-safe fractional bounds, ADVICE),
#:    ``manifest_compact_scan`` (committed-batches-only folding +
#:    optimistic concurrent commit), ``manifest_changes_scan`` (row-grain
#:    fallback path), ``retrieval_quality`` (checkpoint registry keyed by
#:    applicationId), and ``bm25_topk`` (r11-green; adaptive max-score
#:    gate in its serving path).
#: New round-13 registrations follow (never-checked tier), then the
#: r9-stale tier fills the remainder of the 50.  Final r13 window
#: (printed by tools/rotation_audit.py at HEAD, not hand-computed):
#: 3 r8-stale + 5 recheck leaders + 7 new registrations
#: (facade_member_scan, facade_pruned_scan, manifest_delete_feed,
#: manifest_delete_scan, manifest_evolution_scan,
#: manifest_merge_scan, manifest_row_changes_scan) + 35 r9-stale = 50;
#: the 12 r9 names the new registrations displaced lead round 14's
#: stale tier — the explicit, recorded cost of seven new oracle-gated
#: queries.
#: Round 14 (set AFTER the round's last registration; window recomputed
#: by tools/rotation_audit.py, never hand arithmetic): the previous
#: leaders all went green in the r13 window.  This round rewrote the
#: manifest engine — distributed planning (manifest_candidates_df), the
#: v3 checkpointed delta log, deletion-vector/compaction race guards,
#: column mapping, facade Spark-side pruning — so every r12/r13-green
#: manifest-family query runs on changed code and leads the window for
#: a fresh verdict at HEAD.  The 7 round-14 registrations
#: (facade_pruned_scan_time, manifest_as_of_scan, manifest_clone_scan,
#: manifest_history_scan, manifest_rename_scan, manifest_restore_scan,
#: manifest_stream_delete_feed) follow in the never-checked tier, then
#: the stale tier: the 12 r9-stale names (q1_pricing_summary,
#: q3_shipping_priority, q5_nation_revenue, q10_returned_items,
#: pagerank_dup_graph, pivot_status_revenue, retention_cohorts,
#: rollup_order_counts, sequence_view_click_purchase,
#: split_leakage_pairs, pipeline_incremental_refresh,
#: winsorize_event_values — the r13 verdict ask) and the 15 stalest r10
#: names fill the remaining 27 slots: 16 + 7 + 12 + 15 = 50
#: (recomputed by tools/rotation_audit.py AFTER the last registration —
#: the late-registration displacement is recorded, not silently
#: suffered: 3 more r10 names wait for round 15).
#: Round 15 (optimization round 2/2): every query whose verified
#: implementation changed after the r14 verdict — the manifest/facade
#: family (driver-side delta commits + metadata-job cuts), the BM25
#: ingest pair (one-pass bootstrap), retrieval_quality (pair-list
#: checkpoint + pooled lanes), dedup_provenance (min-window survivor),
#: the CC/PageRank consumers (fused round shape), the PQ ladder +
#: lang_id (batched projections).  33 names; the remaining 17 window
#: slots fall to the stalest-verdict tier automatically.
_RECHECK_FIRST: tuple = (
    "manifest_delete_scan",
    "manifest_merge_scan",
    "manifest_delete_feed",
    "manifest_compact_scan",
    "manifest_ingest_scan",
    "manifest_changes_scan",
    "manifest_row_changes_scan",
    "manifest_stats_only",
    "manifest_evolution_scan",
    "manifest_as_of_scan",
    "manifest_clone_scan",
    "manifest_history_scan",
    "manifest_rename_scan",
    "manifest_restore_scan",
    "manifest_stream_delete_feed",
    "facade_pruned_scan",
    "facade_member_scan",
    "facade_pruned_scan_time",
    "bm25_index_ingest",
    "bm25_phrase_index_ingest",
    "retrieval_quality",
    "dedup_provenance",
    "pagerank_dup_graph",
    "dedup_cluster_best",
    "dedup_cluster_keep",
    "split_by_cluster",
    "fuzzy_part_names",
    "ann_pq_codes",
    "ann_pq_adc",
    "ann_pq_residual",
    "ann_pq_opq",
    "ann_pq_opq_res",
    "lang_id",
)


def load_all() -> dict[str, QueryDef]:
    """Import every query module (side effect: fills REGISTRY).

    Returns the registry reordered for the driver's 50-entry correctness
    snapshot: queries whose implementation changed AFTER their last verdict
    (``_RECHECK_FIRST``) lead outright — a stale verdict on changed code is
    worth less than a fresh verdict on old code — then never-driver-checked
    queries (new registrations), then verified queries stalest-verdict-round
    first, so the window re-proves the least-recently-proven code at HEAD.
    """
    from kioss_spark.queries import relational  # noqa: F401

    try:
        from kioss_spark.queries import llm  # noqa: F401
    except ImportError:  # pragma: no cover - built incrementally
        pass

    recheck_rank = {name: i for i, name in enumerate(_RECHECK_FIRST)}

    def order(item):
        name = item[0]
        never = name not in _LAST_GREEN_ROUND
        return (
            recheck_rank.get(name, len(_RECHECK_FIRST)),
            0 if never else 1,
            _LAST_GREEN_ROUND.get(name, 0),
            name,
        )

    return dict(sorted(REGISTRY.items(), key=order))
