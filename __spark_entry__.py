"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual implementations live in ``hiv_data_integration_spark.battery``;
this file is just the stable driver-facing façade.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hiv_data_integration_spark.battery import ORACLE, QUERIES, q_flagship
from hiv_data_integration_spark.battery_ext import EXT_ORACLE, EXT_QUERIES
from hiv_data_integration_spark.battery_sql import SQL2_ORACLE, SQL2_QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship (SURVEY.md §7.5) exercises the spine every reference
    extract repeats: scan → broadcast dim joins → derived column-name
    synthesis → explicit-values pivot → grouped null-preserving re-sum →
    wide→long stack → rounding → sort.
    """
    return q_flagship(spark, SMOKE_SF_DIR)


# The driver hash-verifies only the FIRST 50 ``queries()`` entries per
# round, so ordering is the verification budget. Round-5 tiers (lowest
# emitted first): the 2 round-4 reds (raw ArrayType outputs the driver's
# pandas canonicalizer cannot hash — now scalarized via concat_ws /
# posexplode on both engine and oracle sides), then brand-new queries
# (absent from the tier lists; round 5 ultimately added ~147, far more
# than the 48 remaining slots — the first 48 in registration order
# verify this round, the tail rotates to round 6 and beyond; ALL of
# them are hash-verified locally at sf0.001 AND sf0.01, under a
# hostile session, and in three full 219/260/266-entry driver-style
# sweeps regardless), then the stale r2/r3/r4 greens, which rotate
# entirely to later rounds this time. A previously-green entry never
# displaces a never-driver-verified one (contract-tested in
# tests/test_driver_contract.py).
_R4_RED_FIXED = [
    "user_event_sequences", "embed_mean_pool",
]
_R2_GREEN_STALE = [
    "window_rank_customers", "rules_engine_lineitem",
    "rules_consistent_only", "stack_wide_to_long", "pad_to_contract",
    "string_path_ops", "period_roundtrip", "lenient_numeric_parse",
    "dict_lookup_priority", "fuzzy_levenshtein_match", "text_token_counts",
    "text_quality_scores", "text_lang_id", "doc_fingerprint",
    "dedup_exact_docs", "dedup_minhash_lsh_pairs", "dedup_ngram_jaccard_pairs",
    "dedup_simhash_fingerprints", "dedup_embedding_cosine_pairs",
    "dedup_connected_components", "text_rolling_fingerprint", "text_chunking",
    "text_pii_redaction", "text_vocab_topk", "text_winnow_fingerprints",
    "text_winnow_overlap_pairs", "text_repetition_filter",
    "text_contamination_check", "text_tfidf_topk",
]
_R3_GREEN = [
    "scd2_customer_history", "embed_quantize_int8",
    "embed_quantized_rerank_topk", "embed_ivf_kmeans_topk",
    "fuzzy_resolve_blocked", "rest_naomi_json_flatten", "salted_skew_join",
    "bucketed_colocated_join", "spectrum_csv_scan",
    "partitioned_parquet_pruning", "approx_sketches_events",
    "streaming_tumbling_counts", "streaming_exactly_once_dedup",
    "rollup_lineitem", "cube_orders", "grouping_sets_orders",
    "count_distinct_parts", "grouped_quantiles", "intersect_nations",
    "except_balance_buckets", "range_join_events", "asof_last_event_per_day",
    "string_agg_nations", "correlated_subquery_balance", "embed_vector_norms",
    "skyline_suppliers", "corpus_token_packing", "quality_decile_stats",
    "source_quota_cap", "funnel_events", "cohort_retention_events",
    "null_preserving_sum", "window_lag_events", "tumbling_window_events",
    "sessionize_events", "org_uuid5_ids", "multimodal_decode_stub",
    "multimodal_frame_sample_stub", "embed_cosine_topk",
    "embed_ivf_topk_label",
]
_R4_GREEN = [
    "data_split_sample", "jsonl_corpus_roundtrip", "streaming_pii_redaction",
    "corpus_dataset_card", "embed_ann_recall", "llm_corpus_prep",
    "streaming_corpus_chunking", "corpus_unigram_logprob",
    "dedup_canonical_corpus", "fuzzy_resolve_suppliers",
    "xlsx_report_roundtrip", "csv_per_period_export", "json_dict_scan",
    "registry_upsert_state", "dedup_ngram_prefix_filter",
    "zorder_clustered_scan", "dedup_semantic_clusters",
    "dedup_incremental_batch", "corpus_shuffle_shards",
    "orc_source_roundtrip", "dataset_diff_audit", "compaction_plan_bins",
    "text_clean_corpus", "trailing_window_features", "corpus_mixture_sample",
    "asof_join_two_table", "profile_numeric_histogram",
    "profile_completeness", "embed_lsh_ann_topk", "multimodal_payload_meta",
    "fuzzy_normalize_fold", "rest_fanout_analytics", "flagship_pnls_chain",
    "pricing_summary", "filter_membership", "date_range_filter",
    "conditional_bucket", "join_fact_dim", "multi_hop_join",
    "semi_join_orders", "anti_join_customers", "cross_join_replicate",
    "union_relaxed", "distinct_pairs", "pivot_sum_returnflag",
    "pivot_min_status", "semester_rollup", "topk_customers",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §2.14
    extensions: dedup / similarity / text analysis / multimodal),
    ordered so the driver's 50-query verification window lands on the
    entries with the least cross-round driver signal."""
    merged = {**QUERIES, **EXT_QUERIES, **SQL2_QUERIES}
    tiered = (
        set(_R4_RED_FIXED) | set(_R2_GREEN_STALE) | set(_R3_GREEN)
        | set(_R4_GREEN)
    )
    new_this_round = [k for k in merged if k not in tiered]
    ordered: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for tier in (
        _R4_RED_FIXED,
        new_this_round,
        _R2_GREEN_STALE,
        _R3_GREEN,
        _R4_GREEN,
    ):
        for k in tier:
            if k in merged and k not in ordered:
                ordered[k] = merged[k]
    for k, fn in merged.items():  # safety net: nothing may be dropped
        ordered.setdefault(k, fn)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each query (same column names).

    Keys intentionally absent (mapInPandas decode/frame stubs) get the
    driver's weaker rows-only check.
    """
    return {**ORACLE, **EXT_ORACLE, **SQL2_ORACLE}
