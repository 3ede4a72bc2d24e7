"""Named query registry: the driver-facing correctness surface.

Every implemented operator from SURVEY.md §2 is registered here as a
:class:`Query`: a callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) an equivalent ANSI-SQL oracle string that DuckDB runs
over the same parquet tables. The driver compares row-count + schema +
order-insensitive value hash, so:

- every computed column is aliased IDENTICALLY in the Spark code and
  the oracle SQL;
- integer aggregate outputs are cast to BIGINT on both sides (DuckDB
  ``SUM(int)`` returns HUGEINT, Spark returns LONG);
- no wall-clock anywhere (FIXTURES.md determinism rules);
- every ranked output has a tiebreak-complete ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from . import catalog

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    """One registered engine query + its DuckDB oracle."""

    name: str
    fn: QueryFn
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    survey_ref: str = ""  # SURVEY.md §2 operator ids this query covers
    tags: tuple[str, ...] = field(default=tuple)


_REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None, survey_ref: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref, tags=tags)
        return fn

    return deco


#: Driver-facing registration order. The driver's CORRECTNESS pass
#: verifies the FIRST 50 queries in ``queries()`` iteration order
#: (round-1 finding: positions 50+ get no driver evidence).
DRIVER_PRIORITY: tuple[str, ...] = (
    # ---- Round-10 window (first 50; the driver verifies only these). ----
    # Rotation (VERDICT r9 item 1): the 49 r6-green queries -- the
    # oldest driver evidence in the repo (3 rounds stale) -- plus
    # knn_graph, whose r7 driver row predates the r9 derived-cells/
    # staged-assignment/pair-mirror rewrite. 49 + 1 = exactly 50.
    # Post-r10, no registered query's newest green is older than r7.
    # -- r6-green cohort (49) --
    "standings",
    "reference_standings",
    "group_count",
    "group_sum_multi",
    "top_orders",
    "media_decode_fake",
    "promo_revenue_share",
    "order_value_quartiles",
    "price_quantiles",
    "pivot_qty_by_status",
    "unpivot_order_metrics",
    "text_normalize",
    "doc_fingerprints",
    "cube_flag_status",
    "part_price_rank",
    "order_gaps_lag",
    "custkey_set_ops",
    "orders_by_month",
    "day_name_dimension",
    "season_year_inference",
    "completed_before_cutoff",
    "minhash_lsh_pairs",
    "skewed_user_join",
    "pq_adc_topk",
    "hash_split_assignments",
    "sequence_packing",
    "pii_scrub_stats",
    "doc_unigram_logprob",
    "dedup_stream",
    "dq_audit",
    "customer_name_fuzzy_pairs",
    "order_qty_sequences",
    "sorted_neighborhood_pairs",
    "events_winsorized_stats",
    "status_reconciliation_nullsafe",
    "doc_median_length_udaf",
    "doc_norm_length_grouped",
    "doc_tokens_udtf",
    "training_manifest",
    "dup_clusters",
    "dup_clusters_twostar",
    "ngram_decontamination",
    "vocab_build",
    "tfidf_topk_terms",
    "lang_mixture_weights",
    "revenue_by_nation",
    "simhash_near_dup",
    "minhash_native_pairs",
    "ivf_ann_topk",
    # -- knn head (1): driver evidence catches up with the r9 rewrite --
    "knn_graph",
    # ---- driver window boundary (50) ----
    # -- r11 window head: the four knn queries whose r8 rows also
    #    predate the r9 rewrite, then the r7 cohort oldest-first --
    "knn_pagerank",
    "knn_communities",
    "knn_label_vote",
    "knn_triangle_stats",
    # -- r7 greens --
    "dup_cluster_representatives",
    "semantic_dedup",
    "doc_chunks",
    "forecast_revenue_change",
    "importance_weights",
    "bpe_merge_candidates",
    "event_funnel",
    "retention_cohorts",
    "session_path_topk",
    "semantic_decontamination",
    "event_funnel_stream",
    "scd2_event_history",
    "value_histogram",
    "late_shipment_priority",
    "vocab_coverage_oov",
    "bigram_logprob",
    "weighted_sample_topk",
    "weighted_sample_per_source",
    "html_matches_extract",
    "events_by_segment_stream",
    "events_json_extract",
    "large_volume_customers",
    "small_qty_part_revenue",
    "lone_late_supplier",
    "priority_order_counts",
    "customer_order_distribution",
    "idle_rich_customers",
    "nation_pair_volume",
    "top_revenue_supplier",
    "part_supplier_counts",
    "cheapest_part_per_brand",
    "market_share_by_year",
    "product_profit_by_nation_year",
    "disjunctive_pred_revenue",
    "excess_shipped_suppliers",
    "jaccard_near_dup",
    "dup_span_stats",
    "order_chains_recursive",
    "events_props_variant",
    "dedup_exact",
    "lsh_near_dup_pairs",
    "ann_lsh_topk",
    "full_outer_coalesce",
    "scalar_cleaning_suite",
    "embedding_topk",
    "label_centroids",
    "events_hourly",
    # -- r8 greens --
    "ivfpq_ann_topk",
    "source_shingle_kmv",
    "incremental_ingest_dedup",
    "leakage_safe_split",
    "hard_negative_mining",
    "token_budget_pack",
    "source_overlap_matrix",
    "source_minhash_similarity",
    "near_dup_rate_by_source",
    "ivf2_ann_topk",
    "events_sliding",
    "events_hourly_gapfill",
    "latest_event_snapshot",
    "events_trailing_hour_window",
    "events_hourly_stream",
    "events_sliding_stream",
    "events_session_stream",
    "events_time_rollup",
    "event_sessions",
    "purchases_in_sessions",
    "clicks_last_error",
    "user_totals_stateful",
    "view_click_stream_join",
    "per_source_cap",
    "temperature_mixture_sample",
    "training_shuffle_order",
    "standings_stream",
    "embedding_near_dup_pairs",
    "text_stats_by_lang",
    "doc_quality_scores",
    "token_topk",
    "bpe_token_topk",
    "lang_id_heuristic",
    "doc_winnow_fingerprints",
    "corpus_clean_pipeline",
    "doc_repetition_scores",
    "stratified_sample",
    "media_manifest",
    "media_features",
    "media_frame_sample",
    "pricing_summary",
    "shipping_priority",
    "customers_without_orders",
    "high_value_customers_semi",
    "top_customers_per_nation",
    "rollup_region_nation",
    "distinct_customers_salted",
    "returned_items",
    # -- r9 greens: freshest evidence in the repo --
    "event_type_drift",
    "scd2_point_in_time_join",
    "kmeans_clusters",
    "bm25_doc_ranking",
    "table_profile",
    "knn_bfs_hops",
    "quality_model_filter",
    "cluster_balanced_sample",
    "maxsim_multivector_topk",
    "attribution_last_touch",
    "ewma_user_value",
    "value_outliers_mad",
    "revenue_trend_by_nation",
    "rfm_segments",
    "brand_affinity_pairs",
    "conversion_latency_stats",
    "lang_source_contingency",
    "quality_percentile_norm",
    "pq_reconstruction_error",
    "session_bounce_stats",
    "knn_kcore",
    "event_transition_matrix",
    "time_weighted_value",
    "revenue_pareto_deciles",
    "event_sessions_native",
    "grouping_sets_revenue",
    "hourly_volume_spikes",
    "fd_violation_audit",
    "revenue_trend_theilsen",
    "benford_first_digit",
    "revenue_gini",
    "token_prefix_completions",
    "part_price_boxplot",
    "cohort_ltv",
    "snapshot_reconcile",
    "ab_test_conversion",
    "activity_heatmap",
    "revenue_mom_growth",
    "embedding_norm_outliers",
    "rolling_wau",
    "weekday_seasonality",
    "user_churn_rate",
    "brand_hhi_by_year",
    "supplier_latency_league",
    "curation_pipeline",
    "embedding_covariance",
    "token_cms_heavy_hitters",
    "embedding_pca_scores",
    "revenue_bootstrap_ci",
    "matches_clean",
)

def all_queries() -> dict[str, Query]:
    """Name → Query for every registered query (imports all modules).

    Iteration order follows :data:`DRIVER_PRIORITY`; names missing from
    the priority list (a bug tests/test_registry.py catches) would sort
    after it in registration order.
    """
    # Import for side effects: each module registers its queries.
    from .queries import (  # noqa: F401
        core,
        corpus_q,
        extended,
        flagship,
        multimodal_q,
        reference_pipeline,
        scalar,
        skew_q,
        streaming_q,
        training_q,
        udf_q,
    )

    rank = {name: i for i, name in enumerate(DRIVER_PRIORITY)}
    ordered = sorted(_REGISTRY, key=lambda n: (rank.get(n, len(rank)),))
    return {name: _REGISTRY[name] for name in ordered}


def tables_for(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load + view-register the fixture tables for one query run."""
    return catalog.load(spark, sf_dir)
