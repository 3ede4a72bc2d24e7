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
#:
#: Round-6 rotation (VERDICT r5 item 2): the r5 window went 50/50
#: green, so those queries rotate to the tail with fresh evidence. The
#: r6 window refreshes the 19 queries whose newest green driver row is
#: still r1/r2 (pre-dating the events-fixture regeneration — the r4
#: lesson is that stale greens are how silent drift survives), adds
#: ``minhash_lsh_pairs`` whose round-6 exact-verified reformulation
#: gives it a value-exact oracle for the first time (VERDICT r5
#: item 3), and fills the remaining 30 slots with r4 greens — oldest
#: evidence first, keeping the flagship reference-parity family in.
#: The 14 TPC-H-shape widenings (all stable orders/lineitem/part joins)
#: sit out this round and ride the r7 window; every tail query stays
#: oracle-gated locally by the sf0.01 parity suite.
DRIVER_PRIORITY: tuple[str, ...] = (
    # ---- newest green row is r1/r2 → refresh evidence (19) ----
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
    "group_count",
    "group_sum_multi",
    "top_orders",
    "custkey_set_ops",
    "orders_by_month",
    "day_name_dimension",
    "season_year_inference",
    "completed_before_cutoff",
    # ---- newly oracled in round 6 → first possible green row (1) ----
    "minhash_lsh_pairs",
    # ---- new in round 6: zipfian skew join, no driver row yet (1) ----
    "skewed_user_join",
    # ---- new in round 6: PQ-ADC compressed ANN tier, no driver row yet (1) ----
    "pq_adc_topk",
    # ---- newest green row is r4 → refresh evidence (29) ----
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
    "standings",
    "revenue_by_nation",
    "simhash_near_dup",
    "minhash_native_pairs",
    "ivf_ann_topk",
    "reference_standings",
    "matches_clean",
    # ---- driver window boundary (50) ----
    # html_matches_extract slid out when the round-6 additions
    # (skewed_user_join, pq_adc_topk) entered the head — r4-green,
    # html parse also exercised every round by matches_clean upstream
    "html_matches_extract",
    # new in round 6 (late): canonical-doc selection — r7 window head
    "dup_cluster_representatives",
    # new in round 6 (late): SemDeDup cluster-blocked embedding dedup
    "semantic_dedup",
    # new in round 6 (late): RAG token-window chunking
    "doc_chunks",
    # new in round 6 (late): TPC-H Q6 shape (pure multi-predicate scan)
    "forecast_revenue_change",
    # new in round 6 (late): batch k-NN graph (cell-blocked)
    "knn_graph",
    # new in round 6 (late): DSIR hashed-unigram importance weights
    "importance_weights",
    # new in round 6 (late): BPE merge-candidate pair counts
    "bpe_merge_candidates",
    # new in round 6 (late): ordered conversion funnel
    "event_funnel",
    # new in round 6 (late): weekly cohort retention matrix
    "retention_cohorts",
    # new in round 6 (late): k-NN majority-vote label prediction
    "knn_label_vote",
    # new in round 6 (late): session path mining (ordered string agg)
    "session_path_topk",
    # new in round 6 (late): embedding-similarity decontamination
    "semantic_decontamination",
    # new in round 6 (late): stateful streaming funnel
    "event_funnel_stream",
    # new in round 6 (late): SCD2 validity-interval history
    "scd2_event_history",
    # new in round 6 (late): fixed-width value histogram
    "value_histogram",
    # new in round 6 (late): TPC-H Q12 shape (join + 2-way conditional count)
    "late_shipment_priority",
    # new in round 6 (late): vocabulary OOV-rate evaluation
    "vocab_coverage_oov",
    # new in round 6 (late): add-1 bigram LM quality scoring
    "bigram_logprob",
    # new in round 6 (late): k-NN graph triangles / clustering coeff
    "knn_triangle_stats",
    # new in round 6 (late): Efraimidis-Spirakis weighted sampling
    "weighted_sample_topk",
    # new in round 6 (late): grouped (per-source) E-S weighted sampling
    "weighted_sample_per_source",
    # r4 greens bumped by this round's two additions — r7 window head
    "events_by_segment_stream",  # stream-static join also pinned by view_click_stream_join (r5)
    "events_json_extract",  # JSON extract also pinned by events_props_variant (r5)
    # r4-green TPC-H-shape widenings — rotate into the r7 window
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
    # r5 window, 50/50 green — freshest evidence in the repo
    "events_hourly",
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
    "dup_span_stats",
    "order_chains_recursive",
    "events_props_variant",
    "scalar_cleaning_suite",
    "standings_stream",
    "dedup_exact",
    "jaccard_near_dup",
    "embedding_topk",
    "embedding_near_dup_pairs",
    "lsh_near_dup_pairs",
    "ann_lsh_topk",
    "label_centroids",
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
    "full_outer_coalesce",
    "customers_without_orders",
    "high_value_customers_semi",
    "top_customers_per_nation",
    "rollup_region_nation",
    "distinct_customers_salted",
    "returned_items",
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
