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
#: Round-5 rotation (VERDICT r4 item 3): the events fixture's ts
#: encoding changed between rounds and the engine's read path was fixed
#: this round — so EVERY query whose output depends on event timestamps
#: needs a fresh driver row. The window head holds the 14
#: events-family queries (5 red in r4 + 9 whose r1/r2 green rows
#: predate the fixture change and are evidence for nothing). The
#: remaining 36 slots refresh queries whose most recent green row is
#: r1/r2. All 45 r4 greens carry fresh evidence and rotate to the
#: tail, where the local sf0.01 parity harness still oracle-gates them.
#: ``minhash_lsh_pairs`` is deliberately OUT of the window: it has no
#: SQL oracle (pyspark.ml's internal hashes) so it can never go green
#: in a driver row; its recall gate lives in tests/test_dedup.py and
#: the fully-oracled ``minhash_native_pairs`` construction stays in.
DRIVER_PRIORITY: tuple[str, ...] = (
    # ---- events-family: ts read fixed this round → re-prove (14) ----
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
    # ---- new round-5 queries: no driver row yet (5) ----
    "per_source_cap",
    "temperature_mixture_sample",
    "training_shuffle_order",
    "dup_span_stats",
    "order_chains_recursive",
    "events_props_variant",
    # ---- last green row is r1/r2 → refresh evidence (30) ----
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
    "returned_items",  # r7 perf A/B this round — keep its row fresh too
    # ---- driver window boundary (50) ----
    "media_decode_fake",  # r2-green; decode path also pytest-gated
    "promo_revenue_share",
    "order_value_quartiles",
    "price_quantiles",
    "pivot_qty_by_status",
    "unpivot_order_metrics",
    # all below carry green r4 driver rows (or, for minhash_lsh_pairs,
    # can never go green — no SQL oracle) and stay parity-gated locally
    # at sf0.01.
    "hash_split_assignments",
    "sequence_packing",
    "pii_scrub_stats",
    "events_json_extract",
    "doc_unigram_logprob",
    "dedup_stream",
    "large_volume_customers",
    "small_qty_part_revenue",
    "lone_late_supplier",
    "priority_order_counts",
    "customer_order_distribution",
    "idle_rich_customers",
    "events_by_segment_stream",
    "dq_audit",
    "customer_name_fuzzy_pairs",
    "order_qty_sequences",
    "sorted_neighborhood_pairs",
    "events_winsorized_stats",
    "status_reconciliation_nullsafe",
    "nation_pair_volume",
    "top_revenue_supplier",
    "part_supplier_counts",
    "doc_median_length_udaf",
    "doc_norm_length_grouped",
    "doc_tokens_udtf",
    "training_manifest",
    "dup_clusters",
    "dup_clusters_twostar",
    "cheapest_part_per_brand",
    "market_share_by_year",
    "product_profit_by_nation_year",
    "disjunctive_pred_revenue",
    "excess_shipped_suppliers",
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
    "html_matches_extract",
    "minhash_lsh_pairs",  # no_oracle by nature — recall-gated in pytest
    "text_normalize",  # normalize stage ⊂ corpus_clean_pipeline
    "doc_fingerprints",  # md5 fingerprint ⊂ dedup_exact + doc_winnow_fingerprints
    "cube_flag_status",  # GROUPING SETS machinery ⊂ rollup_region_nation
    "part_price_rank",  # rank window ⊂ top_customers_per_nation (W2)
    "order_gaps_lag",  # lag window ⊂ event_sessions sessionization
    "group_count",  # ⊂ pricing_summary (A1 ⊂ A2)
    "group_sum_multi",  # ⊂ pricing_summary
    "top_orders",  # ⊂ shipping_priority (O1/O2)
    "custkey_set_ops",  # U1 also in standings legs
    "orders_by_month",  # F6/F11 ⊂ matches_clean
    "day_name_dimension",  # F2 ⊂ matches_clean
    "season_year_inference",  # F4 ⊂ matches_clean
    "completed_before_cutoff",  # P3 ⊂ matches_clean
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
