"""Scale-discipline plan assertions (SURVEY.md §4 rules, pinned).

These tests read the physical plan of registered queries and assert the
properties that make them survive a 100× scale-up: pushdown, pruning,
broadcast on bounded dims only, UDF-free hot paths, bounded shuffles.
A regression here means the query still returns right answers but has
quietly become a 100 TB liability.
"""

from __future__ import annotations

import pytest

from data_engineer_8_final_project_spark.plans import inspect as PI
from data_engineer_8_final_project_spark.registry import all_queries

#: Relational queries whose hot path must stay entirely JVM-side.
UDF_FREE = [
    "standings",
    "pricing_summary",
    "revenue_by_nation",
    "matches_clean",
    "reference_standings",
    "group_sum_multi",
    "top_customers_per_nation",
    "jaccard_near_dup",
    "simhash_near_dup",
    "simhash_dedup_verdicts",
    "dedup_exact",
    "ann_recall_eval",
    "pq_recall_eval",
]


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    reg = all_queries()
    return lambda name: reg[name].fn(spark, sf_dir)


@pytest.mark.parametrize("name", UDF_FREE)
def test_hot_paths_have_no_python_boundary(q, name):
    assert PI.python_eval_count(q(name)) == 0


def test_pricing_summary_pushes_date_filter_to_scan(q):
    df = q("pricing_summary")
    assert any("l_shipdate" in f for f in PI.pushed_filters(df))


def test_pricing_summary_prunes_unused_columns(q):
    cols = PI.scanned_columns(q("pricing_summary"))
    assert "l_comment" not in cols and "l_shipinstruct" not in cols
    assert {"l_quantity", "l_extendedprice", "l_discount"} <= cols


def test_revenue_by_nation_broadcasts_only_bounded_dims(q):
    df = q("revenue_by_nation")
    # nation (25 rows) broadcast; at local test scale AQE may also
    # choose broadcast for customer — require at least the hinted one.
    assert PI.broadcast_join_count(df) >= 1


def test_standings_shuffle_count_is_bounded(q):
    # scan → join shuffles on orderkey/custkey/suppkey → pair-agg
    # micro-shuffle → leg-agg → rank window. The absolute count is plan-
    # shaped, not data-shaped: it must not grow with scale factor.
    assert PI.exchange_count(q("standings")) <= 12


def test_standings_uses_wholestage_codegen(q):
    assert len(PI.wholestage_codegen_ids(q("standings"))) >= 2


def test_standings_reuses_pair_aggregate_exchange(q):
    # the (home,away) pair aggregate feeds both unpivot legs; the plan
    # must compute it ONCE and reuse the shuffle, not re-run the
    # scan+join tree per leg
    assert PI.reused_exchange_count(q("standings")) >= 1


def test_media_features_is_a_single_pandas_stage(q):
    # exactly one Arrow boundary — the feature extractor itself
    assert PI.python_eval_count(q("media_features")) == 1


def test_bucketed_join_runs_without_shuffle(spark, sf_dir, tmp_path):
    """Co-bucketed facts join with zero exchanges: the scale story for
    repeated joins on one key — shuffle paid once at write time."""
    import uuid

    from pyspark.sql import functions as F

    from data_engineer_8_final_project_spark import catalog
    from data_engineer_8_final_project_spark.sources import io as eio

    t = catalog.load(spark, sf_dir)
    suffix = uuid.uuid4().hex[:8]
    li, od = f"li_b_{suffix}", f"od_b_{suffix}"
    eio.write_bucketed(t["lineitem"], li, "l_orderkey", 8, sort_cols="l_orderkey")
    eio.write_bucketed(t["orders"], od, "o_orderkey", 8, sort_cols="o_orderkey")
    try:
        joined = (
            spark.table(li)
            .join(spark.table(od), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = PI.explain_string(joined)
        # no shuffle below the join: the only exchange allowed is the
        # single-partition/hash one introduced ABOVE it by the groupBy
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert joined.count() > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {li}")
        spark.sql(f"DROP TABLE IF EXISTS {od}")


def test_asof_join_is_single_shuffle(q):
    # union + running window: one hashpartitioning exchange on the key,
    # never a join operator (no range/theta join fallback)
    plan = PI.explain_string(q("clicks_last_error"))
    assert "Join" not in plan
    assert PI.exchange_count(q("clicks_last_error")) <= 3  # key window + final sort


def test_range_join_never_nested_loop(q):
    # the bucketed formulation must plan as an equi-join on (key, bucket),
    # not BroadcastNestedLoopJoin on the BETWEEN predicate
    plan = PI.explain_string(q("purchases_in_sessions"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_embedding_near_dup_is_equi_join_not_nested_loop(q):
    # blocked all-pairs: the pair-producing join is an equi-join on the
    # composite block key — never a BroadcastNestedLoopJoin on the
    # vec_a < vec_b theta predicate (round-1 scale-killer, fixed)
    plan = PI.explain_string(q("embedding_near_dup_pairs"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lsh_near_dup_is_equi_join_not_nested_loop(q):
    # banded-LSH path: pair production is an equi-join on
    # (band_no, band_val) — bucket-bounded, subquadratic
    plan = PI.explain_string(q("lsh_near_dup_pairs"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sessionization_single_key_shuffle(q):
    # lag window, running sum and session rollup all reuse one user_id
    # shuffle; the only other exchange is the final presentation sort
    assert PI.exchange_count(q("event_sessions")) <= 2


def test_ivf_assignment_is_shuffle_free(q):
    # centroids are inlined literals → cell assignment is a per-row
    # expression; the only join is the broadcast of n_probe probe cells,
    # and the big side reaches TakeOrdered without any hash exchange
    df = q("ivf_ann_topk")
    plan = PI.explain_string(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert PI.broadcast_join_count(df) >= 1
    # exchanges: probe-side sort/limit + broadcast distribution only —
    # never a hashpartitioning of the full embeddings side
    assert "hashpartitioning(vec_id" not in plan
    assert PI.python_eval_count(df) == 0


def test_ivf2_assignment_is_shuffle_free(q):
    # both quantizer levels are literal-matrix expressions (parent
    # argmin + lazily-evaluated per-parent CASE branch) → assignment is
    # a per-row expression; only the n_probe probe cells broadcast
    df = q("ivf2_ann_topk")
    plan = PI.explain_string(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert PI.broadcast_join_count(df) >= 1
    assert "hashpartitioning(vec_id" not in plan
    assert PI.python_eval_count(df) == 0


def test_large_volume_customers_semi_join_no_subquery(q):
    # Q18 shape: the IN-subquery must decorrelate to a semi equi-join —
    # no nested-loop fallback, lineitem scanned without its text-heavy
    # columns
    plan = PI.explain_string(q("large_volume_customers"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan


def test_lone_late_supplier_broadcasts_supplier_dim(q):
    # Q21 shape: double correlation decorrelated into one per-order
    # aggregate + semi join; supplier (bounded dim) broadcast
    df = q("lone_late_supplier")
    plan = PI.explain_string(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert PI.broadcast_join_count(df) >= 1
    assert PI.python_eval_count(df) == 0


def test_training_manifest_packing_window_is_partitioned(q):
    # capstone: the packing running-sum must be the two-level prefix
    # sum — local windows partitioned by (split, bucket), NOT a global
    # per-split window (3 distinct split values = one task per split =
    # the whole train split serialized through one sort at any scale)
    plan = PI.explain_string(q("training_manifest"))
    assert "hashpartitioning(split" in plan
    assert "_pack_bucket" in plan


def test_sequence_packing_two_level_prefix_sum_matches_global_window(spark, sf_dir):
    """The bucketed prefix sum must equal the single-task global window
    bit-for-bit at every bucket size (including bucket_docs larger than
    the corpus — the degenerate single-bucket case)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_engineer_8_final_project_spark import catalog
    from data_engineer_8_final_project_spark.operators import sampling
    from data_engineer_8_final_project_spark.operators.text import token_count

    docs = catalog.load(spark, sf_dir)["documents"]
    toks = docs.select("doc_id", token_count("text").alias("n_tokens"))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = toks.select(
        "doc_id", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("st")
    )
    for bucket_docs in (7, 64, 10**9):
        got = sampling.running_token_start(toks, bucket_docs=bucket_docs).select(
            "doc_id", F.col("_pack_start").alias("st")
        )
        assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_sorted_neighborhood_has_no_single_task_stage(q):
    """ER blocking: the global rank must be the distributed form
    (range repartition + pid-partitioned local window + broadcast
    offsets) and pair production a bucket equi-join — never the
    round-2 unpartitioned Window.orderBy (one task) or a nested-loop
    fallback on the rank-band predicate."""
    df = q("sorted_neighborhood_pairs")
    plan = PI.explain_string(df)
    assert "hashpartitioning(_rank_pid" in plan  # local rank window, many tasks
    assert "rangepartitioning(c_name" in plan  # sort-order-preserving spread
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_distributed_row_number_matches_global_window(spark, sf_dir):
    """The distributed rank must equal row_number() OVER (ORDER BY ...)
    bit-for-bit at any partition count (incl. 1, the degenerate case)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_engineer_8_final_project_spark import catalog
    from data_engineer_8_final_project_spark.operators import sampling

    c = catalog.load(spark, sf_dir)["customer"].select("c_custkey", "c_name")
    want = c.withColumn(
        "rnk", F.row_number().over(Window.orderBy("c_name", "c_custkey")).cast("long")
    )
    for parts in (1, 5, 16):
        got = sampling.distributed_row_number(
            c, sort_cols=("c_name", "c_custkey"), num_partitions=parts
        )
        assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_runtime_bloom_filter_injects_on_selective_join(spark, sf_dir):
    """Runtime row-level filtering: a selective dim-side predicate must
    inject a bloom_filter_agg / might_contain pair onto the fact scan
    when the optimizer's size gates allow it — the 100 TB lever that
    drops non-matching fact rows at the scan instead of the shuffle.
    (Thresholds are session-tuned here because the fixture tables are
    far below the production 10 GB defaults.)"""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        plan = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "might_contain" in plan and "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_nation_pair_volume_broadcasts_both_nation_dims(q):
    """Q7 shape: the two 25-row nation dims must broadcast — only the
    fact-side equi-joins may shuffle."""
    df = q("nation_pair_volume")
    assert PI.broadcast_join_count(df) >= 2
    assert PI.python_eval_count(df) == 0


def test_latest_event_snapshot_single_shuffle(q):
    """CDC compaction: one hash exchange on the primary key feeds both
    the row_number window and the filter — plus only the presentation
    sort's range exchange."""
    df = q("latest_event_snapshot")
    assert PI.exchange_count(df) <= 2
    assert PI.python_eval_count(df) == 0


def test_dq_audit_bounded_scan_count(q):
    """Constraint audit: six checks may not mean six table passes —
    the plan holds one orders scan for the conditional sums, one
    lineitem scan for its pair, plus the referential anti join's pair."""
    import re

    plan = PI.explain_string(q("dq_audit"))
    # formatted explain prints each node in the tree AND the detail
    # list — count the numbered detail entries only
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 4


def test_per_source_cap_rank_limit_is_pushed_map_side(q):
    """Catalyst's InferWindowGroupLimit must compile row_number()<=cap
    into a Partial WindowGroupLimit BEFORE the exchange — each map task
    ships <= cap rows per key, bounding a hot domain's shuffle input by
    cap x partitions instead of key frequency. If the pushdown ever
    stops firing (option renamed, filter shape changed), this fails
    instead of the operator silently degrading to sort-everything."""
    s = PI.explain_string(q("per_source_cap"))
    assert "WindowGroupLimit" in s and "Partial" in s
    # exactly one data exchange for the rank (plus AQE bookkeeping);
    # a hand-rolled two-phase pre-rank would show two hash exchanges
    assert s.count("hashpartitioning(source") == 1


def test_temperature_sample_has_no_data_shuffle(q):
    """The mixing filter is count-aggregate (tiny, per-source) +
    broadcast join + stateless predicate: the documents scan itself
    must reach the output without a hash exchange on the data path.
    The ONLY hash exchanges allowed in the whole plan are under the
    per-source counts aggregate (rows = |sources|, not |docs|): one
    for the groupBy and the constant-key ``tiny_global_window``
    exchanges for the weight-normalizing sums over that same counts
    frame (key is literally ``coalesce(pmod(n, 1), 0)`` — recognizably
    constant in the plan text, so they cannot be confused with a data
    shuffle). The final rangepartitioning is the presentation sort,
    not a data shuffle a regression could hide behind."""
    df = q("temperature_mixture_sample")
    s = PI.explain_string(df)
    assert "BroadcastHashJoin" in s
    assert PI.broadcast_join_count(df) >= 1
    # constant keys exchange under a projected alias (_w0 = the
    # coalesce(pmod(..)) projection feeding windowspecdefinition)
    tiny_const = s.count("hashpartitioning(_w0")
    assert s.count("hashpartitioning(") == 1 + tiny_const, s
    assert "hashpartitioning(source" in s, s
    assert "hashpartitioning(doc_id" not in s, s
    # the silenced-warning contract: the constant partition key
    # survived EliminateWindowPartitions (else WindowExec logs the
    # global-window warning a log audit must keep reserved for bugs)
    assert tiny_const >= 1 and "coalesce(pmod(" in s, s


def test_runtime_bloom_filter_injects_on_shuffle_join(spark, sf_dir):
    """Runtime bloom-filter pruning (InjectRuntimeFilter): a selective
    filter on the orders side must materialize as a bloom_filter_agg
    whose might_contain() probe is pushed into the lineitem side BELOW
    the join — so at scale most non-matching rows die at the scan
    instead of crossing the shuffle. The thresholds are lowered to make
    the rule fire at test scale (at 100 TB the defaults — app side
    > 10 GB, creation side < 10 MB — fire on exactly this query shape);
    broadcast is disabled because a broadcast join needs no runtime
    filter. Result must equal the unfiltered-plan join exactly."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    from data_engineer_8_final_project_spark import catalog

    catalog.load(spark, sf_dir)
    sql = """
      SELECT l.l_orderkey, l.l_quantity FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderpriority = '1-URGENT'
    """
    want = spark.sql(sql).count()  # defaults: no bloom at this scale
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        q = spark.sql(sql)
        plan = q._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
        assert q.count() == want  # pruning is transparent to results
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# Registry-wide anti-pattern lint: every batch query, one gate.
# ---------------------------------------------------------------------------
# The targeted tests above pin the plans of the queries most likely to
# regress; this lint closes the gap for the other ~100 — any registered
# query whose plan grows a cartesian product, an unjustified
# nested-loop join, or a row-at-a-time Python UDF fails here by NAME.
# These are the three shapes that are quadratic-or-serial at 100 TB no
# matter how small they look at test scale.

import re as _re

#: fn launches an availableNow replay and returns the materialized
#: sink — its batch plan says nothing about the streaming job. Their
#: plan/state discipline is pinned in tests/test_streaming.py.
_STREAMING_EXECUTES = {
    "dedup_stream",
    "events_by_segment_stream",
    "events_hourly_stream",
    "events_sliding_stream",
    "events_session_stream",
    "user_totals_stateful",
    "view_click_stream_join",
    "standings_stream",
    "event_funnel_stream",
}

#: name -> why a BroadcastNestedLoopJoin is legitimate THERE (the
#: broadcast side must be provably bounded — a grand-total aggregate
#: or a single query row, never fixture data). Every entry below
#: broadcasts EXACTLY ONE row, so the "nested loop" degenerates to a
#: scalar bind against the stream side — constant work per row at any
#: scale.
_NESTED_LOOP_OK: dict[str, str] = {
    "doc_unigram_logprob": "cross x 1-row corpus token total (logprob denominator)",
    "tfidf_topk_terms": "cross x 1-row corpus doc count (IDF denominator)",
    "lang_mixture_weights": "cross x 1-row corpus total (mixture normalizer)",
    "dq_audit": "inner x 1-row DQ counter aggregates (no join key by design)",
    "idle_rich_customers": "theta vs 1-row avg(c_acctbal) scalar (Q22 shape)",
    "embedding_topk": "cross x 1-row query-vector frame",
    "bigram_logprob": "cross x 1-row distinct-token count (add-1 denominator)",
    "bm25_doc_ranking": "cross x two 1-row stats frames (corpus n/avgdl + per-term dfs)",
    "revenue_bootstrap_ci": "cross x 1-row full-sample mean frame (64 replicate rows x 1)",
    "curriculum_order": "cross x 1-row corpus count (decile denominator)",
    "ann_recall_eval": (
        "cross x |Q|-row broadcast query sample (8 rows): the exact "
        "ground-truth pass is Theta(|Q|*N) BY DEFINITION — it is the "
        "baseline recall is measured against, evaluation-time only"
    ),
    "pq_recall_eval": (
        "cross x |Q|-row broadcast query sample (8 rows): the "
        "ground-truth pass is Theta(|Q|*N) by definition, and the ADC "
        "pass fans each corpus row out to |Q| code-lookup scores "
        "(folded literal LUTs, no shuffle) before the per-qid "
        "window caps it at shortlist rows — evaluation-time only"
    ),
}


@pytest.mark.parametrize(
    "name", [n for n in all_queries() if n not in _STREAMING_EXECUTES]
)
def test_registry_wide_plan_lint(q, name):
    plan = PI.explain_string(q(name))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in _NESTED_LOOP_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join (allowlist it here only with a "
            "proof the broadcast side is bounded)"
        )
    assert not _re.search(r"^\(\d+\) BatchEvalPython", plan, _re.M), (
        f"{name}: row-at-a-time Python UDF on a data path"
    )


def test_embedding_near_dup_pair_join_is_shuffled_hash(q):
    """The block-pair self-join sits at the broadcast-threshold
    boundary at test scale, where the planner flapped between
    BroadcastHashJoin and SortMergeJoin run-to-run (3-12 s); the
    SHUFFLE_HASH pin keeps it on the shuffled hash join the operator's
    scale story promises. This test makes that pin load-bearing: a
    regression to SMJ re-opens the non-codegen giant-residual path."""
    plan = PI.explain_string(q("embedding_near_dup_pairs"))
    assert "ShuffledHashJoin" in plan, "block-pair join lost its SHUFFLE_HASH pin"
    assert "SortMergeJoin" not in plan


def test_spread_if_undersplit_is_noop_on_wellsplit_input(spark):
    """The under-split spread must be a NO-OP branch on well-split
    sources — its 100 TB story is that input splits >= cores so the
    round-robin exchange never appears. Pin both directions: a
    single-partition frame gains exactly one RoundRobinPartitioning
    exchange; a frame already at cluster parallelism gains none."""
    from pyspark.sql import functions as F

    from data_engineer_8_final_project_spark.operators.similarity import (
        _spread_if_undersplit,
    )

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    # natively well-split (range with explicit numPartitions plans no
    # exchange of its own, so any RoundRobin in the plan is the spread's)
    wide = spark.range(0, 1000, 1, par)

    spread_narrow = _spread_if_undersplit(narrow.select(F.col("id")))
    spread_wide = _spread_if_undersplit(wide.select(F.col("id")))
    plan_narrow = PI.explain_string(spread_narrow)
    plan_wide = PI.explain_string(spread_wide)
    assert "RoundRobinPartitioning" in plan_narrow, "under-split input not spread"
    assert "RoundRobinPartitioning" not in plan_wide, (
        "well-split input paid a spurious exchange — the no-op branch broke"
    )
    assert spread_wide.rdd.getNumPartitions() == par


def test_spread_if_undersplit_sees_through_file_binpacking(spark, tmp_path):
    """ADVICE r16: many tiny files bin-pack into few FilePartitions, so
    "n_files >= cores" does NOT mean the scan is well-split. With
    minPartitionNum=1, six openCost-dominated files pack into ~one scan
    partition — the estimate must mirror FilePartition's split sizing
    (openCost padding, bytesPerCore floor) and still spread."""
    from pyspark.sql import functions as F

    from data_engineer_8_final_project_spark.operators.similarity import (
        _spread_if_undersplit,
    )

    par = spark.sparkContext.defaultParallelism
    n_files = par + 2
    path = str(tmp_path / "tiny")
    spark.range(n_files).repartition(n_files).write.parquet(path)
    df = spark.read.parquet(path)
    # premise of the old (broken) fast path: at least as many files as cores
    assert len(df.inputFiles()) >= par
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    try:
        # ground truth: Spark really does pack these files under par splits
        assert df.rdd.getNumPartitions() < par
        spread = _spread_if_undersplit(df.select(F.col("id")))
        plan = PI.explain_string(spread)
        assert "RoundRobinPartitioning" in plan, (
            "bin-packed tiny-file scan not spread (old n_files>=par fast path)"
        )
    finally:
        spark.conf.unset("spark.sql.files.minPartitionNum")


def test_weighted_sample_per_source_limit_is_pushed_map_side(q):
    """Same InferWindowGroupLimit contract as per_source_cap: the
    grouped Efraimidis-Spirakis rank<=k must compile to a Partial
    WindowGroupLimit before the source exchange, so each map task
    ships at most k candidate rows per source."""
    s = PI.explain_string(q("weighted_sample_per_source"))
    assert "WindowGroupLimit" in s and "Partial" in s
    assert s.count("hashpartitioning(source") == 1


def test_table_profile_is_single_scan(q):
    """The profiler's pitch is six columns of stats from ONE pass —
    the plan must hold exactly one scan of orders (the oracle's
    UNION ALL form scans six times), and the exact multi-distinct
    must plan as Expand with a partial aggregate before the shuffle."""
    plan = PI.explain_string(q("table_profile"))
    scans = _re.findall(r"^\(\d+\) Scan parquet", plan, _re.M)
    assert len(scans) == 1, "profile re-scans the table"
    assert "Expand" in plan, "multi-distinct lost its Expand shape"
