"""Deterministic corpus sampling / splitting / packing operators.

Training-data plumbing that must be REPRODUCIBLE across engines, runs
and cluster sizes — so nothing here uses an RNG. Splits and samples key
off md5 of a stable id (the same portable-hash idiom the dedup tiers
use), and packing keys off an explicit total order. All pure built-in
expressions: codegen'd, one window/aggregation shuffle at most, and
value-exact reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.window import WindowSpec

from .text import token_count, tokens

#: Portable 60-bit integer from an md5 prefix (same derivation as the
#: dedup/simhash tiers: 15 hex chars fit a signed int64 in both Spark
#: and DuckDB).
def _hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash_bucket(col: Column, n_buckets: int = 100) -> Column:
    """Stable bucket 0..n_buckets-1 from a string column's md5."""
    return _hash60(col) % n_buckets


def tiny_global_window(anchor: Column) -> WindowSpec:
    """Single-partition window for METADATA-SIZED frames only.

    Partitioning by a constant is semantically identical to an empty
    partition spec, but gives WindowExec a defined partition key so the
    "No Partition Defined for Window operation" warning never fires —
    that warning must stay reserved for REAL scale bugs (a global sort
    of data rows through one task), not for these by-design windows
    over |partitions|- or |sources|-row aggregates.

    A plain ``F.lit(0)`` does NOT work: Spark 4's
    ``EliminateWindowPartitions`` optimizer rule strips foldable
    partition expressions, restoring the empty spec (and the warning).
    ``coalesce(pmod(anchor, 1), 0)`` is constant-VALUED (0 for every
    row, nulls included, so all rows still land in one partition and
    prefix sums stay global) but not constant-FOLDABLE — its child is
    a real column — so the rule keeps it. ``anchor`` can be any column
    of the frame. Every call site of this helper must window over a
    bounded aggregate, never data rows; tests/test_plans.py pins that
    shape.
    """
    return Window.partitionBy(F.coalesce(F.pmod(anchor, F.lit(1)), F.lit(0)))


def hash_split(
    documents: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment → (doc_id, bucket, split).

    The standard leakage-safe split: bucket = md5(id) mod 100, split by
    fixed percentile cut. Stable under corpus growth (a document's
    split never depends on other rows, partitioning, or order) — the
    property a random ``sample()`` call cannot give — and exactly
    reproducible by any engine that has md5.
    """
    return documents.select(
        id_col,
        hash_bucket(F.col(id_col).cast("string")).alias("bucket"),
        split_expr(id_col, train_pct, val_pct).alias("split"),
    )


def split_expr(id_col: str = "doc_id", train_pct: int = 80, val_pct: int = 10) -> Column:
    """The :func:`hash_split` assignment as a pure COLUMN expression.

    Split membership is a function of the id alone, so a frame that
    already carries the id can take the split as a ``withColumn``
    instead of joining the ``hash_split`` frame back on the id — one
    narrow map versus an exchange + join (r16; training_manifest)."""
    bucket = hash_bucket(F.col(id_col).cast("string"))
    return (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )


def running_token_start(
    docs_with_tokens: DataFrame,
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    part_cols: tuple[str, ...] = (),
    bucket_docs: int = 256,
) -> DataFrame:
    """Two-level distributed prefix sum → input + ``_pack_start`` column.

    ``_pack_start`` = Σ tokens of all earlier rows in ``order_col``
    order (within ``part_cols``) — exactly the global running-sum
    window, but never serialized through one task:

    1. rows bucket by ``floor(order_col / bucket_docs)`` — contiguous
       ranges of the sort order, so bucket order == global order;
    2. a local prefix sum runs per (part_cols, bucket) — many tasks;
    3. per-bucket token totals (a ~|buckets|-row aggregate) get their
       own prefix sum and broadcast-join back as bucket offsets.

    ``_pack_start`` = local prefix + bucket offset. Identical output
    for ANY bucket_docs, so oracles never see the parameter. Size
    ``bucket_docs`` ≈ corpus_docs / (1k..10k) at scale: the offsets
    side stays a trivially broadcastable few-thousand rows while each
    local window holds millions of rows per task at most.
    """
    bucket = F.floor(F.col(order_col) / F.lit(bucket_docs)).cast("long")
    df = docs_with_tokens.withColumn("_pack_bucket", bucket)
    keys = [*part_cols, "_pack_bucket"]
    totals = df.groupBy(*keys).agg(F.sum(tokens_col).alias("_bucket_total"))
    w_off = (
        (
            Window.partitionBy(*part_cols)
            if part_cols
            else tiny_global_window(F.col("_pack_bucket"))
        )
        .orderBy("_pack_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *keys,
        F.coalesce(F.sum("_bucket_total").over(w_off), F.lit(0)).alias("_bucket_offset"),
    )
    w_loc = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(tokens_col).over(w_loc), F.lit(0))
    return (
        df.join(F.broadcast(offsets), keys)
        .withColumn("_pack_start", local + F.col("_bucket_offset"))
        .drop("_pack_bucket", "_bucket_offset")
    )


def pack_sequences(
    documents: DataFrame,
    context_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_docs: int = 256,
) -> DataFrame:
    """Concat-and-chunk packing manifest → (doc_id, n_tokens, pack_id, pack_offset).

    The standard LLM pre-training packing: documents are concatenated
    in a deterministic total order (``id_col``) and the token stream is
    chunked into fixed ``context_tokens`` windows. ``pack_id`` is the
    window the document STARTS in; ``pack_offset`` its token offset
    within that window (documents may span a boundary — the training
    loader handles attention masking, the manifest just pins layout).

    The running sum is the two-level prefix sum above — bucketed local
    windows plus broadcast bucket offsets — so packing parallelizes
    instead of serializing the corpus through a single global-window
    task (the round-2 scale flaw, fixed).
    """
    toks = documents.select(id_col, token_count(text_col).alias("n_tokens"))
    packed = running_token_start(toks, order_col=id_col, bucket_docs=bucket_docs)
    start = F.col("_pack_start")
    return packed.select(
        id_col,
        "n_tokens",
        (start / context_tokens).cast("long").alias("pack_id"),
        (start % context_tokens).alias("pack_offset"),
    )


def distributed_row_number(
    df: DataFrame,
    sort_cols: tuple[str, ...],
    rank_col: str = "rnk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1..N rank over a total order WITHOUT a single-task window.

    ``row_number() OVER (ORDER BY ...)`` plans as Exchange
    SinglePartition → one task sorts everything. This is the
    distributed equivalent: ``repartitionByRange`` on the sort key
    (partition order == global order), a local row_number per
    partition, then per-partition row counts — a |partitions|-row
    aggregate — prefix-summed and broadcast back as offsets. Output is
    identical for any partition count because ``sort_cols`` must be a
    total order (tiebreak-complete), which also makes it independent
    of where the range sampler lands the boundaries.
    """
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *sort_cols)
    else:
        ranged = df.repartitionByRange(*sort_cols)
    ranged = ranged.withColumn("_rank_pid", F.spark_partition_id())
    w_local = Window.partitionBy("_rank_pid").orderBy(*sort_cols)
    local = ranged.withColumn("_local_rnk", F.row_number().over(w_local))
    counts = local.groupBy("_rank_pid").agg(F.count(F.lit(1)).alias("_n"))
    w_off = (
        tiny_global_window(F.col("_rank_pid"))
        .orderBy("_rank_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_rank_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_rank_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_rank_pid")
        .withColumn(rank_col, (F.col("_local_rnk") + F.col("_rank_offset")).cast("long"))
        .drop("_rank_pid", "_local_rnk", "_rank_offset")
    )


def stratified_cap_sample(
    documents: DataFrame,
    stratum_col: str = "lang",
    cap: int = 200,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified downsample: cap every stratum at ~``cap``
    docs → (doc_id, stratum, bucket, rate_bp).

    The corpus-rebalancing primitive (cap overrepresented languages /
    sources before training). Per-stratum acceptance rate = min(1,
    cap/count), quantized to basis points; a document is kept iff its
    stable md5 bucket (0..9999) falls under the rate — so membership is
    a pure function of (id, stratum counts), reproducible anywhere,
    and sampling error is the quantization bound, not RNG variance.

    Shape: one count aggregation over the stratum key (tiny result,
    broadcast back) + a stateless filter — no data shuffle at all.
    """
    bucket = (_hash60(F.col(id_col).cast("string")) % 10000).alias("bucket")
    rates = (
        documents.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            stratum_col,
            # explicit floor: Spark's double->long cast truncates but
            # DuckDB's CAST rounds — floor() agrees everywhere
            F.least(F.lit(10000), F.floor(F.lit(10000) * cap / F.col("n")).cast("long")).alias("rate_bp"),
        )
    )
    return (
        documents.select(id_col, stratum_col, bucket)
        .join(F.broadcast(rates), stratum_col)
        .filter(F.col("bucket") < F.col("rate_bp"))
        .select(id_col, F.col(stratum_col).alias("stratum"), "bucket", "rate_bp")
    )


def per_key_cap(
    df: DataFrame,
    key_col: str = "source",
    cap: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` rows per key, picked by stable hash order →
    (id, key, pick_rank).

    The per-domain / per-source cap every web-corpus pipeline applies
    (no single site may dominate the training mix). Which rows survive
    is a pure function of their ids — md5 order, id tiebreak — so the
    selection is reproducible across engines, runs and cluster sizes,
    unlike ``ORDER BY rand() LIMIT cap``.

    Scale shape — written as ONE window on purpose: Catalyst's
    rank-limit pushdown (InferWindowGroupLimit, Spark 3.5+) compiles
    ``row_number() <= cap`` into a map-side Partial WindowGroupLimit
    BEFORE the exchange, so each input partition ships at most ``cap``
    rows per key and a hot domain's shuffle input is bounded by
    cap × partitions, never by key frequency — exactly the hand-built
    two-phase top-k, with one shuffle instead of two (a hand-rolled
    (key, partition-id) pre-rank plans a second exchange; measured plan
    is strictly worse). tests/test_plans.py pins the Partial limit so
    a regression that silently reverts to sort-everything fails loudly.
    """
    pick = _hash60(F.col(id_col).cast("string")).alias("_pick")
    w = Window.partitionBy(key_col).orderBy("_pick", id_col)
    return (
        df.select(id_col, key_col, pick)
        .withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("pick_rank") <= cap)
        .select(id_col, key_col, "pick_rank")
    )


def cluster_balanced_sample(
    emb: DataFrame,
    k: int = 8,
    rounds: int = 2,
    cap: int = 50,
) -> DataFrame:
    """Diversity-preserving corpus selection: k-means topic bucketing
    composed with a deterministic per-cluster quota → (vec_id, label,
    cluster, pick_rank).

    The cluster-balanced selection step of an embedding-curation
    pipeline (pick ≤ ``cap`` exemplars per semantic cluster so no topic
    dominates the training mix — the same rebalancing idea as
    :func:`per_key_cap`, but the key is LEARNED from the embedding
    geometry rather than read from a column). Which rows survive is a
    pure function of (vec_id, centroid trajectory): cluster membership
    comes from the integer fixed-point Lloyd run
    (operators/clusters.kmeans_fixed_point — bit-exact on any shuffle
    width) and the within-cluster pick order is the stable md5 hash
    with vec_id tiebreak, so the sample replays value-exact on any
    engine.

    Scale shape: the k-means rounds are broadcast-Lloyd (map-side
    assignment against k·dim literal centroids, one k·dim-cell update
    aggregate per round — no data-row joins), and the quota is ONE
    window whose ``row_number() <= cap`` compiles to a map-side Partial
    WindowGroupLimit (InferWindowGroupLimit, Spark 3.5+), so each input
    partition ships at most ``cap`` rows per cluster into the single
    (cluster)-keyed exchange — a hot cluster's shuffle input is bounded
    by cap × partitions, never by cluster population.
    """
    from .clusters import kmeans_fixed_point

    labeled = kmeans_fixed_point(emb, k=k, rounds=rounds)
    w = Window.partitionBy("cluster").orderBy("_pick", "vec_id")
    return (
        labeled.withColumn("_pick", _hash60(F.col("vec_id").cast("string")))
        .withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("pick_rank") <= cap)
        .select("vec_id", "label", "cluster", "pick_rank")
    )


def temperature_mixture_sample(
    documents: DataFrame,
    stratum_col: str = "source",
    alpha_sqrt: bool = True,
    target: int = 250,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-weighted cross-source sampling → (id, stratum,
    bucket, wt_bp, rate_bp).

    The corpus-mixing primitive: sources are re-weighted by
    ``(n_s / N) ** alpha`` (alpha = 0.5 here — the square-root
    temperature most data-mixture recipes start from), normalized, and
    each source contributes ``p_s x target`` documents, chosen by the
    stable md5 bucket so membership is a pure function of
    (id, source counts).

    Determinism discipline: the per-source weight is quantized to an
    INTEGER basis-point value (``wt_bp = floor(1e4 x sqrt(n_s/N))``)
    BEFORE normalization, so the normalizing sum is exact integer
    arithmetic — never a float sum whose rounding depends on the
    engine's reduction order. sqrt / * / / on doubles are IEEE
    correctly-rounded, so identical expression trees give identical
    doubles in Spark and DuckDB and the final floor cannot straddle.

    Shape: one tiny per-source count aggregate (rows = |sources| —
    bounded metadata, window over it is trivially safe), broadcast
    back, stateless filter. No data shuffle.
    """
    assert alpha_sqrt, "only alpha=0.5 (sqrt temperature) is implemented"
    bucket = (_hash60(F.col(id_col).cast("string")) % 10000).alias("bucket")
    counts = documents.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n"))
    w_all = tiny_global_window(F.col("n"))
    rates = (
        counts.withColumn("total", F.sum("n").over(w_all))
        .withColumn(
            "wt_bp",
            F.floor(F.lit(10000) * F.sqrt(F.col("n") / F.col("total"))).cast("long"),
        )
        .withColumn("sum_wt", F.sum("wt_bp").over(w_all))
        .select(
            stratum_col,
            "wt_bp",
            F.least(
                F.lit(10000),
                F.floor(
                    F.lit(10000.0) * F.col("wt_bp") * target / (F.col("sum_wt") * F.col("n"))
                ).cast("long"),
            ).alias("rate_bp"),
        )
    )
    return (
        documents.select(id_col, stratum_col, bucket)
        .join(F.broadcast(rates), stratum_col)
        .filter(F.col("bucket") < F.col("rate_bp"))
        .select(
            id_col, F.col(stratum_col).alias("stratum"), "bucket", "wt_bp", "rate_bp"
        )
    )


def importance_weights(
    documents: DataFrame,
    is_target: Column,
    n_buckets: int = 64,
    decimals: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al., arXiv:2302.03169):
    per-document log-likelihood ratio of hashed unigram features
    between a target slice and the raw corpus.

    The data-selection recipe behind quality-targeted pre-training
    mixes: fit two bag-of-hashed-unigram models — one on the documents
    matching ``is_target``, one on everything — and score each document
    by its mean per-token ``ln p_target(bucket) − ln p_raw(bucket)``
    (add-1 smoothing; the length-normalized form so short docs aren't
    penalized). Positive ⇒ the document looks more like the target
    distribution than the corpus average.

    Scale design (100 TB): both feature models come from ONE
    ``n_buckets``-row aggregation over a cached token stream —
    map-side partial combine collapses the tokens to ≤ ``n_buckets``
    rows per task, so the single collect is bounded model parameters
    exactly like the IVF centroids, never data (advisor finding,
    round 6: the raw and target models were previously fit as two
    separate eager passes, a redundant full corpus scan). The scoring
    pass is then one more scan of the same narrow projection with a
    literal-array lookup (zero joins) plus a single ``doc_id``-keyed
    aggregation — two total scans of a column-pruned parquet read;
    deliberately NOT cached, because persisting a corpus-sized token
    explode costs more memory/disk churn at cluster scale than the
    narrow rescan it saves. Buckets use the repo's portable md5 idiom
    so any engine replays membership.
    """
    import math

    tok = documents.select(
        F.col(id_col), is_target.alias("_tgt"), F.explode(tokens("text")).alias("tok")
    )
    tok = tok.withColumn("bucket", hash_bucket(F.col("tok"), n_buckets))
    # ONE bounded collect: both n_buckets-row feature models at once
    model_rows = (
        tok.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("n_tgt"),
        )
        .collect()
    )
    raw = {r["bucket"]: r["n_raw"] for r in model_rows}
    tgt = {r["bucket"]: int(r["n_tgt"]) for r in model_rows}
    total_raw = sum(raw.values())
    total_tgt = sum(tgt.values())
    lr = [
        math.log((tgt.get(b, 0) + 1) / (total_tgt + n_buckets))
        - math.log((raw.get(b, 0) + 1) / (total_raw + n_buckets))
        for b in range(n_buckets)
    ]
    lr_sql = "array(" + ",".join(repr(x) + "D" for x in lr) + ")"
    return (
        tok.withColumn("lr", F.expr(f"element_at({lr_sql}, CAST(bucket + 1 AS INT))"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # + 0.0 canonicalizes IEEE negative zero (-0.0 + 0.0 == +0.0):
            # a doc whose mean log-ratio rounds to zero from below would
            # otherwise hash as "-0.0" in one engine and "0.0" in the other
            (F.round(F.avg("lr"), decimals) + F.lit(0.0)).alias("importance"),
        )
        .withColumn("is_target_like", F.col("importance") > 0.0)
    )
