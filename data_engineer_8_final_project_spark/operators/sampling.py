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

from .text import token_count

#: Portable 60-bit integer from an md5 prefix (same derivation as the
#: dedup/simhash tiers: 15 hex chars fit a signed int64 in both Spark
#: and DuckDB).
def _hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash_bucket(col: Column, n_buckets: int = 100) -> Column:
    """Stable bucket 0..n_buckets-1 from a string column's md5."""
    return _hash60(col) % n_buckets


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
    bucket = hash_bucket(F.col(id_col).cast("string"))
    return documents.select(
        id_col,
        bucket.alias("bucket"),
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
        .alias("split"),
    )


def pack_sequences(
    documents: DataFrame,
    context_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk packing manifest → (doc_id, n_tokens, pack_id, pack_offset).

    The standard LLM pre-training packing: documents are concatenated
    in a deterministic total order (``id_col``) and the token stream is
    chunked into fixed ``context_tokens`` windows. ``pack_id`` is the
    window the document STARTS in; ``pack_offset`` its token offset
    within that window (documents may span a boundary — the training
    loader handles attention masking, the manifest just pins layout).

    One window shuffle for the running sum; at scale the ordering key
    would be (shard, doc_id) so each shard packs independently —
    semantics identical per shard.
    """
    w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        documents.select(id_col, token_count(text_col).alias("n_tokens"))
        .select(
            id_col,
            "n_tokens",
            (start / context_tokens).cast("long").alias("pack_id"),
            (start % context_tokens).alias("pack_offset"),
        )
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
