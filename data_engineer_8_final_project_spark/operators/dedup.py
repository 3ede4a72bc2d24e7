"""Deduplication operators over ``documents``.

Three tiers, in increasing fuzziness — all designed for the 100 TB
path (shuffle on content-hash / shingle keys, never a driver collect):

1. **Exact** — group by content hash (md5), keep min doc_id. One
   shuffle on a uniformly-distributed key; the canonical "hash-groupBy"
   dedup.
2. **N-gram Jaccard** — shingle → explode → self-join on shingle →
   per-pair intersection count → Jaccard. The shingle join IS the LSH
   "band" idea with bands = every shingle; frequency-capping the
   shingle key (drop shingles occurring in > max_df docs) bounds the
   candidate-pair blowup exactly like dropping stop-bands in MinHash
   LSH. Fully SQL-expressible → strong DuckDB oracle.
3. **MinHash-LSH** — pyspark.ml MinHashLSH over a HashingTF of
   shingles; approximate, not SQL-expressible (registered rows-only).
   The scale path when even the capped shingle join is too big.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, shingles


def exact_dedup_groups(documents: DataFrame) -> DataFrame:
    """Group exact-duplicate texts: canonical (min) doc_id + copy count.

    Hashes the text first so the shuffle key is a short uniform md5,
    not the full document body — at 100 TB the shuffle moves 32-byte
    keys + ids, never the text.
    """
    return (
        documents.select(F.col("doc_id"), fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def jaccard_candidate_pairs(
    documents: DataFrame,
    shingle_n: int = 3,
    min_shared: int = 2,
    max_df: int = 100,
) -> DataFrame:
    """Near-duplicate candidate pairs by n-gram Jaccard similarity.

    Returns (doc_a, doc_b, shared_shingles, jaccard) with doc_a < doc_b.
    ``max_df`` drops shingles present in more than that many documents
    before the self-join — the skew/blowup guard: a stop-shingle shared
    by 10 k docs would alone produce 10k²/2 candidate pairs.
    """
    sh = (
        documents.select(
            "doc_id", F.explode(F.array_distinct(shingles("text", shingle_n))).alias("sh")
        )
    )
    # distinct shingle count per doc (for the union term of Jaccard)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    # frequency cap: drop stop-shingles before the join
    rare = sh.join(
        sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") <= max_df),
        "sh",
    ).select("doc_id", "sh")

    a = rare.select(F.col("doc_id").alias("doc_a"), "sh")
    b = rare.select(F.col("doc_id").alias("doc_b"), "sh")
    pairs = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
        .filter(F.col("shared_shingles") >= min_shared)
    )
    sz_a = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        pairs.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_shingles",
            F.round(
                F.col("shared_shingles")
                / (F.col("n_a") + F.col("n_b") - F.col("shared_shingles")),
                4,
            ).alias("jaccard"),
        )
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    shingle_n: int = 3,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
    max_distance: float = 0.6,
) -> DataFrame:
    """Approximate near-dup pairs via MinHash-LSH (pyspark.ml).

    The scale path: cost is O(docs × hash_tables), independent of pair
    count until the final bucket join. Jaccard distance threshold
    ``max_distance`` (= 1 − similarity). Not SQL-expressible →
    registered with a rows-only check.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = documents.select("doc_id", shingles("text", shingle_n).alias("sh")).filter(
        F.size("sh") > 0
    )
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=num_features)
    feats = tf.transform(docs)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, max_distance, distCol="jaccard_dist")
    return (
        pairs.select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .orderBy("doc_a", "doc_b")
    )
