"""Similarity search over the ``embeddings`` table (array<float> column).

Two paths:

- **Brute-force cosine top-k** — the correctness baseline: broadcast
  the (tiny) query vector, compute cosine with built-in higher-order
  array functions (zip_with + aggregate → JVM-side, codegen'd), then
  TakeOrderedAndProject for the top-k. Linear scan; at 100 TB this is
  one pass over the embedding column with no shuffle at all (top-k is
  per-partition + driver merge of k rows).
- **LSH-bucketed ANN** — the scale path: sign-random-projection
  (SimHash-style) bucket keys computed from deterministic hyperplanes,
  candidate join on bucket key, exact cosine re-rank within buckets.
  Trades recall for a shuffle bounded by bucket sizes.

Everything casts float → double before arithmetic so results are
reproducible and match a double-precision oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (built-ins only)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame, query_vec_id: int, k: int = 10, decimals: int = 6
) -> DataFrame:
    """Exact cosine top-k against the vector with ``query_vec_id``.

    The query vector row is cross-joined (broadcast — it is one row);
    the scan stays distributed and shuffle-free.
    """
    emb = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    return (
        emb.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("v"), F.col("qv")), decimals).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.9, decimals: int = 6
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cos ≥ threshold).

    All-pairs formulation — correct but O(n²); appropriate up to ~10⁵
    vectors. Beyond that use :func:`ann_lsh_topk`'s bucketing to block
    the self-join.
    """
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b", F.round(cosine(F.col("va"), F.col("vb")), decimals).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane.

    Components derive from a fixed integer mix (splitmix64-style
    constants) — stable across runs/engines without RNG state.
    """
    comps = []
    for j in range(dim):
        h = (plane_idx * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        h ^= h >> 31
        comps.append(((h % 2001) - 1000) / 1000.0)  # [-1, 1], deterministic
    return comps


def simhash_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-random-projection bucket id (0..2^n_planes-1) for a vector.

    Vectors with high cosine similarity agree on most hyperplane signs,
    so they land in the same bucket with high probability.
    """
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(c) for c in _hyperplane(dim, p)])
        bit = (_dot(vec, plane) >= 0).cast("int")
        bucket = bucket * 2 + bit
    return bucket


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    decimals: int = 6,
) -> DataFrame:
    """ANN top-k: restrict the exact scan to the query's LSH bucket.

    Recall < 1 by construction (bucket boundary losses); the candidate
    set shrinks ~2^n_planes-fold. Same output schema as
    :func:`brute_force_topk` so callers can A/B recall.
    """
    emb = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("bucket", simhash_bucket(F.col("v"), dim, n_planes))
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    return (
        emb.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("v"), F.col("qv")), decimals).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
