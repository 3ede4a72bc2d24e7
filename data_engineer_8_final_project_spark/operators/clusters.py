"""Near-duplicate cluster assignment: connected components over pair edges.

The step after any pairwise dedup tier: near-dup PAIRS (from jaccard /
simhash / minhash) must become CLUSTERS so one canonical document per
component survives. Components are computed by iterative min-label
propagation — each round every vertex adopts the smallest label among
itself and its neighbors; at the fixpoint every component is labeled by
its minimum doc_id. The fixpoint is unique and order-independent, so
the result is deterministic and a DuckDB recursive CTE can replay it
value-exact.

Scale shape: each round is one join edges⋈labels + one min-aggregation
— all key-partitioned shuffles, no driver data; rounds needed = graph
diameter (near-dup components are overwhelmingly tiny cliques, so 2–3
rounds in practice; the loop caps at ``max_iters`` and checks
convergence with a single scalar aggregate per round). For planet-scale
graphs swap the loop body for the large-star/small-star variant — same
interface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_iters: int = 10,
) -> DataFrame:
    """Label every vertex with its component's min id → (doc_id, cluster_id).

    ``vertices``: one column ``doc_id`` (singletons allowed — they come
    out as their own cluster). ``edges``: columns ``doc_a``/``doc_b``.
    """
    # undirected: propagate both ways. Persist — the edge list joins
    # against labels EVERY round; without it each iteration recomputes
    # the (expensive) upstream pair-finding lineage from scratch.
    fwd = edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    both_cached = fwd.unionByName(
        edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    ).persist()
    # Right-size the loop frames: the near-dup edge list is usually far
    # smaller than the corpus, and per-round task overhead at the
    # session's full shuffle width dominates the tiny joins (AQE cannot
    # coalesce under the persisted frames here). ~100k edges per
    # partition, never above the session's shuffle width — so a truly
    # large graph keeps full parallelism. The count also materializes
    # the persist, so round 1 never recomputes the edge lineage.
    spark = vertices.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = max(1, min(width, both_cached.count() // 100_000 + 1))
    both = both_cached.coalesce(parts)
    labels = (
        vertices.select("doc_id", F.col("doc_id").alias("cluster_id"))
        .coalesce(parts)
        .persist()
    )
    # convergence probe: the label sum strictly decreases until the
    # fixpoint (min-propagation is monotone) — one scalar per round,
    # and persisting each generation keeps the lineage flat so round k
    # never recomputes rounds 1..k-1
    old_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
    for _ in range(max_iters):
        msgs = (
            both.join(labels, both.src == labels.doc_id)
            .select(F.col("dst").alias("doc_id"), "cluster_id")
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .persist()
        )
        new_sum = new_labels.agg(F.sum("cluster_id")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if new_sum == old_sum:
            break
        old_sum = new_sum
    both_cached.unpersist()
    # hand back a lineage-free copy and release the loop cache — the
    # persisted generations would otherwise pin executor storage for
    # the life of the session (localCheckpoint blocks are freed by GC)
    out = labels.localCheckpoint(eager=True)
    labels.unpersist()
    return out
