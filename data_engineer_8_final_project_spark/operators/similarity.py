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

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..stage import stage_frame

_SIZE_SUFFIX = {
    "kb": 1 << 10, "mb": 1 << 20, "gb": 1 << 30, "tb": 1 << 40,
    "b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40,
}  # longest suffixes first so '128mb' does not strip only the 'b'


def _bytes_conf(spark, key: str) -> int:
    """A byte-size conf value as an int (accepts '134217728b', '128m', …)."""
    raw = str(spark.conf.get(key)).strip().lower()
    for suf, mult in _SIZE_SUFFIX.items():
        if raw.endswith(suf):
            return int(raw[: -len(suf)]) * mult
    return int(raw)


#: Derived-cell policy for the corpus-wide knn family (VERDICT r8
#: item 3: "make the benched shape the production shape"). With cells
#: PINNED, within-cell pair volume grows as n²/cells — SCALE_r08
#: measured knn_graph at 13.9× wall for 8× data. Scaling cells
#: LINEARLY with corpus size keeps the average cell near CELL_TARGET
#: vectors, so pair volume stays ~n·CELL_TARGET (linear) and per-task
#: work is bounded by CELL_TARGET². The floor keeps tiny fixtures on
#: the exact shape every green driver row was recorded against: all
#: three fixture SFs (500 / 500 / 2000 vectors) derive 16 cells, so
#: registered-query VALUES are unchanged at every oracle-checked
#: scale, while the 8×/64× scale runs (16k/128k vectors) derive
#: 125/1000 cells — the production shape is now what gets benched.
CELL_TARGET = 128
CELL_FLOOR = 16
#: Above this cell count the flat argmin's n_cells·dim per-row
#: assignment cost dominates and knn_graph switches to hierarchical
#: routing ((n_parents + group)·dim per row; scripts/knn_routing_ab.py
#: measured 1.76× at edge agreement 1.0 on 8×/256 cells). Routing is
#: approximate ONLY near cell boundaries — same leaf set, and it can
#: never fire at an oracle-checked scale (all fixtures derive
#: CELL_FLOOR cells), so strict-hash replay is preserved where it is
#: enforced.
ROUTING_MIN_CELLS = 64


def derived_n_cells(n_rows: int) -> int:
    """Corpus-size-derived cell count: ``max(CELL_FLOOR, n // CELL_TARGET)``.

    Replayed verbatim by every knn-family oracle as
    ``GREATEST(16, CAST(COUNT(*) // 128 AS BIGINT))`` — both sides
    floor-divide nonnegative integers, so the derivation is bit-exact.
    """
    return max(CELL_FLOOR, n_rows // CELL_TARGET)


def routing_parents(n_cells: int) -> int | None:
    """Hierarchical-routing parent count for knn_graph: ``isqrt(n_cells)``
    once the cell count clears ROUTING_MIN_CELLS, else None (flat
    argmin). √cells parents × √cells leaves per group minimizes the
    (n_parents + group)·dim assignment term."""
    import math

    return math.isqrt(n_cells) if n_cells >= ROUTING_MIN_CELLS else None


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (built-ins only)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def dot_sql_str(a: str, b: str, dim: int) -> str:
    """Flat left-associated dot-product SQL over two named array
    columns — the codegen-friendly unrolled form shared by
    :func:`cosine_sql` and the prenormalized pair paths."""
    return " + ".join(
        f"element_at({a}, {i}) * element_at({b}, {i})" for i in range(1, dim + 1)
    )


def cosine_sql(a: str, b: str, dim: int) -> Column:
    """:func:`cosine` over NAMED array columns, unrolled to flat
    arithmetic for a known ``dim``.

    Bit-identical to the HOF form — aggregate's ``(((0+t0)+t1)+..)``
    equals the flat left-associated sum because ``0.0 + x == x`` in
    IEEE — but the flat expression participates in whole-stage codegen
    while higher-order lambdas are interpreted per element. On
    per-PAIR verify paths (millions of candidate pairs × 64 dims) the
    interpreted form dominated the query: measured ~10× end-to-end on
    the banded-LSH near-dup verify at sf0.1.

    r14 caveat: the full 3-dot form fused into a JOIN consume exceeds
    Janino's 64 KB method limit at dim=64 (silent interpreted
    fallback). Pair stages must hoist the per-side norms below the
    shuffle (``sqrt(dot_sql_str(v, v, dim))`` per row — bit-identical)
    and keep only the cross dot + divide per pair; the tripwire is
    tests/test_similarity.py::test_pair_cosine_stages_compile.
    """
    dot = dot_sql_str(a, b, dim)
    na = dot_sql_str(a, a, dim)
    nb = dot_sql_str(b, b, dim)
    return F.expr(f"({dot}) / (sqrt({na}) * sqrt({nb}))")


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


def _dot_lit_sql(vec_sql: str, lit: list[float]) -> str:
    """``dot(vec, literal)`` as SQL text — aggregate(zip_with) over an
    inlined double-literal array: the same left-to-right IEEE sum as
    DuckDB's ``list_dot_product`` (0.0 + x == x bit-exactly), so scores
    computed against collected model vectors replay in the oracle."""
    arr = "array(" + ",".join(_sql_d(x) for x in lit) + ")"
    return (
        f"aggregate(zip_with({vec_sql}, {arr}, (x, y) -> x * y), "
        f"0.0D, (a, b) -> a + b)"
    )


def mmr_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 8,
    lam: float = 0.7,
    div: float = 0.3,
    decimals: int = 6,
) -> DataFrame:
    """Maximal-Marginal-Relevance diverse top-k (Carbonell & Goldstein,
    SIGIR 1998): greedy selection maximizing ``lam·cos(d, q) −
    div·max_{s∈selected} cos(d, s)`` — the diversity-aware data
    selection a training-set builder wants when the plain top-k is k
    paraphrases of the same document.

    Determinism contract: scores are ROUNDED to ``decimals`` and ties
    break on ascending vec_id, so every greedy step is replayable by
    the DuckDB recursive-CTE oracle (same doubles: relevance and
    pairwise cosines are aggregate(zip_with) left-to-right sums, the
    selected vectors are collected once and re-inlined as literals, and
    ``lam``/``div`` are passed as independent literals — never derived
    as ``1 - lam``, whose Python repr would differ from the SQL
    literal's parse).

    Scale shape: the candidate frame is staged once
    (localCheckpoint locally; a written top-N relevance gate at cluster
    scale — MMR over 100 TB runs on a bounded pre-selected candidate
    set, not the raw corpus); each of the k steps is one distributed
    scan + TakeOrdered(1) and one BOUNDED collect of a single row
    (model-parameter class, same budget as the IVF centroid collects).
    k is a constant, so the driver loop is k bounded probes, not a
    data-dependent iteration.
    """
    spark = embeddings.sparkSession
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # bounded: one row — the query vector becomes a literal
    qrow = emb.filter(F.col("vec_id") == query_vec_id).head()
    if qrow is None:
        raise ValueError(
            f"mmr_topk: query_vec_id={query_vec_id!r} not found in embeddings"
        )
    qv = [float(x) for x in qrow["v"]]
    q_arr = "array(" + ",".join(_sql_d(x) for x in qv) + ")"
    selfdot = "aggregate(zip_with(v, v, (x, y) -> x * y), 0.0D, (a, b) -> a + b)"
    qself = (
        f"aggregate(zip_with({q_arr}, {q_arr}, (x, y) -> x * y), "
        f"0.0D, (a, b) -> a + b)"
    )
    cand = (
        emb.filter(F.col("vec_id") != query_vec_id)
        .withColumn(
            "rel",
            F.expr(f"({_dot_lit_sql('v', qv)}) / (sqrt({selfdot}) * sqrt({qself}))"),
        )
        # staged once: k scans read the staged frame instead of
        # re-evaluating the relevance expression per step
        .transform(stage_frame)
    )
    picked: list[tuple[int, int, float]] = []
    picked_vecs: list[list[float]] = []
    for step in range(1, k + 1):
        if not picked_vecs:
            score = F.expr(f"round({_sql_d(lam)} * rel, {decimals})")
        else:
            sims = [
                f"(({_dot_lit_sql('v', pv)}) / (sqrt({selfdot}) * "
                f"sqrt({_dot_lit_sql_self(pv)})))"
                for pv in picked_vecs
            ]
            maxsim = f"greatest({', '.join(sims)})" if len(sims) > 1 else sims[0]
            score = F.expr(
                f"round({_sql_d(lam)} * rel - {_sql_d(div)} * {maxsim}, {decimals})"
            )
        row = (  # bounded: one row per step, k steps total
            cand.filter(~F.col("vec_id").isin([p[1] for p in picked]))
            .select("vec_id", "v", score.alias("score"))
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .head()
        )
        if row is None:  # candidate pool exhausted before k picks
            break
        picked.append((step, row["vec_id"], float(row["score"])))
        picked_vecs.append([float(x) for x in row["v"]])
    return spark.createDataFrame(picked, "mmr_rank int, vec_id long, score double")


def _dot_lit_sql_self(lit: list[float]) -> str:
    """``dot(literal, literal)`` as SQL text (see :func:`_dot_lit_sql`):
    evaluated symbolically by the engine, not pre-folded in Python, so
    the oracle's ``list_dot_product(e.v, e.v)`` over the stored vector
    sees bit-identical factors."""
    arr = "array(" + ",".join(_sql_d(x) for x in lit) + ")"
    return (
        f"aggregate(zip_with({arr}, {arr}, (x, y) -> x * y), "
        f"0.0D, (a, b) -> a + b)"
    )


def brute_force_topk_gemm(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Arrow-batch twin of :func:`brute_force_topk`: the exact cosine
    scan as a per-partition numpy GEMV instead of an unrolled
    whole-stage-codegen dot tree.

    This is the sanctioned "drop to Python" shape for dense numeric
    kernels: ``mapInPandas`` streams Arrow batches, each batch scores
    as ONE ``(n, dim) @ (dim,)`` BLAS call, and only each batch's
    local top-k survives to the global TakeOrdered — the candidate cut
    keeps rows-crossing-the-exchange at k·batches regardless of corpus
    size. At 2000×64 the codegen tree wins (JVM stays in one pass, no
    Arrow hop); the GEMV amortizes as vectors×dim grow — the crossover
    is measured in ``tests/test_extended_ops.py`` only for equality,
    and in SURVEY §10 for wall clock.

    NOT oracle-registered: BLAS accumulates partials in SIMD order,
    not left-to-right, so the last float bits are not portable to a
    DuckDB replay. The pytest gate instead pins row-for-row agreement
    with the codegen twin after 6-dp rounding on the fixture corpus.
    """
    import numpy as np
    import pandas as pd

    emb = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    # bounded collect: the query vector is a one-row model parameter
    qv = np.asarray(
        emb.filter(F.col("vec_id") == query_vec_id).select("v").collect()[0]["v"],
        dtype=np.float64,
    )
    qnorm = float(np.sqrt(qv @ qv))

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64, copy=False)
            cos = np.round(
                (m @ qv) / (np.sqrt((m * m).sum(axis=1)) * qnorm), decimals
            )
            out = pd.DataFrame(
                {"vec_id": pdf["vec_id"], "label": pdf["label"], "cosine": cos}
            )
            # local candidate cut: only this batch's top-k can matter
            yield out.sort_values(
                ["cosine", "vec_id"], ascending=[False, True]
            ).head(k)

    return (
        emb.filter(F.col("vec_id") != query_vec_id)
        .mapInPandas(score, "vec_id long, label int, cosine double")
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    decimals: int = 6,
    n_blocks: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cos ≥ threshold).

    Exact all-pairs semantics, **block-partitioned**: vectors are
    assigned to ``n_blocks`` blocks by ``vec_id % n_blocks``; the tiny
    block-pair table (``B(B+1)/2`` rows, broadcast) replicates each
    side so every unordered vector pair meets in exactly one
    ``(block_a, block_b)`` task. The pair-producing join is an
    **equi-join on the composite block key** — a shuffled hash join,
    never a BroadcastNestedLoopJoin — so the O(n²) comparison work
    spreads evenly over ``B(B+1)/2`` independent tasks instead of
    funneling one broadcast side through every executor. Raise
    ``n_blocks`` with cluster size (shuffle volume is ``n·(B+1)/2``
    rows per side; per-task work is ``(n/B)²`` comparisons).

    Exactness at a mid-range threshold genuinely requires examining
    every pair (sign-LSH bands cannot separate cos 0.449 from 0.451 —
    see :func:`lsh_near_dup_pairs` for the subquadratic path valid at
    duplicate-range thresholds); what this formulation fixes is the
    *plan shape*, not the comparison count.

    The per-side norms are hoisted BELOW the shuffle (computed once per
    vector, carried through the exchange) rather than inlined in the
    pair residual: the full 3-dot ``cosine_sql`` residual (192
    ``element_at`` products) fused with the SHUFFLE_HASH consume blew
    Janino's 64 KB method limit and silently fell back to interpreted
    evaluation (observed r13, both local[8]/sf0.01 and local[32]/sf0.1)
    — exactly the configuration the flat form exists to keep inside
    whole-stage codegen. ``sqrt(flat self-dot)`` evaluated in the
    pre-shuffle projection is bit-identical to the same expression
    inlined post-join, so hashes are unchanged; the pair stage keeps
    one 64-term dot + divide and compiles. Regression tripwire:
    ``tests/test_similarity.py::test_pair_cosine_stages_compile`` runs
    this under ``spark.sql.codegen.fallback=false``.
    """
    spark = embeddings.sparkSession
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("nrm", F.expr(f"sqrt({dot_sql_str('v', 'v', dim)})"))
    block_pairs = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "block_a int, block_b int",
    )
    a = (
        emb.withColumn("block_a", (F.col("vec_id") % n_blocks).cast("int"))
        .join(F.broadcast(block_pairs), "block_a")
        .select(
            "block_a",
            "block_b",
            F.col("vec_id").alias("id_a"),
            F.col("v").alias("va"),
            F.col("nrm").alias("nrm_a"),
        )
    )
    b = (
        emb.withColumn("block_b", (F.col("vec_id") % n_blocks).cast("int"))
        .join(F.broadcast(block_pairs), "block_b")
        .select(
            "block_a",
            "block_b",
            F.col("vec_id").alias("id_b"),
            F.col("v").alias("vb"),
            F.col("nrm").alias("nrm_b"),
        )
    )
    return (
        # SHUFFLE_HASH pin: the sides sit at the broadcast-threshold
        # boundary at test scale, and the planner's BHJ/SMJ flapping
        # measured 3-12 s run-to-run; the shuffled hash join this
        # docstring promises measured 3.5 s flat (SMJ pays a sort and
        # evaluates the giant cosine residual outside codegen)
        a.hint("SHUFFLE_HASH").join(b, ["block_a", "block_b"])
        # same-block pairs meet twice ordered (x,y)/(y,x) — keep one;
        # cross-block pairs meet exactly once (block_pairs has i ≤ j only)
        .filter((F.col("block_a") < F.col("block_b")) | (F.col("id_a") < F.col("id_b")))
        .select(
            F.least("id_a", "id_b").alias("vec_a"),
            F.greatest("id_a", "id_b").alias("vec_b"),
            # one 64-term dot + divide; norms ride in from below the
            # shuffle (same sqrt(flat) bits as the inlined form)
            F.round(
                F.expr(f"({dot_sql_str('va', 'vb', dim)}) / (nrm_a * nrm_b)"),
                decimals,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _sql_d(x: float) -> str:
    """A Python float as a Spark SQL DOUBLE literal. ``repr`` emits the
    shortest round-tripping decimal and both parsers (Python's and the
    JVM's Double.parseDouble behind Spark's literal rule) are
    correctly-rounded, so the bits survive the text round-trip."""
    return repr(float(x)) + "D"


def _reduced_d2_sql(vec_sql: str, mat_sql: str, c2_sql: str) -> str:
    """The reduced ``-2·dot(v, c_i) + dot(c_i, c_i)`` argmin score as
    SQL text over a literal centroid/codeword matrix, for use inside a
    ``transform(sequence(..), i -> ..)`` lambda. aggregate(zip_with)
    is the same left-to-right IEEE sum as every other dot in this
    module (0.0 + x == x bit-exactly), so scores — and therefore
    argmins — match the Column-built and DuckDB formulations."""
    return (
        f"-2.0D * aggregate(zip_with({vec_sql}, element_at({mat_sql}, i + 1), "
        f"(x, y) -> x * y), 0.0D, (a, b) -> a + b) + element_at({c2_sql}, i + 1)"
    )


def _fold_c2(cv: list[float]) -> float:
    c2 = 0.0  # left-to-right, same order as list_dot_product(c, c)
    for x in cv:
        c2 += x * x
    return c2


def _cell_structs(v: Column, cents: list[tuple[int, list[float]]]) -> list[Column]:
    """(reduced-distance, cell-id) structs for every centroid — the
    argmin building block shared by assignment, probing and Lloyd
    refinement. ``dot(c,c)`` folds to a Python float in the same
    left-to-right order as ``_dot``, keeping argmins bit-reproducible."""
    out = []
    for cell_id, cv_list in cents:
        cv = F.array(*[F.lit(x) for x in cv_list])
        c2 = 0.0
        for x in cv_list:
            c2 += x * x
        d2 = F.lit(-2.0) * _dot(v, cv) + F.lit(c2)
        out.append(F.struct(d2.alias("d2"), F.lit(cell_id).alias("cell")))
    return out


def refine_centroids_lloyd(
    emb: DataFrame,
    cents: list[tuple[int, list[float]]],
    iters: int = 2,
    decimals: int = 6,
) -> list[tuple[int, list[float]]]:
    """Refine IVF centroids with k-means (Lloyd) rounds.

    Each round: assign every vector to its nearest centroid (inlined
    literals — per-row expression, zero shuffle), then take the
    per-cell coordinate means via posexplode + avg (one uniform-key
    aggregation; the n_cells × dim result is a bounded model
    parameter, collected like the seeds). Means round to ``decimals``
    so float summation order cannot leak into downstream assignments.
    Empty cells keep their previous centroid. Cell ids stay the seed
    ids — stable identifiers across refinement.
    """
    for _ in range(iters):
        assigned = emb.withColumn(
            "cell", F.least(*_cell_structs(F.col("v"), cents)).getField("cell")
        )
        means = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("x"), decimals).alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.transform("pm", lambda s: s["m"]).alias("v"))
            .collect()
        )
        new = {r["cell"]: list(r["v"]) for r in means}
        cents = [(cid, new.get(cid, v)) for cid, v in cents]
    return cents


def _seeded_medoids(emb: DataFrame, n_cells: int) -> list[tuple[int, list[float]]]:
    """The n_cells lowest-vec_id vectors as (cell_id, vector) —
    bounded collect of model-parameter rows. SHARED by
    :func:`ivf_topk` and :func:`ann_recall_eval` (r15 review): the
    recall evaluation's contract is that it measures the exact
    configuration ivf_topk serves, so the centroid selection cannot be
    allowed to desynchronize between copies."""
    return [
        (r["vec_id"], list(r["v"]))
        for r in emb.orderBy("vec_id").limit(n_cells).select("vec_id", "v").collect()
    ]


def _centroid_structs(cents: list[tuple[int, list[float]]]):
    """Builder rendering the (d2, cell) assignment-structs SQL over a
    literal centroid matrix for any vector column name — the single
    definition of the IVF assignment expression (see
    :func:`_seeded_medoids` for why it must not be copied).

    The centroid loop stays SYMBOLIC (transform over a literal matrix,
    one F.expr): the Column-per-node form paid ~1-2 s of py4j
    round-trips and Catalyst analysis per call for a 16×64 literal dot
    tree. Struct ordering (d2 ASC, cell ASC) and the left-to-right
    IEEE sums match the DuckDB oracles bit for bit.
    """
    ids_sql = "array(" + ",".join(str(cid) for cid, _ in cents) + ")"
    mat_sql = (
        "array("
        + ",".join("array(" + ",".join(_sql_d(x) for x in cv) + ")" for _, cv in cents)
        + ")"
    )
    c2_sql = "array(" + ",".join(_sql_d(_fold_c2(cv)) for _, cv in cents) + ")"

    def structs(vec_sql: str) -> str:
        return (
            f"transform(sequence(0, {len(cents) - 1}), i -> named_struct("
            f"'d2', {_reduced_d2_sql(vec_sql, mat_sql, c2_sql)}, "
            f"'cell', element_at({ids_sql}, i + 1)))"
        )

    return structs


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    n_cells: int = 16,
    n_probe: int = 4,
    k: int = 10,
    decimals: int = 6,
    lloyd_iters: int = 0,
) -> DataFrame:
    """IVF-Flat ANN top-k: coarse-quantize into ``n_cells`` Voronoi
    cells, search only the ``n_probe`` cells nearest the query.

    Centroids are the ``n_cells`` lowest-``vec_id`` vectors — seeded
    medoids, fully deterministic, so the cell assignment is replayable
    by any engine; ``lloyd_iters > 0`` refines them with k-means
    rounds (:func:`refine_centroids_lloyd`) for better-shaped cells at
    the same query cost. The centroid table is a
    bounded model parameter (k rows), so it is collected and inlined as
    literals: cell assignment becomes a pure per-row expression —
    **zero shuffle, zero join** — and the plan is one scan + a
    broadcast of the n_probe probe cells + TakeOrderedAndProject.
    Recall < 1 by construction (a true neighbor can live in an
    unprobed cell); raise ``n_probe`` toward ``n_cells`` to trade
    speed back for recall.

    The argmin score is the reduced ``-2·dot(v,c) + dot(c,c)`` (the
    cell-invariant ``dot(v,v)`` term cannot change which cell wins, and
    dropping it saves two of three dot products per cell); ``dot(c,c)``
    is folded to a Python-float constant — strict left-to-right IEEE
    accumulation everywhere, so every argmin is bit-reproducible by a
    DuckDB oracle computing the SAME reduced expression.
    """
    emb = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = _seeded_medoids(emb, n_cells)
    if lloyd_iters:
        # optional k-means refinement (default off: the seeded-medoid
        # path is what the SQL oracle replays)
        cents = refine_centroids_lloyd(emb, cents, iters=lloyd_iters, decimals=decimals)
    structs = _centroid_structs(cents)
    structs_sql = structs("v")
    assigned_cell = F.expr(f"array_min({structs_sql}).cell")
    probe = (
        emb.filter(F.col("vec_id") == query_vec_id)
        .select(
            F.col("v").alias("qv"),
            F.explode(
                F.expr(f"slice(array_sort({structs_sql}), 1, {n_probe})")
            ).alias("pc"),
        )
        .select("qv", F.col("pc.cell").alias("cell"))
    )
    return (
        emb.filter(F.col("vec_id") != query_vec_id)
        .withColumn("cell", assigned_cell)
        .join(F.broadcast(probe), "cell")
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("v"), F.col("qv")), decimals).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def ann_recall_eval(
    embeddings: DataFrame,
    query_vec_ids: tuple[int, ...],
    n_cells: int = 16,
    n_probe: int = 4,
    k: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Recall@k of the IVF index vs brute-force ground truth, batched
    over a query sample — the quality metric an ANN deployment tunes
    ``n_probe`` against (FAISS-style index evaluation; reference
    ivf_topk recall caveat made measurable).

    Per query id: ground truth = exact cosine top-k over the corpus;
    ANN answer = the SAME seeded-medoid IVF configuration
    :func:`ivf_topk` serves (identical centroid literals, probe rule,
    re-rank and tiebreaks); recall = |ANN ∩ truth| / k. Returns
    (query_vec_id, n_hits, recall_at_k) ordered by query id.

    Scale shape: ONE distributed pass per side, multi-query. The query
    sample (|Q| rows) and the (qid, cell) probe pairs (|Q|·n_probe
    rows) are broadcast; cell assignment is the literal-matrix
    expression (zero shuffle); both top-k rankings are
    ``row_number() <= k`` windows partitioned by qid, which
    InferWindowGroupLimit turns into per-partition top-k before the
    shuffle — k rows per query cross the wire, not candidates. The
    ground-truth side is Θ(|Q|·N) dot products BY DEFINITION (it is
    the exact baseline being recalled against): an evaluation-time
    cost bounded by the query-sample size, never a serving path.
    """
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qids = sorted(int(q) for q in query_vec_ids)
    # the SAME centroid selection + assignment expression ivf_topk
    # serves — one shared implementation, by contract
    structs = _centroid_structs(_seeded_medoids(emb, n_cells))
    qs = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    rank = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    truth = _recall_truth(emb, qs, k, decimals)
    probe = (
        qs.select(
            "qid",
            "qv",
            F.explode(F.expr(f"slice(array_sort({structs('qv')}), 1, {n_probe})")).alias(
                "pc"
            ),
        )
        .select("qid", "qv", F.col("pc.cell").alias("cell"))
    )
    ann = (
        emb.withColumn("cell", F.expr(f"array_min({structs('v')}).cell"))
        .join(F.broadcast(probe), "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("v"), F.col("qv")), decimals).alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(rank))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", F.lit(1).alias("_hit"))
    )
    return _recall_summary(truth, ann, k)


def _recall_truth(emb: DataFrame, qs: DataFrame, k: int, decimals: int) -> DataFrame:
    """Exact-cosine ground truth, batched: per query id the corpus-wide
    top-k (rounded cosine DESC, vec_id ASC). Θ(|Q|·N) dot products BY
    DEFINITION — it is the baseline recall is measured against, an
    evaluation-time cost bounded by the broadcast query-sample size.
    The per-qid ranking is a ``row_number() <= k`` window that
    InferWindowGroupLimit turns into per-partition top-k before the
    shuffle — k rows per query cross the wire."""
    rank = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("v"), F.col("qv")), decimals).alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(rank))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id")
    )


def _recall_summary(truth: DataFrame, ann: DataFrame, k: int) -> DataFrame:
    """(query_vec_id, n_hits, recall_at_k) from the truth/ANN id sets;
    ``ann`` carries a ``_hit`` marker column."""
    return (
        truth.join(ann, ["qid", "vec_id"], "left")
        .groupBy("qid")
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("bigint").alias("n_hits"))
        .select(
            F.col("qid").alias("query_vec_id"),
            "n_hits",
            F.round(F.col("n_hits") / F.lit(float(k)), 4).alias("recall_at_k"),
        )
        .orderBy("query_vec_id")
    )


def _dot_ltr(a: list[float], b: list[float]) -> float:
    s = 0.0  # left-to-right, same order as list_dot_product / aggregate(zip_with)
    for x, y in zip(a, b):
        s += x * y
    return s


def _argmin_structs_sql(
    sub: list[tuple[int, list[float]]], group: dict[int, int] | None = None
) -> str:
    """(d2, cell[, pid]) struct array over a literal centroid matrix —
    ``array_min(...)`` of it is the reduced-d2 argmin. ``group`` adds
    each cell's parent id for hierarchy-aware probing."""
    ids = "array(" + ",".join(str(cid) for cid, _ in sub) + ")"
    mat = (
        "array("
        + ",".join("array(" + ",".join(_sql_d(x) for x in cv) + ")" for _, cv in sub)
        + ")"
    )
    c2 = "array(" + ",".join(_sql_d(_fold_c2(cv)) for _, cv in sub) + ")"
    extra = ""
    if group is not None:
        pid_arr = "array(" + ",".join(str(group[cid]) for cid, _ in sub) + ")"
        extra = f", 'pid', element_at({pid_arr}, i + 1)"
    return (
        f"transform(sequence(0, {len(sub) - 1}), i -> named_struct("
        f"'d2', {_reduced_d2_sql('v', mat, c2)}, "
        f"'cell', element_at({ids}, i + 1){extra}))"
    )


def two_level_assignment_sql(
    cents: list[tuple[int, list[float]]], n_parents: int
) -> str:
    """Hierarchical cell-assignment expression: argmin over the
    ``n_parents`` level-1 centroids, then argmin only over that
    parent's leaves — (n_parents + |group|) dot terms per row instead
    of len(cents). Same leaf SET as the flat quantizer; the routing
    (not the cells) is what's approximate.

    Form: the winning parent's leaf matrix / c2 / id arrays are
    selected from nested literals by the level-1 argmin INDEX, and the
    index is bound ONCE via a single-element ``transform`` lambda. A
    per-parent CASE chain computes the same thing but repeats the
    level-1 argmin subexpression across branches; the lambda-bound
    form evaluates each level exactly once, which is both smaller and
    cheaper. NOTE: the lambda form does NOT immunize a downstream
    self-join against Spark 4's common-expression rewrite bug
    (order-dependent INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND on
    schema-inferred inputs — the flat argmin trips it too); consumers
    must self-join through the subquery-alias form
    (:func:`_cell_self_join`). Parent tie → lower index ≡ lower
    parent id (parents are vec_id-ascending), leaf tie → lower cell id
    — identical tie semantics to the flat argmin."""
    parents = cents[:n_parents]
    group = two_level_cells(cents, n_parents)
    pmat = (
        "array("
        + ",".join("array(" + ",".join(_sql_d(x) for x in pv) + ")" for _, pv in parents)
        + ")"
    )
    pc2 = "array(" + ",".join(_sql_d(_fold_c2(pv)) for _, pv in parents) + ")"
    p_structs = (
        f"transform(sequence(0, {len(parents) - 1}), i -> named_struct("
        f"'d2', {_reduced_d2_sql('v', pmat, pc2)}, 'j', i))"
    )
    groups = [
        [(cid, cv) for cid, cv in cents if group[cid] == pid] for pid, _ in parents
    ]
    gmats = (
        "array("
        + ",".join(
            "array("
            + ",".join("array(" + ",".join(_sql_d(x) for x in cv) + ")" for _, cv in g)
            + ")"
            for g in groups
        )
        + ")"
    )
    gc2s = (
        "array("
        + ",".join(
            "array(" + ",".join(_sql_d(_fold_c2(cv)) for _, cv in g) + ")" for g in groups
        )
        + ")"
    )
    gids = (
        "array("
        + ",".join("array(" + ",".join(str(cid) for cid, _ in g) + ")" for g in groups)
        + ")"
    )
    return (
        f"element_at(transform(array(array_min({p_structs}).j), j -> "
        f"array_min(transform(element_at({gmats}, j + 1), (cw, i) -> named_struct("
        f"'d2', -2.0D * aggregate(zip_with(v, cw, (x, y) -> x * y), 0.0D, (a, b) -> a + b)"
        f" + element_at(element_at({gc2s}, j + 1), i + 1), "
        f"'cell', element_at(element_at({gids}, j + 1), i + 1)))).cell), 1)"
    )


def two_level_cells(
    cents: list[tuple[int, list[float]]], n_parents: int
) -> dict[int, int]:
    """Leaf-cell → parent assignment for the hierarchical quantizer.

    Parents are the first ``n_parents`` leaves (their centroids ARE
    those leaves' vectors). A parent-leaf belongs to itself; every
    other leaf joins the parent minimizing the same reduced
    ``-2·dot + c2`` score (tie → lower parent id). Pure driver-side
    arithmetic over the already-collected bounded centroid model —
    left-to-right IEEE sums so a SQL oracle replays the grouping bit
    for bit.
    """
    parents = cents[:n_parents]
    group: dict[int, int] = {}
    parent_ids = {pid for pid, _ in parents}
    for cid, cv in cents:
        if cid in parent_ids:
            group[cid] = cid
            continue
        best: tuple[float, int] | None = None
        for pid, pv in parents:
            d2 = -2.0 * _dot_ltr(cv, pv) + _fold_c2(pv)
            if best is None or (d2, pid) < best:
                best = (d2, pid)
        group[cid] = best[1]
    return group


def ivf2_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    n_cells: int = 16,
    n_parents: int = 4,
    n_probe_l1: int = 2,
    n_probe: int = 4,
    k: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Two-level (hierarchical) IVF ANN top-k — the cell-count scale
    path past :func:`ivf_topk`.

    The flat quantizer's per-row cost is ``n_cells × dim`` dot terms;
    past ~1024 cells that assignment term dominates the scan (the
    documented eventual bottleneck of every cell-blocked operator
    here). The classic fix is a coarse-in-coarse hierarchy (IVF-HNSW /
    two-level IMI family): route each vector to one of ``n_parents``
    level-1 centroids, then argmin only over that parent's leaf cells
    — ``n_parents + |group|`` dot terms per row, √-ish of the flat
    cost at equal leaf count (1024 leaves: 32 + ~32 vs 1024, ≈16×).

    Determinism/oracle story: leaves are the ``n_cells``
    lowest-vec_id vectors (the same seeded-medoid leaf SET as
    :func:`ivf_topk`, so recall is comparable head-to-head), parents
    the first ``n_parents`` of those, leaf→parent grouping via
    :func:`two_level_cells` — every argmin the same reduced-d2 with
    left-to-right IEEE sums, replayable in SQL.

    Plan shape: both levels are literal-matrix expressions — level 1
    an ``array_min(transform(...))`` over the parent matrix, level 2
    the lambda-bound nested-literal selection of
    :func:`two_level_assignment_sql`: the level-1 argmin index picks
    the winning parent's leaf matrix out of a nested literal via a
    single-element ``transform`` lambda, so only that group's dots are
    evaluated per row (the saving is real per row, not just
    symbolic). Zero joins / zero shuffles for assignment; probing
    mirrors :func:`ivf_topk` (level-1 probe of ``n_probe_l1``
    parents, then ``n_probe`` leaves within them, broadcast to the
    scan).
    """
    emb = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    # bounded collect: the same n_cells-row centroid model as ivf_topk
    cents = [
        (r["vec_id"], list(r["v"]))
        for r in emb.orderBy("vec_id").limit(n_cells).select("vec_id", "v").collect()
    ]
    parents = cents[:n_parents]
    group = two_level_cells(cents, n_parents)
    p_structs = _argmin_structs_sql(parents)
    assigned_cell = F.expr(two_level_assignment_sql(cents, n_parents))

    # leaf structs with their parent id, for the query-side level-2 probe
    l_structs = _argmin_structs_sql(cents, group=group)
    probe = (
        emb.filter(F.col("vec_id") == query_vec_id)
        .select(
            F.col("v").alias("qv"),
            F.explode(
                F.expr(
                    f"slice(array_sort(filter({l_structs}, s -> array_contains("
                    f"transform(slice(array_sort({p_structs}), 1, {n_probe_l1}), "
                    f"p -> p.cell), s.pid))), 1, {n_probe})"
                )
            ).alias("pc"),
        )
        .select("qv", F.col("pc.cell").alias("cell"))
    )
    return (
        emb.filter(F.col("vec_id") != query_vec_id)
        .withColumn("cell", assigned_cell)
        .join(F.broadcast(probe), "cell")
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("v"), F.col("qv")), decimals).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
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


def _plane_bits_sql(vec_sql: str, dim: int, plane_indices: list[int]) -> str:
    """Big-endian integer of the sign bits of ``vec · hyperplane_p``
    for each plane index, as one symbolic SQL expression (literal
    plane matrix + HOF loop — the Column-per-node form paid a py4j
    round-trip per arithmetic node and re-analysis per call). The
    fold ``acc*2 + bit`` and the left-to-right dot sums are exactly
    the Column formulation's ops, so bucket ids are unchanged."""
    mat = (
        "array("
        + ",".join(
            "array(" + ",".join(_sql_d(c) for c in _hyperplane(dim, p)) + ")"
            for p in plane_indices
        )
        + ")"
    )
    return (
        f"aggregate(transform(sequence(0, {len(plane_indices) - 1}), p -> "
        f"CASE WHEN aggregate(zip_with({vec_sql}, element_at({mat}, p + 1), "
        f"(x, y) -> x * y), 0.0D, (a, b) -> a + b) >= 0.0D THEN 1 ELSE 0 END), "
        f"0, (acc, b) -> acc * 2 + b)"
    )


def simhash_bucket(vec: str, dim: int, n_planes: int = 8) -> Column:
    """Sign-random-projection bucket id (0..2^n_planes-1) for a NAMED
    array column.

    Vectors with high cosine similarity agree on most hyperplane signs,
    so they land in the same bucket with high probability.
    """
    return F.expr(_plane_bits_sql(vec, dim, list(range(n_planes))))


def lsh_near_dup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_bands: int = 16,
    band_bits: int = 4,
    decimals: int = 6,
) -> DataFrame:
    """Approximate near-dup pairs via banded sign-random-projection LSH.

    The subquadratic scale path: each vector gets ``n_bands × band_bits``
    hyperplane sign bits; two vectors are candidates iff they agree
    exactly on ≥1 band; candidates are verified with exact cosine.
    The only pair-producing join is an equi-join on ``(band_no,
    band_val)`` — comparisons are bounded by bucket occupancy, not n².

    Per-pair recall for a pair at angle θ is ``1-(1-(1-θ/π)^band_bits)^n_bands``
    — near 1 for duplicate-range similarity (cos ≥ 0.8) at the default
    parameters, and tunable (more bands → recall, more bits → precision).
    It is NOT exact at mid-range thresholds — a pair at cos 0.45
    disagrees on ~35% of planes, and no banding separates 0.449 from
    0.451; use :func:`cosine_near_dup_pairs` when exactness at such
    thresholds is required. tests/test_extended_ops.py pins the
    measured fixture recall so parameter regressions surface.
    """
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # the band shuffle carries IDS ONLY — at scale, shipping n_bands
    # copies of every dim-wide vector through the exchange is the
    # dominant cost; candidate pairs are dedup'd BEFORE the verify so
    # a pair colliding in several bands pays one cosine, and the
    # vectors are fetched back by two equi-joins. The band projection
    # is n_bands*band_bits*dim multiplies per row — spread an
    # under-split source first (no-op on well-split inputs)
    bands = _spread_if_undersplit(emb).select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_no"),
                        _band_value("v", dim, k, band_bits).alias("band_val"),
                    )
                    for k in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("vec_id", F.col("b.band_no"), F.col("b.band_val"))
    a = bands.select(F.col("vec_id").alias("vec_a"), "band_no", "band_val")
    b = bands.select(F.col("vec_id").alias("vec_b"), "band_no", "band_val")
    cand = (
        a.join(b, ["band_no", "band_val"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    # norms are hoisted into the fetch-back sides (computed once per
    # vector, below the join) — the full 3-dot cosine_sql residual
    # fused with the double-join consume blew Janino's 64 KB method
    # limit and ran interpreted (found r14 via the fallback=false
    # tripwire); the split form is bit-identical and compiles
    nrm = F.expr(f"sqrt({dot_sql_str('v', 'v', dim)})")
    va = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), nrm.alias("nrm_a")
    )
    vb = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), nrm.alias("nrm_b")
    )
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(
                F.expr(f"({dot_sql_str('va', 'vb', dim)}) / (nrm_a * nrm_b)"),
                decimals,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _band_value(vec: str, dim: int, band_no: int, band_bits: int) -> Column:
    """Integer value of one LSH band: ``band_bits`` hyperplane sign
    bits of a NAMED array column (symbolic — see _plane_bits_sql)."""
    planes = [band_no * band_bits + i for i in range(band_bits)]
    return F.expr(_plane_bits_sql(vec, dim, planes))


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
    ).withColumn("bucket", simhash_bucket("v", dim, n_planes))
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


def pq_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    dim: int = 64,
    n_sub: int = 8,
    n_codes: int = 32,
    shortlist: int = 100,
    k: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Product-Quantization ADC top-k (Jégou et al., TPAMI 2011) — the
    memory-compressed ANN tier, in its production shape: ADC shortlist
    → exact re-rank.

    At 100 TB the embedding column dominates storage and scan cost;
    PQ replaces each ``dim``-float vector with ``n_sub`` codes (here
    64 doubles → 8 codes = 64× smaller), and the first pass ranks by
    Asymmetric Distance Computation: the query stays exact, every
    database vector is approximated by its per-subspace codeword, so
    the approximate inner product is ``n_sub`` table lookups instead
    of a ``dim``-wide dot product. The ``shortlist`` best ADC
    candidates then get the exact cosine (the standard two-stage ANN
    serving pattern) — at scale the exact pass touches only
    ``shortlist`` rows' full vectors, so the big scan can read codes
    alone.

    Determinism follows the IVF recipe exactly: codebooks are seeded
    medoids — codeword ``j`` of subspace ``m`` is the ``j``-th
    lowest-``vec_id`` vector's ``m``-th subvector — collected as a
    bounded model parameter (n_sub × n_codes × dim/n_sub doubles) and
    inlined as literals. Encoding (per-subspace argmin of the reduced
    ``-2·dot(v_sub, cw) + dot(cw, cw)``, tie → lower code), the ADC
    sum, and both rank boundaries (raw ADC DESC then vec_id; cosine
    DESC then vec_id) are pure per-row expressions over strict
    left-to-right IEEE ops — replayable bit-identically by a DuckDB
    oracle. The query vector (one row — the other model parameter) is
    collected too, folding the ADC lookup tables to plain literals.
    The plan is one scan → per-row codes → TakeOrdered(shortlist) →
    exact cosine → TakeOrdered(k). **Zero shuffles, zero joins of any
    kind.**

    Recall < 1 by construction (a true neighbor can fall outside the
    ADC shortlist); measured 10/10 vs the exact top-10 at sf0.01 and
    9/10 at sf0.001 with the defaults — raise ``shortlist`` to trade
    re-rank work for recall.
    """
    sub = dim // n_sub
    emb = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    # bounded collect: the codebook is a model parameter, not data
    seed_rows = emb.orderBy("vec_id").limit(n_codes).select("v").collect()
    books = [
        [list(r["v"])[m * sub : (m + 1) * sub] for r in seed_rows]
        for m in range(n_sub)
    ]

    # the query vector is one row — a model parameter like the
    # codebooks — so collect it and fold the whole ADC lookup table to
    # Python-float literals driver-side (same left-to-right IEEE sums
    # the oracle's list_dot_product performs)
    qv = list(
        emb.filter(F.col("vec_id") == query_vec_id).select("v").collect()[0]["v"]
    )

    # The naive Column-by-Column construction (one F.* call per
    # arithmetic node) costs ~10 s per invocation BEFORE any action:
    # 8 subspaces × 32 codewords × 8-dim dots ≈ 10k py4j round-trips
    # to build, then a 10k-node Catalyst tree to analyze. Keeping the
    # codeword loop SYMBOLIC — higher-order functions over literal
    # codebook matrices, one F.expr per subspace — builds in
    # milliseconds and analyzes a tree whose size is O(n_sub), not
    # O(n_sub × n_codes × sub). The evaluated float ops are identical:
    # aggregate(zip_with(..), 0.0, +) is the same left-to-right IEEE
    # sum (0.0 + x == x bit-exactly), struct array_min is the same
    # (d2 ASC, j ASC) argmin as the least-of-structs form. Unlike the
    # IVF assignment (whose per-row cost is dwarfed by its probe join),
    # the PQ encode IS the per-row hot path — interpreted HOF lambdas
    # measured 10x wall at 64x vectors — so each codeword's reduced d2
    # is UNROLLED to flat whole-stage-codegen arithmetic inside the
    # array_min; the loop stays out of Python (one SQL text per
    # subspace), keeping plan-build cost flat too.
    enc = _pq_encode(emb.filter(F.col("vec_id") != query_vec_id), books, sub)
    raw = F.expr(" + ".join(_adc_lut_terms(qv, books, sub)))
    qlit = F.array(*[F.lit(x) for x in qv])
    return (
        enc.withColumn("_raw", raw)
        .orderBy(F.desc("_raw"), F.asc("vec_id"))
        .limit(shortlist)
        .withColumn("cosine", F.round(cosine(F.col("v"), qlit), decimals))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "label", "cosine")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    n_sub: int = 8,
    n_codes: int = 32,
    shortlist: int = 100,
    k: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """IVF-PQ ANN top-k — the composed production serving tier (FAISS
    ``IVFn,PQm`` with ``by_residual=False``; Jégou et al., TPAMI 2011
    §V "IVFADC"): IVF routing bounds WHICH rows are scored, PQ codes
    bound WHAT is read to score them, exact re-rank bounds the error.

    At 100 TB the two single-axis tiers each leave one cost unbounded:
    :func:`ivf_topk` prunes the candidate set (scan 1/``n_cells`` of
    the rows) but pays a full ``dim``-wide dot per survivor, while
    :func:`pq_topk` compresses every score to ``n_sub`` lookups but
    still scores the whole corpus. Composing them multiplies the
    savings — only probed cells are scored, and only with codes, so a
    cluster run reads (cell, codes) for the probed fraction and full
    vectors for ``shortlist`` rows alone.

    Determinism follows the family recipe: centroids = the ``n_cells``
    lowest-``vec_id`` vectors, codebooks = per-subspace subvectors of
    the ``n_codes`` lowest, the query vector collected — all bounded
    model parameters inlined as literals. Every argmin is the reduced
    ``-2·dot + c2`` with strict left-to-right IEEE sums (tie → lower
    id); the probe set is computed DRIVER-side from the same floats
    (query vec and centroids are both model parameters, so the probe
    list is one too) and becomes a literal ``isin`` — the plan is one
    scan → per-row cell argmin → probe filter → per-row codes → folded
    ADC LUT → TakeOrdered(shortlist) → exact cosine →
    TakeOrdered(k). **Zero joins, zero shuffles.** Replayable
    bit-identically by a DuckDB oracle running the same reduced
    expressions.

    Recall < 1 on two axes (an unprobed cell, or an ADC miss outside
    the shortlist); ``n_probe`` and ``shortlist`` are the independent
    recall knobs.
    """
    sub = dim // n_sub
    emb = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    # bounded collects: centroids, codebooks, and the query vector are
    # model parameters, not data
    cents = [
        (r["vec_id"], list(r["v"]))
        for r in emb.orderBy("vec_id").limit(n_cells).select("vec_id", "v").collect()
    ]
    seed_rows = emb.orderBy("vec_id").limit(n_codes).select("v").collect()
    books = [
        [list(r["v"])[m * sub : (m + 1) * sub] for r in seed_rows]
        for m in range(n_sub)
    ]
    qv = list(
        emb.filter(F.col("vec_id") == query_vec_id).select("v").collect()[0]["v"]
    )

    # driver-side probe: same reduced d2 (left-to-right sums via
    # _dot_ltr / _fold_c2 — the floats the SQL oracle computes), tie →
    # lower cell id
    probe_cells = [
        cid
        for _, cid in sorted(
            (-2.0 * _dot_ltr(qv, cv) + _fold_c2(cv), cid) for cid, cv in cents
        )[:n_probe]
    ]

    # PQ encode + ADC exactly as pq_topk (unrolled flat dots inside the
    # per-codeword lambda; LUT folded to literals driver-side) — but
    # evaluated only for probed-cell survivors
    enc = _pq_encode(
        emb.filter(F.col("vec_id") != query_vec_id)
        .withColumn("cell", F.expr(f"array_min({_argmin_structs_sql(cents)}).cell"))
        .filter(F.col("cell").isin(probe_cells)),
        books,
        sub,
    )
    qlit = F.array(*[F.lit(x) for x in qv])
    return (
        enc.withColumn("_raw", F.expr(" + ".join(_adc_lut_terms(qv, books, sub))))
        .orderBy(F.desc("_raw"), F.asc("vec_id"))
        .limit(shortlist)
        .withColumn("cosine", F.round(cosine(F.col("v"), qlit), decimals))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "label", "cosine")
    )


def _pq_encode(df: DataFrame, books: list[list[list[float]]], sub: int) -> DataFrame:
    """Append per-subspace PQ code columns ``_c0.._c{m}``: argmin over
    the literal codebook of the reduced ``-2·dot(v_sub, cw) + dot(cw,
    cw)`` (tie → lower code j), strict left-to-right IEEE sums.

    Shared encoder of :func:`pq_topk` / :func:`ivfpq_topk` /
    :func:`pq_recall_eval` — one implementation, by contract, so the
    oracles' per-subspace argmin CTEs replay all three. The flat dot
    sits INSIDE the per-codeword lambda: one interpreter dispatch per
    codeword instead of one per ELEMENT (the zip_with/aggregate form
    measured 10x wall at 64x vectors, a fully unrolled 2048-term tree
    pays ~2.5 s of codegen per call); the tree stays O(sub) per
    subspace and the literal matrices constant-fold."""
    for m, book in enumerate(books):
        cws = "array(" + ",".join(
            "array(" + ",".join(_sql_d(x) for x in cw) + ")" for cw in book
        ) + ")"
        c2arr = "array(" + ",".join(_sql_d(_fold_c2(cw)) for cw in book) + ")"
        dot = " + ".join(
            f"element_at(v, {m * sub + e + 1}) * element_at(cw, {e + 1})"
            for e in range(sub)
        )
        df = df.withColumn(
            f"_c{m}",
            F.expr(
                f"array_min(transform({cws}, (cw, i) -> "
                f"named_struct('d2', -2.0D * ({dot}) + element_at({c2arr}, i + 1), "
                f"'j', i))).j"
            ),
        )
    return df


def _adc_lut_terms(qv: list[float], books: list[list[list[float]]], sub: int) -> list[str]:
    """ADC lookup tables folded to literals: ``dot(q_sub, codeword_j)``
    for every j (left-to-right sums — the floats the oracle's
    ``list_dot_product`` computes), indexed by the row's code via one
    ``element_at`` per subspace."""
    terms = []
    for m, book in enumerate(books):
        lut = [_dot_ltr(qv[m * sub : (m + 1) * sub], cw) for cw in book]
        terms.append(
            f"element_at(array({','.join(_sql_d(t) for t in lut)}), _c{m} + 1)"
        )
    return terms


def pq_recall_eval(
    embeddings: DataFrame,
    query_vec_ids: tuple[int, ...],
    dim: int = 64,
    n_sub: int = 8,
    n_codes: int = 32,
    shortlist: int = 100,
    k: int = 10,
    n_cells: int | None = None,
    n_probe: int | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Recall@k of the quantized ANN tiers vs brute-force ground truth,
    batched over a query sample — :func:`ann_recall_eval` extended to
    where recall silently dies at scale: quantization (VERDICT r15
    item 6). ``n_cells``/``n_probe`` unset → the PQ-ADC tier
    (:func:`pq_topk`); set → the composed IVF-PQ tier
    (:func:`ivfpq_topk`). Same configuration → the serving paths'
    exact answers, by shared-encoder contract (:func:`_pq_encode`).

    Per query id: ground truth = exact cosine top-k over the corpus
    (shared :func:`_recall_truth` pass); ANN answer = ADC shortlist →
    exact re-rank with the SAME codebooks, LUTs, probe rule and
    tiebreaks the serving functions use; recall = |ANN ∩ truth| / k.
    Returns (query_vec_id, n_hits, recall_at_k) ordered by query id.

    Scale shape: codes are computed ONCE per corpus row (query-
    independent — the property that makes PQ a storage format); the
    |Q|-row query sample is broadcast and every per-query model
    parameter is a folded literal keyed by qid — per-subspace ADC LUTs
    as ``map(qid -> float array)`` (|Q|·n_codes doubles) and, in
    IVF-PQ mode, the probe set as ``map(qid -> cell array)`` — so the
    fan-out adds zero shuffles. Both top-k rankings are
    ``row_number()`` windows partitioned by qid that
    InferWindowGroupLimit caps per-partition: ``shortlist`` rows per
    query cross the ADC wire, k per query cross the re-rank wire. The
    ground-truth side is Θ(|Q|·N) BY DEFINITION (evaluation, not
    serving).

    Laws (pinned in tests/test_extended_ops.py): recall ≡ 1.0 when
    ``shortlist`` ≥ corpus size; monotone non-decreasing in
    ``shortlist``; IVF-PQ recall ≤ IVF-Flat recall at equal
    ``n_probe`` (the ADC shortlist can only drop truth survivors);
    IVF-PQ recall monotone in ``n_probe``.
    """
    sub = dim // n_sub
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qids = sorted(int(q) for q in query_vec_ids)
    # bounded collects: codebooks and the |Q| query vectors are model
    # parameters, not data
    seed_rows = emb.orderBy("vec_id").limit(n_codes).select("v").collect()
    books = [
        [list(r["v"])[m * sub : (m + 1) * sub] for r in seed_rows]
        for m in range(n_sub)
    ]
    qv_rows = {
        r["vec_id"]: list(r["v"])
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    }
    missing = [q for q in qids if q not in qv_rows]
    if missing:
        raise ValueError(f"query vec_ids not in corpus: {missing}")

    qs = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    truth = _recall_truth(emb, qs, k, decimals)

    cand = _pq_encode(emb, books, sub).crossJoin(F.broadcast(qs)).filter(
        F.col("vec_id") != F.col("qid")
    )
    if n_cells is not None:
        # IVF-PQ mode: same seeded-medoid cells + driver-side probe
        # rule as ivfpq_topk, batched — probe sets folded to a literal
        # qid -> cell-array map (|Q|·n_probe ints)
        cents = _seeded_medoids(emb, n_cells)
        probe_map = {
            q: [
                cid
                for _, cid in sorted(
                    (-2.0 * _dot_ltr(qv_rows[q], cv) + _fold_c2(cv), cid)
                    for cid, cv in cents
                )[: n_probe or 1]
            ]
            for q in qids
        }
        entries = ",".join(
            f"{q}, array({','.join(str(c) for c in probe_map[q])})" for q in qids
        )
        cand = cand.withColumn(
            "cell", F.expr(f"array_min({_argmin_structs_sql(cents)}).cell")
        ).filter(F.expr(f"array_contains(element_at(map({entries}), qid), cell)"))

    # per-query ADC LUTs folded to one literal qid-keyed map per
    # subspace (|Q|·n_codes doubles each)
    raw_terms = []
    for m in range(n_sub):
        entries = ",".join(
            f"{q}, array({','.join(_sql_d(t) for t in [_dot_ltr(qv_rows[q][m * sub:(m + 1) * sub], cw) for cw in books[m]])})"
            for q in qids
        )
        raw_terms.append(
            f"element_at(element_at(map({entries}), qid), _c{m} + 1)"
        )
    adc_rank = Window.partitionBy("qid").orderBy(F.desc("_raw"), F.asc("vec_id"))
    cos_rank = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    ann = (
        cand.withColumn("_raw", F.expr(" + ".join(raw_terms)))
        .withColumn("srn", F.row_number().over(adc_rank))
        .filter(F.col("srn") <= shortlist)
        .withColumn("cosine", F.round(cosine(F.col("v"), F.col("qv")), decimals))
        .withColumn("rn", F.row_number().over(cos_rank))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", F.lit(1).alias("_hit"))
    )
    return _recall_summary(truth, ann, k)


def _spread_if_undersplit(df: DataFrame) -> DataFrame:
    """Round-robin a narrow frame up to cluster parallelism when the
    source under-splits (e.g. one small parquet file → one scan task).

    The per-row quantizer assignment (n_cells × dim interpreted lambda
    evals) runs on the SCAN side, before any exchange — a single-file
    fixture serializes it through one task and dominates wall time
    (measured 4× on knn_graph at sf0.1). At 100 TB, input splits ≫
    cores and this branch never fires; the exchange it adds on small
    inputs carries the raw vectors once and is dwarfed by the
    parallelism recovered. Same lesson as the dup_span_stats 64× curve:
    file layout, not operator design, gates under-split inputs.
    """
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    # r16: probe scan width from the file inventory instead of
    # ``df.rdd.getNumPartitions()`` — the RDD conversion runs full
    # physical planning on the driver (~0.1-0.25 s per call at sf0.1,
    # paid by EVERY quantizer-assignment query; far worse on a complex
    # frame at cluster scale). ``inputFiles()`` is a logical-plan walk.
    # r17 (ADVICE r16): estimate splits the way FilePartition actually
    # packs them — every file is charged openCostInBytes, the split
    # size floors at openCost and caps at maxPartitionBytes while
    # targeting minPartitionNum (default parallelism) splits, and small
    # files BIN-PACK into shared partitions (so "one file ⇒ one split"
    # was wrong for many-tiny-files layouts: the old n_files >= par
    # fast path skipped the repartition exactly when it was needed).
    # total_padded // max_split is the packing lower bound —
    # fragmentation only adds partitions, so an under-par estimate errs
    # toward spreading, which is this helper's purpose. Frames that are
    # not file-backed (empty inventory) or not local fall back to the
    # precise RDD probe.
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    local = [f[len("file:"):] for f in files if f.startswith("file:")]
    if files and len(local) == len(files):
        spark = df.sparkSession
        max_pb = _bytes_conf(spark, "spark.sql.files.maxPartitionBytes")
        open_cost = _bytes_conf(spark, "spark.sql.files.openCostInBytes")
        try:
            total = sum(os.path.getsize(p) for p in local)
        except OSError:
            total = None
        if total is not None:
            try:
                min_pn = int(spark.conf.get("spark.sql.files.minPartitionNum"))
            except Exception:
                min_pn = par
            total_padded = total + open_cost * len(files)
            bytes_per_core = total_padded // max(1, min_pn)
            max_split = min(max_pb, max(open_cost, bytes_per_core))
            est = max(1, total_padded // max(1, max_split))
            return df.repartition(par) if est < par else df
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def _cell_self_join(
    assigned: DataFrame,
    a_names: list[str],
    b_names: list[str],
    extra: tuple[str, ...] = (),
) -> DataFrame:
    """Cell-keyed self-join of the ``(vec_id, v, cell)`` assignment
    frame, built the ONE way that survives Spark 4's attribute-rewrite
    bug: ``df.alias("a").join(df.alias("b"), a.cell == b.cell)`` with
    qualifier-resolved columns.

    Self-joining this frame through per-side ALIASING PROJECTIONS
    (``select(col("v").alias("va"))`` / ``toDF``) dies at runtime with
    ``INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND`` when the input is a
    schema-inferred ``read.parquet`` (nullable array elements widen the
    unrolled cosine tree; the collapse of the rename projection into
    the deduplicated relation then loses the substitution). Verified
    empirically against every staging variant — eager/lazy
    ``localCheckpoint``, even two INDEPENDENT checkpoints, all still
    crash; only the subquery-alias form binds correctly (repro:
    tests/test_extended_ops.py::test_knn_graph_inferred_schema_read).
    The explicit-schema catalog path never trips it, but operators
    must accept any legal frame.

    ``a_names``/``b_names`` rename ``(vec_id, v)`` per side; ``cell``
    is kept once; any ``extra`` columns ride along per side with
    ``_a``/``_b`` suffixes. NOTE (r14, supersedes the r8-era "pruned
    join beats norms-carrying ~1.5×" measurement): that A/B predates
    the discovery that the recompute-per-pair 3-dot residual blew
    Janino's 64 KB method limit and ran the stage on the
    non-whole-stage path. With norms hoisted (``extra=("nrm",)``) the
    pair residual is one dot + divide, which compiles AND stays under
    HotSpot's JIT huge-method limit — measured faster than both prior
    regimes at sf0.1 (see test_similarity.py and the session-level
    ``spark.sql.codegen.hugeMethodLimit=8000`` rationale). Callers pass
    a STAGED frame (localCheckpoint locally; written-to-parquet at
    cluster scale) so the assignment expression is evaluated once, not
    once per side.
    """
    a, b = assigned.alias("a"), assigned.alias("b")
    cols = [
        F.col("a.cell").alias("cell"),
        F.col("a.vec_id").alias(a_names[0]),
        F.col("a.v").alias(a_names[1]),
        F.col("b.vec_id").alias(b_names[0]),
        F.col("b.v").alias(b_names[1]),
    ]
    for name in extra:
        cols.append(F.col(f"a.{name}").alias(f"{name}_a"))
        cols.append(F.col(f"b.{name}").alias(f"{name}_b"))
    return a.join(b, F.col("a.cell") == F.col("b.cell")).select(*cols)


def seeded_medoid_cells(emb: DataFrame, n_cells: int) -> tuple[list, str]:
    """Shared IVF-style coarse quantizer: ``(cents, structs_sql)``.

    ``cents`` = the ``n_cells`` lowest-``vec_id`` vectors (seeded
    medoids, a bounded model-parameter collect); ``structs_sql`` = the
    symbolic per-row (reduced-distance, cell) struct array over the
    literal centroid matrix — ``array_min(structs).cell`` is the cell
    assignment, zero shuffle, zero join. Same construction (and the
    same bit-reproducible left-to-right IEEE sums) as
    :func:`ivf_topk`; callers compose assignment, probing, or
    cell-blocked joins from it.
    """
    cents = [
        (r["vec_id"], list(r["v"]))
        for r in emb.orderBy("vec_id").limit(n_cells).select("vec_id", "v").collect()
    ]
    ids_sql = "array(" + ",".join(str(cid) for cid, _ in cents) + ")"
    mat_sql = (
        "array("
        + ",".join("array(" + ",".join(_sql_d(x) for x in cv) + ")" for _, cv in cents)
        + ")"
    )
    c2_sql = "array(" + ",".join(_sql_d(_fold_c2(cv)) for _, cv in cents) + ")"
    structs_sql = (
        f"transform(sequence(0, {len(cents) - 1}), i -> named_struct("
        f"'d2', {_reduced_d2_sql('v', mat_sql, c2_sql)}, "
        f"'cell', element_at({ids_sql}, i + 1)))"
    )
    return cents, structs_sql


def knn_graph(
    embeddings: DataFrame,
    n_cells: int = 16,
    k: int = 3,
    decimals: int = 6,
    dim: int = 64,
    n_parents: int | None = None,
) -> DataFrame:
    """Batch k-NN graph: every vector's top-``k`` neighbors, cell-blocked.

    The build step SemDeDup / graph-clustering / label-propagation
    pipelines run over the whole corpus (vs the single-query ANN tiers
    :func:`ivf_topk` / :func:`pq_topk`): neighbors are searched within
    the vector's own Voronoi cell (seeded-medoid coarse quantizer),
    ranked by cosine DESC with vec_id tiebreak. Recall < 1 by
    construction for vectors whose true neighbors sit across a cell
    boundary — the standard IVF trade; raise ``n_cells`` slower than
    corpus growth to trade per-task O((n/cells)²) work against recall.

    Plan: zero-shuffle literal-centroid assignment → one cell-keyed
    self-join via :func:`_cell_self_join` (the subquery-alias form —
    the one formulation immune to the Spark 4 self-join
    attribute-rewrite bug; each vector rides the exchange once per
    side) → one
    src-keyed window for the per-vector top-k (row_number over
    |cell-pairs| rows, partition count = corpus size — no global
    window). Ranking happens on the ROUNDED cosine so rank boundaries
    are bit-replayable by the DuckDB oracle.
    """
    emb = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cents, structs_sql = seeded_medoid_cells(emb, n_cells)
    if n_parents:
        # hierarchical routing (two_level_assignment_sql): the
        # assignment term drops from n_cells·dim to
        # (n_parents + group)·dim per row — the scale path once cell
        # counts track corpus size past ~1024. Cell contents become
        # routing-approximate (same leaf set, near-boundary vectors may
        # land one cell over), so the REGISTERED oracle query keeps the
        # flat form; this arm is the production knob's companion.
        cell_expr = two_level_assignment_sql(cents, n_parents)
    else:
        cell_expr = f"array_min({structs_sql}).cell"
    # Stage the assignment ONCE (localCheckpoint locally; at cluster
    # scale the staging point is writing the assigned table to parquet
    # and self-joining THAT): the self-join reads the staged rows from
    # both sides instead of re-evaluating the quantizer per side —
    # measured ~1.3× on the 8× leg.
    # nrm rides the staged frame (r16, same pattern as
    # semantic_dedup_verdicts): per-pair work drops from the 3-dot
    # cosine_sql residual (which blows Janino's 64 KB method limit
    # fused into the join consume) to one cross dot + divide — the
    # norms are computed ONCE per vector below the shuffle,
    # bit-identically (sqrt of the same left-associated self-dot).
    assigned = (
        _spread_if_undersplit(emb)
        .withColumn("cell", F.expr(cell_expr).cast("long"))
        .withColumn("nrm", F.expr(f"sqrt({dot_sql_str('v', 'v', dim)})"))
        .transform(stage_frame)
    )
    # Cosine is evaluated on each UNORDERED pair once (src < dst) and
    # mirrored, halving the dominant cost (pair-stage arithmetic, not
    # the shuffle, bounds this operator — measured ~2× on the 8× leg).
    # Bit-exact by construction: per-term products
    # commute and the left-associated i=1..dim sum order is IDENTICAL
    # for (a,b) and (b,a), so the mirrored cosine is the same double
    # the directed evaluation would have produced. The mirror is an
    # explode of the two orientations INSIDE the pair stage — one
    # generator, cosine evaluated once per unordered pair, no second
    # plan branch re-running the join (a union of two selects over
    # ``half`` would re-evaluate it per branch).
    half = (
        _cell_self_join(assigned, ["src", "va"], ["dst", "vb"], extra=("nrm",))
        .filter(F.col("src") < F.col("dst"))
        .select(
            "src",
            "dst",
            F.round(
                F.expr(f"({dot_sql_str('va', 'vb', dim)}) / (nrm_a * nrm_b)"),
                decimals,
            ).alias("cosine"),
        )
    )
    pairs = half.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("s"), F.col("dst").alias("d")),
                F.struct(F.col("dst").alias("s"), F.col("src").alias("d")),
            )
        ).alias("e"),
        "cosine",
    ).select(F.col("e.s").alias("src"), F.col("e.d").alias("dst"), "cosine")
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    return (
        pairs.withColumn("nn_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("nn_rank") <= k)
        .select("src", "nn_rank", "dst", "cosine")
    )


def semantic_dedup_verdicts(
    embeddings: DataFrame,
    n_cells: int = 16,
    threshold: float = 0.45,
    decimals: int = 6,
    dim: int = 64,
) -> DataFrame:
    """SemDeDup-style cluster-blocked embedding dedup (Abbas et al.,
    arXiv:2303.09540): per-document keep/drop verdicts from
    within-cluster cosine similarity.

    The production semantic-dedup recipe: k-means the corpus embeddings
    into ``n_cells`` clusters, then compare pairs ONLY within a cluster
    (near-dups land in the same Voronoi cell; cross-cluster pairs are
    below threshold by construction of the clustering) and drop every
    document that has a same-cell earlier neighbor at ``cos ≥
    threshold``. Deterministic keep rule: vec ``v`` is dropped iff some
    ``u < v`` in its cell has ``round(cos(u, v), decimals) ≥
    threshold`` — the min-id greedy that any engine can replay.

    Scale design (100 TB): cell assignment reuses the IVF seeded-medoid
    argmin — centroids are bounded model parameters inlined as literals
    (one ``transform`` over a literal matrix), so assignment is a pure
    per-row expression with **zero shuffle, zero join**. The pair stage
    shuffles on the cell key only (each vector rides the exchange
    exactly once per side), and per-task work is ``(n/n_cells)²``
    comparisons — ``n_cells`` is the scale knob (SemDeDup runs ~100 k
    clusters at corpus scale, keeping cells ~constant-sized). The
    per-pair cosine is :func:`cosine_sql` flat codegen arithmetic, not
    an interpreted lambda. No all-pairs join exists: the join key is
    the cell id.

    Returns (vec_id, cell, is_kept) — a verdict frame usable directly
    as a dedup gate join, same contract as
    ``dup_cluster_representatives``.
    """
    emb = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    # bounded collect: n_cells centroid rows are model parameters, not data
    _, structs_sql = seeded_medoid_cells(emb, n_cells)
    # Staged once (the _cell_self_join contract): the frame feeds THREE
    # consumers — both self-join sides and the verdict join — so the
    # n_cells·dim quantizer expression evaluates once, not three times.
    # localCheckpoint locally; at cluster scale write the assigned
    # table to parquet and join that.
    # nrm rides the staged frame: the 3-dot cosine_sql residual fused
    # with the cell self-join consume blew Janino's 64 KB limit and ran
    # interpreted (found r14, fallback=false tripwire) — hoisting the
    # per-vector norms below the shuffle keeps the pair stage compiled;
    # sqrt(flat self-dot) is bit-identical to the inlined form
    assigned = (
        _spread_if_undersplit(emb)
        .withColumn("cell", F.expr(f"array_min({structs_sql}).cell").cast("long"))
        .withColumn("nrm", F.expr(f"sqrt({dot_sql_str('v', 'v', dim)})"))
        .transform(stage_frame)
    )
    dropped = (
        _cell_self_join(assigned, ["id_a", "va"], ["id_b", "vb"], extra=("nrm",))
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.round(
                F.expr(f"({dot_sql_str('va', 'vb', dim)}) / (nrm_a * nrm_b)"),
                decimals,
            )
            >= threshold
        )
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    # verdict join stays an unhinted equi-join on vec_id: `dropped` is
    # data-sized in the worst case (an all-dup corpus), so broadcast is
    # AQE's call, never forced
    return assigned.join(dropped.withColumn("_dup", F.lit(True)), "vec_id", "left").select(
        "vec_id", "cell", F.col("_dup").isNull().alias("is_kept")
    )


def hard_negatives(
    embeddings: DataFrame,
    n_cells: int = 16,
    k: int = 1,
    decimals: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Hard-negative mining for contrastive training: each vector's
    top-``k`` most-similar CELL-LOCAL neighbors with a DIFFERENT label
    — the "looks alike, isn't" pairs a contrastive or reranker
    objective wants as negatives (high-cosine, cross-class).

    Same scale shape as :func:`knn_graph` (one literal-centroid
    assignment, one cell-keyed self-join through the subquery-alias
    form, one src-keyed window), with the label inequality applied
    BEFORE the window so within-class pairs never rank. Ranking on the
    ROUNDED cosine keeps every rank boundary oracle-replayable.

    Returns (src, src_label, neg_rank, dst, dst_label, cosine).
    """
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    _, structs_sql = seeded_medoid_cells(emb, n_cells)
    # r16: stage the assignment once (the directed self-join used to
    # re-evaluate the n_cells·dim quantizer on BOTH sides), hoist the
    # per-vector norm below the shuffle (pair residual = one cross dot
    # + divide, same pattern as knn_graph/semantic_dedup), and score
    # each UNORDERED cross-label pair once, mirroring both
    # orientations (label inequality is symmetric; the mirrored cosine
    # is bit-identical because products commute elementwise and the
    # sum order is shared).
    assigned = (
        _spread_if_undersplit(emb)
        .withColumn("cell", F.expr(f"array_min({structs_sql}).cell").cast("long"))
        .withColumn("nrm", F.expr(f"sqrt({dot_sql_str('v', 'v', dim)})"))
        .transform(stage_frame)
    )
    half = (
        _cell_self_join(assigned, ["id_a", "va"], ["id_b", "vb"], extra=("label", "nrm"))
        .filter((F.col("id_a") < F.col("id_b")) & (F.col("label_a") != F.col("label_b")))
        .select(
            "id_a",
            "label_a",
            "id_b",
            "label_b",
            F.round(
                F.expr(f"({dot_sql_str('va', 'vb', dim)}) / (nrm_a * nrm_b)"),
                decimals,
            ).alias("cosine"),
        )
    )
    pairs = half.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("s"),
                    F.col("label_a").alias("sl"),
                    F.col("id_b").alias("d"),
                    F.col("label_b").alias("dl"),
                ),
                F.struct(
                    F.col("id_b").alias("s"),
                    F.col("label_b").alias("sl"),
                    F.col("id_a").alias("d"),
                    F.col("label_a").alias("dl"),
                ),
            )
        ).alias("e"),
        "cosine",
    ).select(
        F.col("e.s").alias("src"),
        F.col("e.sl").alias("src_label"),
        F.col("e.d").alias("dst"),
        F.col("e.dl").alias("dst_label"),
        "cosine",
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    return (
        pairs.withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("neg_rank") <= k)
        .select("src", "src_label", "neg_rank", "dst", "dst_label", "cosine")
    )


def knn_triangle_stats(
    embeddings: DataFrame,
    n_cells: int = 16,
    k: int = 3,
    decimals: int = 4,
    n_parents: int | None = None,
) -> DataFrame:
    """Per-vector triangle participation + local clustering coefficient
    over the undirected k-NN graph — the neighborhood-density signal
    community detection and near-dup QA read off a similarity graph.

    Undirected edge = the (least, greatest) pair of any directed k-NN
    edge, deduplicated; a triangle is three mutually-connected nodes,
    enumerated once as a < b < c via two equi-joins; lcc(v) =
    2·T(v) / (deg(v)·(deg(v)−1)) for deg ≥ 2 else 0.

    Scale design: every join key is a single node id and the graph is
    DEGREE-BOUNDED by construction (≤ k out-edges per node, so ≤ 2k
    undirected partners): the edge-edge joins fan out at most 2k rows
    per key — linear in corpus size with a k² constant, never the
    unbounded wedge explosion of a power-law graph (the knn builder
    caps exactly what a raw co-occurrence graph cannot).
    """
    g = knn_graph(embeddings, n_cells=n_cells, k=k, n_parents=n_parents)
    # Materialize the undirected edge list ONCE: four plan branches
    # read it (degree + all three triangle-join sides), and without
    # truncation each branch recomputes the full knn-graph lineage
    # (quantizer assignment + cell join + rank window) from scratch —
    # measured ~4.8 s → ~3.2 s at sf0.1. Same staging point as the
    # pagerank / LPA edge lists.
    und = (
        g.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .transform(stage_frame)
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])  # x < y < z by construction
    tri_nodes = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.join(tri_nodes, "v", "left")
        .select(
            F.col("v").alias("vec_id"),
            F.col("deg").cast("long").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
            F.when(
                F.col("deg") >= 2,
                F.round(
                    2.0
                    * F.coalesce("n_triangles", F.lit(0))
                    / (F.col("deg") * (F.col("deg") - 1)),
                    decimals,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )


def maxsim_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    n_tokens: int = 4,
    k: int = 10,
    scale: int = 10**6,
) -> DataFrame:
    """Multi-vector "late interaction" retrieval (ColBERT-style MaxSim)
    → the k docs with the highest ``Σ_q max_t <q, t>`` score, where
    each document is represented by ``n_tokens`` sub-vectors rather
    than one pooled embedding → (vec_id, label, score).

    The fixture corpus has one 64-d vector per doc, so token vectors
    are its ``n_tokens`` contiguous slices (64/n_tokens dims each) — a
    deterministic stand-in for per-token encoder output; the operator
    body is representation-agnostic. The query's token vectors come
    from ``query_vec_id``'s row (one bounded collect — the same
    one-row model-parameter budget as the brute-force query vector).

    Determinism: components are scaled to BIGINT (``round(x·scale)``),
    every dot product is an exact integer sum (16 dims × 10¹² per term
    ≈ 1.6·10¹³ ≪ 2⁶³; the n_tokens² MaxSim sum stays < 10¹⁵), the
    final order is (score DESC, vec_id ASC) — tiebreak-complete, so
    the top-k is bit-identical on any engine or shuffle width.

    Scale shape: the score is a pure literal expression tree — the
    n_tokens query slices ride into the plan as literal arrays, so the
    scan is MAP-SIDE ONLY (no join, no shuffle) and the global top-k
    compiles to TakeOrderedAndProject (per-partition k survivors, one
    k·partitions merge at the driver). At 100 TB this is the exact
    shape you want for a reranker over a candidate set; a first-stage
    retriever would put the IVF family in front of it.
    """
    dim_per = 64 // n_tokens
    sv = embeddings.select(
        "vec_id",
        "label",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * scale).cast("long"),
        ).alias("s"),
    )
    # one-row bounded collect: the query's token matrix
    qrow = sv.filter(F.col("vec_id") == query_vec_id).select("s").collect()[0]["s"]
    qtoks = [
        [int(v) for v in qrow[i * dim_per : (i + 1) * dim_per]]
        for i in range(n_tokens)
    ]

    # Flat unrolled integer dots (the pq_topk / kmeans encode shape —
    # whole-stage-codegen arithmetic, no interpreted HOF lambdas; the
    # zip_with/aggregate form this replaced measured ~1.6x wall at
    # sf0.1). Exact integers, so the rewrite is oracle-identical.
    def dot_lit(tok_idx: int, q: list[int]) -> Column:
        base = tok_idx * dim_per
        return F.expr(
            " + ".join(
                f"element_at(s, {base + e + 1}) * CAST({q[e]} AS BIGINT)"
                for e in range(dim_per)
            )
        )

    score = None
    for q in qtoks:
        best = F.greatest(*[dot_lit(t, q) for t in range(n_tokens)])
        score = best if score is None else score + best
    return (
        sv.filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", "label", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
    )


def pq_reconstruction_error(
    embeddings: DataFrame,
    dim: int = 64,
    n_sub: int = 8,
    n_codes: int = 16,
    scale: int = 10**6,
) -> DataFrame:
    """Quantization-quality audit for the PQ tier → one row per
    subspace: vector count, total and mean squared reconstruction
    error against the best codeword (exact integers in fixed-point
    units of ``scale⁻¹``). This is the codebook-health report a
    serving stack watches — a subspace whose MSE balloons is the one
    whose codebook needs retraining before ADC recall degrades.

    Determinism: components are scaled to BIGINT; each subspace error
    is ``min over codewords of Σ (x−c)²`` — every quantity an exact
    integer (8 dims × (2·10⁶)² × 10⁹ vecs ≈ 3·10²² needs DECIMAL(38)
    for the global SSE past ~10⁷ vectors per partition-sum; the
    registered BIGINT form documents that swap). Codebooks follow the
    seeded-medoid convention (codeword j of subspace m = the j-th
    lowest-vec_id row's m-th subvector, one bounded collect).

    Scale shape: the per-row encode is the SAME symbolic
    literal-matrix array_min as :func:`pq_topk` (map-side, zero
    joins); the rollup is one 8-column aggregate unpivoted via
    ``stack`` — ONE scan, ONE 1-row aggregation, no shuffle of data
    rows at all.
    """
    sub = dim // n_sub
    sv = embeddings.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * scale).cast("long"),
        ).alias("s"),
    )
    seed_rows = sv.orderBy("vec_id").limit(n_codes).select("s").collect()
    books = [
        [[int(v) for v in r["s"][m * sub : (m + 1) * sub]] for r in seed_rows]
        for m in range(n_sub)
    ]

    enc = sv
    for m in range(n_sub):
        cws = "array(" + ",".join(
            "array(" + ",".join(f"CAST({x} AS BIGINT)" for x in cw) + ")"
            for cw in books[m]
        ) + ")"
        d2 = " + ".join(
            f"(element_at(s, {m * sub + e + 1}) - element_at(cw, {e + 1}))"
            f" * (element_at(s, {m * sub + e + 1}) - element_at(cw, {e + 1}))"
            for e in range(sub)
        )
        enc = enc.withColumn(
            f"_e{m}", F.expr(f"array_min(transform({cws}, cw -> {d2}))")
        )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_vecs")] + [
        F.sum(f"_e{m}").cast("long").alias(f"sse_{m}") for m in range(n_sub)
    ]
    wide = enc.agg(*aggs)
    stack_expr = "stack({}, {}) as (subspace, sse)".format(
        n_sub,
        ", ".join(f"CAST({m} AS BIGINT), sse_{m}" for m in range(n_sub)),
    )
    return wide.select("n_vecs", F.expr(stack_expr)).select(
        "subspace",
        "n_vecs",
        "sse",
        (F.round(F.col("sse") / F.col("n_vecs"), 4) + 0.0).alias("mse"),
    ).orderBy("subspace")


def embedding_norm_outliers(
    embeddings: DataFrame,
    k_mad: str = "4.4478",
    scale: int = 10**6,
) -> DataFrame:
    """Vector-QA screen → one row per label: median / MAD of the
    squared embedding norm (exact integers in fixed-point units) and
    the count of vectors beyond ``k_mad``·MAD — the corrupted-vector
    detector of an embedding pipeline (a truncated, zeroed, or
    double-scaled vector shows up as a norm outlier long before it
    poisons ANN recall).

    Same determinism recipe as the MAD event screen
    (operators/profiling.mad_outlier_stats): norms are exact BIGINT
    sums of squared scaled components, medians are EXPLICIT rank
    selections, the threshold comparison multiplies the same literal
    on both engines. One label-keyed rank window over |vectors| rows;
    the 100 TB swap is approx_percentile per label.
    """
    from pyspark.sql import Window

    sv = embeddings.select(
        "vec_id",
        "label",
        F.aggregate(
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: F.round(x * scale).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v * v,
        ).alias("norm2"),
    )
    wv = Window.partitionBy("label").orderBy("norm2", "vec_id")
    wn = Window.partitionBy("label")
    ranked = sv.select(
        "label",
        "vec_id",
        "norm2",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = (
        ranked.filter(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
        )
        .groupBy("label")
        .agg(F.avg("norm2").alias("med"))
    )
    dev = sv.join(F.broadcast(med), "label").withColumn(
        "ad", F.abs(F.col("norm2") - F.col("med"))
    )
    wa = Window.partitionBy("label").orderBy("ad", "vec_id")
    dranked = dev.select(
        "label",
        "ad",
        F.row_number().over(wa).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    mad = (
        dranked.filter(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
        )
        .groupBy("label")
        .agg(F.avg("ad").alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            (F.round(F.min("med"), 4) + 0.0).alias("med_norm2"),
            (F.round(F.min("mad"), 4) + 0.0).alias("mad_norm2"),
            F.sum(
                F.when(F.col("ad") > F.expr(f"{k_mad} * mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("label")
    )
