"""Semantic unit tests for the dedup operator tiers (SURVEY.md §4 extended).

Parity vs DuckDB is covered by test_parity; these pin the *semantics*
on hand-computable inputs: identical texts collapse, near-identical
texts land within small Hamming/Jaccard distance, unrelated texts
produce no pair.
"""

from __future__ import annotations

from data_engineer_8_final_project_spark.operators import dedup

BASE = "the quick brown fox jumps over the lazy dog " * 5


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_identical_docs_hamming_zero(spark):
    df = _docs(spark, [(1, BASE), (2, BASE), (3, "completely different words here " * 8)])
    pairs = dedup.simhash_near_dup_pairs(df, max_hamming=3).collect()
    assert [(r.doc_a, r.doc_b, r.hamming) for r in pairs] == [(1, 2, 0)]


def test_simhash_near_identical_small_hamming(spark):
    edited = BASE.replace("lazy", "sleepy")  # 5 of ~45 token occurrences
    df = _docs(spark, [(1, BASE), (2, edited)])
    pairs = dedup.simhash_near_dup_pairs(df, max_hamming=20).collect()
    assert len(pairs) == 1
    # a small edit may flip zero vote signs — only the upper bound is guaranteed
    assert pairs[0].hamming <= 20


def test_simhash_signature_deterministic(spark):
    df = _docs(spark, [(1, BASE), (2, "other text entirely")])
    a = {r.doc_id: r.simhash for r in dedup.simhash_signatures(df).collect()}
    b = {r.doc_id: r.simhash for r in dedup.simhash_signatures(df.repartition(7)).collect()}
    assert a == b
    assert all(0 <= v < (1 << dedup.SIMHASH_BITS) for v in a.values())


def test_exact_dedup_groups(spark):
    df = _docs(spark, [(1, "aaa"), (2, "aaa"), (3, "bbb")])
    got = {
        (r.canonical_doc_id, r.n_copies) for r in dedup.exact_dedup_groups(df).collect()
    }
    assert got == {(1, 2), (3, 1)}


def test_jaccard_identical_docs_score_one(spark):
    df = _docs(spark, [(1, BASE), (2, BASE), (3, "unrelated totally distinct tokens " * 10)])
    pairs = dedup.jaccard_candidate_pairs(df, shingle_n=3, min_shared=2, max_df=100).collect()
    assert [(r.doc_a, r.doc_b) for r in pairs] == [(1, 2)]
    assert pairs[0].jaccard == 1.0


def test_salted_count_distinct_matches_direct(spark):
    """Salted two-level distinct equals the direct distinct count,
    including under a heavily skewed key distribution."""
    from pyspark.sql import functions as F

    from data_engineer_8_final_project_spark.operators.skew import salted_count_distinct

    rows = [("hot", i % 97) for i in range(5000)] + [("cold", i) for i in range(13)]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        r.k: r.n_distinct
        for r in salted_count_distinct(df, ["k"], "v", n_salts=8).collect()
    }
    want = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == want == {"hot": 97, "cold": 13}
