"""Text-analytics operators over the ``documents`` table.

Large-scale training-data pipeline surface (BASELINE north star):
token counting, quality scoring, language-ID heuristics, shingling,
document fingerprinting. All pure ``pyspark.sql.functions`` — split /
higher-order array functions / md5 — no Python UDFs, so every operator
stays inside whole-stage codegen and scales linearly with input
partitions (no shuffle except the final aggregations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..stage import stage_frame

#: Stopword list for quality scoring / language-ID heuristics.
#: Deterministic and engine-agnostic (mirrored into oracle SQL literals).
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (the only tokenizer the fixture corpus needs)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("long")


def stopword_count(col: Column | str) -> Column:
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(stop, t))).cast("long")


def shingles(col: Column | str, n: int = 3) -> Column:
    """n-token shingles as an array<string> (space-joined), via zip_with
    over n shifted slices of the token array.

    shingle[i] = toks[i] ' ' toks[i+1] ... ' ' toks[i+n-1], i in
    0..len-n; empty array when the document is shorter than n tokens
    (every slice length clamps to 0). Equivalent to the textbook
    transform(sequence(0, len-n), i -> concat(get...)) formulation but
    ~10x faster: per-element get() lambdas are interpreted per access,
    while zip_with walks each slice once.
    """
    toks = tokens(col)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    out = F.slice(toks, 1, m)
    for j in range(2, n + 1):
        out = F.zip_with(out, F.slice(toks, j, m), lambda a, b: F.concat_ws(" ", a, b))
    return out


def fingerprint(col: Column | str) -> Column:
    """Deterministic content fingerprint (md5 hex — portable across engines)."""
    return F.md5(col)


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality scoring (length / diversity / stopword ratios).

    Adds: n_tokens, n_distinct_tokens, type_token_ratio, stopword_ratio,
    avg_token_len. Ratios rounded to 4 so they hash-match the oracle.
    """
    c = F.col(text_col)
    n_tok = token_count(c)
    n_dis = distinct_token_count(c)
    n_stop = stopword_count(c)
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("n_distinct_tokens", n_dis)
        .withColumn(
            "type_token_ratio",
            F.round(F.col("n_distinct_tokens") / F.col("n_tokens"), 4),
        )
        .withColumn("stopword_ratio", F.round(n_stop / F.col("n_tokens"), 4))
        .withColumn(
            "avg_token_len",
            F.round(
                (F.length(F.trim(c)) - (F.col("n_tokens") - 1)) / F.col("n_tokens"), 4
            ),
        )
    )


#: Language-ID marker words: first match wins (deterministic chain).
LANG_MARKERS: tuple[tuple[str, str], ...] = (
    ("the", "en"),
    ("spark", "tech"),
)


def lang_id_heuristic(col: Column | str) -> Column:
    """Marker-token language guess (n-gram-heuristic stand-in).

    The fixture corpus is synthetic, so this demonstrates the operator
    shape (deterministic token-marker voting) rather than a real model;
    a production pipeline would swap in fastText via pandas_udf.
    """
    toks = tokens(col)
    expr = F.lit("unknown")
    for marker, lang in reversed(LANG_MARKERS):
        expr = F.when(F.array_contains(toks, marker), lang).otherwise(expr)
    return expr


#: PII patterns — RE2-safe subset (no backrefs/lookarounds) so the same
#: pattern strings run verbatim in Spark (java.util.regex) and DuckDB
#: (RE2), keeping the scrub oracle value-exact.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"


def pii_scrub(col: Column | str) -> Column:
    """Mask emails then phone numbers with typed placeholder tokens.

    Order matters (emails can contain digit runs); applying the same
    two regexp_replace passes in the same order is the whole contract,
    so any engine reproduces the output byte-for-byte.
    """
    c = F.regexp_replace(col, PII_EMAIL, "<EMAIL>")
    return F.regexp_replace(c, PII_PHONE, "<PHONE>")


def pii_counts(col: Column | str) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in the column — audit counts.

    Phones are counted AFTER the email pass (mirroring the scrub order)
    so digit runs inside an address are never double-counted.
    """
    n_email = F.size(F.regexp_extract_all(col, F.lit(PII_EMAIL), F.lit(0))).cast("long")
    after_email = F.regexp_replace(col, PII_EMAIL, "<EMAIL>")
    n_phone = F.size(
        F.regexp_extract_all(after_email, F.lit(PII_PHONE), F.lit(0))
    ).cast("long")
    return n_email, n_phone


def unigram_logprob_scores(
    documents: DataFrame, text_col: str = "text", decimals: int = 4
) -> DataFrame:
    """Per-document mean unigram negative log-probability → language-model
    quality proxy → (doc_id, n_tokens, avg_neg_logprob).

    Two aggregations over one tokenized pass: (1) corpus unigram
    frequencies (token-keyed shuffle, vocabulary-sized result), (2) a
    token→doc join feeding the per-document mean of −ln p(token).
    Gibberish and boilerplate separate cleanly on this score, which is
    the cheap stand-in for perplexity filtering in training-data
    pipelines (no model needed). All built-ins; the token join is the
    only wide op. At 100 TB its key (token) is Zipf-skewed — hot
    stopword keys are exactly what AQE skew-join splitting (session
    default) handles — and the frequency side is vocabulary-sized, so
    for natural-language vocabularies it broadcasts and the join
    degenerates to a map-side lookup.
    """
    # r16: tokenize ONCE — the token stream feeds three consumers (the
    # 1-row total, the frequency aggregation, and the join probe side),
    # each of which re-ran the regex tokenizer unstaged. The staged
    # frame is the narrow (doc_id, tokens) projection (cluster-scale
    # staging point: a parquet write); the per-consumer explode is a
    # cheap in-row generator by comparison.
    tf = documents.select("doc_id", tokens(text_col).alias("t")).transform(
        stage_frame
    )
    tok = tf.select("doc_id", F.explode("t").alias("tok"))
    # Corpus token total as a 1-row aggregate broadcast-cross-joined in,
    # NOT a tok.count() round-trip through the driver. (The staged
    # tokenize above already scans the corpus eagerly at construction —
    # the aggregate form's remaining value is keeping the total off the
    # driver and inside the one staged-frame read.)
    total = tok.agg(F.count(F.lit(1)).cast("double").alias("_total_tokens"))
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    return (
        tok.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("tf") / F.col("_total_tokens"))), decimals
            ).alias("avg_neg_logprob"),
        )
    )


def repetition_scores(
    documents: DataFrame, text_col: str = "text", decimals: int = 4
) -> DataFrame:
    """Gopher-style repetition metrics per document →
    (doc_id, n_bigrams, top_bigram_frac, dup_bigram_frac, keep).

    The fixture corpus is a newline-free word stream, so the line-based
    Gopher gates reduce to their n-gram forms: ``top_bigram_frac`` =
    occurrences of the document's most frequent bigram over its bigram
    count; ``dup_bigram_frac`` = fraction of bigram instances that are
    repeats of an earlier instance. ``keep`` applies the standard
    repetition gate (drop boilerplate/spam-like docs).

    Shape: explode bigrams → count per (doc_id, bigram) → rollup per
    doc. Both shuffles key on doc_id(+gram) — uniform, skew-free; the
    text itself never shuffles (grams are short strings; at 100 TB
    hash the gram first if gram cardinality dwarfs memory).
    """
    # r16 note: an in-row rewrite (array_sort + aggregate() run-length
    # walk per document — zero shuffles) was value-identical but
    # measured 40% SLOWER isolated at sf0.1 (1.73 -> 2.43 s steady):
    # the per-element HOF lambda dispatch costs more than the two
    # hash-aggregation exchanges it removes at this scale. Reverted;
    # the explode form's shuffles carry (doc_id, gram) keys only.
    grams = documents.select(
        "doc_id", F.explode(shingles(text_col, 2)).alias("g")
    )
    per_gram = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    top_frac = F.round(F.max("c") / F.sum("c"), decimals)
    dup_frac = F.round((F.sum("c") - F.count(F.lit(1))) / F.sum("c"), decimals)
    return per_gram.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        top_frac.alias("top_bigram_frac"),
        dup_frac.alias("dup_bigram_frac"),
        ((F.max("c") / F.sum("c") <= 0.18) & ((F.sum("c") - F.count(F.lit(1))) / F.sum("c") <= 0.6)).alias("keep"),
    )


def dup_span_stats(
    documents: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-corpus duplicated-span measurement → (doc_id, n_spans,
    n_dup_spans, dup_span_frac).

    The span-level view of exact dedup (the "deduplicating training
    data makes language models better" measurement): an n-token span is
    DUPLICATED if its exact text occurs more than once in the corpus
    (any document, including elsewhere in its own); a document's
    dup_span_frac is the fraction of its spans that are duplicated —
    the signal a pipeline thresholds to drop or trim boilerplate-heavy
    documents that whole-document hashing can never catch.

    Scale shape: one explode of n-token shingles (rows = corpus token
    count; the repartition spreads the shingle construction off a
    single-file scan — same idiom as the winnowing op), one count
    aggregation on the span text, one semi-style join back, one
    per-doc count — all hash-partitioned, no windows, no driver data.
    The same postings discipline as ngram_decontamination; at 100 TB
    the span strings would ride as 64-bit hashes (xxhash of the
    shingle) to cut shuffle bytes — kept as text here so the DuckDB
    oracle is exact.
    """
    spark = documents.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # r16 note: staging the span arrays once (localCheckpoint) for the
    # two consumers was tried and REVERTED — isolated A/B read 2.06 ->
    # 2.79 s steady: writing + re-reading the span-array blocks costs
    # more than re-running the tokenize + assembly at this scale, and
    # the two consumers' scans pipeline inside one whole-stage anyway.
    spans = (
        documents.repartition(n_parts, id_col)
        .select(id_col, F.explode(shingles(text_col, n)).alias("span"))
    )
    counts = spans.groupBy("span").agg(F.count(F.lit(1)).alias("c"))
    dup_per_doc = (
        spans.join(counts.filter(F.col("c") > 1), "span")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_spans"))
    )
    base = documents.select(
        id_col,
        F.greatest(token_count(text_col) - (n - 1), F.lit(0)).alias("n_spans"),
    )
    return (
        base.join(dup_per_doc, id_col, "left")
        .select(
            id_col,
            "n_spans",
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            (
                F.coalesce("n_dup_spans", F.lit(0))
                / F.greatest(F.col("n_spans"), F.lit(1)).cast("double")
            ).alias("dup_span_frac"),
        )
    )


def bigram_logprob_scores(
    documents: DataFrame, text_col: str = "text", decimals: int = 4
) -> DataFrame:
    """Per-document mean bigram negative log-probability — the add-1
    bigram LM upgrade of :func:`unigram_logprob_scores`:
    ``P(cur|prev) = (count(prev,cur) + 1) / (count(prev·) + |V|)``.

    Shape: one in-row transform produces adjacent pairs (no cross-row
    state — pairs never leave their document), two corpus count
    aggregations (bigram-keyed and prev-keyed, both map-side-combining
    to vocabulary-sized frames), the |V| scalar rides a 1-row
    broadcast, and one doc-keyed rollup. Same Zipf-skew story as the
    unigram scorer: hot stopword join keys are AQE skew-split
    territory, and both count frames broadcast for natural-language
    vocabularies. Docs with fewer than 2 tokens have no bigrams and
    are excluded (the fixture minimum is 10).
    """
    # r16: tokenize ONCE. Four consumers read the token stream (the
    # bigram join's probe side, the two count aggregations, and the
    # vocab scalar) — unstaged, each re-ran the regex tokenizer over
    # the full corpus (the dominant per-row cost; 18 Exchange nodes /
    # four document scans in the before plan). The staged frame is the
    # narrow (doc_id, tokens) projection; at cluster scale the staging
    # point is a parquet write. ``vocab`` reads the UNFILTERED frame,
    # exactly as it read the raw documents before.
    tf = documents.select("doc_id", tokens(text_col).alias("t")).transform(
        stage_frame
    )
    t = tf.filter(F.size("t") >= 2)
    bg = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> struct(element_at(t, i) AS prev, element_at(t, i + 1) AS cur))"
            )
        ).alias("b"),
    ).select("doc_id", "b.prev", "b.cur")
    vocab = tf.select(F.explode("t").alias("tok")).agg(
        F.countDistinct("tok").cast("double").alias("_v")
    )
    bgf = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("bc"))
    pf = bg.groupBy("prev").agg(F.count(F.lit(1)).alias("pc"))
    return (
        bg.join(bgf, ["prev", "cur"])
        .join(pf, "prev")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.avg(-F.log((F.col("bc") + 1) / (F.col("pc") + F.col("_v")))), decimals
            ).alias("avg_neg_logprob"),
        )
    )
