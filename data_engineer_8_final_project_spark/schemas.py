"""Explicit schemas for every table the engine touches.

Rule (SURVEY.md §1.3): the reference relied on inference everywhere
(pandas dict inference, ``spark.createDataFrame`` without a schema at
reference spark-scripts/spark-project.py:64, ``to_sql`` dtype
derivation); this engine never infers — every source read passes one of
these ``StructType``s.

Group A mirrors the reference-native shapes (FIXTURES.md §A, with
reference file:line provenance); group B is the driver fixture star
schema (FIXTURES.md §B, verified against the parquet footers).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# A. Reference-native shapes
# --------------------------------------------------------------------------

#: Raw scraped match rows (reference dags/projectde_dag.py:49-55).
MATCH_RAW = T.StructType(
    [
        T.StructField("date", T.StringType(), False),
        T.StructField("home_team", T.StringType(), False),
        T.StructField("score", T.StringType(), False),
        T.StructField("away_team", T.StringType(), False),
        T.StructField("league", T.StringType(), False),
    ]
)

#: Cleaned matches (reference dags/projectde_dag.py:124-129 reselect list).
MATCH_CLEAN = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("day", T.StringType(), False),
        T.StructField("date", T.StringType(), False),
        T.StructField("match_date", T.DateType(), True),
        T.StructField("home_team", T.StringType(), False),
        T.StructField("home_score", T.IntegerType(), True),
        T.StructField("away_team", T.StringType(), False),
        T.StructField("away_score", T.IntegerType(), True),
        T.StructField("league", T.StringType(), False),
        T.StructField("created_at", T.StringType(), False),
        T.StructField("result_home", T.IntegerType(), False),
        T.StructField("result_away", T.IntegerType(), False),
    ]
)

#: Retail CSV ingest table (reference sql/ddl-retail.sql:2-11, verbatim).
RETAIL = T.StructType(
    [
        T.StructField("InvoiceNo", T.StringType(), False),
        T.StructField("StockCode", T.StringType(), False),
        T.StructField("Description", T.StringType(), True),
        T.StructField("Quantity", T.IntegerType(), False),
        T.StructField("InvoiceDate", T.DateType(), False),
        T.StructField("UnitPrice", T.DoubleType(), False),
        T.StructField("CustomerID", T.StringType(), True),
        T.StructField("Country", T.StringType(), False),
    ]
)

# --------------------------------------------------------------------------
# B. Driver fixture star schema (/root/testdata/sf*/ — FIXTURES.md §B)
# --------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), False),
        T.StructField("r_name", T.StringType(), False),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), False),
        T.StructField("n_name", T.StringType(), False),
        T.StructField("n_regionkey", T.IntegerType(), False),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), False),
        T.StructField("c_name", T.StringType(), False),
        T.StructField("c_nationkey", T.IntegerType(), False),
        T.StructField("c_acctbal", T.DoubleType(), False),
        T.StructField("c_mktsegment", T.StringType(), False),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), False),
        T.StructField("s_name", T.StringType(), False),
        T.StructField("s_nationkey", T.IntegerType(), False),
        T.StructField("s_acctbal", T.DoubleType(), False),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), False),
        T.StructField("p_name", T.StringType(), False),
        T.StructField("p_brand", T.StringType(), False),
        T.StructField("p_type", T.StringType(), False),
        T.StructField("p_size", T.IntegerType(), False),
        T.StructField("p_retailprice", T.DoubleType(), False),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_custkey", T.LongType(), False),
        T.StructField("o_orderstatus", T.StringType(), False),
        T.StructField("o_totalprice", T.DoubleType(), False),
        T.StructField("o_orderdate", T.TimestampType(), False),
        T.StructField("o_orderpriority", T.StringType(), False),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), False),
        T.StructField("l_partkey", T.LongType(), False),
        T.StructField("l_suppkey", T.LongType(), False),
        T.StructField("l_linenumber", T.IntegerType(), False),
        T.StructField("l_quantity", T.DoubleType(), False),
        T.StructField("l_extendedprice", T.DoubleType(), False),
        T.StructField("l_discount", T.DoubleType(), False),
        T.StructField("l_tax", T.DoubleType(), False),
        T.StructField("l_returnflag", T.StringType(), False),
        T.StructField("l_linestatus", T.StringType(), False),
        T.StructField("l_shipdate", T.TimestampType(), False),
    ]
)

#: Events table — one definition, shared by batch readers, streaming
#: readers (file replay and Kafka JSON decode), and createDataFrame in
#: tests. The fixture stores ``ts`` as parquet TIMESTAMP(µs, NTZ);
#: reading it as TimestampType is oracle-correct ONLY under the UTC
#: session-timezone pin (session.py) — the same convention orders and
#: lineitem use, and the one DuckDB hashes against. catalog.load_table
#: asserts the physical footer type so a future fixture re-encode
#: fails loudly instead of producing wrong answers (this drift burned
#: rounds 3–4 when the fixture moved from INT64-nanos to TIMESTAMP).
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), False),
    ]
)

#: ``events.props`` JSON payload schema (for F.from_json).
EVENT_PROPS = T.StructType([T.StructField("k", T.IntegerType(), True)])

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("n_chars", T.LongType(), False),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType(), True), False),
        T.StructField("label", T.IntegerType(), False),
    ]
)

#: All driver fixture tables, keyed by view/table name.
FIXTURE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
