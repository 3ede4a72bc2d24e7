"""data_engineer_8_final_project_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of the reference
repo ``haryo22/data-engineer-8-final-project`` (batch ETL: scrape →
clean/derive → conditional aggregate → rank → persist, plus a declared
Kafka/streaming leg), built Spark-first:

- DataFrame / Spark SQL only on hot paths (Catalyst + Tungsten do the
  optimization); zero row-at-a-time Python UDFs for reference parity.
- Explicit ``StructType`` schemas everywhere (no inference).
- Structured Streaming for the streaming leg.
- Extended large-scale training-data operators (dedup, similarity
  search, text analytics) as first-class citizens.

Package layout:

- ``session``    — SparkSession factory (AQE on, UTC session tz).
- ``schemas``    — explicit schemas for every fixture table.
- ``catalog``    — fixture loader / temp-view registration.
- ``functions``  — scalar cleaning/derivation expression builders.
- ``operators``  — relational + flagship + extended operators.
- ``sources``    — batch readers/writers (parquet/csv/jdbc).
- ``streaming``  — Structured Streaming leg.
- ``registry``   — named query registry + DuckDB oracle SQL
  (the driver-facing correctness surface).
"""

__version__ = "0.1.0"
