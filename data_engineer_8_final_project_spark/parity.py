"""Local differential-oracle harness (mirror of the driver's t2 gate).

Runs a registered Spark query and its DuckDB oracle over the same
parquet fixtures and compares row-count + column names/types +
order-insensitive values — the same contract the driver applies
(``__spark_entry__.py`` docstring). Used by tests/test_parity.py so
every registered query is verified locally before the driver sees it.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .catalog import TABLE_NAMES

#: double columns are rounded to this many decimals before compare —
#: Spark and DuckDB may legally differ in floating-point summation order.
FLOAT_DECIMALS = 6


def run_oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    """Run oracle SQL in DuckDB with fixture views registered (driver-alike)."""
    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        return con.execute(sql).fetchdf()
    finally:
        con.close()


@dataclass
class ParityResult:
    ok: bool
    detail: str


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, float-rounded, row-sorted canonical frame."""
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].round(FLOAT_DECIMALS)
        elif out[c].dtype == object:
            out[c] = out[c].map(
                lambda v: round(v, FLOAT_DECIMALS) if isinstance(v, float) else v
            )
    out = out.sort_values(by=list(out.columns), ignore_index=True, kind="mergesort")
    return out


def _strict_hash(df: pd.DataFrame) -> str:
    """The driver's value hash: column-name-sorted, everything rendered
    via astype(str), row-sorted, md5 of the csv. Stricter than the
    tolerant compare below — a DECIMAL column rendering '…328.50'
    against a DOUBLE's '…328.5' is numerically equal but hash-distinct
    (round-8 lesson: Spark SQL parses bare decimal literals as
    DECIMAL; the tolerant compare passed while the driver hash would
    not have)."""
    import hashlib

    out = df[sorted(df.columns)].astype(str)
    out = out.sort_values(by=sorted(out.columns), ignore_index=True)
    return hashlib.md5(out.to_csv(index=False).encode()).hexdigest()


def compare(spark_df: DataFrame, oracle_df: pd.DataFrame) -> ParityResult:
    """Compare a Spark result against the oracle frame, driver-style."""
    got = spark_df.toPandas()
    if sorted(got.columns) != sorted(oracle_df.columns):
        return ParityResult(
            False, f"column mismatch: spark={sorted(got.columns)} oracle={sorted(oracle_df.columns)}"
        )
    if len(got) != len(oracle_df):
        return ParityResult(False, f"row count: spark={len(got)} oracle={len(oracle_df)}")
    a, b = _canon(got), _canon(oracle_df)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            # None / NaT / NaN all count as "both null" (pd.isna on a
            # scalar; NaT != NaT would otherwise fail nullable columns)
            try:
                if pd.isna(x) and pd.isna(y):
                    continue
            except (TypeError, ValueError):
                pass
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                    return ParityResult(False, f"value mismatch col={c} row={i}: {x!r} != {y!r}")
            elif x != y:
                # pandas may surface ints as numpy vs python types; compare loosely
                try:
                    if float(x) == float(y):
                        continue
                except (TypeError, ValueError):
                    pass
                return ParityResult(False, f"value mismatch col={c} row={i}: {x!r} != {y!r}")
    if _strict_hash(got) != _strict_hash(oracle_df):
        return ParityResult(
            False,
            "strict-hash mismatch (values numerically equal but render "
            "differently — check for DECIMAL-vs-DOUBLE literals, "
            "trailing zeros, or -0.0)",
        )
    return ParityResult(True, f"ok rows={len(got)} cols={len(a.columns)}")


def check_query(spark: SparkSession, name: str, sf_dir: str) -> ParityResult:
    """Run one registered query against its oracle."""
    from .registry import all_queries

    q = all_queries()[name]
    spark_df = q.fn(spark, sf_dir)
    if q.oracle is None:
        n = spark_df.count()
        return ParityResult(True, f"rows-only (no oracle): rows={n}")
    return compare(spark_df, run_oracle(sf_dir, q.oracle))
