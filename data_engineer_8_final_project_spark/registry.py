"""Named query registry: the driver-facing correctness surface.

Every implemented operator from SURVEY.md §2 is registered here as a
:class:`Query`: a callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) an equivalent ANSI-SQL oracle string that DuckDB runs
over the same parquet tables. The driver compares row-count + schema +
order-insensitive value hash, so:

- every computed column is aliased IDENTICALLY in the Spark code and
  the oracle SQL;
- integer aggregate outputs are cast to BIGINT on both sides (DuckDB
  ``SUM(int)`` returns HUGEINT, Spark returns LONG);
- no wall-clock anywhere (FIXTURES.md determinism rules);
- every ranked output has a tiebreak-complete ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from . import catalog

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    """One registered engine query + its DuckDB oracle."""

    name: str
    fn: QueryFn
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    survey_ref: str = ""  # SURVEY.md §2 operator ids this query covers
    tags: tuple[str, ...] = field(default=tuple)


_REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None, survey_ref: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Name → Query for every registered query (imports all modules)."""
    # Import for side effects: each module registers its queries.
    from .queries import (  # noqa: F401
        core,
        extended,
        flagship,
        multimodal_q,
        reference_pipeline,
        scalar,
        streaming_q,
    )

    return dict(_REGISTRY)


def tables_for(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load + view-register the fixture tables for one query run."""
    return catalog.load(spark, sf_dir)
