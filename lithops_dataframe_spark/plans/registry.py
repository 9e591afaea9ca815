"""Registry mapping query names → (Spark builder, optional DuckDB oracle SQL).

Contract (driver-defined):
- builder: ``Callable[[SparkSession, str], DataFrame]`` — takes the session
  and an sf_dir containing the fixture parquet files.
- oracle: ANSI SQL string DuckDB can run with the fixture tables
  pre-registered as views. Column names MUST match the Spark result —
  the driver sorts columns by name before value-hashing.
- Non-SQL-expressible ops register ``oracle=None`` → rows-only check.

Float discipline: every aggregated/computed double column is rounded to a
fixed number of decimals in BOTH the Spark builder and the oracle SQL, so
value-hash comparison is immune to last-ulp summation-order differences
between engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query builder and its oracle SQL under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def query_names() -> list[str]:
    return sorted(QUERIES)
