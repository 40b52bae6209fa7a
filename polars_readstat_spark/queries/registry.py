"""Registry wiring SURVEY.md §2 operators to (Spark query, DuckDB oracle) pairs.

Each implemented operator registers a named query: a callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an ANSI
SQL string DuckDB runs over the same parquet tables. The driver
compares row-count + schema + order-insensitive value hash, sorting
columns by name — so every computed column is aliased identically on
both sides, and output types are restricted to
int/bigint/double/string/date/boolean (timestamps are emitted as epoch
seconds or dates: Spark collects tz-aware µs timestamps while DuckDB
yields naive ones, which would spuriously hash-mismatch).

Float determinism: monetary aggregates go through DECIMAL so the
aggregation is exact and order-independent (Spark sums doubles in
partition-completion order; a double sum would wobble in the last ulp),
then cast to double at the end — both engines do correctly-rounded
decimal→binary conversion, so the hashes match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register a named query and its optional DuckDB oracle."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    # import for side effect: each module registers its queries
    from polars_readstat_spark.queries import (  # noqa: F401
        compress,
        dedup,
        labels,
        nulls,
        relational,
        rowindex,
        sampling,
        scanio,
        similarity,
        text,
        timeseries,
    )

    _LOADED = True
