"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary aggregation at
sf0.001; ``queries()`` / ``oracle_sql()`` expose the full registry in
polars_readstat_spark/queries/ (one entry per implemented operator
from SURVEY.md §2 plus the training-pipeline additions), compared by
the driver against DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from polars_readstat_spark.queries import all_queries
    from polars_readstat_spark.session import configure_existing

    configure_existing(spark)
    return all_queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from polars_readstat_spark.queries import all_queries
    from polars_readstat_spark.session import configure_existing

    registry = all_queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_existing(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in registry.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    from polars_readstat_spark.queries import all_oracles

    return all_oracles()
