"""Declared-query registry: name → (Spark callable, DuckDB oracle SQL).

See registry.py for conventions. ``all_queries()`` / ``all_oracles()``
are the surface ``__spark_entry__.py`` exposes to the driver.
"""

from polars_readstat_spark.queries.registry import all_oracles, all_queries  # noqa: F401
