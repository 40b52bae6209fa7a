"""polars_readstat_spark — a PySpark-native statistical-file analytics engine.

A from-scratch re-expression of the capabilities of the reference
``jrothbaum/polars_readstat`` engine (see SURVEY.md) on top of Apache
Spark:

- custom Spark data sources (Python Data Source API) for SAS / Stata /
  SPSS statistical file formats (``sources/``),
- scan-time transform operators (value-label decode, informative nulls,
  type compression, row-order control, metadata surface) expressed as
  Catalyst-friendly DataFrame transforms (``operators/``),
- large-scale training-data-pipeline functions (dedup, similarity
  search, text analysis, multimodal plumbing) (``functions/``),
- structured-streaming equivalents (``streaming/``).

Everything downstream of the scan (joins, aggregations, windows, sorts)
is plain Spark DataFrame / Catalyst — mirroring how the reference
delegates relational algebra to the host Polars lazy engine.
"""

from polars_readstat_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"


def register(spark):
    """Register the `readstat` data source with a SparkSession.

    After this, ``spark.read.format("readstat").load("f.dta")`` works.
    Mirrors the reference's ``register_io_source`` integration
    (reference: polars_readstat/__init__.py:663).
    """
    from polars_readstat_spark.sources.datasource import ReadstatDataSource

    spark.dataSource.register(ReadstatDataSource)
    return spark
