"""Row-order / row-identity operator queries (SURVEY.md §2.3).

The reference's preserve_order modes guarantee exact file-row indices
under parallel scans (reference src/sas/polars_output.rs:443-506,
src/lib.rs:380-398). On an ordered key these translate to ranked
windows; the data-source-side exact partition-offset index lives in
operators/row_index.py and is pytest-verified against file order.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from polars_readstat_spark.queries.registry import query
from polars_readstat_spark.tables import load_table


@query(
    "row_index_ordered",
    oracle="""
    SELECT o_orderkey,
           ROW_NUMBER() OVER (ORDER BY o_orderkey) AS row_idx
    FROM orders
    """,
)
def row_index_ordered(spark, sf_dir):
    """O2/O3: global row index over a total order. A single-partition
    window is the semantic spec; at scale the data source computes the
    same index shuffle-free from per-partition row offsets."""
    o = load_table(spark, sf_dir, "orders")
    w = W.orderBy("o_orderkey")
    return o.select("o_orderkey").withColumn("row_idx", F.row_number().over(w))


@query(
    "sort_by_index_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey FROM (
      SELECT o_orderkey, o_custkey,
             ROW_NUMBER() OVER (ORDER BY o_orderkey DESC) AS idx
      FROM orders
    ) ORDER BY idx
    """,
)
def sort_by_index_roundtrip(spark, sf_dir):
    """O3: scan-with-index then sort(idx).drop(idx)
    (reference __init__.py:674-675)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.orderBy(F.col("o_orderkey").desc())
    return (
        o.select("o_orderkey", "o_custkey")
        .withColumn("idx", F.row_number().over(w))
        .orderBy("idx")
        .drop("idx")
    )
