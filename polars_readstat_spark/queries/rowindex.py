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
    "row_index_collision_guard",
    oracle="""
    SELECT 'ValueError' AS error_class,
           CAST(1 AS INT) AS names_column,
           CAST(1 AS INT) AS raised
    """,
)
def row_index_collision_guard(spark, sf_dir):
    """O4: row_index_name colliding with an existing column is an
    analysis-time error, not silent column shadowing (reference
    src/lib.rs:380-398 rejects the same collision). The query attempts
    the colliding scan, catches the rejection, and reports WHAT was
    raised as a 1-row frame so the driver's oracle can check the guard
    itself — the only §2 operator whose observable output is an error.
    """
    import polars_readstat_spark as prs
    from polars_readstat_spark.queries.scanio import ensure_readstat_file

    path = ensure_readstat_file(spark, sf_dir, "dta")
    prs.register(spark)
    raised, names_column, error_class = 0, 0, ""
    try:
        df = (
            spark.read.format("readstat")
            .option("row_index_name", "l_orderkey")
            .load(path)
        )
        df.schema  # force analysis in case load() deferred it
    except Exception as e:  # noqa: BLE001 — the error IS the result
        raised = 1
        blob = f"{type(e).__name__} {e}"
        if "collides with a column" in blob and "l_orderkey" in blob:
            names_column = 1
        # Spark surfaces Python-datasource errors wrapped; the original
        # class name survives in the message chain
        error_class = (
            "ValueError" if "ValueError" in blob or isinstance(e, ValueError)
            else type(e).__name__
        )
    # literal select over range(1), not createDataFrame: the local
    # 1-row Arrow upload costs ~0.33 s per call where the literal
    # plan is ~0.09 s — this probe's wall should be dominated by the
    # analysis cycle under test, not by materializing its verdict
    # (VERDICT r09 next#6)
    return spark.range(1).select(
        F.lit(error_class).alias("error_class"),
        F.lit(names_column).cast("int").alias("names_column"),
        F.lit(raised).cast("int").alias("raised"),
    )


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
