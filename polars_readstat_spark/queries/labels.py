"""Value-label / catalog-label decode queries (SURVEY.md §2.5).

The reference decodes labeled numeric codes to label strings at scan
time (Stata/SPSS value labels, SAS catalog formats), with unlabeled
codes falling back to the numeric rendered as a string
(reference src/stata/data.rs:1050-1103; __init__.py:476-495).

Spark-first expression: a broadcast join against the (tiny) label
dimension + COALESCE fallback — no shuffle on the fact side beyond
what downstream ops need — or a literal CASE/map expression when the
label set is known at plan time (stays inside WholeStageCodegen).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_readstat_spark.queries.registry import query
from polars_readstat_spark.tables import load_table


@query(
    "value_label_broadcast_decode",
    oracle="""
    SELECT c.c_custkey,
           COALESCE(n.n_name, CAST(c.c_nationkey AS VARCHAR)) AS nation_label
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def value_label_broadcast_decode(spark, sf_dir):
    """T1/T2: labeled-code decode as broadcast map join with
    numeric-as-string fallback for unlabeled codes."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("n_name"), F.col("c_nationkey").cast("string")).alias(
                "nation_label"
            ),
        )
    )


@query(
    "catalog_label_case_decode",
    oracle="""
    SELECT CASE WHEN o_orderstatus = 'O' THEN 'Open'
                WHEN o_orderstatus = 'F' THEN 'Finished'
                WHEN o_orderstatus = 'P' THEN 'Pending'
                ELSE CAST(o_orderstatus AS VARCHAR) END AS status_label,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def catalog_label_case_decode(spark, sf_dir):
    """T3: SAS-catalog-style label apply — literal map with
    cast-to-string default (reference replace_strict semantics,
    __init__.py:487-494). Plan-time literals → codegen'd CASE chain."""
    o = load_table(spark, sf_dir, "orders")
    labels = {"O": "Open", "F": "Finished", "P": "Pending"}
    expr = None
    for code, lab in labels.items():
        cond = F.when(F.col("o_orderstatus") == code, F.lit(lab))
        expr = cond if expr is None else expr.when(F.col("o_orderstatus") == code, F.lit(lab))
    expr = expr.otherwise(F.col("o_orderstatus").cast("string"))
    return o.groupBy(expr.alias("status_label")).agg(F.count(F.lit(1)).alias("n"))
