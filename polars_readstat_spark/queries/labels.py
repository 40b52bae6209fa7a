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


_CAT_FIXTURE = "tests/fixtures/sas7bcat/formats.sas7bcat"
_CAT_FORMATS = ("REGIONF", "LEVELF", "$FRAMEF")


@query(
    "catalog_scan_formats",
    oracle="""
    SELECT * FROM (VALUES
      ('$FRAMEF', 'AREA', 'School is part of area frame'),
      ('$FRAMEF', 'LIST', 'School is part of list frame'),
      ('LEVELF', '1', 'Elementary'),
      ('LEVELF', '2', 'Secondary'),
      ('LEVELF', '3', 'Combined elementary and secondary'),
      ('REGIONF', '1', 'Northeast'),
      ('REGIONF', '2', 'Midwest'),
      ('REGIONF', '3', 'South'),
      ('REGIONF', '4', 'West')
    ) AS t(fmt, key, label)
    """,
)
def catalog_scan_formats(spark, sf_dir):
    """S8 under the driver gate: parse the committed public-corpus
    catalog fixture (a real NCES private-school-survey .sas7bcat,
    formats publicly documented) and emit three representative
    formats as (fmt, key, label) rows; the oracle is the documented
    truth as a VALUES literal, so the binary catalog parser is
    checked against fixed external facts rather than itself. Numeric
    keys render as integers (catalog stores them as doubles)."""
    import os

    import polars_readstat_spark as prs

    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    cat = prs.read_sas7bcat(os.path.join(repo, _CAT_FIXTURE))
    rows = []
    for fmt in _CAT_FORMATS:
        for k, v in cat[fmt].items():
            key = str(int(k)) if isinstance(k, float) else str(k)
            rows.append((fmt, key, v))
    return spark.createDataFrame(rows, "fmt string, key string, label string")
