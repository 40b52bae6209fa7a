"""Type-compression (narrowing) operator queries (SURVEY.md §2.6).

The reference's ``compress_df`` pipeline decides, per column, whether a
numeric column downcasts (min/max + all-integers), a datetime column is
really a date (all-midnight), or a string column parses as numeric —
then applies casts (reference src/stata/compress.rs:82-225, 339-355).
Here the *decision pass* is a declared Spark aggregation; the apply
half lives in operators/compress.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_readstat_spark.queries.registry import query
from polars_readstat_spark.tables import load_table

# shared downcast decision, written identically in Spark SQL and DuckDB
# SQL (reference IntBounds::standard, src/stata/compress.rs:43-52)
_DECIDE_SQL = """
    CASE WHEN n_nonint = 0 AND min_v >= -128 AND max_v <= 127 THEN 'int8'
         WHEN n_nonint = 0 AND min_v >= -32768 AND max_v <= 32767 THEN 'int16'
         WHEN n_nonint = 0 AND min_v >= -2147483648 AND max_v <= 2147483647 THEN 'int32'
         ELSE 'float64' END
"""


def _stats_select(col: str) -> str:
    """Per-column stats as a one-row SELECT (engine-portable SQL)."""
    return f"""
    SELECT '{col}' AS column_name,
           CAST(MIN({col}) AS DOUBLE) AS min_v,
           CAST(MAX({col}) AS DOUBLE) AS max_v,
           COUNT(CASE WHEN {col} != FLOOR({col}) THEN 1 END) AS n_nonint,
           COUNT(CASE WHEN {col} IS NULL THEN 1 END) AS n_null
    FROM lineitem
    """


_NUMERIC_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

_STATS_SQL = " UNION ALL ".join(_stats_select(c) for c in _NUMERIC_COLS)


@query(
    "compress_numeric_decision",
    oracle=f"""
    SELECT column_name, min_v, max_v, n_nonint, n_null,
           {_DECIDE_SQL} AS decided_type
    FROM ({_STATS_SQL})
    """,
)
def compress_numeric_decision(spark, sf_dir):
    """C1/C2: one aggregation pass over lineitem's numeric columns →
    per-column (min, max, all-int, nulls) → downcast decision.

    A single scan computes all columns' stats (one job, map-side
    partial aggregation — at 100 TB this is one pass, not one per
    column); the per-column rows are then unpivoted driver-free with
    stack().
    """
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _NUMERIC_COLS:
        aggs += [
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
            F.count(F.when(F.col(c) != F.floor(c), 1)).alias(f"{c}__nonint"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__null"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__min, {c}__max, {c}__nonint, {c}__null" for c in _NUMERIC_COLS
    )
    unpivoted = one.selectExpr(
        f"stack({len(_NUMERIC_COLS)}, {stack_args}) AS "
        "(column_name, min_v, max_v, n_nonint, n_null)"
    )
    return unpivoted.selectExpr(
        "column_name", "min_v", "max_v", "n_nonint", "n_null",
        f"{_DECIDE_SQL} AS decided_type",
    )


@query(
    "compress_all_midnight",
    oracle="""
    SELECT COUNT(CASE WHEN epoch_ms(l_shipdate) % 86400000 != 0 THEN 1 END) = 0
               AS all_midnight,
           COUNT(*) AS n_rows
    FROM lineitem
    """,
)
def compress_all_midnight(spark, sf_dir):
    """C3: datetime→date eligibility — every timestamp lands on
    midnight (reference is_all_midnight, src/stata/compress.rs:339-355)."""
    li = load_table(spark, sf_dir, "lineitem")
    # l_shipdate is TIMESTAMP_NTZ; cast via UTC session tz is identity
    nonmid = F.count(
        F.when(F.unix_millis(F.col("l_shipdate").cast("timestamp")) % 86400000 != 0, 1)
    )
    return li.agg(
        (nonmid == 0).alias("all_midnight"), F.count(F.lit(1)).alias("n_rows")
    )


@query(
    "compress_string_numeric_parse",
    oracle="""
    SELECT COUNT(CASE WHEN lang IS NOT NULL
                       AND TRY_CAST(lang AS DOUBLE) IS NULL THEN 1 END) AS n_unparseable,
           COUNT(CASE WHEN TRY_CAST(CAST(n_chars AS VARCHAR) AS DOUBLE) IS NOT NULL
                      THEN 1 END) AS n_roundtrip_ok
    FROM documents
    """,
)
def compress_string_numeric_parse(spark, sf_dir):
    """C4: string→numeric parse check — bail if any non-null value
    fails to parse (reference try_parse_string_to_f64)."""
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count(
            F.when(
                F.col("lang").isNotNull()
                & F.expr("try_cast(lang AS DOUBLE)").isNull(),
                1,
            )
        ).alias("n_unparseable"),
        F.count(
            F.when(
                F.expr("try_cast(CAST(n_chars AS STRING) AS DOUBLE)").isNotNull(), 1
            )
        ).alias("n_roundtrip_ok"),
    )
