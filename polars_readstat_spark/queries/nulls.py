"""Informative-null operator queries (SURVEY.md §2.4).

The reference turns format-specific user-missing codes (SAS tagged
NaNs .A-.Z, Stata .a-.z sentinels, SPSS declared ranges) into one of
three output shapes: a separate `<col>_null` indicator column, a
Struct{value, null_indicator}, or a merged string column
(reference src/lib.rs:301-378). The parquet test tables have no real
missing sentinels, so the queries declare a deterministic user-missing
rule over `events` and exercise the three output shapes; the file
readers apply the same operators to genuinely tagged data
(operators/nulls.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_readstat_spark.queries.registry import query
from polars_readstat_spark.tables import load_table


def _indicator():
    """User-missing rule: tiny values are '.a', error rows '.b'."""
    return F.when(F.col("value") < 1.0, F.lit(".a")).when(
        F.col("event_type") == "error", F.lit(".b")
    )


_IND_SQL = "CASE WHEN value < 1.0 THEN '.a' WHEN event_type = 'error' THEN '.b' END"


@query(
    "informative_null_separate",
    oracle=f"""
    SELECT event_id,
           CASE WHEN {_IND_SQL} IS NULL THEN value END AS value_masked,
           {_IND_SQL} AS value_null
    FROM events
    """,
)
def informative_null_separate(spark, sf_dir):
    """M2: separate-column mode — value masked to null when
    user-missing, indicator column `<col>_null` alongside."""
    ev = load_table(spark, sf_dir, "events")
    ind = _indicator()
    return ev.select(
        "event_id",
        F.when(ind.isNull(), F.col("value")).alias("value_masked"),
        ind.alias("value_null"),
    )


@query(
    "informative_null_merged",
    oracle="""
    SELECT event_id,
           CASE WHEN user_id % 97 = 0 THEN '.u'
                ELSE CAST(user_id AS VARCHAR) END AS user_id_merged
    FROM events
    """,
)
def informative_null_merged(spark, sf_dir):
    """M4: merged-string mode — coalesce(cast(value AS string),
    indicator) (reference src/lib.rs:358-377)."""
    ev = load_table(spark, sf_dir, "events")
    ind = F.when(F.col("user_id") % 97 == 0, F.lit(".u"))
    merged = F.coalesce(
        F.when(ind.isNull(), F.col("user_id").cast("string")), ind
    )
    return ev.select("event_id", merged.alias("user_id_merged"))


@query(
    "informative_null_struct",
    oracle=f"""
    SELECT event_id,
           COALESCE(CAST(CAST(FLOOR(
               (CASE WHEN {_IND_SQL} IS NULL THEN value END) * 1000
           ) AS BIGINT) AS VARCHAR), '<null>')
           || '|' || COALESCE({_IND_SQL}, '<null>') AS value_struct_ser
    FROM events
    """,
)
def informative_null_struct(spark, sf_dir):
    """M3: struct mode — Struct{value, null_indicator}
    (reference src/lib.rs:341-357). The struct is built in-plan, then
    its fields serialize to one canonical string so DuckDB can hash it:
    the double goes through scaled-integer floor (double→string casts
    format differently across engines; floor(value*1000) is the repo's
    exact-parity convention) and nulls print as '<null>'."""
    ev = load_table(spark, sf_dir, "events")
    ind = _indicator()
    vs = F.struct(
        F.when(ind.isNull(), F.col("value")).alias("value"),
        ind.alias("null_indicator"),
    )
    ser = F.concat(
        F.coalesce(
            F.floor(vs.getField("value") * 1000).cast("bigint").cast("string"),
            F.lit("<null>"),
        ),
        F.lit("|"),
        F.coalesce(vs.getField("null_indicator"), F.lit("<null>")),
    )
    return ev.select("event_id", ser.alias("value_struct_ser"))
