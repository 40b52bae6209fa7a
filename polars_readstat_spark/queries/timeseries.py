"""Time-series / event-stream queries over `events`.

Batch expressions of the streaming operators (windowed aggregation,
sessionization); the readStream equivalents live in
streaming/events.py and are pytest-verified to produce identical
results via the memory sink. Window starts are emitted as epoch
seconds (bigint): Spark timestamps collect tz-aware while DuckDB's are
naive, which would spuriously hash-mismatch.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from polars_readstat_spark.queries.registry import query
from polars_readstat_spark.tables import load_table

DEC = "decimal(18,2)"


@query(
    "event_hourly_window",
    oracle="""
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
               AS window_start_s,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def event_hourly_window(spark, sf_dir):
    """Tumbling-window aggregation (the Structured Streaming shape, on
    batch data): window(ts, '1 hour') × event_type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("value_sum"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n",
            "value_sum",
        )
    )


@query(
    "sessionization_30m",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT user_id,
           COUNT(CASE WHEN prev_ts IS NULL
                       OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(prev_ts AS TIMESTAMP))
                          > 1800000000 THEN 1 END) AS n_sessions,
           COUNT(*) AS n_events
    FROM e GROUP BY user_id
    """,
)
def sessionization_30m(spark, sf_dir):
    """Sessionization: lag(ts) per user, gap > 30 min starts a new
    session (ties broken on event_id so the lag is deterministic)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.withColumn("prev_ts", F.lag("ts").over(w))
    new_session = F.when(
        F.col("prev_ts").isNull()
        | (F.unix_micros("ts") - F.unix_micros("prev_ts") > 1_800_000_000),
        1,
    )
    return e.groupBy("user_id").agg(
        F.count(new_session).alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "event_value_quantiles",
    oracle="""
    SELECT event_type,
           CAST(COUNT(CASE WHEN value <= 10.0 THEN 1 END) AS DOUBLE) / COUNT(*)
               AS frac_le_10,
           CAST(MIN(value) AS DOUBLE) AS min_value,
           CAST(MAX(value) AS DOUBLE) AS max_value
    FROM events GROUP BY event_type
    """,
)
def event_value_quantiles(spark, sf_dir):
    """Distribution probe per event type (exact fractions; the
    approx_percentile scale path is bench-only since approximate
    sketches aren't engine-portable)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        (
            F.count(F.when(F.col("value") <= 10.0, 1)).cast("double")
            / F.count(F.lit(1))
        ).alias("frac_le_10"),
        F.min("value").cast("double").alias("min_value"),
        F.max("value").cast("double").alias("max_value"),
    )
