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
    "asof_join_purchase_click",
    oracle="""
    WITH refs AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id, value
      FROM events WHERE event_type = 'click'
    ),
    tgts AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id, value
      FROM events WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT t.event_id, t.user_id, t.ts_us, t.value,
             r.event_id AS r_eid, r.value AS r_val, r.ts_us AS r_ts_us,
             ROW_NUMBER() OVER (PARTITION BY t.event_id
                                ORDER BY r.ts_us DESC NULLS LAST, r.event_id DESC) AS rk
      FROM tgts t LEFT JOIN refs r
        ON r.user_id = t.user_id AND r.ts_us <= t.ts_us
    )
    SELECT event_id, user_id, ts_us,
           CAST(value AS DOUBLE) AS purchase_value,
           r_eid AS click_event_id,
           CAST(r_val AS DOUBLE) AS click_value,
           ts_us - r_ts_us AS gap_us
    FROM j WHERE rk = 1
    """,
)
def asof_join_purchase_click(spark, sf_dir):
    """Backward as-of join: each purchase event picks the most recent
    click (ts_click <= ts_purchase) by the same user — the canonical
    attribution / last-touch operator Spark has no built-in for.

    Implemented the scalable way: union the reference rows (side 0)
    under the target rows (side 1) and take `last(..., ignorenulls)`
    over a per-user window ordered by (ts, side, event_id) — ONE
    shuffle on user_id and a linear window pass, versus the oracle's
    O(refs × targets) per-user join which only a small engine can
    afford. Ties: a click at exactly the purchase ts counts (side 0
    sorts first), and among equal-ts clicks the largest event_id wins
    (window order is ascending, `last` keeps the latest).
    """
    ev = load_table(spark, sf_dir, "events")
    refs = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("side"),
        F.col("event_id").alias("r_eid"),
        F.col("value").alias("r_val"),
        F.col("ts").alias("r_ts"),
        F.lit(None).cast("double").alias("t_val"),
    )
    tgts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("r_eid"),
        F.lit(None).cast("double").alias("r_val"),
        F.lit(None).cast("timestamp").alias("r_ts"),
        F.col("value").alias("t_val"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    u = refs.unionByName(tgts)
    joined = u.select(
        "event_id",
        "user_id",
        "ts",
        "side",
        "t_val",
        F.last("r_eid", ignorenulls=True).over(w).alias("click_event_id"),
        F.last("r_val", ignorenulls=True).over(w).alias("click_value"),
        F.last("r_ts", ignorenulls=True).over(w).alias("click_ts"),
    )
    return joined.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("t_val").alias("purchase_value"),
        "click_event_id",
        "click_value",
        (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("gap_us"),
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
