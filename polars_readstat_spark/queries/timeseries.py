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


_STREAM_SESS_CACHE_VERSION = 1


def _ensure_events_chunks(
    sf_dir: str, n_chunks: int = 4, dup_mod: int | None = None
) -> str:
    """events split into n time-ordered parquet chunk files (naive µs
    timestamps, ascending mtimes) — a landing directory whose files
    arrive as separate micro-batches under maxFilesPerTrigger=1, so a
    user's session can genuinely span batch boundaries.

    dup_mod: additionally append a copy of every row with
    event_id % dup_mod == 0 to ITS OWN chunk — an at-least-once
    redelivery stand-in. Duplicates stay within one file so the
    dedup result is batching-invariant (a cross-batch duplicate
    whose original aged past the watermark may legitimately pass
    dropDuplicatesWithinWatermark — correct streaming semantics, but
    not a fixed row set an oracle can pin)."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    kind = f"dup{dup_mod}" if dup_mod else "sess"
    # Key the cache on the source file's identity (size+mtime), not
    # just the sf-dir name: if events.parquet is regenerated in place,
    # stale chunks would otherwise be served while the DuckDB oracle
    # reads the fresh table — a gate mismatch that looks like an
    # operator bug (ADVICE r10).
    st = os.stat(os.path.join(sf_dir, "events.parquet"))
    src_id = f"{st.st_size}_{st.st_mtime_ns // 1_000_000}"
    d = (
        f"/tmp/spark_graft_stream_{kind}_c{n_chunks}"
        f"_v{_STREAM_SESS_CACHE_VERSION}_{tag}_{src_id}"
    )
    done = os.path.join(d, ".done")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type", "ts", "value"],
    )
    i = t.schema.get_field_index("ts")
    # safe=False: truncate any sub-µs precision like the batch path
    # (ts div 1000) and the oracle (CAST AS TIMESTAMP) do, instead of
    # raising ArrowInvalid on genuine ns values (ADVICE r10).
    t = t.set_column(i, "ts", t["ts"].cast(pa.timestamp("us"), safe=False))
    t = t.take(
        pc.sort_indices(
            t, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
    )
    n = t.num_rows
    for k in range(n_chunks):
        lo, hi = k * n // n_chunks, (k + 1) * n // n_chunks
        chunk = t.slice(lo, hi - lo)
        if dup_mod:
            assert dup_mod & (dup_mod - 1) == 0, "dup_mod: power of two"
            dups = chunk.filter(
                pc.equal(pc.bit_wise_and(chunk["event_id"], dup_mod - 1), 0)
            )
            chunk = pa.concat_tables([chunk, dups])
        tmp = os.path.join(d, f".tmp{os.getpid()}.chunk{k}.parquet")
        pq.write_table(chunk, tmp)
        dst = os.path.join(d, f"chunk{k}.parquet")
        os.replace(tmp, dst)
        # the file-stream source orders by modification time; pin an
        # ascending sequence so batch order == time order
        os.utime(dst, (1_700_000_000 + k, 1_700_000_000 + k))
    with open(done, "w") as f:
        f.write("ok")
    return d


@query(
    "stream_sessionize_stateful",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
      FROM events
    ),
    m AS (
      SELECT user_id, t,
             CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t)
                      > 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM e
    ),
    s AS (
      SELECT user_id, t,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM m
    ),
    a AS (
      SELECT user_id, sid, MIN(t) AS session_start_us,
             COUNT(*) AS n_events
      FROM s GROUP BY user_id, sid
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(session_start_us AS BIGINT) AS session_start_us,
           CAST(n_events AS BIGINT) AS n_events
    FROM (SELECT a.*, MAX(sid) OVER (PARTITION BY user_id) AS max_sid
          FROM a)
    WHERE sid < max_sid
    """,
)
def stream_sessionize_stateful(spark, sf_dir):
    """The applyInPandasWithState custom sessionizer under the full
    value oracle: events land as four time-ordered parquet files, the
    file stream drains them one per micro-batch (cross-batch state is
    the point — a session open at a batch boundary must survive in the
    state store and close from a gap seen two batches later), and the
    operator emits exactly the gap-closed sessions at µs fidelity.

    Emission is gap-only (timeout_close=False): each user's final
    session is withheld, which makes the emitted set batching-
    invariant — equal to the batch gaps-and-islands SQL minus each
    user's last island — and therefore oracle-checkable. Timeout
    emission would instead depend on where the final watermark lands,
    which no batch SQL can express (streaming/events.py docstring).

    Scale shape: state is one (last_ts, n, start_ts) triple per user
    — O(active users), not O(events); the stream shuffles once on
    user_id and each micro-batch is Arrow-batched into pandas per
    group. The same plan runs unchanged against a Kafka source."""
    import uuid

    from polars_readstat_spark.streaming.events import (
        approx_rows_in_dir,
        drain_collect,
        sessionize_stateful,
        state_partitions_for,
        stream_events_dir,
    )

    d = _ensure_events_chunks(sf_dir)
    ev = stream_events_dir(spark, d, max_files_per_trigger=1)
    # state = one triple per user (<< rows); the pandas group kernel
    # still wants cores, so python_groups keeps a parallelism floor
    nparts = state_partitions_for(
        spark, approx_rows_in_dir(d), python_groups=True
    )
    # Salt users into ~4x-parallelism bucket groups: the per-GROUP
    # applyInPandasWithState protocol cost (not the kernel) dominated
    # with one group per user; 4x keeps hash-placement balance while
    # scaling with the state-derived partition count.
    sess = sessionize_stateful(
        ev,
        gap_seconds=1800,
        micros=True,
        timeout_close=False,
        bucket_users=4 * nparts,
    )
    name = f"prs_stream_sess_{uuid.uuid4().hex[:8]}"
    return drain_collect(sess, name, state_partitions=nparts)


@query(
    "stream_hourly_window",
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
def stream_hourly_window(spark, sf_dir):
    """The watermarked tumbling-window aggregation under the value
    oracle: the event chunks drain one file per micro-batch (the
    watermark genuinely advances batch to batch) and the complete-mode
    memory sink must equal the batch GROUP BY — same oracle as
    event_hourly_window, which is the point: stream and batch are one
    logical plan in two execution modes. Complete mode retains all
    window groups in state, so no group is watermark-evicted from the
    OUTPUT; the watermark still bounds what a production append-mode
    sink would hold, which the streaming suite covers."""
    import uuid

    from polars_readstat_spark.streaming.events import (
        approx_rows_in_dir,
        drain_collect,
        hourly_window,
        state_partitions_for,
        stream_events_dir,
    )

    d = _ensure_events_chunks(sf_dir)
    ev = stream_events_dir(spark, d, max_files_per_trigger=1)
    name = f"prs_stream_hw_{uuid.uuid4().hex[:8]}"
    # state = one row per (hour-window, type) — bounded far below the
    # input-row estimate, which is already the conservative upper bound
    return drain_collect(
        hourly_window(ev),
        name,
        state_partitions=state_partitions_for(spark, approx_rows_in_dir(d)),
    )


@query(
    "stream_dedup_watermark",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_unique
    FROM events
    GROUP BY event_type
    """,
)
def stream_dedup_watermark(spark, sf_dir):
    """dropDuplicatesWithinWatermark under the value oracle: the
    landing chunks carry an at-least-once redelivery (every
    event_id % 8 == 0 row appears twice in its chunk); the streaming
    dedup must collapse them so the per-type counts over the drained
    sink equal the duplicate-free batch table. Duplicates are
    injected within one file each — within-horizon redelivery, the
    case the operator guarantees; a duplicate arriving after the
    watermark passed its original is ALLOWED to re-emit (state was
    evicted, by design), so only the within-horizon set is a fixed
    row set an oracle can pin. The aggregation runs batch-side over
    the sink table: a streaming groupBy after dedup would need its
    own watermark windows, a different operator than the one under
    test."""
    import uuid

    from polars_readstat_spark.streaming.events import (
        approx_rows_in_dir,
        dedup_within_watermark,
        drain_collect,
        state_partitions_for,
        stream_events_dir,
    )

    d = _ensure_events_chunks(sf_dir, dup_mod=8)
    ev = stream_events_dir(spark, d, max_files_per_trigger=1)
    name = f"prs_stream_dedup_{uuid.uuid4().hex[:8]}"
    # state = one key per event_id in the watermark horizon — the
    # input-row estimate IS the state size here, the worst case
    return drain_collect(
        dedup_within_watermark(ev),
        name,
        post=lambda out: out.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_unique")
        ),
        state_partitions=state_partitions_for(spark, approx_rows_in_dir(d)),
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
    "range_join_click_purchase_1h",
    oracle="""
    WITH tgts AS (
      SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events WHERE event_type = 'purchase'
    ),
    refs AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
      FROM events WHERE event_type = 'click'
    )
    SELECT t.event_id, t.user_id, t.ts_us,
           COUNT(r.ts_us) AS n_clicks_1h,
           CAST(COALESCE(SUM(CAST(r.value AS DECIMAL(18,2))),
                         CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS click_value_sum
    FROM tgts t LEFT JOIN refs r
      ON r.user_id = t.user_id
     AND r.ts_us <= t.ts_us
     AND r.ts_us > t.ts_us - 3600000000
    GROUP BY t.event_id, t.user_id, t.ts_us
    """,
)
def range_join_click_purchase_1h(spark, sf_dir):
    """Banded range join: for each purchase, count/sum same-user
    clicks in the preceding hour — the interval-join operator Spark
    has no built-in for, expressed the scalable way.

    Instead of the oracle's inequality theta-join (O(refs × targets)
    per user), clicks land in 1-hour epoch buckets and each purchase
    probes exactly its own and the previous bucket (explode of a
    2-element array), turning the range predicate into an equi-join on
    (user_id, bucket) plus a residual filter. Shuffle volume is
    2×targets + refs rows on a compound key — the band width equals
    the bucket width, so candidate fan-in per probe is bounded by the
    events in two buckets regardless of corpus size.
    """
    us_per_h = 3_600_000_000
    ev = load_table(spark, sf_dir, "events")
    refs = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("r_uid"),
        F.unix_micros("ts").alias("r_ts_us"),
        F.col("value").alias("r_val"),
        (F.unix_micros("ts") / us_per_h).cast("long").alias("r_hb"),
    )
    tgts = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
        )
        .withColumn(
            "hb",
            F.explode(
                F.array(
                    (F.col("ts_us") / us_per_h).cast("long"),
                    (F.col("ts_us") / us_per_h).cast("long") - 1,
                )
            ),
        )
    )
    joined = tgts.join(
        refs,
        (F.col("r_uid") == F.col("user_id"))
        & (F.col("hb") == F.col("r_hb"))
        & (F.col("r_ts_us") <= F.col("ts_us"))
        & (F.col("r_ts_us") > F.col("ts_us") - us_per_h),
        "left",
    )
    return joined.groupBy("event_id", "user_id", "ts_us").agg(
        F.count("r_ts_us").alias("n_clicks_1h"),
        F.coalesce(F.sum(F.col("r_val").cast(DEC)), F.lit(0).cast(DEC))
        .cast("double")
        .alias("click_value_sum"),
    )


@query(
    "window_lag_delta",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
           ROW_NUMBER() OVER w AS seq,
           epoch_us(CAST(ts AS TIMESTAMP))
             - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us,
           CAST(CAST(value AS DOUBLE)
                - LAG(CAST(value AS DOUBLE)) OVER w AS DOUBLE) AS value_delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_delta(spark, sf_dir):
    """Per-user event-over-event deltas: row_number + lag over one
    per-user window — one shuffle on user_id, linear window pass, the
    feature-engineering primitive for inter-event-time models. Window
    order ties break on event_id so lag is deterministic. The delta is
    a single IEEE subtraction (exact, order-independent), so doubles
    compare bit-identically across engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros("ts")
    return ev.select(
        "event_id",
        "user_id",
        ts_us.alias("ts_us"),
        F.row_number().over(w).alias("seq"),
        (ts_us - F.lag(ts_us).over(w)).alias("gap_us"),
        (F.col("value") - F.lag("value").over(w)).cast("double").alias("value_delta"),
    )


@query(
    "salted_skew_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
           MIN(event_id) AS min_event_id
    FROM events GROUP BY event_type
    """,
)
def salted_skew_agg(spark, sf_dir):
    """Two-phase salted aggregation for skewed keys: events has only 5
    event_type values, so at 100 TB a naive groupBy lands 1/5 of the
    corpus on single reducers. Phase 1 aggregates on (event_type,
    salt) with a 16-way deterministic salt — 80 evenly-sized partial
    groups — then phase 2 re-aggregates the 80 partials on event_type
    alone. Every aggregate here is re-aggregatable (count→sum,
    sum→sum, min→min), which is the condition for the pattern; the
    second shuffle moves 80 rows, not 100 TB.

    (Spark's AQE skew handling covers skewed *joins*; skewed
    *aggregations* still need the salt, hence the explicit operator.)
    """
    ev = load_table(spark, sf_dir, "events")
    phase1 = (
        ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(16)))
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("n_p"),
            F.sum(F.col("value").cast(DEC)).alias("sum_p"),
            F.min("event_id").alias("min_p"),
        )
    )
    return phase1.groupBy("event_type").agg(
        F.sum("n_p").alias("n"),
        F.sum("sum_p").cast("double").alias("value_sum"),
        F.min("min_p").alias("min_event_id"),
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


@query(
    "event_value_histogram",
    oracle="""
    SELECT CAST(LEAST(FLOOR(value / 25.0), 19) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY CAST(LEAST(FLOOR(value / 25.0), 19) AS BIGINT)
    """,
)
def event_value_histogram(spark, sf_dir):
    """Fixed-width histogram over the event value distribution
    (20 buckets of width 25, top bucket open-ended): the profiling
    primitive behind dashboards and data-quality checks. Pure
    hash-aggregate on a computed key — map-side combinable, shuffle
    carries ≤20 rows per partition at any scale. DECIMAL sum keeps
    per-bucket totals exact and order-independent.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 25.0), F.lit(19)).cast("bigint")
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "value_sum"
            ),
        )
    )


@query(
    "event_props_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
    FROM events
    GROUP BY event_type
    """,
)
def event_props_json_extract(spark, sf_dir):
    """Semi-structured payload extraction: pull a typed field out of
    the JSON `props` column and aggregate it per event type — the
    log-analytics staple. `get_json_object` is a Catalyst expression
    (codegen'd JSON path evaluation, no Python), and the integer
    aggregates are exact; at scale the extraction is map-side work
    that fuses into the scan stage, so the shuffle carries only the
    per-type partials.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("k_sum"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
    )


@query(
    "funnel_click_to_purchase",
    oracle="""
    WITH first_click AS (
      SELECT user_id, MIN(epoch_us(ts)) AS c_us
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    converted AS (
      SELECT f.user_id, MIN(epoch_us(e.ts)) AS p_us
      FROM first_click f
      JOIN events e ON e.user_id = f.user_id
       AND e.event_type = 'purchase' AND epoch_us(e.ts) > f.c_us
      GROUP BY f.user_id
    )
    SELECT COUNT(*) AS n_clickers,
           COUNT(c.user_id) AS n_converted,
           CAST(COUNT(c.user_id) AS DOUBLE) / COUNT(*) AS conversion_rate,
           CAST(SUM(c.p_us - f.c_us) AS BIGINT) AS total_lag_us
    FROM first_click f LEFT JOIN converted c ON c.user_id = f.user_id
    """,
)
def funnel_click_to_purchase(spark, sf_dir):
    """Two-stage funnel: of users who clicked, how many purchased
    AFTER their first click, and with what cumulative lag — the
    product-analytics sequence primitive. Both stages are combinable
    per-user MIN aggregates plus one equi-join on user_id (no window
    over the raw event stream, no inequality join against the full
    table — the time predicate applies after the per-user reduction).
    One shuffle per stage at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    first_click = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("c_us"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("p_us")
    )
    converted = (
        first_click.join(purchases, "user_id")
        .filter(F.col("p_us") > F.col("c_us"))
        .groupBy("user_id")
        .agg(F.min("p_us").alias("p_us"))
    )
    j = first_click.join(
        converted.withColumnRenamed("user_id", "cu"),
        first_click.user_id == F.col("cu"),
        "left",
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_clickers"),
        F.count("cu").alias("n_converted"),
        (F.count("cu").cast("double") / F.count(F.lit(1))).alias(
            "conversion_rate"
        ),
        F.sum(F.col("p_us") - F.col("c_us")).cast("bigint").alias("total_lag_us"),
    )


@query(
    "retention_weekly_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(FLOOR(MIN(epoch(CAST(ts AS TIMESTAMP))) / 604800)
                  AS BIGINT) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(FLOOR(epoch(CAST(e.ts AS TIMESTAMP)) / 604800)
                  AS BIGINT) - f.cohort_week AS weeks_since
      FROM events e JOIN firsts f ON f.user_id = e.user_id
    )
    SELECT cohort_week, weeks_since,
           COUNT(*) AS active_users
    FROM activity GROUP BY cohort_week, weeks_since
    """,
)
def retention_weekly_cohorts(spark, sf_dir):
    """Cohort retention: users grouped by first-activity week, counted
    in each subsequent week they return — the product-analytics staple
    every event pipeline ships.

    Two aggregations and one equi-join, all integer arithmetic (epoch
    seconds / 604800), so the result is exact on both engines. Scale:
    the first-seen table is one shuffle on user_id (at 100 TB this is
    the incremental-materialize candidate — first_seen never changes
    once written); the activity distinct and the final rollup
    partial-aggregate, and the join key is user_id so the event side
    shuffles once. No windows, no driver-side state.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.floor(F.col("ts").cast("long") / 604800).alias("wk")
    )
    firsts = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.col("wk") - F.col("cohort_week")).alias("weeks_since"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "weeks_since").agg(
        F.count(F.lit(1)).alias("active_users")
    )


@query(
    "event_dau_wau_stickiness",
    oracle="""
    WITH daily AS (
      SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
                 AS day_n,
             COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1
    ),
    weekly AS (
      SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 604800) AS BIGINT)
                 AS week_n,
             COUNT(DISTINCT user_id) AS wau
      FROM events GROUP BY 1
    )
    SELECT d.day_n, d.dau, w.wau,
           CAST(d.dau AS DOUBLE) / w.wau AS stickiness
    FROM daily d
    JOIN weekly w ON w.week_n = CAST(FLOOR(d.day_n / 7.0) AS BIGINT)
    """,
)
def event_dau_wau_stickiness(spark, sf_dir):
    """DAU/WAU stickiness per day — the engagement ratio every event
    pipeline reports. Two distinct-count aggregates (shuffled on their
    bucket keys, partial-deduped map-side) joined on the containing
    week; the ratio divides two exact BIGINTs so both engines emit the
    identical double. Output is |days| rows at any event volume.

    Week buckets are epoch/604800 — the same convention as
    retention_weekly_cohorts, so day_n/7 must floor through the same
    epoch alignment (86400*7 = 604800; day 0 and week 0 share the
    epoch origin).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("ts").cast("long") / 86400).alias("day_n"),
    )
    daily = ev.groupBy("day_n").agg(F.countDistinct("user_id").alias("dau"))
    weekly = (
        ev.select("user_id", F.floor(F.col("day_n") / 7.0).alias("week_n"))
        .groupBy("week_n")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        daily.withColumn("week_n", F.floor(F.col("day_n") / 7.0))
        .join(weekly, "week_n")
        .select(
            "day_n",
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


@query(
    "resample_ffill_hourly",
    oracle="""
    WITH ev AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS value
      FROM events WHERE user_id % 10 = 0 GROUP BY user_id, ts
    ),
    span AS (
      SELECT user_id, DATE_TRUNC('hour', MIN(ts)) AS t0,
             DATE_TRUNC('hour', MAX(ts)) AS t1
      FROM ev GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             UNNEST(GENERATE_SERIES(t0, t1, INTERVAL 1 HOUR)) AS gts
      FROM span
    ),
    u AS (
      SELECT user_id, ts AS sort_ts, 0 AS is_grid, value FROM ev
      UNION ALL
      SELECT user_id, gts, 1, NULL FROM grid
    ),
    f AS (
      SELECT user_id, sort_ts, is_grid,
             LAST_VALUE(value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY sort_ts, is_grid
               ROWS UNBOUNDED PRECEDING) AS ffill
      FROM u
    )
    SELECT user_id, CAST(EPOCH(sort_ts) AS BIGINT) AS hour_ts,
           ffill AS value
    FROM f WHERE is_grid = 1
    """,
)
def resample_ffill_hourly(spark, sf_dir):
    """Time-series resample to a 1-hour grid with forward-fill (gap
    filling — the feature-engineering step before any fixed-step
    model): per sampled user, every hour between their first and last
    event carries the last observed value at or before that hour
    (null before the first observation).

    Spark-first shape: the grid is sequence()+explode per user (no
    driver-side date loop), and the fill is ONE pass — union the
    observations with null-valued grid points and take
    last(ignorenulls) over (user, time) with events ordered before
    grid points at equal timestamps. Everything partitions by
    user_id: one shuffle, bounded per-task state, no self-join. At
    100 TB the grid explode is output-proportional (users × hours),
    never events × hours; values are carried (no float arithmetic)
    so both engines agree bitwise.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 10 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    span = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = span.select(
        "user_id",
        F.explode(F.expr("sequence(t0, t1, interval 1 hour)")).alias("gts"),
    )
    u = ev.select(
        "user_id",
        F.col("ts").alias("sort_ts"),
        F.lit(0).alias("is_grid"),
        "value",
    ).unionAll(
        grid.select(
            "user_id",
            F.col("gts"),
            F.lit(1),
            F.lit(None).cast("double"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("sort_ts", "is_grid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        u.withColumn("ffill", F.last("value", ignorenulls=True).over(w))
        .filter(F.col("is_grid") == 1)
        .select(
            "user_id",
            F.unix_timestamp("sort_ts").alias("hour_ts"),
            F.col("ffill").alias("value"),
        )
    )


@query(
    "event_anomaly_days",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
               AS day_n,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    st AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS d,
             CAST(SUM(n_events) AS BIGINT) AS s,
             CAST(SUM(n_events * n_events) AS BIGINT) AS q
      FROM daily GROUP BY event_type
    )
    SELECT daily.event_type, daily.day_n, daily.n_events,
           (CAST((daily.n_events * st.d - st.s) AS DECIMAL(38,0))
              * CAST((daily.n_events * st.d - st.s) AS DECIMAL(38,0)))
             > CAST(9 AS DECIMAL(38,0))
               * CAST((st.q * st.d - st.s * st.s) AS DECIMAL(38,0))
             AS is_anomaly
    FROM daily JOIN st USING (event_type)
    """,
)
def event_anomaly_days(spark, sf_dir):
    """Daily event-volume anomaly flags per event type — the pipeline
    tripwire that catches an upstream collector outage (volume crater)
    or a bot flood (spike) before the day's data poisons a training
    snapshot. A day is anomalous when its count sits more than 3
    population standard deviations from that type's mean.

    The 3σ test runs in EXACT integer algebra — no sqrt, no float
    accumulation: with D days, S = Σn, Q = Σn², the condition
    |n − S/D| > 3σ is equivalent to (n·D − S)² > 9·(Q·D − S²) after
    multiplying through by D² (σ² = Q/D − (S/D)²). Both sides are
    integers promoted to DECIMAL(38,0) before squaring so the compare
    is exact at any volume (bigint daily counts square past 2⁶³ at
    ~1e10 events/day; decimal keeps the math closed).

    Scale shape: two combinable aggregations (days×types, then types)
    plus one broadcast join of the |types|-row stats table back onto
    the daily rollup — no window over the full event stream, output
    |types|×|days| rows regardless of event volume.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.select(
        "event_type",
        F.floor(F.col("ts").cast("long") / 86400)
        .cast("bigint")
        .alias("day_n"),
    ).groupBy("event_type", "day_n").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("d"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("q"),
    )
    j = daily.join(F.broadcast(st), "event_type")
    diff = (F.col("n_events") * F.col("d") - F.col("s")).cast(
        "decimal(38,0)"
    )
    rhs = F.lit(9).cast("decimal(38,0)") * (
        F.col("q") * F.col("d") - F.col("s") * F.col("s")
    ).cast("decimal(38,0)")
    return j.select(
        "event_type",
        "day_n",
        "n_events",
        ((diff * diff) > rhs).alias("is_anomaly"),
    )
