"""Structured Streaming operators over the events stream.

The streaming counterparts of queries/timeseries.py, built the
idiomatic Spark way: `readStream` → watermarked windowed aggregations
→ sink. Each operator is a pure plan function over a streaming
DataFrame so it composes with any source (file stream, Kafka, rate);
`stream_events_dir` wires the file-stream source used in tests.

Scale notes:
- watermarks bound state: an hourly tumbling window with a 2h
  watermark keeps ≤ a few window-groups per key in the state store
  regardless of total volume;
- `session_window` (Spark 3.2+) is the built-in sessionizer — state
  merges are handled by the engine, no Python;
- `sessionize_stateful` shows the custom-operator escape hatch
  (`applyInPandasWithState`) for semantics the built-ins can't express
  (here: per-session event counts with custom gap + max-duration cap);
  state is per user_id, Arrow-batched.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# target keyed-state rows per state-store instance: each micro-batch
# commits one delta file (+ maintenance snapshot) PER shuffle partition
# per stateful operator, so partition count is a per-batch fixed cost.
# Size it to state volume, not core count (AQE cannot coalesce inside a
# streaming query). 100k keys/store keeps store files in the MBs range;
# override for clusters where state rows are wide.
_STATE_ROWS_PER_PARTITION = int(
    os.environ.get("SPARK_GRAFT_STREAM_STATE_ROWS_PER_STORE", "100000")
)


def approx_rows_in_dir(directory: str, bytes_per_row: int = 40) -> int:
    """Cheap upper-bound row estimate for a landing directory from file
    bytes (no data pass) — the input-size signal the state-partition
    sizing derives from."""
    total = 0
    for p in _glob.glob(os.path.join(directory, "*")):
        try:
            if os.path.isfile(p):
                total += os.path.getsize(p)
        except OSError:
            continue
    return max(1, total // max(1, bytes_per_row))


def state_partitions_for(
    spark: SparkSession,
    approx_state_rows: int,
    *,
    python_groups: bool = False,
) -> int:
    """Scale-adaptive shuffle-partition count for a stateful stream.

    Stateful streaming pays one state-store commit (delta file write +
    maintenance) per shuffle partition per micro-batch, independent of
    data volume — with the session default (cores) and tiny keyed
    state, that fixed cost dominates the drain (measured 4.7→2.1 s /
    5.4→2.2 s on the hourly-window and watermark-dedup drains at sf0.1
    going 32→4 stores). Partitions therefore scale with estimated
    keyed-state rows (`approx_state_rows`, typically the input-row
    upper bound from `approx_rows_in_dir`), clamped to the session's
    shuffle parallelism so a genuinely large state still fans out to
    every core. `python_groups=True` keeps a parallelism floor of a
    quarter of the session setting for applyInPandas* group kernels,
    whose per-group Python work wants cores even when state is small
    (measured: the stateful sessionizer is fastest at 8 of 32)."""
    session = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n = max(1, -(-int(approx_state_rows) // _STATE_ROWS_PER_PARTITION))
    if python_groups:
        n = max(n, max(2, session // 4))
    return max(1, min(n, session))


EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", LongType()),  # ns under nanosAsLong
        StructField("value", DoubleType()),
    ]
)


def stream_events_dir(
    spark: SparkSession,
    directory: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream source over a directory of events parquet files
    (the test-table schema, TESTDATA.md). New files appearing in the
    directory flow through incrementally — the Spark-native analogue
    of tailing a drop folder.

    Streaming sources need a declared schema, so one file's footer is
    probed driver-side to pick the ts layout: TIMESTAMP(NANOS) files
    stream as long + ns→µs conversion (legacy conf), TIMESTAMP(MICROS)
    files stream as timestamp directly (NTZ inference off, so the raw
    stored micros become epoch-µs — same semantics as tables.load_table).
    """
    ts_unit = "us"
    try:  # schema probe: any one footer decides (files share a writer)
        import glob

        import pyarrow.parquet as pq

        sample = sorted(glob.glob(f"{directory}/*.parquet"))
        if sample:
            ts_unit = pq.read_schema(sample[0]).field("ts").type.unit
    except Exception:
        pass
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")

    def rs(schema):
        b = spark.readStream.schema(schema).format("parquet")
        if max_files_per_trigger:
            # one landed file per micro-batch: the multi-batch shape
            # that actually exercises cross-batch operator state
            b = b.option("maxFilesPerTrigger", str(max_files_per_trigger))
        return b.load(directory)

    if ts_unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = rs(EVENT_SCHEMA)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    schema = StructType(
        [
            f if f.name != "ts" else StructField("ts", TimestampType())
            for f in EVENT_SCHEMA.fields
        ]
    )
    return rs(schema)


def hourly_window(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation — the streaming shape of
    queries/timeseries.event_hourly_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Built-in session windows: state merging handled by the engine
    (no shuffle beyond the keyed aggregation, no Python)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start_s"),
            "n_events",
        )
    )


SESSION_STATE_SCHEMA = "last_ts long, n long, start_ts long"

# Bucketed-state twin: one state row per user-bucket, user triples as
# parallel arrays. applyInPandasWithState pays a per-GROUP protocol
# cost (Arrow round trip + state encode) every micro-batch; with one
# group per user that floor dominates small-state streams (measured
# ~5.5 s of 7.8 s at sf0.1 with a no-op kernel, 1500 users x 4
# batches). Salting users into ~4x-parallelism buckets removes it
# without changing any per-user event sequence.
BUCKET_STATE_SCHEMA = (
    "users array<long>, last array<long>, n array<long>, start array<long>"
)


def advance_session_state(ts, state, gap):
    """The sessionizer's pure state machine, one batch step: sorted
    event times `ts` fold into `state = (last_ts, n, start_ts) | None`,
    returning (closed_sessions, new_state) where closed_sessions is a
    list of (start_ts, n_events) islands closed by an observed gap.

    Kept module-level (not nested in the Spark fn) so the
    batching-invariance claim the SQL oracle depends on is testable as
    a property: folding ANY time-ordered chunking of a stream through
    this function emits exactly the batch gaps-and-islands minus the
    final open island (tests/test_streaming_events.py hypothesis
    suite)."""
    closed = []
    last_ts, n, start_ts = state if state is not None else (None, 0, None)
    for t in ts:
        if last_ts is not None and t - last_ts > gap:
            closed.append((start_ts, n))
            n, start_ts = 0, None
        if start_ts is None:
            start_ts = t
        n += 1
        last_ts = t
    return closed, (last_ts, n, start_ts)


def sessionize_stateful(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
    *,
    micros: bool = False,
    timeout_close: bool = True,
    bucket_users: int | None = None,
) -> DataFrame:
    """Custom stateful sessionizer via applyInPandasWithState — the
    escape hatch for semantics session_window can't express. Emits a
    session row whenever the gap elapses (event-time timeout); state
    is one (last_ts, n, start_ts) triple per user.

    micros=True keeps event time at µs precision (column
    `session_start_us`) instead of flooring to seconds — the
    full-fidelity mode the SQL-oracle query uses, since the events
    table carries sub-second timestamps.

    timeout_close=False emits ONLY gap-closed sessions (each user's
    final session is withheld, state dies with the query). That makes
    the emitted set batching-invariant and therefore expressible as a
    batch SQL oracle: gaps observed in the data are deterministic,
    while timeout emission depends on where the final watermark lands
    relative to open sessions."""
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    gap = gap_seconds * 1_000_000 if micros else gap_seconds
    start_col = "session_start_us" if micros else "session_start_s"
    out_schema = f"user_id long, {start_col} long, n_events long"
    if micros:
        # epoch-µs computed JVM-side: unix_micros is tz-independent,
        # whereas the Arrow→pandas conversion of a TimestampType
        # localizes to spark.sql.session.timeZone before dropping the
        # tz — under a non-UTC driver session that shifts every epoch
        # extracted pandas-side by the session offset
        events = events.withColumn("ts_us", F.unix_micros("ts"))

    if bucket_users is not None:
        # Gap-close-only semantics required: a per-user event-time
        # timeout cannot be registered on a shared bucket timer.
        if timeout_close:
            raise ValueError("bucket_users requires timeout_close=False")
        ts_col = "ts_us" if micros else "ts"

        def bfn(key, pdf_iter, state: GroupState):
            import pandas as pd

            frames = [pdf[["user_id", ts_col]] for pdf in pdf_iter]
            df = pd.concat(frames)
            if micros:
                tvals = df[ts_col].astype("int64")
            else:
                tvals = (
                    df[ts_col].to_numpy(dtype="datetime64[ns]").astype("int64")
                    // 1_000_000_000
                )
            df = pd.DataFrame(
                {"user_id": df["user_id"].astype("int64"), "t": tvals}
            ).sort_values(["user_id", "t"])
            if state.exists:
                users, last, n, start = state.get
                st = {
                    u: (l, c, s)
                    for u, l, c, s in zip(users, last, n, start)
                }
            else:
                st = {}
            rows = []
            for uid, g in df.groupby("user_id", sort=False):
                uid = int(uid)
                closed, new_state = advance_session_state(
                    g["t"].tolist(), st.get(uid), gap
                )
                st[uid] = new_state
                rows.extend((uid, s, k) for s, k in closed)
            us = sorted(st)
            state.update(
                (
                    us,
                    [st[u][0] for u in us],
                    [st[u][1] for u in us],
                    [st[u][2] for u in us],
                )
            )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["user_id", start_col, "n_events"]
                )

        return (
            events.withWatermark("ts", watermark)
            .withColumn(
                "bucket", F.pmod(F.col("user_id"), F.lit(int(bucket_users)))
            )
            .groupBy("bucket")
            .applyInPandasWithState(
                bfn,
                outputStructType=out_schema,
                stateStructType=BUCKET_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if timeout_close and state.hasTimedOut:
            last_ts, n, start_ts = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    start_col: [start_ts],
                    "n_events": [n],
                }
            )
            return
        ts_all = []
        for pdf in pdf_iter:
            ts_all.append(pdf["ts_us" if micros else "ts"])
        if micros:
            ts = pd.concat(ts_all).sort_values().astype("int64").tolist()
        else:
            ts = (
                pd.concat(ts_all)
                .sort_values()
                .to_numpy(dtype="datetime64[ns]")
                .astype("int64")
                // 1_000_000_000
            ).tolist()
        prev = state.get if state.exists else None
        closed, new_state = advance_session_state(ts, prev, gap)
        rows = [(user_id, s, k) for s, k in closed]
        last_ts = new_state[0]
        state.update(new_state)
        if timeout_close:
            # event-time timeout is registered in ms
            ms = (last_ts + gap) // 1_000 if micros else (last_ts + gap) * 1000
            state.setTimeoutTimestamp(ms)
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", start_col, "n_events"]
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout
            if timeout_close
            else GroupStateTimeout.NoTimeout,
        )
    )


def dedup_within_watermark(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each
    event_id, with state bounded by the watermark —
    `dropDuplicatesWithinWatermark` keeps a key in the state store
    only until the watermark passes its event time, so state is
    O(events per watermark horizon) instead of O(all history). The
    batch twin is a plain dropDuplicates on the key.

    This is the streaming half of the pipeline dedup story
    (queries/dedup.py): at-least-once sources (Kafka, file redelivery)
    feed through this before any downstream aggregation double-counts.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def drain_collect(
    stream_df: DataFrame,
    query_name: str,
    post=None,
    state_partitions: int | None = None,
) -> DataFrame:
    """run_available_now, then materialize the sink's rows into a
    plain local DataFrame and DROP the memory-sink temp view — the
    registry/bench entry point. Without the drop, every invocation
    leaks a uuid-named in-memory table (the full drained result) into
    the driver for the life of the SparkSession; a full-registry gate
    plus retry tiers accumulates dozens.

    post: optional DataFrame→DataFrame transform applied to the sink
    table BEFORE materialization, so a rollup over a large drained
    set collects its few result rows instead of the whole sink.

    state_partitions: shuffle-partition count for the stream's
    stateful operators (see state_partitions_for); applied for the
    duration of the drain, restored after."""
    out = run_available_now(
        stream_df, query_name, state_partitions=state_partitions
    )
    if post is not None:
        out = post(out)
    spark = stream_df.sparkSession
    # Arrow round trip (toArrow -> createDataFrame) instead of
    # Row-object collect + re-parallelize: the gap-emission streams
    # drain ~1 row per event, and the Row path serializes each one
    # twice through py4j (guide §4 — keep bulk data in Arrow).
    tbl = out.toArrow()
    spark.catalog.dropTempView(query_name)
    return spark.createDataFrame(tbl)


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    state_partitions: int | None = None,
):
    """Drain everything currently available through a memory sink and
    return the collected rows — the test/bench driver for the
    streaming plans (Trigger.AvailableNow semantics).

    state_partitions sizes the stateful operators' state-store count
    (spark.sql.shuffle.partitions is read once at stream start and
    baked into the checkpoint); the session value is restored once the
    drain completes, so batch queries keep the cores-scaled default."""
    spark = stream_df.sparkSession
    key = "spark.sql.shuffle.partitions"
    prior = spark.conf.get(key, None)
    try:
        if state_partitions is not None:
            spark.conf.set(key, str(state_partitions))
        q = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(
                "complete" if _has_agg_complete(stream_df) else "append"
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if state_partitions is not None:
            if prior is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prior)
    return spark.sql(f"SELECT * FROM {query_name}")


def _has_agg_complete(df: DataFrame) -> bool:
    # session_window / applyInPandasWithState / dedup require append;
    # plain windowed aggregation drains fully under complete
    plan = df._jdf.queryExecution().logical().toString()
    return (
        "sessionWindow" not in plan
        and "FlatMapGroupsInPandasWithState" not in plan
        and "Deduplicate" not in plan
    )
