"""Structured Streaming tests: streaming plans must reproduce batch
equivalents when drained with Trigger.AvailableNow over a file-stream
source — the standard batch-vs-stream differential.

The events table is split into time-ordered chunks processed as
separate micro-batches (maxFilesPerTrigger=1) so the watermark
advances and append-mode session operators actually emit closed
sessions.
"""

from __future__ import annotations

import os
import time

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    from polars_readstat_spark.tables import load_table

    d = tmp_path_factory.mktemp("events_stream")
    ev = load_table(spark, SF, "events").orderBy("ts")
    rows = ev.count()
    chunk = rows // 4 + 1
    pdf = ev.toPandas()
    for i in range(4):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        if len(part) == 0:
            continue
        p = str(d / f"chunk_{i}.parquet")
        part.to_parquet(
            p, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        os.utime(p, (time.time() + i, time.time() + i))
    return str(d)


def _stream(spark, events_dir):
    """Chunked file-stream: one file per micro-batch, in mtime order."""
    from polars_readstat_spark.streaming.events import EVENT_SCHEMA

    from pyspark.sql import functions as F

    raw = (
        spark.readStream.schema(
            # chunks were written from the already-converted batch df:
            # ts is timestamp_ntz here, value double
            "event_id long, user_id long, event_type string, "
            "ts timestamp_ntz, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(events_dir)
    )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def test_hourly_window_stream_matches_batch(spark, events_dir):
    from polars_readstat_spark.queries.timeseries import event_hourly_window
    from polars_readstat_spark.streaming.events import (
        hourly_window,
        run_available_now,
    )

    stream = run_available_now(
        hourly_window(_stream(spark, events_dir)), "hw_mem"
    )
    got = {
        (r.window_start_s, r.event_type): (r.n, r.value_sum)
        for r in stream.collect()
    }
    want = {
        (r.window_start_s, r.event_type): (r.n, r.value_sum)
        for r in event_hourly_window(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k, (n, s) in want.items():
        assert got[k][0] == n
        assert abs(got[k][1] - s) < 1e-6


def _batch_sessions(spark):
    """Batch oracle: session_window works in batch mode too — exact
    per-session rows (user_id, session_start_s, n_events)."""
    from pyspark.sql import functions as F

    from polars_readstat_spark.tables import load_table

    ev = load_table(spark, SF, "events")
    return {
        (r.user_id, r.session_start_s): r.n_events
        for r in (
            ev.groupBy(
                F.session_window("ts", "30 minutes").alias("w"), "user_id"
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.unix_timestamp(F.col("w.start")).alias("session_start_s"),
                "n_events",
            )
            .collect()
        )
    }


def test_batch_session_window_agrees_with_lag_sessionization(spark):
    """Cross-check the two batch sessionizers before using one as the
    streaming oracle: per-user session counts must agree."""
    from collections import Counter

    from polars_readstat_spark.queries.timeseries import sessionization_30m

    per_session = _batch_sessions(spark)
    by_user = Counter(u for (u, _s) in per_session)
    events_by_user = Counter()
    for (u, _s), n in per_session.items():
        events_by_user[u] += n
    for r in sessionization_30m(spark, SF).collect():
        assert by_user[r.user_id] == r.n_sessions
        assert events_by_user[r.user_id] == r.n_events


def test_session_window_stream(spark, events_dir):
    from polars_readstat_spark.streaming.events import (
        run_available_now,
        sessionize,
    )

    out = run_available_now(
        sessionize(_stream(spark, events_dir), watermark="1 hour"),
        "sess_mem",
    )
    got = out.collect()
    batch = _batch_sessions(spark)
    assert len(got) > 0  # chunked watermark advance → sessions closed
    for r in got:
        assert batch.get((r.user_id, r.session_start_s)) == r.n_events


@pytest.fixture(scope="module")
def dup_events_dir(spark, tmp_path_factory):
    """The events table split into 3 chunks, each written TWICE (the
    at-least-once redelivery shape a streaming dedup must absorb)."""
    from polars_readstat_spark.tables import load_table

    d = tmp_path_factory.mktemp("events_stream_dup")
    ev = load_table(spark, SF, "events").orderBy("ts")
    pdf = ev.toPandas()
    chunk = len(pdf) // 3 + 1
    k = 0
    for i in range(3):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        if len(part) == 0:
            continue
        for rep in range(2):
            p = str(d / f"chunk_{i}_{rep}.parquet")
            part.to_parquet(
                p, coerce_timestamps="us", allow_truncated_timestamps=True
            )
            os.utime(p, (time.time() + k, time.time() + k))
            k += 1
    return str(d)


def test_dedup_within_watermark_absorbs_redelivery(spark, dup_events_dir):
    """Every event arrives twice (adjacent micro-batches); the
    watermarked dedup must emit each event_id exactly once and in
    total match the batch distinct count."""
    from polars_readstat_spark.streaming.events import (
        dedup_within_watermark,
        run_available_now,
    )
    from polars_readstat_spark.tables import load_table

    out = run_available_now(
        dedup_within_watermark(_stream(spark, dup_events_dir)),
        "dedup_mem",
    )
    ids = [r.event_id for r in out.select("event_id").collect()]
    assert len(ids) == len(set(ids))
    want = load_table(spark, SF, "events").select("event_id").distinct().count()
    assert len(ids) == want


def test_stateful_sessionizer(spark, events_dir):
    """applyInPandasWithState custom sessionizer: every emitted closed
    session matches the batch session_window oracle (start floored to
    seconds)."""
    from polars_readstat_spark.streaming.events import (
        run_available_now,
        sessionize_stateful,
    )

    out = run_available_now(
        sessionize_stateful(_stream(spark, events_dir), watermark="1 hour"),
        "sess_state_mem",
    )
    got = out.collect()
    batch = _batch_sessions(spark)
    assert len(got) > 0
    for r in got:
        assert batch.get((r.user_id, r.session_start_s)) == r.n_events


def test_stateful_sessionizer_gap_only_micros(spark, events_dir):
    """micros/timeout_close=False mode (the oracle-checked registry
    query's semantics): the emitted set must EQUAL the batch
    gaps-and-islands minus each user's final island, at µs fidelity.
    Set equality (not subset) is the cross-batch state proof: a
    session spanning a chunk boundary would split into extra emitted
    rows if state were lost between micro-batches, and a lost gap
    would drop a row."""
    from polars_readstat_spark.streaming.events import (
        run_available_now,
        sessionize_stateful,
    )
    from polars_readstat_spark.tables import load_table

    out = run_available_now(
        sessionize_stateful(
            _stream(spark, events_dir), micros=True, timeout_close=False
        ),
        "sess_gap_mem",
    )
    got = {
        (r.user_id, r.session_start_us, r.n_events) for r in out.collect()
    }

    from pyspark.sql import functions as F

    pdf = (
        load_table(spark, SF, "events")
        .select("user_id", F.unix_micros("ts").alias("t"))
        .toPandas()
        .sort_values(["user_id", "t"])
    )
    want = set()
    for uid, grp in pdf.groupby("user_id"):
        ts = grp["t"].tolist()
        islands = []
        start, n = ts[0], 1
        for prev, cur in zip(ts, ts[1:]):
            if cur - prev > 1_800_000_000:
                islands.append((start, n))
                start, n = cur, 0
            n += 1
        islands.append((start, n))  # final island — withheld by design
        for s, k in islands[:-1]:
            want.add((uid, s, k))
    assert got == want
    assert len(got) > 0


def test_stateful_sessionizer_bucketed_equals_per_user(spark, events_dir):
    """bucket_users salts users into shared state groups (array-typed
    state rows) to amortize the per-group applyInPandasWithState
    protocol cost; the emitted set must be IDENTICAL to the per-user
    kernel's — bucketing may not merge, split, or reorder any user's
    event sequence, and array state must round-trip the store across
    micro-batch boundaries (events_dir drains multiple chunks)."""
    from polars_readstat_spark.streaming.events import (
        run_available_now,
        sessionize_stateful,
    )

    def emitted(**kw):
        out = run_available_now(
            sessionize_stateful(
                _stream(spark, events_dir),
                micros=True,
                timeout_close=False,
                **kw,
            ),
            f"sess_bucket_mem_{len(kw)}",
        )
        rows = {
            (r.user_id, r.session_start_us, r.n_events)
            for r in out.collect()
        }
        spark.catalog.dropTempView(f"sess_bucket_mem_{len(kw)}")
        return rows

    # bucket count deliberately tiny and coprime-ish to nothing: 3
    # forces many users per bucket and >1 bucket per partition
    assert emitted(bucket_users=3) == emitted()


def test_stateful_sessionizer_bucketed_requires_gap_only(spark, events_dir):
    import pytest as _pytest

    from polars_readstat_spark.streaming.events import sessionize_stateful

    with _pytest.raises(ValueError, match="timeout_close"):
        sessionize_stateful(
            _stream(spark, events_dir),
            micros=True,
            timeout_close=True,
            bucket_users=4,
        )


# ── batching-invariance property (pure state machine, no Spark) ──────

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


def _batch_islands(ts_sorted, gap):
    """Reference gaps-and-islands over the WHOLE sorted stream."""
    islands = []
    start, n = None, 0
    last = None
    for t in ts_sorted:
        if last is not None and t - last > gap:
            islands.append((start, n))
            start, n = None, 0
        if start is None:
            start = t
        n += 1
        last = t
    if n:
        islands.append((start, n))
    return islands


if _HYP:

    @settings(max_examples=200, deadline=None)
    @given(
        ts=st.lists(
            st.integers(min_value=0, max_value=100_000),
            min_size=1,
            max_size=60,
        ),
        cuts=st.lists(
            st.integers(min_value=0, max_value=60), max_size=6
        ),
        gap=st.integers(min_value=1, max_value=5_000),
    )
    def test_session_state_machine_batching_invariant(ts, cuts, gap):
        """Folding ANY time-ordered chunking through
        advance_session_state emits exactly the batch islands minus
        the final open one — the invariance stream_sessionize_stateful's
        SQL oracle rests on. Duplicate timestamps and empty chunks
        included."""
        from polars_readstat_spark.streaming.events import (
            advance_session_state,
        )

        ts = sorted(ts)
        bounds = sorted({min(c, len(ts)) for c in cuts} | {0, len(ts)})
        chunks = [
            ts[a:b] for a, b in zip(bounds, bounds[1:])
        ]  # may include empty chunks
        state = None
        emitted = []
        for chunk in chunks:
            closed, state = advance_session_state(chunk, state, gap)
            emitted.extend(closed)
        want = _batch_islands(ts, gap)
        # the final island stays open in `state`, never emitted
        assert emitted == want[:-1]
        assert state is not None
        assert (state[2], state[1]) == want[-1]


def test_drain_collect_drops_sink_view(spark, events_dir):
    """drain_collect must not leak the memory-sink temp view: the
    result stays collectable after the view is gone."""
    from polars_readstat_spark.streaming.events import (
        drain_collect,
        hourly_window,
    )

    out = drain_collect(
        hourly_window(_stream(spark, events_dir)), "drain_drop_probe"
    )
    assert "drain_drop_probe" not in [
        t.name for t in spark.catalog.listTables()
    ]
    assert out.count() > 0


def test_state_partitions_for_scales_with_state_not_cores(spark):
    """State stores are a per-batch fixed cost: the count must derive
    from keyed-state volume (clamped to session parallelism), with a
    parallelism floor only for Python group kernels."""
    from polars_readstat_spark.streaming.events import (
        _STATE_ROWS_PER_PARTITION,
        state_partitions_for,
    )

    session = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # tiny state -> one store, regardless of core count
    assert state_partitions_for(spark, 1) == 1
    assert state_partitions_for(spark, _STATE_ROWS_PER_PARTITION) == 1
    # large state -> clamped to the session's shuffle parallelism
    big = _STATE_ROWS_PER_PARTITION * (session + 50)
    assert state_partitions_for(spark, big) == session
    # in between: ceil(rows / target)
    assert (
        state_partitions_for(spark, 3 * _STATE_ROWS_PER_PARTITION + 1)
        == min(4, session)
    )
    # python group kernels keep a parallelism floor even for tiny state
    floor = max(2, session // 4)
    assert state_partitions_for(spark, 1, python_groups=True) == min(
        floor, session
    )


def test_run_available_now_restores_shuffle_partitions(spark, events_dir):
    """The drain sizes state stores via spark.sql.shuffle.partitions
    for the stream's lifetime only: the session value must come back
    for batch queries (and the stream must still produce rows)."""
    from polars_readstat_spark.streaming.events import (
        drain_collect,
        hourly_window,
    )

    prior = spark.conf.get("spark.sql.shuffle.partitions")
    out = drain_collect(
        hourly_window(_stream(spark, events_dir)),
        "state_parts_probe",
        state_partitions=2,
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == prior
    assert out.count() > 0
