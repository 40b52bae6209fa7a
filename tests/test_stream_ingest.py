"""Streaming file-arrival ingest: readStream over a directory of
statistical files — new files become microbatch rows, offsets make
restarts exactly-once."""

from __future__ import annotations

import os
import time

import pytest


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    import polars_readstat_spark as prs

    prs.register(spark)


def _write(spark, path, lo, hi):
    import polars_readstat_spark as prs

    df = spark.range(lo, hi).selectExpr(
        "cast(id as long) as id", "cast(id * 1.5 as double) as v",
        "concat('r', id) as s"
    )
    tmp = path + ".tmpx.dta"
    prs.write_readstat(df, tmp)
    os.replace(tmp, path)


def _run_available(spark, src_dir, ckpt, out):
    """One availableNow pass into a parquet sink (checkpoint-
    recoverable, unlike the memory sink); returns all rows in the
    sink so far."""
    q = (
        spark.readStream.format("readstat")
        .load(src_dir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    try:
        return spark.read.parquet(out).collect()
    except Exception:
        return []


def test_stream_ingests_new_files_exactly_once(spark, tmp_path):
    src = str(tmp_path / "landing")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    _write(spark, os.path.join(src, "a.dta"), 0, 50)
    first = _run_available(spark, src, ckpt, out)
    assert sorted(r.id for r in first) == list(range(50))
    assert {r.s for r in first if r.id == 7} == {"r7"}

    # second run with the same checkpoint: only the new file lands
    _write(spark, os.path.join(src, "b.dta"), 50, 80)
    second = _run_available(spark, src, ckpt, out)
    assert sorted(r.id for r in second) == list(range(80))  # appended once

    # nothing new -> no duplicate rows
    third = _run_available(spark, src, ckpt, out)
    assert sorted(r.id for r in third) == list(range(80))


def test_stream_include_existing_false(spark, tmp_path):
    src = str(tmp_path / "landing2")
    os.makedirs(src)
    _write(spark, os.path.join(src, "old.dta"), 0, 10)
    ckpt = str(tmp_path / "ckpt2")

    out = str(tmp_path / "out2")

    def run():
        q = (
            spark.readStream.format("readstat")
            .option("include_existing", "false")
            .load(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        try:
            return spark.read.parquet(out).collect()
        except Exception:
            return []

    assert run() == []  # pre-existing file skipped

    _write(spark, os.path.join(src, "new.dta"), 100, 110)
    got = run()
    assert sorted(r.id for r in got) == list(range(100, 110))


def test_stream_events_dir_reads_micros_layout(spark, tmp_path):
    """stream_events_dir must handle the current events layout
    (TIMESTAMP(MICROS), not-UTC-adjusted) by probing the footer and
    streaming ts as epoch-µs timestamps — same values as
    tables.load_table gives the batch twin."""
    import os

    from pyspark.sql import functions as F

    from polars_readstat_spark.streaming.events import (
        hourly_window,
        run_available_now,
        stream_events_dir,
    )
    from polars_readstat_spark.queries.timeseries import event_hourly_window
    from polars_readstat_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    d = tmp_path / "events_us"
    d.mkdir()
    # write chunks from the batch table with µs-NTZ timestamps — the
    # same physical layout the driver's generator now produces
    pdf = (
        load_table(spark, sf, "events")
        .select("event_id", "user_id", "event_type", "ts", "value")
        .toPandas()
    )
    half = len(pdf) // 2
    for i, part in enumerate((pdf.iloc[:half], pdf.iloc[half:])):
        part.to_parquet(
            str(d / f"c{i}.parquet"),
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
    out = run_available_now(
        hourly_window(stream_events_dir(spark, str(d))), "sed_mem"
    )
    got = {
        (r.window_start_s, r.event_type): (r.n, r.value_sum)
        for r in out.collect()
    }
    want = {
        (r.window_start_s, r.event_type): (r.n, r.value_sum)
        for r in event_hourly_window(spark, sf).collect()
    }
    assert got == want
