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


def _tiny_dta_dir(dirpath: str, n_files: int, rows_per_file: int = 20):
    """n tiny same-schema dta files written with pandas (fast, no
    Spark round trip)."""
    import pandas as pd

    os.makedirs(dirpath, exist_ok=True)
    for k in range(n_files):
        lo = k * rows_per_file
        pd.DataFrame(
            {
                "id": range(lo, lo + rows_per_file),
                "v": [float(i) * 1.5 for i in range(lo, lo + rows_per_file)],
            }
        ).to_stata(
            os.path.join(dirpath, f"f{k:04d}.dta"),
            write_index=False,
            version=118,
        )


def _stream_parts(opts: dict):
    """Driver-side plan of one micro-batch containing everything in
    the landing path: (partitions, stream_reader)."""
    from polars_readstat_spark.sources.datasource import ReadstatDataSource
    from polars_readstat_spark.sources.streamreader import (
        ReadstatStreamReader,
    )

    schema = ReadstatDataSource(dict(opts))._schema_uncompressed()
    r = ReadstatStreamReader(dict(opts), schema)
    return r.partitions({"seen": []}, r.latestOffset()), r


def test_stream_single_big_file_fans_out(spark, tmp_path):
    """VERDICT r10 next#3(b): one large nightly drop must NOT read on
    one core — the stream planner emits the file's inner row-range
    partitions as separate tasks."""
    src = str(tmp_path / "bigdrop")
    os.makedirs(src)
    _write(spark, os.path.join(src, "big.dta"), 0, 10_000)
    parts, r = _stream_parts(
        {"path": src, "rows_per_partition": "1000"}
    )
    assert len(parts) == 10  # 10k rows / 1k per partition
    rows = []
    for p in parts:
        for b in r.read(p):
            rows.extend(b.column(0).to_pylist())
    assert sorted(rows) == list(range(10_000))


def test_stream_small_files_pack(spark, tmp_path):
    """VERDICT r10 next#3(a): a micro-batch of N tiny arrivals packs
    into ~cores tasks instead of paying N per-task floors — the same
    packer the batch scan uses."""
    src = str(tmp_path / "tinydrop")
    _tiny_dta_dir(src, 100)
    packed, r = _stream_parts({"path": src, "target_parallelism": "8"})
    assert len(packed) <= 12  # ~cores bins, not 100 tasks
    unpacked, r2 = _stream_parts(
        {"path": src, "target_parallelism": "8", "coalesce_files": "0"}
    )
    assert len(unpacked) == 100
    got = []
    for p in packed:
        for b in r.read(p):
            got.extend(b.column(0).to_pylist())
    want = []
    for p in unpacked:
        for b in r2.read(p):
            want.extend(b.column(0).to_pylist())
    assert sorted(got) == sorted(want) == list(range(2000))


def test_stream_many_small_files_end_to_end(spark, tmp_path):
    """Full readStream drain over 60 tiny files: exercises pickling of
    packed StreamUnitsPartition through the real executor path."""
    src = str(tmp_path / "landing60")
    _tiny_dta_dir(src, 60, rows_per_file=10)
    ckpt = str(tmp_path / "ckpt60")
    out = str(tmp_path / "out60")
    q = (
        spark.readStream.format("readstat")
        .load(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    got = spark.read.parquet(out).collect()
    assert sorted(r.id for r in got) == list(range(600))


def test_stream_per_file_n_rows(spark, tmp_path):
    """Per-file slicing options stay legal on streams (each landed
    file is its own unit of work — there is no Catalyst limit across
    a stream's files): n_rows=5 takes the first 5 rows of EVERY
    landed file."""
    src = str(tmp_path / "sliced")
    _tiny_dta_dir(src, 4, rows_per_file=20)
    parts, r = _stream_parts({"path": src, "n_rows": "5"})
    rows = []
    for p in parts:
        for b in r.read(p):
            rows.extend(b.column(0).to_pylist())
    assert sorted(rows) == sorted(
        x for k in range(4) for x in range(k * 20, k * 20 + 5)
    )


def test_stream_partition_payload_has_no_reader_objects(spark, tmp_path):
    """StreamUnitsPartition ships option dicts, never parsed reader
    objects — a wide file's metadata must not be pickled once per
    inner partition (finding r11-review#10)."""
    src = str(tmp_path / "payload")
    _tiny_dta_dir(src, 3)
    parts, _r = _stream_parts({"path": src, "coalesce_files": "0"})
    for p in parts:
        for opts, _inner, path in p.units:
            assert isinstance(opts, dict) and isinstance(path, str)
            assert "path" in opts


def test_stream_from_remote_uri(spark, tmp_path):
    """readStream from a non-POSIX URI: listings, offsets, planning,
    and executor reads all resolve through the filesystem seam."""
    src = str(tmp_path / "remote_landing")
    _tiny_dta_dir(src, 5, rows_per_file=10)
    ckpt = str(tmp_path / "rl_ckpt")
    out = str(tmp_path / "rl_out")
    q = (
        spark.readStream.format("readstat")
        .load("simlat0://" + src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = spark.read.parquet(out).collect()
    assert sorted(r.id for r in got) == list(range(50))


def test_stream_max_file_age_bounds_offsets(spark, tmp_path):
    """max_file_age_sec compacts offsets to the mtime window of the
    newest file (Spark FileStreamSource maxFileAge design): offsets
    stay bounded on a long-lived landing zone, already-ingested names
    trimmed from the window never re-ingest, and backdated arrivals
    outside the window are skipped (the documented trade)."""
    from polars_readstat_spark.sources.datasource import ReadstatDataSource
    from polars_readstat_spark.sources.streamreader import (
        ReadstatStreamReader,
    )

    src = str(tmp_path / "aged")
    _tiny_dta_dir(src, 5, rows_per_file=4)  # f0000..f0004
    base = 1_700_000_000  # deterministic mtimes, seconds apart
    for k in range(5):
        t = base + k
        os.utime(os.path.join(src, f"f{k:04d}.dta"), (t, t))
    opts = {"path": src, "max_file_age_sec": "2"}
    schema = ReadstatDataSource(dict(opts))._schema_uncompressed()
    r = ReadstatStreamReader(dict(opts), schema)

    end1 = r.latestOffset()
    names1 = [os.path.basename(f) for f in end1["seen"]]
    # window = newest(base+4) - 2s → f0002..f0004 only
    assert names1 == ["f0002.dta", "f0003.dta", "f0004.dta"]
    assert end1["horizon"] == (base + 2) * 10**9

    def rows_of(parts):
        out = []
        for p in parts:
            for b in r.read(p):
                out.extend(b.column(0).to_pylist())
        return sorted(out)

    # first batch ingests exactly the in-window files
    got1 = rows_of(r.partitions({"seen": []}, end1))
    assert got1 == sorted(x for k in (2, 3, 4) for x in range(k * 4, k * 4 + 4))

    # a new file lands; the old ones age out of the offset entirely
    p5 = os.path.join(src, "f0005.dta")
    import pandas as pd

    pd.DataFrame({"id": range(20, 24), "v": [0.0] * 4}).to_stata(
        p5, write_index=False, version=118
    )
    t5 = base + 10
    os.utime(p5, (t5, t5))
    end2 = r.latestOffset()
    assert [os.path.basename(f) for f in end2["seen"]] == ["f0005.dta"]
    # bounded: the offset no longer carries the 5 older names
    got2 = rows_of(r.partitions(end1, end2))
    assert got2 == [20, 21, 22, 23]

    # f0003 is still on disk, absent from both seens, and older than
    # end2's horizon — it was trimmed as ingested, NOT new: a replay
    # from end2 must not re-read it even if a listing resurfaces it
    fake_end = {
        "seen": end2["seen"] + [os.path.join(src, "f0003.dta")],
        "horizon": end2["horizon"],
    }
    assert r.partitions(end2, fake_end) == []

    # a backdated file landing outside the window is skipped
    p6 = os.path.join(src, "f0006.dta")
    pd.DataFrame({"id": [99], "v": [0.0]}).to_stata(
        p6, write_index=False, version=118
    )
    os.utime(p6, (base + 1, base + 1))
    end3 = r.latestOffset()
    assert "f0006.dta" not in [os.path.basename(f) for f in end3["seen"]]


def test_stream_where_option_filters_and_prunes(spark, tmp_path):
    """Round 13: the hazard-free `where` option works on the stream —
    parsed at stream start, applied batch-side in every task, and
    (when the landing dir carries a sink-published manifest) used at
    micro-batch planning to drop refuted files and trim row spans.
    Results must equal the unfiltered ingest filtered afterward."""
    import polars_readstat_spark as prs

    prs.register(spark)
    src = str(tmp_path / "landing")
    # the sink writes the parts AND the _prs_stats.json zone maps
    (
        spark.range(8000)
        .selectExpr("cast(id as long) as id", "cast(id % 5 as double) as v")
        .repartitionByRange(4, "id")
        .sortWithinPartitions("id")
        .write.format("readstat")
        .option("format", "dta")
        .option("zonemap_stripe_rows", "512")
        .mode("overwrite")
        .save(src)
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("readstat")
        .option("where", "id >= 6500 AND v = 2")
        .load(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    want = sorted(
        i for i in range(6500, 8000) if i % 5 == 2
    )
    assert got == want


def test_stream_where_plan_prunes_files(spark, tmp_path):
    """Plan-level: a micro-batch whose predicate refutes most landed
    parts schedules strictly fewer planned rows."""
    import polars_readstat_spark as prs
    from polars_readstat_spark.sources.streamreader import (
        ReadstatStreamReader,
    )

    prs.register(spark)
    src = str(tmp_path / "landing")
    (
        spark.range(8000)
        .selectExpr("cast(id as long) as id")
        .repartitionByRange(4, "id")
        .write.format("readstat")
        .option("format", "dta")
        .mode("overwrite")
        .save(src)
    )
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("id", LongType(), True)])

    def planned(opts):
        r = ReadstatStreamReader({"path": src, **opts}, schema)
        parts = r.partitions({"seen": []}, r.latestOffset())
        tot = 0
        for p in parts:
            for _o, inner, _pth in p.units:
                tot += getattr(inner, "n", 0)
        return tot

    full = planned({})
    pruned = planned({"where": "id >= 7000"})
    assert full == 8000
    assert 0 < pruned < full / 2


def test_stream_where_bad_column_raises_at_start(spark, tmp_path):
    from polars_readstat_spark.sources.streamreader import (
        ReadstatStreamReader,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("id", LongType(), True)])
    with pytest.raises(ValueError, match="unknown column"):
        ReadstatStreamReader(
            {"path": str(tmp_path), "where": "nope = 1"}, schema
        )
