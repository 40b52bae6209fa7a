"""A3 profiled reads: per-phase timing breakdown for a readstat scan.

Mirrors the reference's profiled read surface (OpenProfile /
ReadProfile, reference crates/polars_readstat_rs/src/sas/reader.rs:
30-43, 174-189): a diagnostic that answers "where does scan time go"
— metadata parse, partition planning, raw IO, decode+Arrow build.

Like the reference's profiled path, this runs single-process: it
drives the exact reader objects Spark's executors run
(ReadstatDataSource → partitions → read), so the numbers are the real
per-partition costs, measured without executor noise. Production
scans stay distributed; this is the tuning tool you run on one file
before launching the cluster job.

Phase definitions (they sum to total_s by construction):
- metadata_s: format metadata parse + schema derivation
- plan_s:     reader construction + partition planning
- io_s:       raw sequential read of the file bytes (measured in a
              separate pass, 8 MiB chunks — full width, so with
              projection pushdown the pipeline may read less)
- decode_arrow_s: consume_s − io_s, i.e. row→column pivot, type
              decode, and Arrow batch build net of IO
"""

from __future__ import annotations

import time
from polars_readstat_spark.sources.fs import fs_open


def profile_read(path: str, columns: str | list | None = None, **options) -> dict:
    """Profile a scan of ``path`` (any supported format / glob).

    Returns phase timings in seconds plus row/batch/partition counts
    and decode throughput. ``columns`` and any ``scan_readstat``
    option (n_rows, offset, value_labels_as_strings, ...) apply, so
    you can profile exactly the scan you plan to run."""
    from polars_readstat_spark.sources.datasource import ReadstatDataSource

    opts = {"path": str(path)}
    if columns is not None:
        opts["columns"] = (
            columns if isinstance(columns, str) else ",".join(columns)
        )
    opts.update({k: str(v) for k, v in options.items()})

    t_total = time.perf_counter()

    t0 = time.perf_counter()
    ds = ReadstatDataSource(opts)
    schema = ds.schema()
    metadata_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    reader = ds.reader(schema)
    parts = list(reader.partitions())
    plan_s = time.perf_counter() - t0

    from polars_readstat_spark.sources.fs import (
        fs_glob,
        fs_isdir,
        fs_listdir,
    )

    paths = fs_glob(opts["path"]) or [opts["path"]]
    if len(paths) == 1 and fs_isdir(paths[0]):
        paths = fs_listdir(paths[0])
    t0 = time.perf_counter()
    byte_count = 0
    for p in paths:
        if fs_isdir(p):  # a glob can match subdirectories
            continue
        with fs_open(p) as f:
            while True:
                b = f.read(8 << 20)
                if not b:
                    break
                byte_count += len(b)
    io_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_rows = 0
    n_batches = 0
    for part in parts:
        for batch in reader.read(part):
            n_rows += batch.num_rows
            n_batches += 1
    consume_s = time.perf_counter() - t0

    total_s = time.perf_counter() - t_total
    decode_arrow_s = max(consume_s - io_s, 0.0)
    return {
        "metadata_s": metadata_s,
        "plan_s": plan_s,
        "io_s": io_s,
        "decode_arrow_s": decode_arrow_s,
        "total_s": total_s,
        "n_rows": n_rows,
        "n_batches": n_batches,
        "n_partitions": len(parts),
        "bytes_read": byte_count,
        "rows_per_sec": (n_rows / consume_s) if consume_s > 0 else float("inf"),
        "columns": [f.name for f in schema.fields],
    }
