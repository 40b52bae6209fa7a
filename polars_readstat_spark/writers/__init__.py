"""Writers / sinks (SURVEY.md §2.7): Spark DataFrame → statistical
file formats. Single-file formats with row-count headers ⇒ a pre-pass
aggregation job (widths/counts/ranges) + a driver-side streaming
assembly over Arrow chunks (iter_arrow_chunks — the Spark translation
of the reference's two-pass sink_stata, pybindings.rs:951-1096)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_epoch_seconds(c: Column) -> Column:
    """Wall-clock seconds since 1970-01-01 00:00:00 for TIMESTAMP or
    TIMESTAMP_NTZ, without any timezone interpretation (NTZ cannot be
    cast to double in Spark 4; field arithmetic sidesteps session-tz
    coupling entirely)."""
    return (
        F.unix_date(F.to_date(c)).cast("double") * 86400.0
        + F.hour(c) * 3600.0
        + F.minute(c) * 60.0
        + F.second(c).cast("double")
        + F.date_format(c, "SSSSSS").cast("double") / 1e6
    )


def iter_arrow_chunks(df, max_rows: int = 65536):
    """Partition-ordered Arrow-chunk transport for driver-side sinks.

    `toLocalIterator()` deserializes one pickled Row OBJECT per row on
    the driver — the slowest possible transport for a bulk export.
    Here each executor serializes its Arrow batches to IPC bytes
    (`mapInArrow`, one binary cell per chunk ≤ max_rows), the driver
    streams those few rows in partition order with bounded memory, and
    each chunk deserializes back to a `pyarrow.RecordBatch` in one
    C-level pass. Yields pandas DataFrames (the pack kernels consume
    Series via .to_numpy / iteration) of ≤ max_rows rows.
    """
    import pyarrow as pa

    schema_names = df.columns

    def stage(batches):
        import io

        import pyarrow as _pa

        for b in batches:
            start = 0
            while start < b.num_rows:
                piece = b.slice(start, max_rows)
                start += piece.num_rows
                sink = io.BytesIO()
                with _pa.ipc.new_stream(sink, piece.schema) as w:
                    w.write_batch(piece)
                yield _pa.RecordBatch.from_arrays(
                    [_pa.array([sink.getvalue()], type=_pa.binary())],
                    names=["chunk"],
                )

    staged = df.mapInArrow(stage, "chunk binary")
    for row in staged.toLocalIterator(prefetchPartitions=True):
        with pa.ipc.open_stream(row[0]) as reader:
            for b in reader:
                pdf = b.to_pandas()
                pdf.columns = schema_names
                yield pdf


def iter_packed_chunks(df, pack_fn, max_rows: int = 8192, modules=()):
    """Executor-side packing for driver-assembled single-file sinks.

    `pack_fn(pandas.DataFrame) -> bytes` runs inside a mapInArrow
    stage on the executors (rows pack independently in every format
    here); the driver receives (payload, n_rows) pairs in partition
    order and only concatenates. `modules` are registered for
    cloudpickle pickle-by-value so the stage works when the package
    is importable only on the driver (the external-driver layout);
    pack_fn and everything it references must resolve from those
    modules' globals, not from runtime package imports.
    """
    import sys

    from pyspark import cloudpickle

    for m in modules:
        cloudpickle.register_pickle_by_value(sys.modules[m])
    names = df.columns

    def stage(batches):
        import pyarrow as _pa

        for b in batches:
            start = 0
            while start < b.num_rows:
                piece = b.slice(start, max_rows)
                start += piece.num_rows
                pdf = piece.to_pandas()
                pdf.columns = names
                yield _pa.RecordBatch.from_arrays(
                    [
                        _pa.array([pack_fn(pdf)], type=_pa.binary()),
                        _pa.array([piece.num_rows], type=_pa.int64()),
                    ],
                    names=["payload", "n"],
                )

    staged = df.mapInArrow(stage, "payload binary, n bigint")
    for row in staged.toLocalIterator(prefetchPartitions=True):
        yield row[0], row[1]
