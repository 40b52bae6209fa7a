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


def iter_packed_chunks_wide(df, pack_fn, max_rows: int = 8192, modules=()):
    """iter_packed_chunks with pack_fn fanned across EVERY core.

    toLocalIterator runs a narrow pipeline's partitions one at a time
    (prefetch 1), so executor packing through iter_packed_chunks only
    ever uses a core or two when pack_fn dominates. Here stage 1
    slices the input into row chunks shipped as Arrow IPC blobs
    tagged (partition, seq, is-last); a repartition(cores) spreads
    them; stage 2 applies pack_fn on every core; persist+count
    materializes the whole stage in parallel; and chunks are yielded
    to the caller in exact partition order reconstructed from the
    tags (the same protocol as the sas7bdat compressed sink). One
    extra pass of chunk bytes through the shuffle — the single-file
    convenience path's trade; bulk exports use the partitioned
    writers."""
    import sys

    from pyspark import cloudpickle

    for m in modules:
        cloudpickle.register_pickle_by_value(sys.modules[m])
    names = df.columns
    tag_schema = "pid int, seq int, last boolean, payload binary, n bigint"

    def chunk_stage(batches):
        import io

        import pyarrow as _pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()

        def rec(seq, last, payload, n):
            return _pa.RecordBatch.from_arrays(
                [
                    _pa.array([pid], type=_pa.int32()),
                    _pa.array([seq], type=_pa.int32()),
                    _pa.array([last], type=_pa.bool_()),
                    _pa.array([payload], type=_pa.binary()),
                    _pa.array([n], type=_pa.int64()),
                ],
                names=["pid", "seq", "last", "payload", "n"],
            )

        def ipc(piece):
            sink = io.BytesIO()
            with _pa.ipc.new_stream(sink, piece.schema) as wtr:
                wtr.write_batch(piece)
            return sink.getvalue()

        seq = 0
        pending = None
        for b in batches:
            start = 0
            while start < b.num_rows:
                piece = b.slice(start, max_rows)
                start += piece.num_rows
                if pending is not None:
                    yield rec(seq, False, *pending)
                    seq += 1
                pending = (ipc(piece), piece.num_rows)
        yield rec(seq, True, *(pending if pending is not None else (b"", 0)))

    def pack_stage(batches):
        import pyarrow as _pa

        for b in batches:
            enc = []
            pays = b.column(3)
            for j in range(b.num_rows):
                blob = pays[j].as_py()
                if blob:
                    with _pa.ipc.open_stream(blob) as reader:
                        pdf = reader.read_pandas()
                    pdf.columns = names
                    enc.append(pack_fn(pdf))
                else:
                    enc.append(b"")
            yield _pa.RecordBatch.from_arrays(
                [
                    b.column(0),
                    b.column(1),
                    b.column(2),
                    _pa.array(enc, type=_pa.binary()),
                    b.column(4),
                ],
                names=["pid", "seq", "last", "payload", "n"],
            )

    sc = df.sparkSession.sparkContext
    cores = max(int(sc.defaultParallelism), 1)
    from pyspark import StorageLevel

    staged = (
        df.mapInArrow(chunk_stage, tag_schema)
        .repartition(cores)
        .mapInArrow(pack_stage, tag_schema)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        # materialize (pack runs on all cores) AND capture the total
        # row count JVM-side: count() aggregates over every executed
        # partition, so comparing it to the rows the local iterator
        # actually delivered restores an end-to-end total that is
        # independent of the iterator path — losing every row of one
        # or more trailing partitions (max_pid would shrink in step)
        # cannot pass. Terminator/pid bookkeeping below still derives
        # from the DATA, not a separately converted RDD lineage's
        # getNumPartitions() (AQE/plan re-optimization can desync the
        # latter from the executed stage).
        expected_rows = staged.count()
        pending: dict = {}
        cur_pid, cur_seq = 0, 0
        max_pid, terminators, received = -1, 0, 0
        for row in staged.toLocalIterator(prefetchPartitions=True):
            received += 1
            max_pid = max(max_pid, row[0])
            if row[2]:
                terminators += 1
            pending[(row[0], row[1])] = (row[2], row[3], row[4])
            while (cur_pid, cur_seq) in pending:
                last, payload, n = pending.pop((cur_pid, cur_seq))
                if n:
                    yield payload, n
                if last:
                    cur_pid, cur_seq = cur_pid + 1, 0
                else:
                    cur_seq += 1
        if (
            pending
            or cur_pid != max_pid + 1
            or terminators != max_pid + 1
            or received != expected_rows
        ):
            raise RuntimeError(
                "iter_packed_chunks_wide: chunk stream incomplete "
                f"(at partition {cur_pid}/{max_pid + 1}, "
                f"{terminators} terminators, "
                f"{received}/{expected_rows} rows, "
                f"{len(pending)} chunks unplaced)"
            )
    finally:
        staged.unpersist()
