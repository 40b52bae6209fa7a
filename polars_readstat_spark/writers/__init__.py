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


def str_cell_matrix(col, w: int, utf8_boundary: bool = False):
    """(n, w) uint8 matrix of UTF-8-encoded, truncated, space-padded
    fixed-width string cells — the shared string-cell pack for the
    sav/xpt/sas7bdat writers (round 13, guide §4.2): the encode runs
    once per DISTINCT value (pandas factorize) and rows gather from
    the unique-cell matrix, replacing the per-row encode/ljust loops.
    Non-str values (None/NaN) become the empty cell, as before.
    ``utf8_boundary`` backs a width-truncated cell off (≤3 bytes) to
    the last complete UTF-8 character (the xpt rule)."""
    import numpy as np
    import pandas as pd

    if not isinstance(col, (pd.Series, pd.Index, np.ndarray)):
        col = np.asarray(col, dtype=object)  # tuple/list driver paths
    codes, uniq = pd.factorize(col, use_na_sentinel=True)
    cells = []
    for s in uniq:
        full = (s if isinstance(s, str) else "").encode("utf-8")
        b = full[:w]
        if utf8_boundary and len(b) < len(full):
            for _ in range(3):
                try:
                    b.decode("utf-8")
                    break
                except UnicodeDecodeError:
                    b = b[:-1]
        cells.append(b)
    cells.append(b"")  # factorize's -1 sentinel (null) → empty cell
    lens = np.fromiter(
        (len(b) for b in cells), dtype=np.int64, count=len(cells)
    )
    k = max(int(lens.max()), 1)
    um = (
        np.array(cells, dtype=f"S{k}")
        .view(np.uint8)
        .reshape(len(cells), k)
    )
    out = np.full((len(cells), w), 0x20, dtype=np.uint8)
    msk = np.arange(k)[None, :] < lens[:, None]
    out[:, :k][msk] = um[msk]
    return out[codes]


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


# chunk-id buckets per core in the wide packing protocol (see
# iter_ordered_packed). 1, measured: 4x over-partitioning to
# load-balance unevenly-hashed chunk ids LOST to its own per-task
# Python-worker overhead in an interleaved A/B at sf0.1 (por
# 4.2 vs 4.4 s, rle 3.6 vs 3.9, zsav 2.9 vs 3.6) — the straggler
# tail it targets is smaller than 96 extra mapInArrow task spin-ups.
_WIDE_FACTOR = 1


def iter_ordered_packed(df, pack_fn, max_rows: int = 8192, modules=(), cast=None):
    """Executor packing fanned across every core with JVM-side order
    tags — one Python crossing (round 13; guide §4.1: control how
    often data crosses the boundary).

    Rows are tagged in the JVM with a monotonically-increasing id and
    a chunk id (``__prs_cid = __prs_mid div max_rows`` — contiguous,
    in-order row groups, because the id is (partition << 33) + offset
    so chunk ids sort exactly like the input row order), then
    RANGE-repartitioned BY CHUNK ID across the cluster: whole chunks
    travel together through a JVM-only shuffle, the data crosses into
    Python exactly once in the pack stage, and — because range
    partition index order IS cid order and each task emits its chunks
    cid-ascending — the persisted pack output streams to the driver
    already in exact input order via plain toLocalIterator (round 14;
    VERDICT r13 next#5). The previous hash-partitioned drain paid a
    second full exchange + sort of the PACKED PAYLOAD BYTES
    (orderBy(cid) over the persisted chunks) to restore that order;
    range partitioning moves the cost to one row-sampling pass of the
    tagged input (RangePartitioner bounds), which at export scale is
    far cheaper than re-shuffling every packed byte. A strictly-
    increasing cid check at the drain turns any ordering violation
    into a hard error instead of a corrupt file.

    The previous protocol (two mapInArrow stages around the shuffle)
    paid a second full Python crossing — slicing + Arrow-IPC
    re-serializing every row on the narrow input partitions before
    the shuffle could spread the work — measured 0.65 s of the
    sas7bdat export pipeline at sf0.1 — plus a driver-side (pid, seq)
    reassembly dict.

    ``cast``, when given, is applied AFTER the repartition and must
    preserve the ``__prs_mid``/``__prs_cid`` columns: the shuffle
    then carries the narrow source types and the cast's row-widening
    (e.g. dates → display strings) runs on every core instead of on
    the scan's partition count.
    """
    import sys

    from pyspark import cloudpickle

    for m in modules:
        cloudpickle.register_pickle_by_value(sys.modules[m])
    for c in ("__prs_mid", "__prs_cid"):
        if c in df.columns:
            raise ValueError(f"iter_ordered_packed: column {c!r} is reserved")
    sc = df.sparkSession.sparkContext
    cores = max(int(sc.defaultParallelism), 1)
    tagged = df.withColumn(
        "__prs_mid", F.monotonically_increasing_id()
    ).withColumn("__prs_cid", F.expr(f"__prs_mid div {int(max_rows)}"))
    body = tagged.repartitionByRange(_WIDE_FACTOR * cores, "__prs_cid")
    if cast is not None:
        body = cast(body)
    names = [c for c in body.columns if c not in ("__prs_mid", "__prs_cid")]

    def stage(batches):
        import numpy as np
        import pyarrow as _pa

        blist = list(batches)
        if not blist:
            return
        tbl = _pa.Table.from_batches(blist)
        if tbl.num_rows == 0:
            return
        # the shuffle reader merges map-output streams in arbitrary
        # order — restore row order inside the task, then split on
        # chunk-id boundaries (range partitioning routes all rows of
        # a chunk to this task, and this task's cid range precedes
        # every later partition's)
        mid = tbl.column("__prs_mid").to_numpy()
        tbl = tbl.take(np.argsort(mid, kind="stable"))
        cid = tbl.column("__prs_cid").to_numpy()
        bounds = np.flatnonzero(cid[1:] != cid[:-1]) + 1
        starts = np.concatenate(([0], bounds)).tolist()
        ends = np.concatenate((bounds, [len(cid)])).tolist()
        data = tbl.select(names)
        for s, e in zip(starts, ends):
            pdf = data.slice(s, e - s).to_pandas()
            pdf.columns = names
            yield _pa.RecordBatch.from_arrays(
                [
                    _pa.array([int(cid[s])], type=_pa.int64()),
                    _pa.array([pack_fn(pdf)], type=_pa.binary()),
                    _pa.array([e - s], type=_pa.int64()),
                ],
                names=["cid", "payload", "n"],
            )

    from pyspark import StorageLevel

    staged = body.mapInArrow(
        stage, "cid bigint, payload binary, n bigint"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # materialize on every core AND capture chunk/row totals from
        # the same executed plan: the drained stream must match both,
        # which catches whole-trailing-partition loss in the local
        # iterator (the failure mode the old protocol's terminator
        # bookkeeping guarded against)
        tot = staged.agg(
            F.count(F.lit(1)).alias("c"), F.sum("n").alias("r")
        ).collect()[0]
        exp_chunks, exp_rows = tot[0], tot[1] or 0
        got_chunks = got_rows = 0
        last_cid = None
        # no orderBy: range partitioning already makes partition index
        # order cid order, and each task emits cid-ascending — the
        # monotonicity check below proves it on every drained stream
        for row in staged.toLocalIterator(prefetchPartitions=True):
            if last_cid is not None and row[0] <= last_cid:
                raise RuntimeError(
                    "iter_ordered_packed: chunk stream out of order "
                    f"(cid {row[0]} after {last_cid})"
                )
            last_cid = row[0]
            got_chunks += 1
            got_rows += row[2]
            yield row[1], row[2]
        if got_chunks != exp_chunks or got_rows != exp_rows:
            raise RuntimeError(
                "iter_ordered_packed: chunk stream incomplete "
                f"({got_chunks}/{exp_chunks} chunks, "
                f"{got_rows}/{exp_rows} rows)"
            )
    finally:
        staged.unpersist()


def iter_packed_chunks_wide(df, pack_fn, max_rows: int = 8192, modules=()):
    """Back-compat name for the wide (all-cores) packing protocol —
    now the JVM-tagged single-crossing iter_ordered_packed."""
    yield from iter_ordered_packed(df, pack_fn, max_rows, modules)
