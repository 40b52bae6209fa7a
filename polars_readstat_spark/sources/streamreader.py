"""Structured Streaming source: file-arrival ingest of statistical
files.

``spark.readStream.format("readstat").load(dir_or_glob)`` turns a
landing directory of dta/sav/xpt/por/sas7bdat files into an unbounded
DataFrame: each microbatch picks up files that appeared since the last
offset, and each file decodes inside an executor task with the same
partition readers the batch scan uses. The offset is the sorted list
of ingested files, so replay from a checkpoint re-decodes exactly the
files between two offsets — deterministic because landed files are
immutable.

This is a Spark-native extension surface: the reference engine is
batch-only (SURVEY.md §2.8 — no streaming), but a statistical-file
landing zone is exactly how survey/administrative data arrives in
practice (nightly drops), and Structured Streaming's checkpointing
gives restart-safe ingest for free.

Scale notes: offsets carry file names only (bytes re-read from
storage on replay, never stored in the checkpoint); each new file is
one input partition, so a microbatch with N landed files decodes on N
executors in parallel. Files must land atomically (write-then-rename)
so a half-written file is never listed.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import DataSourceStreamReader, InputPartition


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith(".") and os.path.isfile(os.path.join(path, f))
        )
    return sorted(p for p in _glob.glob(path) if os.path.isfile(p))


class FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ReadstatStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema):
        self.options = dict(options)
        self.path = self.options.get("path")
        if not self.path:
            raise ValueError("readstat stream: path required")
        self._schema = schema
        # include_existing=false starts from the current directory
        # state instead of ingesting what's already there
        v = str(self.options.get("include_existing", "true")).lower()
        self.include_existing = v in {"1", "true", "yes"}

    def initialOffset(self) -> dict:
        if self.include_existing:
            return {"seen": []}
        return {"seen": _list_files(self.path)}

    def latestOffset(self) -> dict:
        return {"seen": _list_files(self.path)}

    def partitions(self, start: dict, end: dict):
        prev = set(start.get("seen", []))
        new = [f for f in end.get("seen", []) if f not in prev]
        return [FilePartition(f) for f in new]

    def commit(self, end: dict) -> None:
        pass  # nothing external to clean up: files stay in place

    def read(self, partition: FilePartition):
        from polars_readstat_spark.sources.datasource import (
            ReadstatDataSource,
            SchemaAlignReader,
        )

        opts = dict(self.options)
        opts["path"] = partition.path
        if str(opts.get("union_by_name", "")).lower() in {"1", "true", "yes"}:
            # drift-tolerant landing zone: the stream's schema is
            # fixed at start (first file / initial union); later
            # files align per batch — absent columns read as null,
            # widened numerics cast, unknown columns are projected
            # away (a stream cannot widen its schema mid-flight)
            fields = [f for f in self._schema.fields]
            probe = dict(opts)
            probe.pop("columns", None)
            avail = set(
                ReadstatDataSource(probe)
                ._schema_uncompressed()
                .fieldNames()
            )
            mine = [f.name for f in fields if f.name in avail]
            opts["columns"] = ",".join(
                mine or list(avail)[:1]
            )
            inner = ReadstatDataSource(opts)._reader_uncompressed(
                self._schema
            )
            reader = SchemaAlignReader(inner, fields)
        else:
            reader = ReadstatDataSource(opts)._reader_uncompressed(
                self._schema
            )
        for part in reader.partitions():
            yield from reader.read(part)
