"""Zone-map indexing for EXISTING lakes (round 13).

The sink and the bulk exporters publish ``_prs_stats.json`` as they
write — but most statistical-file lakes were written by SAS/Stata/
SPSS themselves, or landed from elsewhere, and carry no manifest, so
they get no file skipping. ``index_zonemaps`` closes that: one
distributed Spark job reads every file in a directory through the
REAL reader chain and publishes the same manifest (file-level +
per-stripe column stats) the sink would have.

Soundness is *stronger* than the writer-side maps: stats accumulate
over the reader's OUTPUT batches, which is by definition the output
domain the r12 fix-point rules exist to approximate from the input
side — a value the format would have rewritten has already been
rewritten. String stats therefore need no normalization poisoning
here; the accumulator's numeric/date poisoning rules are kept anyway
(defense in depth, and sentinel-range values in reader output would
mean a reader bug). Domain-CHANGING scan options still degrade
safely at query time exactly as with writer-published maps: a
string-typed filter against numeric stats (value_labels_as_strings),
or a numeric filter against string stats (compress string→numeric),
coerces to None and simply never refutes; ``missing_string_as_null``
only turns ''→null, and nulls never match a range predicate, while
IsNull/IsNotNull refutation through string stats is already blocked.

Cost: one full read of the directory (the job you were going to run
anyway, roughly). Partitioning: files fan out to tasks; each file is
read IN PARTITION ORDER inside one task so stripe i covers output
rows [i*R, (i+1)*R) — the same geometry the scan's row-range
partitions address.
"""

from __future__ import annotations

import json
import os


def _kinds_for(schema) -> list[tuple[str, str]]:
    """Spark schema → (name, kind) pairs for ZoneMapStats: the
    reader-output domain mapping. Timestamps/time stay out (the scan
    never refutes them); everything else is num/str/date."""
    out = []
    for f in schema.fields:
        t = f.dataType.simpleString()
        if t == "string":
            out.append((f.name, "str"))
        elif t == "date":
            out.append((f.name, "date"))
        elif t.startswith("timestamp"):
            out.append((f.name, "datetime"))  # excluded by the acc
        elif f.metadata.get("time") == "ns_since_midnight":
            out.append((f.name, "time"))  # excluded by the acc
        else:
            out.append((f.name, "num"))
    return out


def index_one_file(
    path: str, stripe_rows: int = 65536, bloom_columns=()
) -> dict:
    """Read one file through the real reader chain and return a
    manifest fragment {"n", "stats", "stripes"} (stats in the
    ZoneMapStats list form). Runs executor-side."""
    from polars_readstat_spark.sources.datasource import ReadstatDataSource
    from polars_readstat_spark.writers.spark_sink import ZoneMapStats

    ds = ReadstatDataSource({"path": path})
    schema = ds._schema_uncompressed()
    reader = ds._reader_uncompressed(schema)
    pairs = _kinds_for(schema)
    # fmt="" on purpose: reader output is already the output domain —
    # no format-epoch numerics ever reach the accumulator
    acc = ZoneMapStats(
        [n for n, _ in pairs],
        [k for _, k in pairs],
        "",
        stripe_rows=stripe_rows,
        bloom_cols=tuple(bloom_columns),
    )
    n = 0
    for part in reader.partitions():
        for batch in reader.read(part):
            acc.add(batch)
            n += batch.num_rows
    return {
        "n": n,
        "stats": acc.stats,
        "stripes": acc.stripes_payload(),
        "blooms": acc.bloom_payload(),
    }


def index_zonemaps(
    spark,
    dir_path: str,
    stripe_rows: int = 65536,
    refresh: bool = False,
    bloom_columns=(),
) -> dict:
    """Build/refresh ``_prs_stats.json`` for a directory of
    statistical files by READING them (distributed; one task per
    file, files fanned across the cluster).

    ``refresh=False`` (default) indexes only files the existing
    manifest doesn't cover with CURRENT size+mtime — re-running after
    new files land indexes just the new ones. ``refresh=True``
    re-reads everything. Returns {path: row_count} for the files
    indexed this call."""
    from polars_readstat_spark import _ship_package
    from polars_readstat_spark.sources import fs as _fs
    from polars_readstat_spark.sources.datasource import is_data_file
    from polars_readstat_spark.writers.spark_sink import (
        publish_stats_manifest,
    )

    # the tasks import this package executor-side — ship it like
    # register() does, so a cluster session needn't have registered
    # the data source first
    _ship_package(spark)
    if any(ch in dir_path for ch in "*?["):
        # nested/partitioned lake: a glob like lake/2024-*/ *.dta —
        # manifests are per-directory, so files group by dirname and
        # each directory publishes its own _prs_stats.json (the scan
        # side already merges per-directory manifests)
        files = sorted(f for f in _fs.fs_glob(dir_path) if is_data_file(f))
    else:
        files = sorted(
            f for f in _fs.fs_listdir(dir_path) if is_data_file(f)
        )
    if not files:
        return {}
    todo = files
    if not refresh:
        have_by_dir: dict[str, dict] = {}

        def have_for(d: str) -> dict:
            h = have_by_dir.get(d)
            if h is None:
                try:
                    with _fs.fs_open(
                        _fs.fs_join(d, "_prs_stats.json")
                    ) as f:
                        h = json.loads(f.read()).get("files", {})
                except Exception:  # noqa: BLE001 — absent/corrupt
                    h = {}
                have_by_dir[d] = h
            return h

        def covered(p: str) -> bool:
            e = have_for(os.path.dirname(p)).get(os.path.basename(p))
            if not isinstance(e, dict):
                return False
            try:
                size, mtime_ns = _fs.fs_stat(p)
            except OSError:
                return False
            return size == e.get("size") and (
                e.get("mtime_ns") is None or mtime_ns == e.get("mtime_ns")
            )

        todo = [p for p in files if not covered(p)]
    if not todo:
        return {}

    import pandas as pd

    bloom_cols = tuple(bloom_columns)

    def task(batches):
        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                try:
                    frag = index_one_file(path, stripe_rows, bloom_cols)
                except Exception as e:  # noqa: BLE001 — skip, report
                    rows.append((path, -1, json.dumps({"err": str(e)[:200]})))
                    continue
                rows.append((path, frag["n"], json.dumps(frag)))
            yield pd.DataFrame(
                rows, columns=["path", "n_rows", "frag"]
            )

    par = max(1, min(len(todo), spark.sparkContext.defaultParallelism))
    res = (
        spark.createDataFrame([(p,) for p in todo], "path string")
        .repartition(par)
        .mapInPandas(task, "path string, n_rows long, frag string")
        .collect()
    )
    parts_by_dir: dict[str, list] = {}
    indexed = {}
    for r in res:
        if r.n_rows < 0:
            continue
        frag = json.loads(r.frag)
        parts_by_dir.setdefault(os.path.dirname(r.path), []).append(
            (
                r.path,
                frag["n"],
                frag["stats"],
                frag.get("stripes"),
                frag.get("blooms"),
            )
        )
        indexed[r.path] = frag["n"]
    for d, parts in parts_by_dir.items():
        publish_stats_manifest(d, parts, merge=True)
    return indexed


def vacuum_manifest(dir_path: str) -> dict:
    """Drop inert ``_prs_stats.json`` entries: files that no longer
    exist, or whose size/mtime drifted from the recorded values.

    Long-lived lakes accumulate dead weight — ``merge=True`` publishes
    keep superseded entries forever after compactions, deletes, and
    re-exports. Inert entries are CORRECT (the reader's freshness
    check already refuses to prune against them) but they cost
    manifest bytes and planning-time parses, and with per-column
    blooms a dead entry can carry tens of KB. One LIST + one stat per
    recorded file; rewrites the manifest only when something was
    dropped. Returns {"kept": k, "dropped": d}."""
    from polars_readstat_spark.sources import fs as _fs

    mpath = _fs.fs_join(dir_path, "_prs_stats.json")
    try:
        with _fs.fs_open(mpath) as f:
            doc = json.loads(f.read())
    except Exception:  # noqa: BLE001 — absent/corrupt: nothing to do
        return {"kept": 0, "dropped": 0}
    files = doc.get("files", {})
    kept = {}
    for base, e in files.items():
        try:
            size, mtime_ns = _fs.fs_stat(_fs.fs_join(dir_path, base))
        except OSError:
            continue  # file gone
        if size != e.get("size"):
            continue
        if e.get("mtime_ns") is not None and mtime_ns != e.get("mtime_ns"):
            continue
        kept[base] = e
    dropped = len(files) - len(kept)
    if dropped:
        doc["files"] = kept
        with _fs.fs_open_output(mpath) as f:
            f.write(json.dumps(doc).encode())
    return {"kept": len(kept), "dropped": dropped}
