"""Scan-pruning observability: what did the zone maps actually do?

``prs.explain_scan(spark, path, where=..., **options)`` plans the
scan twice — once ignoring the filter, once for real — and reports,
per file and in total, how many partitions and rows the manifest
refuted or trimmed. Driver-side only (two ``partitions()`` calls, no
Spark job, no data read): the exact plan the executors would run,
auditable before paying for it. A lake whose selective query reports
``pruned_rows == planned_rows`` is missing its manifest — run
``prs.index_zonemaps`` — or filtering on a column with no stats."""

from __future__ import annotations

import os


def _unit_info(paths, p):
    """Yield (path, rows_or_None) for every unit inside partition p.
    ``paths`` is the plan's resolved file list (a raw single-file
    partition maps to paths[0] — the chain may expose no MultiFile
    layer at all when neither pushdown nor where attached stats)."""
    from polars_readstat_spark.sources.datasource import (
        MultiPart,
        MultiPartGroup,
    )
    from polars_readstat_spark.sources.filters import _part_row_span

    units = p.units if isinstance(p, MultiPartGroup) else [p]
    for u in units:
        if isinstance(u, MultiPart):
            path, inner = paths[u.file_idx], u.inner
        else:
            path, inner = paths[0], u
        span = _part_row_span(inner)
        yield path, (span[1] - span[0]) if span else None


def explain_scan(spark, path: str, **options) -> dict:
    """Plan-only pruning report for a readstat scan.

    Returns ``{"files": {basename: {"planned_partitions",
    "planned_rows", "pruned_partitions", "pruned_rows"}},
    "totals": {...}, "manifest": bool}`` — rows are None-safe sums
    over partitions whose row span is knowable (compressed-SAS page
    plans report partitions only). ``options`` are the reader's
    (where/columns/union_by_name/...)."""
    from polars_readstat_spark.sources.datasource import ReadstatDataSource

    opts = {k: str(v) for k, v in options.items() if v is not None}
    opts["path"] = path

    def plan(with_where: bool):
        o = dict(opts)
        if not with_where:
            o.pop("where", None)
        ds = ReadstatDataSource(o)
        reader = ds.reader(ds._schema_uncompressed())
        # the filter frontends prune in partitions(); the chain (when
        # one exists) exposes the stats it loaded for the manifest
        # flag — a filterless pushdown-off single-file plan has no
        # stats-bearing layer at all, hence the ds._paths fallback
        parts = list(reader.partitions())
        mf = reader
        while mf is not None and not hasattr(mf, "paths"):
            mf = getattr(mf, "inner", None)
        paths = list(mf.paths) if mf is not None else ds._paths()
        stats = getattr(mf, "file_stats", None) if mf is not None else None
        return paths, stats, parts

    paths0, stats0, full = plan(False)
    paths1, stats1, pruned = plan(True)
    manifest = bool(stats1 or stats0)

    def tally(paths, parts):
        out: dict[str, list] = {}
        for p in parts:
            if p is None:
                continue
            for fpath, rows in _unit_info(paths, p):
                e = out.setdefault(fpath, [0, 0])
                e[0] += 1
                if rows is not None:
                    e[1] += rows
        return out

    t_full = tally(paths0, full)
    t_pruned = tally(paths1, pruned)
    files = {}
    for fpath, (nparts, nrows) in sorted(t_full.items()):
        kept = t_pruned.get(fpath, [0, 0])
        files[os.path.basename(fpath)] = {
            "planned_partitions": nparts,
            "planned_rows": nrows,
            "pruned_partitions": kept[0],
            "pruned_rows": kept[1],
        }
    totals = {
        "planned_partitions": sum(v[0] for v in t_full.values()),
        "planned_rows": sum(v[1] for v in t_full.values()),
        "pruned_partitions": sum(v[0] for v in t_pruned.values()),
        "pruned_rows": sum(v[1] for v in t_pruned.values()),
    }
    return {"files": files, "totals": totals, "manifest": manifest}
