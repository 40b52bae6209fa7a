"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count,
column names, and order-insensitive values (exact on ints/strings,
bitwise on doubles — our queries are engineered for exact float
parity, see queries/registry.py).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py [sf_dir] --changed-since <sha>

--changed-since maps the files changed since <sha> to the affected
registry queries (a query is affected when its module, or any
package-internal module in its module's static import closure,
changed; changes under sources/ or writers/ additionally map to every
query whose module drives the readstat data source) and checks just
those — the cheap in-round verification loop without losing coverage.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows, cols):
    """Sort columns by name, rows by repr — order-insensitive compare."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return v
        return v

    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    out.sort(key=repr)
    return [c for c in sorted(cols)], out


def compare(name, sdf, sql, con, report):
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    ok = True
    msgs = []
    if sorted(scols) != sorted(dcols):
        ok = False
        msgs.append(f"cols: spark={sorted(scols)} duck={sorted(dcols)}")
    if len(srows) != len(drows):
        ok = False
        msgs.append(f"rows: spark={len(srows)} duck={len(drows)}")
    if ok and not srows:
        # 0 rows on BOTH sides matches any empty oracle — the query
        # body was never value-checked (the r04 q22 lesson). Flag it
        # loudly as untested rather than letting it count as a pass.
        report[name] = (False, ["0 rows on both engines"])
        print(f"UNTESTED {name}: 0 rows on both engines")
        return
    if ok:
        _, ns = normalize(srows, scols)
        _, nd = normalize(drows, dcols)
        n_bad = 0
        for i, (a, b) in enumerate(zip(ns, nd)):
            if a != b:
                n_bad += 1
                if n_bad <= 3:
                    msgs.append(f"row {i}: spark={a} duck={b}")
        if n_bad:
            ok = False
            msgs.append(f"{n_bad}/{len(ns)} mismatched rows")
    report[name] = (ok, msgs)
    print(("PASS " if ok else "FAIL ") + name + ("" if ok else ": " + " | ".join(msgs)))


_PKG = "polars_readstat_spark"


def _module_imports(mod_name: str) -> set[str]:
    """Package-internal modules statically imported by `mod_name`
    (regex over source — good enough for this package's plain
    import style)."""
    import importlib
    import inspect
    import re

    try:
        src = inspect.getsource(importlib.import_module(mod_name))
    except Exception:  # noqa: BLE001
        return set()
    out = set()
    # handles `from X import a, b`, parenthesized multi-line imports,
    # and plain `import X`
    for m in re.finditer(
        rf"from\s+({_PKG}(?:\.\w+)*)\s+import\s+(\(([^)]*)\)|[\w, ]+)"
        rf"|import\s+({_PKG}(?:\.\w+)*)",
        src,
        re.DOTALL,
    ):
        if m.group(4):
            out.add(m.group(4))
            continue
        base = m.group(1)
        out.add(base)
        names = m.group(3) if m.group(3) is not None else m.group(2)
        for leaf in names.split(","):
            leaf = leaf.strip().split(" ")[0]
            if leaf:
                out.add(f"{base}.{leaf}")
    return out


def _import_closure(mod_name: str, cache: dict) -> set[str]:
    if mod_name in cache:
        return cache[mod_name]
    cache[mod_name] = set()  # break cycles
    seen = {mod_name}
    for dep in _module_imports(mod_name):
        seen.add(dep)
        # queries.registry is a LEAF (ADVICE r09): every query module
        # imports it for the @query decorator, and its _ensure_loaded
        # statically imports every query module back — recursing
        # through it would union all ~160 queries into every closure,
        # so one query-file edit marked the whole registry affected.
        # The registry's imports are load-side plumbing, not semantic
        # dependencies; a change to registry.py ITSELF still flags
        # everything because the leaf module stays in every closure.
        if dep == f"{_PKG}.queries.registry":
            continue
        if dep.startswith(_PKG):
            seen |= _import_closure(dep, cache)
    cache[mod_name] = seen
    return seen


def queries_changed_since(sha: str) -> set[str]:
    """Registry queries affected by files changed since `sha`."""
    import importlib
    import inspect
    import subprocess

    changed = subprocess.check_output(
        ["git", "diff", "--name-only", sha, "--", "*.py"], cwd=REPO
    ).decode().splitlines()
    changed_mods = {
        p[:-3].replace("/", ".")
        for p in changed
        if p.endswith(".py") and p.startswith(f"{_PKG}/")
    }
    if not changed_mods:
        return set()
    # a datasource/writer change can surface through ANY query that
    # scans via spark.read.format("readstat") — static imports can't
    # see that dynamic dispatch, so detect consumers textually
    ds_changed = any(
        m.startswith((f"{_PKG}.sources", f"{_PKG}.writers"))
        or m == f"{_PKG}.__init__"
        or m == _PKG
        for m in changed_mods
    )
    import __spark_entry__ as entrymod

    entrymod.queries()  # force registry load
    from polars_readstat_spark.queries.registry import QUERIES

    cache: dict = {}
    affected = set()
    for name, fn in QUERIES.items():
        mod = fn.__module__
        closure = _import_closure(mod, cache)
        if closure & changed_mods:
            affected.add(name)
            continue
        if ds_changed:
            try:
                src = inspect.getsource(importlib.import_module(mod))
            except Exception:  # noqa: BLE001
                src = ""
            # actual datasource consumption, not the bare substring —
            # every module's `queries.registry` import contains
            # "readstat", which would degenerate this rule to
            # run-everything
            if (
                'format("readstat")' in src
                or "prs.register" in src
                or "ensure_readstat_file" in src
                or "write_readstat" in src
            ):
                affected.add(name)
    return affected


def main():
    # flags first: a flag placed before the sf_dir positional must
    # not be consumed AS sf_dir (review r10: `--list-only` leading
    # argv became the data dir and launched the full Spark run)
    argv = [a for a in sys.argv[1:] if a != "--list-only"]
    list_only = "--list-only" in sys.argv[1:]
    # sf_dir is optional even with --changed-since
    if argv[:1] == ["--changed-since"]:
        sf_dir = "/root/testdata/sf0.01"
        args = argv
    else:
        sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
        args = argv[1:]
    if args[:1] == ["--changed-since"]:
        if len(args) < 2:
            print(
                "usage: check_oracle.py [sf_dir] --changed-since <sha>"
                " [--list-only]"
            )
            sys.exit(2)
        sys.path.insert(0, REPO)
        only = queries_changed_since(args[1])
        if not only:
            print("no package .py files changed; nothing to check")
            sys.exit(0)
        print(f"# {len(only)} queries affected: {' '.join(sorted(only))}")
        if list_only:  # print the affected set and stop (no Spark)
            sys.exit(0)
    else:
        only = set(args)
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod
    from polars_readstat_spark.session import get_spark

    spark = get_spark("oracle-check", cpus=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb_con(sf_dir)
    report = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            print(f"ROWS {name}: {n} (no oracle)")
            continue
        try:
            compare(name, fn(spark, sf_dir), oracles[name], con, report)
        except Exception as e:  # noqa: BLE001
            report[name] = (False, [repr(e)])
            print(f"ERROR {name}: {e!r}")
    n_fail = sum(1 for ok, _ in report.values() if not ok)
    print(f"\n{len(report) - n_fail}/{len(report)} oracle-checked queries pass")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
