"""Capture .explain("formatted") for registry queries + anti-pattern scan.

Usage: python tools/capture_plans.py <out_dir> <suffix> [sf_dir] [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (all of them when none are
named) and prints a one-line-per-query anti-pattern summary to stdout:
Exchange count, join strategies, Python-boundary nodes, cartesian
products. Used to produce plans/r13/*_before.txt / *_after.txt and to
triage which operators need plan work (guide §1.1/§7.2).
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)

    from polars_readstat_spark.queries import all_queries
    from polars_readstat_spark.session import get_spark

    import polars_readstat_spark as prs

    spark = get_spark("capture_plans")
    prs.register(spark)
    qs = all_queries()
    if names:
        qs = {n: qs[n] for n in names}

    from polars_readstat_spark.queries._cache import release_all

    rows = []
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            rows.append((name, f"ERROR {e!r:.120}"))
            release_all()
            continue
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = "+".join(
            sorted(
                {
                    j
                    for j in (
                        "BroadcastHashJoin",
                        "SortMergeJoin",
                        "ShuffledHashJoin",
                        "BroadcastNestedLoopJoin",
                        "CartesianProduct",
                    )
                    if j in plan
                }
            )
        )
        py = "+".join(
            sorted(
                {
                    p
                    for p in (
                        "BatchEvalPython",
                        "ArrowEvalPython",
                        "MapInArrow",
                        "MapInPandas",
                        "FlatMapGroupsInPandas",
                    )
                    if p in plan
                }
            )
        )
        rows.append((name, f"ex={n_ex} join={joins or '-'} py={py or '-'}"))
        release_all()
    for name, summary in rows:
        print(f"{name}: {summary}")
    spark.stop()


if __name__ == "__main__":
    main()
