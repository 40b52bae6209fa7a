"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query executes to completion through the noop sink (full plan, no
driver-side collect), mirroring how a cluster job would be driven.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    from polars_readstat_spark.queries import all_queries
    from polars_readstat_spark.session import get_spark

    spark = get_spark("bench")
    # warm the JVM + parquet footers so per-query numbers measure the
    # queries, not session startup
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name, fn in all_queries().items():
        t0 = time.perf_counter()
        try:
            run_query(fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"# bench error {name}: {e!r}", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 3)
    print(
        json.dumps(
            {
                "metric": "total_query_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
