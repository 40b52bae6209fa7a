"""SparkSession factory tuned for this engine.

Local-mode settings follow the scale design notes in SURVEY.md §7:
shuffle partitions ~ cores (not the 200 default), AQE on (runtime
coalescing + skew-join handling — the local stand-in for what a
1000-executor cluster needs), Arrow enabled for the Pandas-UDF paths,
UTC session timezone so results compare bit-for-bit against the DuckDB
oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app: str = "polars_readstat_spark", cpus: int | None = None) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    # must be in THIS process's env before the JVM launches: python
    # workers inherit it, so numpy in every worker skips the
    # MADV_HUGEPAGE direct-compaction stalls (see _alloc.py) even if
    # the worker imports numpy before our package. PRS_KEEP_HUGEPAGE=1
    # (the _alloc.py escape hatch) must apply to executors too, not
    # just the driver.
    keep_hugepage = os.environ.get("PRS_KEEP_HUGEPAGE") == "1"
    if not keep_hugepage:
        os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config(
            "spark.executorEnv.NUMPY_MADVISE_HUGEPAGE",
            "1" if keep_hugepage else "0",
        )
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized
        # reader otherwise rejects; read as long and convert in-plan.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # NOTE: spark.sql.python.filterPushdown.enabled is deliberately
        # NOT set here. Spark 4.1 caches the pushed-reader plan on the
        # shared relation and reuses it for FILTERLESS queries on the
        # same DataFrame (df.filter(x).count() then df.count() returns
        # the filtered count — verified, see SCALE.md r11). The default
        # is VERSION-GATED in register() (filters.plan_reuse_hazard):
        # on a Spark with the cache fixed, leaving the conf unset
        # auto-enables pushdown + zone-map skipping; on 4.1.x and
        # earlier it stays opt-in (conf + prs.register(spark) again —
        # see README "Filter pushdown & zone-map file skipping");
        # fresh-relation patterns (one load per query) are unaffected.
        # keep metastore/warehouse artifacts out of the repo cwd
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
        .config(
            "spark.driver.extraJavaOptions",
            "-Dderby.system.home=/tmp/spark_graft_derby",
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_existing(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable configs to a session we didn't build
    (the driver hands us one in ``__spark_entry__.entry``)."""
    for k, v in [
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        # runtime-settable: a handed-in session otherwise keeps the
        # 200-partition default, which at sf0.01 means 200 tiny tasks
        # per shuffle in the driver's correctness sweep
        ("spark.sql.shuffle.partitions", str(DEFAULT_CPUS)),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark
