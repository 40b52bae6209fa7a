"""Loaders for the driver-provided parquet test tables (TESTDATA.md).

All tables load with the plain JVM parquet scan (columnar, predicate /
projection pushdown intact). The one wrinkle is ``events``: the file
stores TIMESTAMP(NANOS) which Spark's vectorized reader rejects, so we
read it with ``spark.sql.legacy.parquet.nanosAsLong=true`` and convert
ns→µs in-plan (stays inside WholeStageCodegen; no Python involved).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # ts arrives as long ns-since-epoch under the legacy conf.
        if dict(df.dtypes).get("ts") == "bigint":
            # integer division: ns values (~1.7e18) overflow double precision
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
