"""Write-then-scan roundtrip queries: the file readers under the
driver's DuckDB oracle.

Round-1 gap: the dta/sav/xpt/por scan paths — the heart of the engine —
were verified only by in-repo pytest differentials, never by the
driver's independent CORRECTNESS gate. These queries close that: each
deterministically materializes the sf lineitem table as a statistical
file (cached in /tmp, one write per sf), scans it back through
``spark.read.format("readstat")``, and projects a canonical column set;
the oracle is a plain SELECT over the same parquet lineitem — so a
value-hash match proves the writer+reader pair is lossless against an
engine that never touched either. This mirrors the reference's own
differential-oracle test spine (SURVEY.md §5;
reference tests/sas/compare_to_python.py:1-60).

Exactness notes (why the hash can be expected to match bit-for-bit):
- dta/sav store numerics as IEEE float64 — identity roundtrip.
- xpt stores IBM/370 hex floats: 56-bit mantissa, worst case 3 leading
  zero bits ⇒ ≥53 usable bits, so every IEEE double converts exactly.
- por base-30 text wobbles on non-dyadic fractions, so its query sticks
  to integral and string columns.
- timestamps are written as format-native datetimes (%tc ms / SPSS
  seconds / SAS DATETIME) and compared as DATE after roundtrip, under
  the UTC session tz both engines share.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from polars_readstat_spark.queries.registry import query

# the representative mixed frame (ints, doubles, strings, timestamp)
# shared with bench.py's format-read benchmarks — one cache, one layout
BENCH_COLS = (
    "l_orderkey",
    "l_partkey",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_returnflag",
    "l_shipdate",
    "l_linestatus",
)


# bump when a writer's on-disk layout or the roundtrip column set
# changes, so stale cached files can't poison the correctness gate
_CACHE_VERSION = 3


def _cache_dir(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"/tmp/spark_graft_scanio_v{_CACHE_VERSION}_{tag}"


def _source_frame(spark, sf_dir: str, ext: str = "dta"):
    df = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        *BENCH_COLS
    )
    if ext == "por":
        # POR is a legacy eager interchange format (single-partition by
        # nature, SCALE.md "known single-node bounds") — its roundtrip
        # verifies a deterministic 10% slice rather than paying a full
        # bulk export nobody would route through POR
        df = df.filter(F.col("l_orderkey") % 10 == 0)
    return df


def ensure_readstat_file(spark, sf_dir: str, ext: str) -> str:
    """Materialize lineitem as /tmp/..._{sf}/lineitem.{ext} once per sf.

    Atomic: written to a temp name (same extension so write_readstat's
    dispatch works) then os.replace'd, so a crashed writer never leaves
    a half-file that poisons later runs.
    """
    import polars_readstat_spark as prs

    d = _cache_dir(sf_dir)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"lineitem.{ext}")
    if os.path.exists(path):
        return path
    tmp = os.path.join(d, f".tmp{os.getpid()}.lineitem.{ext}")
    prs.write_readstat(_source_frame(spark, sf_dir, ext), tmp)
    os.replace(tmp, path)
    return path


def ensure_multifile_dir(spark, sf_dir: str, ext: str = "dta") -> str:
    """Two same-schema files (even/odd l_orderkey) in one directory —
    the multi-file union fan-out path."""
    import polars_readstat_spark as prs

    d = os.path.join(_cache_dir(sf_dir), f"multi_{ext}")
    done = os.path.join(d, ".done")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    src = _source_frame(spark, sf_dir)
    for parity in (0, 1):
        part = src.filter(F.col("l_orderkey") % 2 == parity)
        tmp = os.path.join(d, f".tmp{os.getpid()}.part{parity}.{ext}")
        prs.write_readstat(part, tmp)
        os.replace(tmp, os.path.join(d, f"part{parity}.{ext}"))
    with open(done, "w") as f:
        f.write("ok")
    return d


def _scan(spark, path: str):
    import polars_readstat_spark as prs

    prs.register(spark)
    return spark.read.format("readstat").load(path)


# canonical projection both sides emit: bigints for keys, raw doubles
# (identity roundtrip), strings, and shipdate as DATE
_CANON_ORACLE = """
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_partkey AS BIGINT) AS l_partkey,
           l_quantity, l_extendedprice, l_discount,
           l_returnflag, l_linestatus,
           CAST(l_shipdate AS DATE) AS l_shipdate
    FROM lineitem
"""


def _canon(df, names: dict[str, str] | None = None):
    """Project the scanned frame to the canonical shape. `names` maps
    canonical → on-file column name (for 8-char xpt/por truncation)."""
    n = names or {}

    def c(canonical):
        return F.col(n.get(canonical, canonical))

    return df.select(
        c("l_orderkey").cast("bigint").alias("l_orderkey"),
        c("l_partkey").cast("bigint").alias("l_partkey"),
        c("l_quantity").cast("double").alias("l_quantity"),
        c("l_extendedprice").cast("double").alias("l_extendedprice"),
        c("l_discount").cast("double").alias("l_discount"),
        c("l_returnflag").alias("l_returnflag"),
        c("l_linestatus").alias("l_linestatus"),
        c("l_shipdate").cast("date").alias("l_shipdate"),
    )


_XPT_NAMES = {
    "l_orderkey": "L_ORDERK",
    "l_partkey": "L_PARTKE",
    "l_quantity": "L_QUANTI",
    "l_extendedprice": "L_EXTEND",
    "l_discount": "L_DISCOU",
    "l_returnflag": "L_RETURN",
    "l_linestatus": "L_LINEST",
    "l_shipdate": "L_SHIPDA",
}


@query("scan_dta_roundtrip", oracle=_CANON_ORACLE)
def scan_dta_roundtrip(spark, sf_dir):
    """S9/W1 under the driver oracle: Stata v118 write → scan."""
    return _canon(_scan(spark, ensure_readstat_file(spark, sf_dir, "dta")))


@query("scan_sas7bdat_roundtrip", oracle=_CANON_ORACLE)
def scan_sas7bdat_roundtrip(spark, sf_dir):
    """S4 write→scan under the driver oracle: the new sas7bdat writer
    (writers/sas7bdat.py — a capability the reference lacks; its
    sas7bdat path is read-only) makes the format self-roundtrippable
    like dta/sav/xpt/por. Numerics are IEEE doubles on disk (identity
    roundtrip); shipdate goes out as SAS DATE days and comes back as
    date32."""
    return _canon(
        _scan(spark, ensure_readstat_file(spark, sf_dir, "sas7bdat"))
    )


@query(
    "scan_sas7bdat_rle_roundtrip",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_partkey AS BIGINT) AS l_partkey,
           l_quantity, l_extendedprice, l_discount,
           l_returnflag, l_linestatus,
           CAST(l_shipdate AS DATE) AS l_shipdate
    FROM lineitem WHERE l_orderkey % 10 = 0
    """,
)
def scan_sas7bdat_rle_roundtrip(spark, sf_dir):
    """S4-S5 compressed write→scan: SASYZCRL per-row compression out
    through writers/sas7bdat.py (compress='rle'), back in through the
    reader's page-parallel compressed scan — the RLE encoder is the
    exact inverse of pages.py:rle_decompress and is property-tested
    against it. Verifies a deterministic 10% slice (POR precedent):
    per-row Python RLE encode of the full sf0.1 table would dominate
    the bench's one-time file build without adding coverage."""
    import polars_readstat_spark as prs

    d = _cache_dir(sf_dir)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "lineitem_rle.sas7bdat")
    if not os.path.exists(path):
        src = _source_frame(spark, sf_dir).filter(F.col("l_orderkey") % 10 == 0)
        tmp = os.path.join(d, f".tmp{os.getpid()}.lineitem_rle.sas7bdat")
        prs.write_readstat(src, tmp, compress="rle")
        os.replace(tmp, path)
    return _canon(_scan(spark, path))


@query(
    "scan_sas7bdat_rdc_roundtrip",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_partkey AS BIGINT) AS l_partkey,
           l_quantity, l_extendedprice, l_discount,
           l_returnflag, l_linestatus,
           CAST(l_shipdate AS DATE) AS l_shipdate
    FROM lineitem WHERE l_orderkey % 10 = 5
    """,
)
def scan_sas7bdat_rdc_roundtrip(spark, sf_dir):
    """S4/S6 compressed write→scan, RDC codec: SASYZCR2 per-row
    compression out through writers/sas7bdat.py (compress='rdc' —
    literal+RLE command forms, property-tested as the exact inverse of
    pages.py:rdc_decompress and cross-checked against pandas'
    independent RDC decompressor), back in through the reader. Same
    deterministic slice rationale as the RLE twin (disjoint parity so
    the two queries can't mask each other)."""
    import polars_readstat_spark as prs

    d = _cache_dir(sf_dir)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "lineitem_rdc.sas7bdat")
    if not os.path.exists(path):
        src = _source_frame(spark, sf_dir).filter(F.col("l_orderkey") % 10 == 5)
        tmp = os.path.join(d, f".tmp{os.getpid()}.lineitem_rdc.sas7bdat")
        prs.write_readstat(src, tmp, compress="rdc")
        os.replace(tmp, path)
    return _canon(_scan(spark, path))


@query("scan_sink_dir_roundtrip", oracle=_CANON_ORACLE)
def scan_sink_dir_roundtrip(spark, sf_dir):
    """The Spark-native sink under the driver oracle:
    df.write.format("readstat") fans lineitem out as 4 sav part-files
    (writers/spark_sink.py staged-commit path), read back as one
    directory scan — write-side partition fan-out plus read-side
    multi-file union in a single check."""
    import polars_readstat_spark as prs

    prs.register(spark)
    d = os.path.join(_cache_dir(sf_dir), "sink_sav")
    done = os.path.join(d, ".done")
    if not os.path.exists(done):
        (
            _source_frame(spark, sf_dir)
            .repartition(4)
            .write.format("readstat")
            .option("format", "sav")
            .mode("overwrite")
            .save(d)
        )
        with open(done, "w") as f:
            f.write("ok")
    return _canon(_scan(spark, d))


@query("sink_remote_roundtrip", oracle=_CANON_ORACLE)
def sink_remote_roundtrip(spark, sf_dir):
    """The WRITE side of the filesystem seam under the driver oracle:
    the distributed sink saves lineitem as dta part-files to a
    ``simlat1://`` URI (executor tasks spool+upload staged names, the
    commit publishes with filesystem-level moves), then the same URI
    is scanned back through the seam. One hash-match proves the
    upload, publish, listing, and decode paths are all
    byte-transparent end to end."""
    import polars_readstat_spark as prs

    prs.register(spark)
    d = os.path.join(_cache_dir(sf_dir), "sink_remote_dta")
    done = os.path.join(d, ".done")
    if not os.path.exists(done):
        (
            _source_frame(spark, sf_dir)
            .repartition(3)
            .write.format("readstat")
            .option("format", "dta")
            .mode("overwrite")
            .save("simlat1://" + d)
        )
        with open(done, "w") as f:
            f.write("ok")
    return _canon(_scan(spark, "simlat1://" + d))


@query(
    "scan_zonemap_prune",
    oracle="""
    SELECT CONCAT(l_returnflag, l_linestatus) AS rk,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty
    FROM lineitem
    WHERE CONCAT(l_returnflag, l_linestatus) = 'AF'
    GROUP BY rk
    """,
)
def scan_zonemap_prune(spark, sf_dir):
    """Zone-map file skipping under the VALUE oracle: lineitem lands
    as 4 dta parts range-partitioned by a string key
    rk = returnflag||linestatus (the sink publishes string min/max per
    part — round-12 string zone maps), then an equality probe with
    pushdown opted in prunes the refuting parts at plan time and must
    still aggregate EXACTLY the oracle's rows — skipping may never
    drop data. The action runs inside the opt-in window on a fresh
    relation (the safe pattern under the Spark 4.1 pushed-plan reuse
    hazard, see session.py) and the result is materialized before the
    conf is restored, because pushdown participation is decided at
    action time, not load time."""
    import polars_readstat_spark as prs

    prs.register(spark)
    d = os.path.join(_cache_dir(sf_dir), "sink_zonemap_dta")
    done = os.path.join(d, ".done")
    if not os.path.exists(done):
        (
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .select(
                "l_orderkey",
                F.concat("l_returnflag", "l_linestatus").alias("rk"),
                "l_quantity",
            )
            .repartitionByRange(4, "rk")
            .write.format("readstat")
            .option("format", "dta")
            .mode("overwrite")
            .save(d)
        )
        with open(done, "w") as f:
            f.write("ok")
    prior = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    prs.register(spark)
    try:
        agg = (
            spark.read.format("readstat")
            .load(d)
            .filter(F.col("rk") == "AF")
            .groupBy("rk")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_qty"),
            )
        )
        rows = agg.collect()  # pruning happens HERE, inside the window
        schema = agg.schema
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set(
                "spark.sql.python.filterPushdown.enabled", prior
            )
        prs.register(spark)
    return spark.createDataFrame(rows, schema)


@query(
    "scan_where_option",
    oracle="""
    SELECT CONCAT(l_returnflag, l_linestatus) AS rk,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty
    FROM lineitem
    WHERE CONCAT(l_returnflag, l_linestatus) = 'AF'
      AND l_quantity > 0
    GROUP BY rk
    """,
)
def scan_where_option(spark, sf_dir):
    """The hazard-free explicit filter path (round 13): the same
    rk-partitioned fixture as scan_zonemap_prune, but filtered via
    ``.option("where", ...)`` with pushdown OFF — batch-side apply +
    zone-map file skipping driven entirely by the reader option, no
    Catalyst pushdown and therefore no Spark 4.1 plan-reuse exposure.
    Skipping may never drop data: the pruned aggregate must equal the
    oracle exactly."""
    import polars_readstat_spark as prs

    prs.register(spark)
    d = os.path.join(_cache_dir(sf_dir), "sink_zonemap_dta")
    done = os.path.join(d, ".done")
    if not os.path.exists(done):
        (
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .select(
                "l_orderkey",
                F.concat("l_returnflag", "l_linestatus").alias("rk"),
                "l_quantity",
            )
            .repartitionByRange(4, "rk")
            .write.format("readstat")
            .option("format", "dta")
            .mode("overwrite")
            .save(d)
        )
        with open(done, "w") as f:
            f.write("ok")
    return (
        spark.read.format("readstat")
        .option("where", "rk = 'AF' AND l_quantity > 0")
        .load(d)
        .groupBy("rk")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


@query(
    "scan_zonemap_stripe_prune",
    oracle="""
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty,
           CAST(MIN(l_orderkey) AS BIGINT) AS min_ok,
           CAST(MAX(l_orderkey) AS BIGINT) AS max_ok
    FROM lineitem
    WHERE l_orderkey > 20000 AND l_orderkey <= 26000
    """,
)
def scan_zonemap_stripe_prune(spark, sf_dir):
    """Per-stripe (intra-file) zone maps under the VALUE oracle
    (round 13, VERDICT r12 next#2): lineitem lands as ONE dta part
    sorted by l_orderkey with 4096-row stripe stats, then a mid-file
    range predicate — via the hazard-free `where` option — must TRIM
    the single file's row-range partitions to the stripes that can
    match and still aggregate EXACTLY the oracle's rows. Intra-file
    skipping may never drop data; the plan-time lever is pinned by
    tests/test_stripe_skipping.py and the bench floor pair
    (floor_zonemap_stripe_skip vs _fullscan)."""
    import polars_readstat_spark as prs

    prs.register(spark)
    d = os.path.join(_cache_dir(sf_dir), "sink_stripe_dta")
    done = os.path.join(d, ".done")
    if not os.path.exists(done):
        (
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .select("l_orderkey", "l_quantity")
            .coalesce(1)
            .sortWithinPartitions("l_orderkey")
            .write.format("readstat")
            .option("format", "dta")
            .option("zonemap_stripe_rows", "4096")
            .mode("overwrite")
            .save(d)
        )
        with open(done, "w") as f:
            f.write("ok")
    return (
        spark.read.format("readstat")
        .option("where", "l_orderkey > 20000 AND l_orderkey <= 26000")
        .load(d)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.min(F.col("l_orderkey").cast("bigint")).alias("min_ok"),
            F.max(F.col("l_orderkey").cast("bigint")).alias("max_ok"),
        )
    )


@query(
    "scan_zonemap_date_prune",
    oracle="""
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty,
           CAST(MIN(l_shipdate) AS DATE) AS min_d,
           CAST(MAX(l_shipdate) AS DATE) AS max_d
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-06-01'
      AND l_shipdate < DATE '1995-09-01'
    """,
)
def scan_zonemap_date_prune(spark, sf_dir):
    """DATE zone maps under the VALUE oracle (round 13): lineitem
    lands as 4 dta parts range-partitioned AND sorted by l_shipdate
    (the canonical date-partitioned-lake layout) with 4096-row stripe
    stats, then a ship-date window — via the where option's ANSI
    ``DATE 'yyyy-mm-dd'`` literals — must prune refuting files, trim
    kept files to the matching stripes, and still aggregate EXACTLY
    the oracle's rows. Date stats are epoch days tagged "t":"date";
    only datetime.date operands coerce (tests/test_date_zonemaps.py
    pins the soundness battery per format)."""
    import polars_readstat_spark as prs

    prs.register(spark)
    d = os.path.join(_cache_dir(sf_dir), "sink_datelake2_dta")
    done = os.path.join(d, ".done")
    if not os.path.exists(done):
        (
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .select(
                "l_orderkey",
                # the testdata parquet carries shipdate as
                # TimestampNTZ; the lake layout under test is a DATE
                # column (dta %td), which is also what publishes
                # date zone maps — a datetime column deliberately
                # does not (sub-second storage rounds)
                F.col("l_shipdate").cast("date").alias("l_shipdate"),
                "l_quantity",
            )
            .repartitionByRange(4, "l_shipdate")
            .sortWithinPartitions("l_shipdate")
            .write.format("readstat")
            .option("format", "dta")
            .option("zonemap_stripe_rows", "4096")
            .mode("overwrite")
            .save(d)
        )
        with open(done, "w") as f:
            f.write("ok")
    return (
        spark.read.format("readstat")
        .option(
            "where",
            "l_shipdate >= DATE '1995-06-01' AND "
            "l_shipdate < DATE '1995-09-01'",
        )
        .load(d)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.min("l_shipdate").cast("date").alias("min_d"),
            F.max("l_shipdate").cast("date").alias("max_d"),
        )
    )


@query(
    "scan_zonemap_index_prune",
    oracle="""
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty,
           CAST(MIN(l_orderkey) AS BIGINT) AS min_ok
    FROM lineitem
    WHERE l_orderkey > 45000
    """,
)
def scan_zonemap_index_prune(spark, sf_dir):
    """index_zonemaps under the VALUE oracle (round 13): lineitem
    lands as 4 range-partitioned dta parts and the sink's manifest is
    DELETED — the externally-landed-lake shape — then a distributed
    index_zonemaps read rebuilds _prs_stats.json from READER output,
    and a where-option scan must prune/trim against the rebuilt maps
    and still aggregate EXACTLY the oracle's rows."""
    import polars_readstat_spark as prs

    prs.register(spark)
    d = os.path.join(_cache_dir(sf_dir), "indexed_lake_dta")
    done = os.path.join(d, ".done")
    if not os.path.exists(done):
        (
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .select("l_orderkey", "l_quantity")
            .repartitionByRange(4, "l_orderkey")
            .sortWithinPartitions("l_orderkey")
            .write.format("readstat")
            .option("format", "dta")
            .mode("overwrite")
            .save(d)
        )
        os.unlink(os.path.join(d, "_prs_stats.json"))  # external lake
        prs.index_zonemaps(spark, d, stripe_rows=4096)
        with open(done, "w") as f:
            f.write("ok")
    return (
        spark.read.format("readstat")
        .option("where", "l_orderkey > 45000")
        .load(d)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.min(F.col("l_orderkey").cast("bigint")).alias("min_ok"),
        )
    )


@query(
    "scan_zonemap_bloom_prune",
    oracle="""
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem
    WHERE l_orderkey IN (1, 7, 32)
    """,
)
def scan_zonemap_bloom_prune(spark, sf_dir):
    """Per-file Bloom-filter skipping under the VALUE oracle
    (round 13, sources/bloom.py): lineitem lands hash-scattered by
    l_partkey, so every part's l_orderkey [min, max] spans the whole
    key domain and RANGE stats can never refute a point predicate —
    the unsorted-lookup-key shape. The sink publishes per-file blooms
    on l_orderkey (zonemap_bloom_columns, with the ndv cap raised via
    zonemap_bloom_max_bytes since each part holds >13k distinct
    orderkeys), and a where-option IN probe must skip the files whose
    blooms refute all three keys while aggregating EXACTLY the
    oracle's rows — membership pruning may never drop data. Plan-time
    lever pinned by tests/test_zonemap_bloom.py and the bench pair
    floor_zonemap_bloom_skip vs _fullscan."""
    import polars_readstat_spark as prs

    prs.register(spark)
    d = os.path.join(_cache_dir(sf_dir), "sink_bloom_dta")
    done = os.path.join(d, ".done")
    if not os.path.exists(done):
        (
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .select("l_orderkey", "l_partkey", "l_quantity")
            .repartitionByRange(6, "l_partkey")
            .write.format("readstat")
            .option("format", "dta")
            .option("zonemap_bloom_columns", "l_orderkey")
            .option("zonemap_bloom_max_bytes", "131072")
            .mode("overwrite")
            .save(d)
        )
        with open(done, "w") as f:
            f.write("ok")
    return (
        spark.read.format("readstat")
        .option("where", "l_orderkey IN (1, 7, 32)")
        .load(d)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.countDistinct(F.col("l_orderkey").cast("bigint")).alias(
                "n_orders"
            ),
        )
    )


@query(
    "scan_hive_layout_prune",
    oracle="""
    SELECT CONCAT(l_returnflag, l_linestatus) AS rk,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty
    FROM lineitem
    WHERE CONCAT(l_returnflag, l_linestatus) <> 'AF'
    GROUP BY rk ORDER BY rk
    """,
)
def scan_hive_layout_prune(spark, sf_dir):
    """Hive-style layout under the VALUE oracle (round 13,
    writers/hive.py): lineitem lands as rk=<value>/ subdirectories in
    one pass (keys kept IN the data), a glob scan merges the
    per-subdir manifests, and a `rk <> 'AF'` probe — the
    negated-constant shape only key-partitioned layouts can prune —
    must skip the rk=AF subdirectory entirely while aggregating
    EXACTLY the oracle's rows."""
    import polars_readstat_spark as prs

    prs.register(spark)
    d = os.path.join(_cache_dir(sf_dir), "hive_rk_dta")
    done = os.path.join(d, ".done")
    if not os.path.exists(done):
        prs.write_readstat_hive(
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .select(
                F.concat("l_returnflag", "l_linestatus").alias("rk"),
                "l_quantity",
            ),
            d,
            ext="dta",
            partition_by=["rk"],
        )
        with open(done, "w") as f:
            f.write("ok")
    return (
        spark.read.format("readstat")
        .option("where", "rk <> 'AF'")
        .load(os.path.join(d, "rk=*", "*.dta"))
        .groupBy("rk")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("rk")
    )


@query("scan_sav_roundtrip", oracle=_CANON_ORACLE)
def scan_sav_roundtrip(spark, sf_dir):
    """S10/W3: SPSS SAV write → scan (uncompressed records)."""
    return _canon(_scan(spark, ensure_readstat_file(spark, sf_dir, "sav")))


@query("scan_sav_compressed_roundtrip", oracle=_CANON_ORACLE)
def scan_sav_compressed_roundtrip(spark, sf_dir):
    """W3 bytecode-compression path (new r06): write_sav(compress=True)
    emits SPSS's compression=1 stream (bias commands for integral
    values, 255 sysmis, 254 all-spaces, 253 literals — what real SPSS
    writes by default); the scan decodes it in PARALLEL row-range
    partitions via the plan-time checkpoint index (rows_per_partition
    forces multi-partition even at oracle scale). Puts the encoder,
    the bias decode path, AND the checkpoint restart machinery under
    the DuckDB oracle."""
    import polars_readstat_spark as prs

    prs.register(spark)
    from polars_readstat_spark.writers.sav import write_sav

    d = _cache_dir(sf_dir)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "lineitem_bc.sav")
    if not os.path.exists(path):
        tmp = os.path.join(d, f".tmp{os.getpid()}.lineitem_bc.sav")
        write_sav(_source_frame(spark, sf_dir, "sav"), tmp, compress=True)
        os.replace(tmp, path)
    df = (
        spark.read.format("readstat")
        .option("rows_per_partition", "8192")
        .load(path)
    )
    return _canon(df)


@query("scan_zsav_roundtrip", oracle=_CANON_ORACLE)
def scan_zsav_roundtrip(spark, sf_dir):
    """S10 compressed path: ZSAV (zlib-wrapped bytecode) write → scan —
    puts the streaming decompress decode under the oracle."""
    return _canon(_scan(spark, ensure_readstat_file(spark, sf_dir, "zsav")))


@query("scan_xpt_roundtrip", oracle=_CANON_ORACLE)
def scan_xpt_roundtrip(spark, sf_dir):
    """S7/W4: XPT v5 write → scan. IBM float conversion is exact for
    every IEEE double (see module docstring); v5 truncates names to
    8 upper-case chars, aliased back to canonical here."""
    return _canon(
        _scan(spark, ensure_readstat_file(spark, sf_dir, "xpt")),
        names=_XPT_NAMES,
    )


@query(
    "scan_por_roundtrip",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_partkey AS BIGINT) AS l_partkey,
           CAST(l_quantity AS BIGINT) AS l_quantity,
           l_returnflag, l_linestatus
    FROM lineitem WHERE l_orderkey % 10 = 0
    """,
)
def scan_por_roundtrip(spark, sf_dir):
    """S11/W5: SPSS portable write → scan of a deterministic 10% slice
    (POR is the legacy eager format — see _source_frame). POR's
    base-30 text wobbles on non-dyadic fractions, so only integral +
    string columns are compared (cast through BIGINT on both sides)."""
    df = _scan(spark, ensure_readstat_file(spark, sf_dir, "por"))
    return df.select(
        F.col("L_ORDERK").cast("bigint").alias("l_orderkey"),
        F.col("L_PARTKE").cast("bigint").alias("l_partkey"),
        F.col("L_QUANTI").cast("bigint").alias("l_quantity"),
        F.col("L_RETURN").alias("l_returnflag"),
        F.col("L_LINEST").alias("l_linestatus"),
    )


@query("scan_dta_multifile", oracle=_CANON_ORACLE)
def scan_dta_multifile(spark, sf_dir):
    """Multi-file union fan-out under the oracle: two dta files (even /
    odd l_orderkey) read as one directory scan — the partition-per-file
    shape a 100 TB lake read takes."""
    return _canon(_scan(spark, ensure_multifile_dir(spark, sf_dir, "dta")))


@query("scan_fs_seam_roundtrip", oracle=_CANON_ORACLE)
def scan_fs_seam_roundtrip(spark, sf_dir):
    """The filesystem seam (sources/fs.py) under the driver oracle: the
    SAME multi-file directory as scan_dta_multifile, loaded through a
    non-POSIX ``simlat1://`` URI — directory listing, header parse,
    partition planning, and every worker-side range read resolve
    through the scheme handler (1 ms deterministic latency per range
    request, the object-store cost model), composed with depth-2
    readahead exactly as a real remote scan would run. A value-hash
    match against the plain-path oracle proves the seam is
    byte-transparent end to end. Closes VERDICT r10 missing#2's gate:
    an oracle-anchored scan through a filesystem registered as a
    scheme."""
    import polars_readstat_spark as prs

    prs.register(spark)
    d = ensure_multifile_dir(spark, sf_dir, "dta")
    df = (
        spark.read.format("readstat")
        .option("io_readahead", "2")
        .load("simlat1://" + d)
    )
    return _canon(df)


@query("scan_dta_multifile_readahead", oracle=_CANON_ORACLE)
def scan_dta_multifile_readahead(spark, sf_dir):
    """A4 under the oracle: the SAME directory scan as
    scan_dta_multifile but with io_readahead=2 — each partition's raw
    range fetches run one producer thread ahead of decode (the
    high-latency-store pipeline, reference scan_prefetch.rs:35-52).
    A value-hash match against the plain oracle proves the pipelined
    path is batch-for-batch identical to the inline one."""
    import polars_readstat_spark as prs

    prs.register(spark)
    df = (
        spark.read.format("readstat")
        .option("io_readahead", "2")
        .load(ensure_multifile_dir(spark, sf_dir, "dta"))
    )
    return _canon(df)


@query(
    "scan_dta_pushdown",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey, l_quantity
    FROM lineitem WHERE l_quantity >= 18
    """,
)
def scan_dta_pushdown(spark, sf_dir):
    """Projection + predicate pushdown through the Python data source
    on a real dta scan: only 2 of 8 columns decode, and the filter
    drops rows inside the worker before the JVM transfer."""
    df = _scan(spark, ensure_readstat_file(spark, sf_dir, "dta"))
    return (
        df.filter(F.col("l_quantity") >= 18)
        .select(
            F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
            F.col("l_quantity").cast("double").alias("l_quantity"),
        )
    )


_META_ORACLE = """
    SELECT 'l_orderkey' AS name,
           CASE WHEN MIN(l_orderkey) >= -2147483647
                 AND MAX(l_orderkey) <= 2147483620
                THEN '%12.0g' ELSE '%10.0g' END AS fmt,
           CAST(NULL AS INTEGER) AS str_width
    FROM lineitem
    UNION ALL
    SELECT 'l_partkey',
           CASE WHEN MIN(l_partkey) >= -2147483647
                 AND MAX(l_partkey) <= 2147483620
                THEN '%12.0g' ELSE '%10.0g' END,
           CAST(NULL AS INTEGER)
    FROM lineitem
    UNION ALL SELECT 'l_quantity', '%10.0g', CAST(NULL AS INTEGER)
    UNION ALL SELECT 'l_extendedprice', '%10.0g', CAST(NULL AS INTEGER)
    UNION ALL SELECT 'l_discount', '%10.0g', CAST(NULL AS INTEGER)
    UNION ALL
    SELECT 'l_returnflag',
           '%' || CAST(GREATEST(MAX(STRLEN(l_returnflag)), 9) AS VARCHAR) || 's',
           CAST(MAX(STRLEN(l_returnflag)) AS INTEGER)
    FROM lineitem
    UNION ALL SELECT 'l_shipdate', '%tc', CAST(NULL AS INTEGER)
    UNION ALL
    SELECT 'l_linestatus',
           '%' || CAST(GREATEST(MAX(STRLEN(l_linestatus)), 9) AS VARCHAR) || 's',
           CAST(MAX(STRLEN(l_linestatus)) AS INTEGER)
    FROM lineitem
"""


@query("scan_dta_metadata_surface", oracle=_META_ORACLE)
def scan_dta_metadata_surface(spark, sf_dir):
    """S14 under the driver oracle: the 12-column metadata surface of
    the written dta file must equal the writer's pre-pass column plan
    re-derived independently in SQL — display formats encode the
    bigint range downcast decision (%12.0g long vs %10.0g double) and
    string widths come from max byte length, so a drift in either
    the writer plan, the dta metadata encoding, or the reader's
    metadata parse breaks the hash."""
    from polars_readstat_spark.operators.metadata import metadata_df

    path = ensure_readstat_file(spark, sf_dir, "dta")
    mdf = metadata_df(spark, path)
    return mdf.select(
        F.col("name"),
        F.col("format").alias("fmt"),
        F.col("string_width_bytes").cast("int").alias("str_width"),
    )


def ensure_labeled_file(spark, sf_dir: str) -> str:
    """lineitem slice written as dta WITH a value-label set (partial:
    codes 1-4 labeled, 5-7 unlabeled) and nulls punched into
    l_quantity on a deterministic rule — the fixture for scanning
    label decode and missing sentinels back out of a real file."""
    import polars_readstat_spark as prs

    d = _cache_dir(sf_dir)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "lineitem_labeled.dta")
    if os.path.exists(path):
        return path
    src = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.when(F.col("l_orderkey") % 7 != 0, F.col("l_quantity")).alias(
                "l_quantity"
            ),
        )
    )
    tmp = os.path.join(d, f".tmp{os.getpid()}.lineitem_labeled.dta")
    prs.write_readstat(
        src,
        tmp,
        value_labels={
            "l_linenumber": {1: "first", 2: "second", 3: "third", 4: "fourth"}
        },
    )
    os.replace(tmp, path)
    return path


@query(
    "scan_dta_value_labels",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CASE l_linenumber
                WHEN 1 THEN 'first' WHEN 2 THEN 'second'
                WHEN 3 THEN 'third' WHEN 4 THEN 'fourth'
                ELSE CAST(l_linenumber AS VARCHAR) END AS line_label
    FROM lineitem
    """,
)
def scan_dta_value_labels(spark, sf_dir):
    """T1/T6 through a real file: value labels written into the dta's
    <value_labels> section decode back as strings on scan
    (value_labels_as_strings), with unlabeled codes rendering
    numeric-as-string — the oracle re-derives the mapping in SQL."""
    path = ensure_labeled_file(spark, sf_dir)
    import polars_readstat_spark as prs

    prs.register(spark)
    df = (
        spark.read.format("readstat")
        .option("value_labels_as_strings", "true")
        .load(path)
    )
    return df.select(
        F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
        F.col("l_linenumber").alias("line_label"),
    )


@query(
    "scan_dta_informative_nulls",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CASE WHEN l_orderkey % 7 != 0 THEN l_quantity END AS l_quantity,
           CASE WHEN l_orderkey % 7 = 0 THEN '.' END AS l_quantity_null
    FROM lineitem
    """,
)
def scan_dta_informative_nulls(spark, sf_dir):
    """M1/M2 through a real file: nulls written as Stata sentinel
    missings come back as nulls, and informative_nulls=separate adds
    the '.' system-missing indicator column — compared against the
    same null rule applied directly to the parquet table."""
    path = ensure_labeled_file(spark, sf_dir)
    import polars_readstat_spark as prs

    prs.register(spark)
    df = (
        spark.read.format("readstat")
        .option("informative_nulls", "separate")
        .option("informative_null_columns", "l_quantity")
        .load(path)
    )
    return df.select(
        F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        F.col("l_quantity").cast("double").alias("l_quantity"),
        F.col("l_quantity_null").alias("l_quantity_null"),
    )


def ensure_tagged_file(spark, sf_dir: str, ext: str) -> str:
    """lineitem slice written with SAS tagged missings punched into
    l_quantity on a deterministic rule (l_orderkey % 11 == 0 → '._',
    else % 7 == 0 → '.'+letter cycling A-Z) via the writers'
    tagged_missing option — the fixture for scanning `.A`-`.Z`/`._`
    NaN-payload tags (sas7bdat) / byte-0 tags (xpt) back out
    (reference decode src/sas/value.rs:181-194, src/sas/xpt.rs:396)."""
    import polars_readstat_spark as prs

    d = _cache_dir(sf_dir)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"lineitem_tagged.{ext}")
    if os.path.exists(path):
        return path
    src = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("double").alias("l_quantity"),
            F.when(F.col("l_orderkey") % 11 == 0, F.lit("._"))
            .when(
                F.col("l_orderkey") % 7 == 0,
                F.concat(
                    F.lit("."),
                    F.char((F.lit(65) + F.col("l_orderkey") % 26).cast("int")),
                ),
            )
            .alias("q_tag"),
        )
    )
    tmp = os.path.join(d, f".tmp{os.getpid()}.lineitem_tagged.{ext}")
    prs.write_readstat(src, tmp, tagged_missing={"l_quantity": "q_tag"})
    os.replace(tmp, path)
    return path


_TAGGED_ORACLE = """
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CASE WHEN l_orderkey % 11 != 0 AND l_orderkey % 7 != 0
                THEN CAST(l_quantity AS DOUBLE) END AS l_quantity,
           CASE WHEN l_orderkey % 11 = 0 THEN '._'
                WHEN l_orderkey % 7 = 0
                THEN '.' || chr(CAST(65 + l_orderkey % 26 AS INT))
           END AS l_quantity_null
    FROM lineitem
"""


@query("scan_sas7bdat_informative_nulls", oracle=_TAGGED_ORACLE)
def scan_sas7bdat_informative_nulls(spark, sf_dir):
    """M2 for the SAS family: `.A`-`.Z`/`._` tags written into the
    NaN payload (bits [47:40], ones-complement — the pattern real SAS
    emits, verified against a SAS-generated fixture in
    tests/test_informative_sas_xpt.py) decode back into the
    informative_nulls=separate indicator column; the oracle re-derives
    both the null rule and the indicator strings from the parquet
    source in SQL."""
    path = ensure_tagged_file(spark, sf_dir, "sas7bdat")
    import polars_readstat_spark as prs

    prs.register(spark)
    df = (
        spark.read.format("readstat")
        .option("informative_nulls", "separate")
        .option("informative_null_columns", "l_quantity")
        .load(path)
    )
    return df.select(
        F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        F.col("l_quantity").cast("double").alias("l_quantity"),
        F.col("l_quantity_null").alias("l_quantity_null"),
    )


@query("scan_xpt_informative_nulls", oracle=_TAGGED_ORACLE)
def scan_xpt_informative_nulls(spark, sf_dir):
    """M2 for the transport format: tag characters in byte 0 of an
    otherwise-zero IBM-double field (TS-140) decode into the
    indicator column; same derived oracle as the sas7bdat twin. XPT
    v5 uppercases and truncates variable names to 8 chars, so the
    scan re-aliases back to the oracle's full lowercase names."""
    path = ensure_tagged_file(spark, sf_dir, "xpt")
    import polars_readstat_spark as prs

    prs.register(spark)
    df = (
        spark.read.format("readstat")
        .option("informative_nulls", "separate")
        .load(path)
    )
    return df.select(
        F.col("L_ORDERK").cast("bigint").alias("l_orderkey"),
        F.col("L_LINENU").cast("bigint").alias("l_linenumber"),
        F.col("L_QUANTI").cast("double").alias("l_quantity"),
        F.col("L_QUANTI_null").alias("l_quantity_null"),
    )


def ensure_tagged_dta(spark, sf_dir: str) -> str:
    """Stata twin of ensure_tagged_file: letters only (Stata has no
    '._'), lowercase '.a'-'.z' cycling by l_orderkey where % 7 == 0."""
    import polars_readstat_spark as prs

    d = _cache_dir(sf_dir)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "lineitem_tagged.dta")
    if os.path.exists(path):
        return path
    src = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("double").alias("l_quantity"),
            F.when(
                F.col("l_orderkey") % 7 == 0,
                F.concat(
                    F.lit("."),
                    F.char((F.lit(97) + F.col("l_orderkey") % 26).cast("int")),
                ),
            ).alias("q_tag"),
        )
    )
    tmp = os.path.join(d, f".tmp{os.getpid()}.lineitem_tagged.dta")
    prs.write_readstat(src, tmp, tagged_missing={"l_quantity": "q_tag"})
    os.replace(tmp, path)
    return path


@query(
    "scan_dta_tagged_missing",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CASE WHEN l_orderkey % 7 != 0
                THEN CAST(l_quantity AS DOUBLE) END AS l_quantity,
           CASE WHEN l_orderkey % 7 = 0
                THEN '.' || chr(CAST(97 + l_orderkey % 26 AS INT))
           END AS l_quantity_null
    FROM lineitem
    """,
)
def scan_dta_tagged_missing(spark, sf_dir):
    """Stata write→scan tagged-missing roundtrip: '.a'-'.z' written
    into the double sentinel range (0x7fe0… + tag<<40, the inverse of
    decode_numeric) come back through informative_nulls=separate; the
    oracle re-derives tag letters from the parquet source in SQL."""
    path = ensure_tagged_dta(spark, sf_dir)
    import polars_readstat_spark as prs

    prs.register(spark)
    df = (
        spark.read.format("readstat")
        .option("informative_nulls", "separate")
        .option("informative_null_columns", "l_quantity")
        .load(path)
    )
    return df.select(
        F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        F.col("l_quantity").cast("double").alias("l_quantity"),
        F.col("l_quantity_null").alias("l_quantity_null"),
    )


# ── W6: SAS CSV-import bundle (reference __init__.py:1399-1488) ──────


def ensure_sas_csv_bundle(spark, sf_dir: str) -> tuple[str, str]:
    """Materialize the CSV + DATA-step bundle once per sf: the
    BENCH_COLS lineitem frame with a value-label set on l_returnflag
    (exercises PROC FORMAT) and a variable label on l_orderkey."""
    import polars_readstat_spark as prs

    d = os.path.join(_cache_dir(sf_dir), "sascsv")
    csv_path = os.path.join(d, "lineitem.csv")
    sas_path = os.path.join(d, "lineitem.sas")
    if os.path.exists(csv_path) and os.path.exists(sas_path):
        return csv_path, sas_path
    os.makedirs(d, exist_ok=True)
    return prs.write_sas_csv_import(
        _source_frame(spark, sf_dir),
        d,
        dataset_name="lineitem",
        value_labels={
            "l_returnflag": {"A": "Accepted", "N": "New", "R": "Returned"}
        },
        variable_labels={"l_orderkey": "Order key"},
    )


@query("sas_csv_import_roundtrip", oracle=_CANON_ORACLE)
def sas_csv_import_roundtrip(spark, sf_dir):
    """W6 data half under the driver oracle: the bundle's CSV read
    back with the DATA-step's schema must reproduce lineitem exactly —
    shipdate timestamps stored as SAS datetime seconds (since
    1960-01-01, reference __init__.py:1460) are shifted back to DATE;
    doubles round-trip bit-exact because Spark's csv writer emits
    shortest-round-trip decimal."""
    csv_path, _ = ensure_sas_csv_bundle(spark, sf_dir)
    df = (
        spark.read.option("header", "true")
        .schema(
            "l_orderkey bigint, l_partkey bigint, l_quantity double,"
            " l_extendedprice double, l_discount double,"
            " l_returnflag string, l_shipdate bigint, l_linestatus string"
        )
        .csv(csv_path)
    )
    return df.select(
        "l_orderkey",
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_returnflag",
        "l_linestatus",
        F.date_from_unix_date(
            ((F.col("l_shipdate") - F.lit(315_619_200)) / F.lit(86_400))
            .cast("int")
        ).alias("l_shipdate"),
    )


# exact generated-script pins (everything except the absolute-path
# infile line), mirroring the reference's type table
# (__init__.py:1450-1476): $1 lengths from the string-width pre-pass,
# datetime19. on the timestamp shipdate, PROC FORMAT for the value
# labels, LABEL for the variable label
_SAS_SCRIPT_PINNED = (
    "proc format;",
    "  value $l_returnflag_fmt",
    '    "A" = "Accepted"',
    '    "N" = "New"',
    '    "R" = "Returned"',
    "  ;",
    "run;",
    "",
    "data lineitem;",
    "  length l_returnflag $1;",
    "  length l_linestatus $1;",
    "  input l_orderkey  l_partkey  l_quantity  l_extendedprice "
    " l_discount  l_returnflag $ l_shipdate  l_linestatus $;",
    "  format l_shipdate datetime19.;",
    "  format l_returnflag $l_returnflag_fmt.;",
    '  label l_orderkey = "Order key";',
    "run;",
)


@query(
    "sas_csv_script_pins",
    oracle="SELECT * FROM (VALUES "
    + ", ".join(
        f"({i}, '" + ln.replace("'", "''") + "')"
        for i, ln in enumerate(_SAS_SCRIPT_PINNED)
    )
    + ") AS t(ord, stmt)",
)
def sas_csv_script_pins(spark, sf_dir):
    """W6 script half: the generated DATA-step's FORMAT/LENGTH/LABEL/
    INPUT statements pinned line-by-line against a VALUES oracle. The
    one path-dependent line (infile "<abs path>") is excluded; all
    type-table behavior (reference __init__.py:1450-1476) is pinned."""
    _, sas_path = ensure_sas_csv_bundle(spark, sf_dir)
    with open(sas_path) as fh:
        lines = [ln.rstrip("\n") for ln in fh]
    kept = [ln for ln in lines if not ln.lstrip().startswith("infile ")]
    while kept and kept[-1] == "":
        kept.pop()
    rows = [(i, ln) for i, ln in enumerate(kept)]
    return spark.createDataFrame(rows, "ord int, stmt string")


# ── S12: streaming ingest under the driver oracle ────────────────────


@query(
    "stream_ingest_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_qty
    FROM lineitem
    WHERE l_orderkey % 10 = 0
    GROUP BY l_returnflag
    """,
)
def stream_ingest_agg(spark, sf_dir):
    """S12 with a full value oracle: a Structured Streaming
    file-arrival scan (readStream.format("readstat") over a landing
    directory of two dta part-files) aggregated in complete mode and
    drained with ONE availableNow trigger into a memory sink — the
    streaming result must equal the batch SQL over the same rows.
    The landing dir reuses the multifile fixture (even/odd
    l_orderkey), filtered to the deterministic 10% slice so the
    query also proves the stream scan pushes projection into the
    same per-file readers the batch path uses.

    Scale shape: each landed file is one input partition (decoded on
    its own executor), offsets carry file names only, and the
    complete-mode agg is a standard stateful hash aggregation —
    exactly the nightly-drop ingest topology (streamreader.py)."""
    import tempfile
    import uuid

    import polars_readstat_spark as prs
    from polars_readstat_spark.streaming.events import (
        state_partitions_for,
    )

    prs.register(spark)
    d = ensure_multifile_dir(spark, sf_dir, "dta")
    name = f"prs_stream_agg_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="prs_stream_ckpt_")
    # state = one row per l_returnflag (single-char flag domain, author
    # knowledge like a broadcast hint): the map-side partial agg still
    # fans across all input partitions; only the bounded merge state
    # needs stores, so size them to the key domain, not core count
    pkey = "spark.sql.shuffle.partitions"
    prior_parts = spark.conf.get(pkey, None)
    spark.conf.set(pkey, str(state_partitions_for(spark, 8)))
    try:
        q = (
            spark.readStream.format("readstat")
            .load(d)
            .filter(F.col("l_orderkey") % 10 == 0)
            .groupBy("l_returnflag")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_qty"),
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
    finally:
        if prior_parts is None:
            spark.conf.unset(pkey)
        else:
            spark.conf.set(pkey, prior_parts)
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)  # one-shot drain: no restart
    # materialize + drop the uuid-named memory sink: without this every
    # invocation leaks an in-memory table into the driver session
    out = spark.table(name).select("l_returnflag", "n", "sum_qty")
    rows = out.collect()
    schema = out.schema
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, schema)


# ── A3: profiled read, deterministic surface ─────────────────────────


@query(
    "profile_read_surface",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(8 AS INT) AS n_columns,
           CAST(COUNT(*) > 0 AS BOOLEAN) AS phases_positive
    FROM lineitem
    """,
)
def profile_read_surface(spark, sf_dir):
    """A3 under the driver oracle: profile_read's DETERMINISTIC
    fields — row count, column count, and that every phase timing is
    a positive finite number (the timings themselves are
    machine-dependent and stay out of the hash). Runs the real
    profiler (operators/profile.py, reference OpenProfile/ReadProfile
    sas/reader.rs:30-43) over the cached dta twin."""
    from polars_readstat_spark.operators.profile import profile_read

    path = ensure_readstat_file(spark, sf_dir, "dta")
    r = profile_read(path)
    phases = ("metadata_s", "plan_s", "io_s", "decode_arrow_s", "total_s")
    ok = all(
        isinstance(r[k], float) and r[k] >= 0 and r[k] == r[k]
        for k in phases
    ) and r["total_s"] > 0
    return spark.createDataFrame(
        [(int(r["n_rows"]), len(r["columns"]), bool(ok))],
        "n_rows bigint, n_columns int, phases_positive boolean",
    )


# ── multi-file schema drift: union_by_name ───────────────────────────


def ensure_drift_dir(spark, sf_dir: str) -> str:
    """Two lineitem waves with drifted schemas: wave1 (even orderkeys)
    stores l_quantity as smallint and carries l_returnflag; wave2 (odd)
    stores l_quantity as double and carries l_extendedprice."""
    import polars_readstat_spark as prs

    d = os.path.join(_cache_dir(sf_dir), "drift_dta")
    done = os.path.join(d, ".done")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    src = _source_frame(spark, sf_dir)
    w1 = src.filter(F.col("l_orderkey") % 2 == 0).select(
        F.col("l_orderkey").cast("int").alias("l_orderkey"),
        F.col("l_quantity").cast("smallint").alias("l_quantity"),
        "l_returnflag",
    )
    w2 = src.filter(F.col("l_orderkey") % 2 == 1).select(
        F.col("l_orderkey").cast("int").alias("l_orderkey"),
        F.col("l_quantity").cast("double").alias("l_quantity"),
        "l_extendedprice",
    )
    for name, part in (("wave1", w1), ("wave2", w2)):
        tmp = os.path.join(d, f".tmp{os.getpid()}.{name}.dta")
        prs.write_readstat(part, tmp)
        os.replace(tmp, os.path.join(d, f"{name}.dta"))
    with open(done, "w") as f:
        f.write("ok")
    return d


@query(
    "scan_union_by_name",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_quantity AS DOUBLE) AS l_quantity,
           l_returnflag,
           CAST(NULL AS DOUBLE) AS l_extendedprice
    FROM lineitem WHERE l_orderkey % 2 = 0
    UNION ALL
    SELECT CAST(l_orderkey AS BIGINT),
           CAST(l_quantity AS DOUBLE),
           NULL,
           l_extendedprice
    FROM lineitem WHERE l_orderkey % 2 = 1
    """,
)
def scan_union_by_name(spark, sf_dir):
    """Multi-file schema-drift scan (union_by_name): columns union by
    name across drifted waves, smallint+double l_quantity widens to
    double, and each wave's absent column reads as null — checked
    value-for-value against the equivalent UNION ALL in DuckDB.
    The per-batch alignment is executor-side Arrow
    (SchemaAlignReader, sources/datasource.py); the 100 TB shape is
    unchanged (per-file row-range partitions, no shuffle)."""
    d = ensure_drift_dir(spark, sf_dir)
    import polars_readstat_spark as prs

    prs.register(spark)
    df = (
        spark.read.format("readstat")
        .option("union_by_name", "true")
        .load(d)
    )
    return df.select(
        F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
        F.col("l_quantity").cast("double").alias("l_quantity"),
        "l_returnflag",
        "l_extendedprice",
    )


@query(
    "scan_federated_join",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_quantity >= 30
    GROUP BY o.o_orderpriority
    """,
)
def scan_federated_join(spark, sf_dir):
    """Cross-source federation: the readstat .dta scan of lineitem
    joined to the PARQUET orders table in one Catalyst plan — the
    mixed-lake topology (legacy statistical drops next to columnar
    tables) the engine exists for. The quantity filter pushes into
    the dta scan's Python worker (rows drop before the Arrow
    transfer); the join shuffles on l_orderkey; revenue goes through
    DECIMAL so the sum is order-independent and matches DuckDB
    bitwise. The fixture holds the FULL lineitem, so the parquet-only
    oracle checks the same rows.
    """
    li = _scan(spark, ensure_readstat_file(spark, sf_dir, "dta"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    from polars_readstat_spark.queries.relational import DEC
    return (
        li.filter(F.col("l_quantity") >= 30)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast(DEC))
            .cast("double")
            .alias("revenue"),
        )
    )
