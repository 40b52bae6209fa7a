"""Relational / host-engine operator queries (SURVEY.md §2.2, §2.9).

These are the scan-adjacent relational primitives the reference
delegates to its host engine (Polars) and that our engine delegates to
Catalyst: projection & predicate pushdown, limit/offset slices, casts,
joins (broadcast / semi / anti), full-outer-join+coalesce metadata
merge (reference __init__.py:1217-1247), union, top-k per group,
max-strlen writer pre-pass (reference pybindings.rs:996-1044).

Scale notes: joins against nation/region are broadcast (dims are tiny
at any SF); aggregations are partial (map-side combine) by construction
since they use built-in hash aggregates; limit/offset sort on a unique
key so results are deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_readstat_spark.queries.registry import query
from polars_readstat_spark.tables import load_table

DEC = "decimal(18,2)"


def _dec(c):
    return F.col(c).cast(DEC)


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                    * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-style pricing summary — the flagship aggregation.

    Monetary sums go through DECIMAL so the result is exact and
    independent of Spark's partition-completion order (double sums are
    not associative); cast back to double for the comparator.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast(DEC) + _dec("l_tax"))
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1998-03-15'
      AND CAST(l.l_shipdate AS DATE) > DATE '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H-Q3-style shipping priority: the canonical 3-table
    fact-to-fact join (customer ⋈ orders ⋈ lineitem) with filters on
    all three tables, grouped revenue, and top-10.

    Scale shape: the customer side shrinks to one segment before
    joining, so it broadcasts; orders⋈lineitem is the real
    shuffle-on-orderkey join and AQE handles skew. Revenue sums go
    through DECIMAL (exact, order-independent); the date is emitted as
    a yyyy-MM-dd string so neither engine's timestamp tz handling
    touches the comparator. Top-10 ties break on l_orderkey.
    """
    cutoff = F.lit("1998-03-15").cast("date")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.to_date("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > cutoff
    )
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H-Q5-style local supplier volume: the 6-table star join
    (customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region) with
    the correlated c_nationkey = s_nationkey predicate.

    Scale shape: nation⋈region prune supplier down to one region
    before anything big joins — supplier×nation broadcasts into the
    fact join, so the only shuffles are orders⋈customer (on custkey)
    and lineitem⋈orders (on orderkey); the year filter lands on the
    orders scan as a pushed predicate. Revenue sums through DECIMAL
    for order-independent exactness.
    """
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    sn = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(sn),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "cube_status_priority",
    oracle="""
    SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
                ELSE o_orderstatus END AS orderstatus,
           CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
                ELSE o_orderpriority END AS orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark, sf_dir):
    """CUBE grouping sets: all 2^2 marginal totals of orders by
    (status, priority) in one pass — Catalyst expands the cube into a
    single hash aggregate with a grouping-id column (no re-scan per
    grouping set), which is the scalable OLAP-rollup shape. GROUPING()
    flags distinguish subtotal rows from genuine values.
    """
    o = load_table(spark, sf_dir, "orders")
    agg = o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        F.grouping("o_orderstatus").alias("g_status"),
        F.grouping("o_orderpriority").alias("g_priority"),
    )
    return agg.select(
        F.when(F.col("g_status") == 1, "ALL")
        .otherwise(F.col("o_orderstatus"))
        .alias("orderstatus"),
        F.when(F.col("g_priority") == 1, "ALL")
        .otherwise(F.col("o_orderpriority"))
        .alias("orderpriority"),
        "n_orders",
        "total_price",
    )


@query(
    "projection_pushdown",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
)
def projection_pushdown(spark, sf_dir):
    """P1: column pruning reaches the parquet scan (ReadSchema shows
    exactly two columns; reference never reads unselected bytes)."""
    return load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@query(
    "filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem WHERE l_quantity >= 18 AND l_returnflag = 'R'
    """,
)
def filter_pushdown(spark, sf_dir):
    """P4: predicate reaches PushedFilters in the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") >= 18) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@query(
    "limit_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    ORDER BY l_orderkey, l_linenumber LIMIT 100
    """,
)
def limit_pushdown(spark, sf_dir):
    """P2: n_rows limit; ordered on the unique key so the slice is
    deterministic under any partitioning."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "offset_slice",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    ORDER BY l_orderkey, l_linenumber LIMIT 100 OFFSET 100
    """,
)
def offset_slice(spark, sf_dir):
    """P3: offset+limit slice (reference: exact byte-seek offset reads)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .orderBy("l_orderkey", "l_linenumber")
        .offset(100)
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "schema_override_cast",
    oracle="""
    SELECT l_orderkey, CAST(l_quantity AS INTEGER) AS qty_int,
           CAST(l_linenumber AS BIGINT) AS ln_big,
           CAST(l_orderkey AS VARCHAR) AS ok_str
    FROM lineitem
    """,
)
def schema_override_cast(spark, sf_dir):
    """P5: schema_overrides post-scan casts (reference __init__.py:668-673)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_linenumber").cast("bigint").alias("ln_big"),
        F.col("l_orderkey").cast("string").alias("ok_str"),
    )


@query(
    "metadata_merge_full_join",
    oracle="""
    WITH cust AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS cust_acctbal
      FROM customer GROUP BY c_nationkey
    ), supp AS (
      SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers,
             CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS supp_acctbal
      FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(cust.nationkey, supp.nationkey) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers,
           COALESCE(cust_acctbal, 0.0) AS cust_acctbal,
           COALESCE(supp_acctbal, 0.0) AS supp_acctbal
    FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
    """,
)
def metadata_merge_full_join(spark, sf_dir):
    """W7: the metadata-merge idiom — full outer join + per-column
    COALESCE where explicit kwargs win (reference __init__.py:1217-1247),
    exercised here over two per-nation summaries."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("cust_acctbal"),
        )
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(_dec("s_acctbal")).cast("double").alias("supp_acctbal"),
        )
    )
    joined = cust.join(supp, on="nationkey", how="full")
    return joined.select(
        "nationkey",
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        F.coalesce("cust_acctbal", F.lit(0.0)).alias("cust_acctbal"),
        F.coalesce("supp_acctbal", F.lit(0.0)).alias("supp_acctbal"),
    )


@query(
    "semi_join_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_join_customers_with_orders(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def anti_join_customers_without_orders(spark, sf_dir):
    """LEFT ANTI against a filtered right side. The urgency predicate
    keeps the result non-empty on this datagen, where every customer
    has at least one order (a bare "never ordered" anti-join returns
    0 rows at every SF, so the join was never value-checked — the
    same vacuity the r04 verdict found in q22): 18/203/1986 customers
    at sf0.001/0.01/0.1."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders.filter(F.col("o_orderpriority") == "1-URGENT"),
        cust.c_custkey == orders.o_custkey,
        "left_anti",
    ).select("c_custkey", "c_name")


@query(
    "broadcast_join_order_region",
    oracle="""
    SELECT r.r_name AS region_name, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def broadcast_join_order_region(spark, sf_dir):
    """Star-join rollup: nation/region are broadcast (tiny dims at any
    SF); only orders⋈customer shuffles, and AQE coalesces it."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
    )


@query(
    "union_distinct_keys",
    oracle="""
    SELECT n_regionkey AS key FROM nation
    UNION
    SELECT r_regionkey AS key FROM region
    """,
)
def union_distinct_keys(spark, sf_dir):
    """vstack/concat + distinct (reference vstacks scan batches)."""
    n = load_table(spark, sf_dir, "nation").select(F.col("n_regionkey").alias("key"))
    r = load_table(spark, sf_dir, "region").select(F.col("r_regionkey").alias("key"))
    return n.union(r).distinct()


@query(
    "topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
)
def topk_orders_per_customer(spark, sf_dir):
    """Top-K per group via ranked window (tie-broken on the unique
    order key so ranks are deterministic)."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


@query(
    "max_strlen_prepass",
    oracle="""
    SELECT source, MAX(LENGTH(text)) AS max_len, COUNT(*) AS n_docs
    FROM documents GROUP BY source
    """,
)
def max_strlen_prepass(spark, sf_dir):
    """W2: the streaming-sink width pre-pass — agg(max(length(c)))
    (reference pybindings.rs:996-1044), per source file."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.max(F.length("text")).alias("max_len"), F.count(F.lit(1)).alias("n_docs")
    )


@query(
    "group_count_events",
    oracle="SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
)
def group_count_events(spark, sf_dir):
    """groupBy-count (reference uses it for row-index tag resolution)."""
    return load_table(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "pivot_user_event_counts",
    oracle="""
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
    FROM events GROUP BY user_id
    """,
)
def pivot_user_event_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = ev.groupBy("user_id").pivot("event_type", types).count()
    return out.na.fill(0, subset=types)


@query(
    "rollup_revenue_subtotals",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue_subtotals(spark, sf_dir):
    """OLAP rollup: revenue at (flag, status), per-flag subtotal, and
    grand total in one pass — Catalyst expands the grouping sets into
    one aggregation with a grouping-id column, still map-side partial.
    The grouping id disambiguates subtotal NULLs from data NULLs on
    both engines (same bit order: 1 = flag rolled up, 2 = status)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (
                F.grouping("l_returnflag") + F.lit(2) * F.grouping("l_linestatus")
            ).alias("gid"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "revenue", "n")
    )


@query(
    "running_revenue_window",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS running_rev,
           CAST(LAG(CAST(l_quantity AS BIGINT))
                OVER (PARTITION BY l_orderkey ORDER BY l_linenumber)
               AS BIGINT) AS prev_qty
    FROM lineitem WHERE l_orderkey % 100 = 0
    """,
)
def running_revenue_window(spark, sf_dir):
    """Running aggregate + lag over an ordered window: one shuffle on
    the partition key, sorted within partitions; DECIMAL accumulation
    keeps the running sum exact in frame order on both engines."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 100 == 0
    )
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber")
    frame = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(_dec("l_extendedprice")).over(frame).cast("double").alias(
            "running_rev"
        ),
        F.lag(F.col("l_quantity").cast("bigint")).over(w).cast("bigint").alias(
            "prev_qty"
        ),
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1999-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H-Q6-style forecast-revenue: tight conjunctive filter over
    the fact table feeding a single global sum — the canonical
    predicate-pushdown + map-side-combine probe (reference exercises it
    through its host-engine filter/agg surface, SURVEY.md §2.9).

    Scale shape: every predicate reaches the parquet scan (min/max
    row-group skipping does real work on l_shipdate/l_discount); the
    aggregate is a partial-final pair carrying one row per partition.
    DECIMAL accumulation keeps the sum exact and order-independent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit("1998-01-01").cast("date"))
            & (F.to_date("l_shipdate") < F.lit("1999-01-01").cast("date"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "intersect_except_user_sets",
    oracle="""
    SELECT 'both' AS grp, COUNT(*) AS n FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    UNION ALL
    SELECT 'click_only' AS grp, COUNT(*) AS n FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
)
def intersect_except_user_sets(spark, sf_dir):
    """INTERSECT / EXCEPT set algebra over user cohorts (clickers vs
    purchasers) — the audience-overlap primitives. Both compile to
    hash-aggregate + join shapes (one shuffle per side on user_id);
    counts make the result order-free.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    both = clicks.intersect(buys).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("grp"), "n"
    )
    only = clicks.distinct().exceptAll(buys.distinct()).agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("click_only").alias("grp"), "n")
    return both.union(only)


@query(
    "customer_spend_quartiles",
    oracle="""
    SELECT o_custkey, total_spend, spend_quartile, pct_rank FROM (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
             NTILE(4) OVER (ORDER BY SUM(CAST(o_totalprice AS DECIMAL(18,2))) DESC,
                            o_custkey) AS spend_quartile,
             PERCENT_RANK() OVER (ORDER BY SUM(CAST(o_totalprice AS DECIMAL(18,2))) DESC,
                                  o_custkey) AS pct_rank
      FROM orders GROUP BY o_custkey
    ) WHERE o_custkey % 10 = 0
    """,
)
def customer_spend_quartiles(spark, sf_dir):
    """Distribution ranking: per-customer spend bucketed into NTILE
    quartiles with PERCENT_RANK — the cohort-scoring shape. The
    aggregate is combinable; the global ranking window is the one
    deliberate single-ordering pass (rank semantics require it), with
    a deterministic (spend DESC, custkey) order so both engines tile
    identically. The final sample filter keeps the declared result
    bounded.
    """
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).alias("spend_dec")
    )
    w = W.orderBy(F.col("spend_dec").desc(), "o_custkey")
    return (
        spend.select(
            "o_custkey",
            F.col("spend_dec").cast("double").alias("total_spend"),
            F.ntile(4).over(w).alias("spend_quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
        )
        .filter(F.col("o_custkey") % 10 == 0)
    )


@query(
    "orders_monthly_rollup",
    oracle="""
    SELECT strftime(DATE_TRUNC('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d')
               AS month_start,
           o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
)
def orders_monthly_rollup(spark, sf_dir):
    """Calendar rollup: truncate order timestamps to month boundaries
    and aggregate per (month, status) — the continuous-aggregate /
    hypertable-rollup shape. date_trunc is a map-side expression, the
    aggregate is combinable, and the month string keeps timestamp
    semantics out of the comparator.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_format(
                F.date_trunc("month", F.to_date("o_orderdate")), "yyyy-MM-dd"
            ).alias("month_start"),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
    )


@query(
    "q4_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_exists(spark, sf_dir):
    """Q4 shape: EXISTS decorrelates to a LEFT SEMI hash join on the
    order key — the fact side shuffles once on its join key, the
    priority rollup partial-aggregates."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-07-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q10_returned_item_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_item_revenue(spark, sf_dir):
    """Q10 shape: returned-item revenue per customer. The filter on
    l_returnflag cuts the fact before the joins; nation broadcasts;
    the top-20 is a TakeOrderedAndProject, never a global sort."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    rev = (
        F.sum(
            _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
        ).cast("double")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev.alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q14_promo_effect",
    oracle="""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                     THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1997-03-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1997-04-01'
    """,
)
def q14_promo_effect(spark, sf_dir):
    """Q14 shape: conditional aggregate over a fact-dim join. The
    month filter prunes the fact scan; both DECIMAL sums are exact so
    the final double division matches bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-03-01"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-04-01"))
    )
    p = load_table(spark, sf_dir, "part")
    disc = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)")
    promo = F.sum(
        F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(zero)
    ).cast("double")
    total = F.sum(disc).cast("double")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg((F.lit(100.0) * promo / total).cast("double").alias(
            "promo_revenue_pct"
        ))
    )


@query(
    "q18_large_volume_customer",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
               AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 210
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, b.total_qty,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q18_large_volume_customer(spark, sf_dir):
    """Q18 shape: group-having on the fact builds a small key set that
    then drives the joins — the classic aggregate-then-join reduction
    (joining first would shuffle the whole fact twice)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .filter(F.col("total_qty") > 210)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("total_qty").cast("bigint").alias("total_qty"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
    )


@query(
    "table_profile_lineitem",
    oracle="""
    SELECT 'l_orderkey' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(l_orderkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(l_orderkey) AS VARCHAR) AS min_s,
           CAST(MAX(l_orderkey) AS VARCHAR) AS max_s
    FROM lineitem
    UNION ALL
    SELECT 'l_quantity', COUNT(*), COUNT(*) - COUNT(l_quantity),
           COUNT(DISTINCT l_quantity),
           CAST(MIN(l_quantity) AS VARCHAR),
           CAST(MAX(l_quantity) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
           COUNT(DISTINCT l_returnflag),
           MIN(l_returnflag), MAX(l_returnflag)
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', COUNT(*), COUNT(*) - COUNT(l_shipdate),
           COUNT(DISTINCT l_shipdate),
           CAST(CAST(MIN(l_shipdate) AS DATE) AS VARCHAR),
           CAST(CAST(MAX(l_shipdate) AS DATE) AS VARCHAR)
    FROM lineitem
    """,
)
def table_profile_lineitem(spark, sf_dir):
    """Column-profiling op (the SUMMARIZE/data-quality primitive):
    per profiled column, row count, null count, exact distinct count,
    and min/max rendered as strings for a type-uniform report row.

    Scale shape: one aggregate subtree PER COLUMN, unioned — not one
    multi-distinct aggregate. Measured 9x faster at sf0.1 (0.63 vs
    5.6 s): N distinct aggregates in one pass plan through an Expand
    that replicates every row N+1 times into one wide shuffle, while
    the union's subtrees each column-prune their parquet scan to the
    ONE profiled column and partial-aggregate map-side, so total I/O
    ≈ a single full-width scan and each shuffle carries only
    per-partition distinct values. The same reasoning holds on a
    columnar lake at 100 TB; for row-major sources (where each scan
    re-reads full records) switch to approx_count_distinct, which
    collapses into one non-Expand aggregate. Dates/doubles stringify
    identically on both engines (dates via an explicit DATE cast; the
    doubles here are x.0-form, both engines print '18.0')."""
    li = load_table(spark, sf_dir, "lineitem")

    def prof(col, minmax=None):
        mn, mx = F.min(col), F.max(col)
        if minmax is not None:
            mn, mx = minmax(mn), minmax(mx)
        return li.agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
            F.countDistinct(col).alias("n_distinct"),
            mn.cast("string").alias("min_s"),
            mx.cast("string").alias("max_s"),
        ).select(F.lit(col).alias("col"), "*")

    return (
        prof("l_orderkey")
        .unionAll(prof("l_quantity"))
        .unionAll(prof("l_returnflag"))
        .unionAll(prof("l_shipdate", minmax=lambda c: c.cast("date")))
    )


@query(
    "window_rank_family",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           PERCENT_RANK() OVER w AS prnk,
           CUME_DIST() OVER w AS cdist,
           CAST(NTILE(4) OVER (
             PARTITION BY l_returnflag
             ORDER BY l_quantity, l_orderkey, l_linenumber
           ) AS INT) AS quartile
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
    """,
)
def window_rank_family(spark, sf_dir):
    """The full ranking-window family in one pass: rank, dense_rank,
    percent_rank, cume_dist (tie-stable over the quantity ordering)
    and ntile(4) (tie-UNSTABLE, so its ordering adds the unique
    (l_orderkey, l_linenumber) key — NTILE splits remainder rows by
    position, and positions inside a tie group are otherwise
    engine-arbitrary). percent_rank=(rank-1)/(n-1) and
    cume_dist=n_le/n are exact integer divisions, so the doubles
    match bitwise.

    Scale shape: one shuffle on l_returnflag; all five functions
    evaluate in a single Window operator over the same sort. The 1%
    orderkey sample bounds the compared result, not the plan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 100 == 0
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("l_returnflag").orderBy("l_quantity")
    wn = W.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(wn).alias("quartile"),
    )


@query(
    "shuffle_key_skew_report",
    oracle="""
    WITH k AS (
      SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY l_suppkey
    ),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM lineitem)
    SELECT k.key, k.n_rows,
           CAST(k.n_rows AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
    FROM k CROSS JOIN t
    ORDER BY k.n_rows DESC, k.key ASC LIMIT 20
    """,
)
def shuffle_key_skew_report(spark, sf_dir):
    """Skew diagnosis for a prospective shuffle key: the top-20
    heaviest key groups and their share of the table — the report run
    BEFORE a big join/agg to decide whether a key needs salting or
    AQE skew handling (one key at >1% of a 100 TB table means one
    executor eats a terabyte). Deterministic tie-break (count desc,
    key asc); share is one bigint/bigint division per output row.

    Scale shape: a combinable count per key, a 1-row total broadcast,
    and TakeOrderedAndProject for the top-20 — never a global sort of
    the key table; output is 20 rows at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    t = li.agg(F.count(F.lit(1)).alias("total"))
    return (
        k.crossJoin(F.broadcast(t))
        .select(
            "key",
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("total").cast("double"))
            .alias("share"),
        )
        .orderBy(F.col("n_rows").desc(), F.col("key").asc())
        .limit(20)
    )
