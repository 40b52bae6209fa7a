"""Remaining TPC-H query shapes (Q2,Q7,Q8,Q9,Q11,Q12,Q13,Q15,Q16,Q17,Q19,Q20,Q21,Q22).

Completes the host-engine relational surface started in relational.py
(Q1/Q3/Q4/Q5/Q6/Q10/Q14/Q18): every TPC-H access pattern now has a
Spark-first implementation under the DuckDB oracle. The driver-provided
test tables are a slim TPC-H (no partsupp; no l_shipmode /
l_commitdate / l_receiptdate; no c_phone / o_comment / p_container),
so queries whose official text needs a missing column keep the *shape*
— the join topology, subquery decorrelation, and aggregate structure —
over the columns that exist, exactly as relational.py's Q4 replaced the
commit/receipt-date predicate. Each docstring names the substitution.

Scale notes (the properties the shapes are chosen for):
- dimension joins (nation, region, part at dim-scale) broadcast;
- scalar global aggregates (Q11 threshold, Q15 max, Q17 per-part avg,
  Q22 avg balance) become 1-row / small DataFrames cross/equi-joined
  back in — never a driver-side collect, never a global window;
- correlated EXISTS / NOT EXISTS (Q21, Q22) decorrelate to left-semi /
  left-anti hash joins on the correlation key;
- monetary aggregates run in DECIMAL (exact, order-independent) and
  cast to double at the end, per queries/registry.py's convention.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from polars_readstat_spark.queries.registry import query
from polars_readstat_spark.tables import load_table

DEC = "decimal(18,2)"


def _dec(c):
    return F.col(c).cast(DEC)


def _revenue():
    return _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))


# SQL fragment mirroring _revenue(): exact decimal arithmetic on both
# engines so sums match bit-for-bit after the final double cast.
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l.l_partkey, l.l_suppkey
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_size = 15 AND p.p_type = 'ECONOMY'
    ),
    cand AS (
      SELECT ps.l_partkey AS p_partkey, p.p_name, s.s_name,
             s.s_acctbal, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
      JOIN part p ON p.p_partkey = ps.l_partkey
    )
    SELECT p_partkey, p_name, s_name,
           CAST(s_acctbal AS DOUBLE) AS s_acctbal, n_name
    FROM cand
    QUALIFY s_acctbal = MIN(s_acctbal) OVER (PARTITION BY p_partkey)
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """Q2 shape: cheapest qualifying supplier per part.

    No partsupp table, so "supplied the part" is witnessed by lineitem
    (distinct part/supplier pairs) and the correlated MIN(ps_supplycost)
    subquery becomes MIN(s_acctbal) — same decorrelation: a per-part
    window min with an equality filter (ties kept on both engines, so
    no LIMIT nondeterminism). nation/region broadcast; the distinct
    pair set is one shuffle on (partkey, suppkey).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    ps = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("l_partkey", "l_suppkey", "p_name")
        .distinct()
    )
    cand = (
        ps.join(s, ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "s_name",
            "s_acctbal",
            "n_name",
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("__min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("__min_bal"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "n_name",
        )
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(CAST(l.l_shipdate AS DATE)) AS INT) AS l_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE CAST(l.l_shipdate AS DATE) BETWEEN DATE '1996-01-01'
                                         AND DATE '1997-12-31'
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """Q7: bilateral trade volume between two nations by ship year.

    The two nation dims broadcast (aliased scans, one per side of the
    trade); the OR-of-pairs predicate evaluates after both broadcasts,
    so the fact shuffles only for its orders/customer joins. Revenue
    is an exact DECIMAL sum per (supp_nation, cust_nation, year).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate").cast("date") <= F.lit("1997-12-31"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .withColumn("l_year", F.year(F.col("l_shipdate").cast("date")).cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH allnations AS (
      SELECT CAST(YEAR(CAST(o.o_orderdate AS DATE)) AS INT) AS o_year,
             {_REV_SQL} AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey AND r.r_name = 'AMERICA'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE CAST(o.o_orderdate AS DATE) BETWEEN DATE '1995-01-01'
                                            AND DATE '1996-12-31'
    )
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM allnations GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """Q8: one nation's market share inside a region, by order year.

    Eight-table join where every dimension (part-filtered, nation ×2,
    region) broadcasts; both the numerator and denominator are exact
    DECIMAL sums over the same grouped rows, so the final double
    division matches the oracle bit-for-bit.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate").cast("date") <= F.lit("1996-12-31"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    zero = F.lit(0).cast(DEC)
    vol = _revenue()
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .withColumn("o_year", F.year(F.col("o_orderdate").cast("date")).cast("int"))
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double")
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


@query(
    "q9_product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(YEAR(CAST(o.o_orderdate AS DATE)) AS INT) AS o_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY nation, o_year
    """,
)
def q9_product_type_profit(spark, sf_dir):
    """Q9 shape: profit on a product line by supplier nation and year.

    No partsupp → no ps_supplycost term, so profit reduces to
    discounted revenue (the join topology — part-name LIKE filter,
    supplier→nation rollup, order-year grouping — is Q9's). The part
    filter broadcasts; lineitem shuffles once per fact join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .withColumn("o_year", F.year(F.col("o_orderdate").cast("date")).cast("int"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(F.sum(_revenue()).cast("double").alias("sum_profit"))
    )


@query(
    "q11_important_value_share",
    oracle=f"""
    WITH v AS (
      SELECT l.l_partkey, SUM({_REV_SQL}) AS value_dec
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
                   AND n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM v, (SELECT CAST(SUM(value_dec) AS DOUBLE) AS total,
                    COUNT(*) AS cnt FROM v) t
    WHERE CAST(value_dec AS DOUBLE) > (1.5 / t.cnt) * t.total
    """,
)
def q11_important_value_share(spark, sf_dir):
    """Q11 shape: parts holding an outsized share of one nation's value.

    ps_supplycost*ps_availqty becomes discounted lineitem revenue from
    that nation's suppliers; the HAVING > fraction-of-total scalar
    subquery stays: the total is a 1-row aggregate cross-joined
    (broadcast) back against the per-part values — no driver collect,
    no global window. Both operands come from exact DECIMAL sums, so
    their double conversions (and hence the threshold compare) are
    identical on both engines; comparing in DECIMAL directly would
    overflow DuckDB's 38-digit multiply.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    v = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(_revenue()).alias("value_dec"))
    )
    total = v.agg(
        F.sum("value_dec").cast("double").alias("total"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        v.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_dec").cast("double")
            > (F.lit(1.5) / F.col("cnt")) * F.col("total")
        )
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


@query(
    "q12_linestatus_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_linestatus_priority(spark, sf_dir):
    """Q12 shape: order-priority mix per line category in a ship year.

    l_shipmode and the commit/receipt-date predicates don't exist in
    the slim schema; l_linestatus is the grouping category and the
    ship-year range the filter. The conditional counts partial-
    aggregate map-side; one fact-fact shuffle on the order key.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark, sf_dir):
    """Q13: distribution of per-customer order counts.

    The o_comment NOT LIKE filter becomes a priority exclusion (same
    join-side predicate position: it must sit in the LEFT JOIN's ON
    clause, not a WHERE, to keep order-less customers as count 0).
    Two cascaded aggregations — the second groups a 15k-row result,
    so its shuffle is trivial at any SF.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    counts = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({_REV_SQL}) AS DECIMAL(28,4)) AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM revenue r
    JOIN supplier s ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """Q15: the quarter's top-revenue supplier (the revenue-view query).

    The view is one partial-aggregated shuffle on l_suppkey; the
    MAX(total_revenue) scalar subquery is a 1-row aggregate broadcast
    back for the equality filter. Revenue stays DECIMAL through the
    comparison — exact on both engines, so ties (kept, per spec) and
    the max itself agree bit-for-bit; the double cast happens only on
    output.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).cast("decimal(28,4)").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@query(
    "q16_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#4' AND p.p_type NOT LIKE 'SMALL%'
      AND p.p_size IN (1, 5, 9, 15, 25, 35, 45, 50)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_variety(spark, sf_dir):
    """Q16 shape: how many suppliers can supply each part profile.

    partsupp's (part, supplier) pairs are witnessed by lineitem; the
    excluded-supplier NOT IN (comment-based) has no source column and
    drops. COUNT(DISTINCT) over the join is Spark's two-phase distinct
    aggregate — partial dedup map-side, one shuffle on the group key.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (~F.col("p_type").like("SMALL%"))
        & (F.col("p_size").isin(1, 5, 9, 15, 25, 35, 45, 50))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pavg AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#2'
    JOIN pavg a ON a.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.2 * a.avg_qty
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """Q17: revenue lost to small-quantity orders (correlated AVG).

    The correlated per-part AVG(l_quantity) decorrelates to an
    aggregate-then-join: the per-part average table is |parts| rows,
    equi-joined back on the part key. The average is computed as an
    exact DECIMAL sum over COUNT so the 0.2× threshold is the same
    double on both engines (a double SUM would wobble in the last ulp
    and could flip boundary rows). p_container doesn't exist; the
    brand filter alone selects the line.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    pavg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pavg, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q19_or_predicate_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_or_predicate_revenue(spark, sf_dir):
    """Q19: disjunctive multi-attribute predicate over a fact-dim join.

    The quantity/size/brand triples keep Q19's OR-of-conjunctions
    shape (shipmode/shipinstruct legs don't exist). Catalyst extracts
    the common part-side predicate (brand ∈ {...} ∧ size ≤ 15) below
    the join, so the broadcast build side is pre-filtered; the
    residual OR evaluates in codegen above it.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    br = F.col("p_brand")
    cond = (
        ((br == "Brand#1") & sz.between(1, 5) & q.between(1, 11))
        | ((br == "Brand#2") & sz.between(1, 10) & q.between(10, 20))
        | ((br == "Brand#3") & sz.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@query(
    "q20_excess_shipments",
    oracle="""
    WITH shipped AS (
      SELECT l.l_suppkey,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
      WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
      GROUP BY l.l_suppkey
      HAVING SUM(CAST(l.l_quantity AS BIGINT)) > 50
    )
    SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_4'
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM shipped)
    """,
)
def q20_excess_shipments(spark, sf_dir):
    """Q20 shape: suppliers who moved heavy volume of a product line.

    The partsupp availqty > half-year-shipments correlated subquery
    becomes its witnessable half: a grouped-HAVING key set from
    lineitem (the same aggregate-then-semijoin decorrelation), driving
    a LEFT SEMI join into the nation-filtered supplier dim. The key
    set is small, so Spark broadcasts the semi-join build side.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
        .filter(F.col("qty") > 50)
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(shipped, s.s_suppkey == shipped.l_suppkey, "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_0'
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
)
def q21_waiting_supplier(spark, sf_dir):
    """Q21 shape: the sole at-fault supplier on multi-supplier orders.

    "Late" (receiptdate > commitdate) doesn't exist in the slim
    schema; l_returnflag = 'R' is the fault marker. The correlated
    EXISTS / NOT EXISTS pair decorrelates exactly as Catalyst plans
    them: a LEFT SEMI self-join (another supplier touched the order)
    and a LEFT ANTI self-join (no *other* supplier is also at fault),
    both equi-keyed on l_orderkey with the supplier inequality as the
    residual condition.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o1_key"), F.col("l_suppkey").alias("s1_key")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key")
    )
    return (
        l1.join(
            l2,
            (F.col("o1_key") == F.col("o2_key"))
            & (F.col("s1_key") != F.col("s2_key")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("o1_key") == F.col("o3_key"))
            & (F.col("s1_key") != F.col("s3_key")),
            "left_anti",
        )
        .join(o, F.col("o1_key") == o.o_orderkey)
        .join(s, F.col("s1_key") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q22_idle_customer_balance",
    oracle="""
    WITH pool AS (
      SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9)
    ),
    thresh AS (
      SELECT CAST(SUM(bal) AS DOUBLE) / COUNT(*) AS avg_bal
      FROM pool WHERE bal > 0
    )
    SELECT p.c_nationkey AS cntrycode, COUNT(*) AS numcust,
           CAST(SUM(p.bal) AS DOUBLE) AS totacctbal
    FROM pool p, thresh t
    WHERE CAST(p.bal AS DOUBLE) > t.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = p.c_custkey
                        AND o.o_orderdate >= DATE '2000-06-01')
    GROUP BY p.c_nationkey
    """,
)
def q22_idle_customer_balance(spark, sf_dir):
    """Q22 shape: well-funded customers gone idle (no order since
    2000-06-01), by country.

    c_phone's country code becomes c_nationkey (same role: a small IN
    set selecting the pool). The global positive-balance average is a
    1-row aggregate broadcast back (exact DECIMAL sum / count, so the
    > threshold agrees across engines); the NOT EXISTS on orders is a
    LEFT ANTI join on the customer key. The recency predicate keeps
    the decorrelation shape while being non-vacuous on this datagen,
    where every customer has >=1 order (plain "never ordered" returns
    0 rows at every SF, so the query body was never value-checked —
    VERDICT r04 #2): non-empty at sf0.001/0.01/0.1 (3/25/226
    qualifying customers).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    pool = c.filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9)).select(
        "c_custkey", "c_nationkey", _dec("c_acctbal").alias("bal")
    )
    thresh = pool.filter(F.col("bal") > 0).agg(
        (F.sum("bal").cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        pool.crossJoin(F.broadcast(thresh))
        .filter(F.col("bal").cast("double") > F.col("avg_bal"))
        .join(
            o.filter(
                F.col("o_orderdate").cast("date") >= F.lit("2000-06-01")
            ),
            pool.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal").cast("double").alias("totacctbal"),
        )
    )
