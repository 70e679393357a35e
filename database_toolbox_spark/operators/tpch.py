"""Core analytic queries over the star schema — the SQL surface the reference
commits to via arbitrary-SQL passthrough (SURVEY.md §2.B [implied] rows:
grouped aggregation, multi-way joins, top-k, rollup), exercised TPC-H-style
on the driver's tables.

Scale notes (100 TB design):
- Filters are expressed as Column predicates on the scan → Catalyst pushes
  them into the Parquet reader (PushedFilters) and prunes columns.
- region/nation/supplier are broadcast at every sf (BROADCAST_DIMS) —
  no shuffle for dimension joins; fact⋈fact joins go sort-merge with AQE
  skew handling.
- Top-k is orderBy+limit → Catalyst's TakeOrderedAndProject (per-partition
  heap + driver merge), never a global single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_toolbox_spark.functions import bounded_rank_window, charge, disc_price, money, ratio, ts
from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_table


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: scan→filter→project→hash-agg→sort.

    The flagship query (SURVEY.md §7 minimum slice) — the core of what every
    warehouse wrapped by the reference executes for `execute_sql`.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money(F.sum("l_quantity")).alias("sum_qty"),
            money(F.sum("l_extendedprice")).alias("sum_base_price"),
            money(F.sum(disc_price())).alias("sum_disc_price"),
            money(F.sum(charge())).alias("sum_charge"),
            ratio(F.avg("l_quantity")).alias("avg_qty"),
            ratio(F.avg("l_extendedprice")).alias("avg_price"),
            ratio(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style top-k: 3-way join → grouped agg → deterministic top-10.

    Top-k via orderBy+limit (TakeOrderedAndProject — scales to any row count)
    with the rank column added afterwards over only the k surviving rows, so
    no global-window shuffle ever sees the full data.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < ts("1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > ts("1998-01-01")
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money(F.sum(disc_price())).alias("revenue"))
    )
    top = rev.orderBy(F.col("revenue").desc(), F.col("o_orderkey")).limit(10)
    w = bounded_rank_window(F.col("o_orderkey"), F.col("revenue").desc(), F.col("o_orderkey"))
    return top.withColumn("rnk", F.row_number().over(w))


def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style 6-way star join with broadcast dimensions.

    region/nation/supplier are broadcast (no shuffle); the customer⋈orders⋈
    lineitem chain shuffles on its keys with AQE handling skew/coalescing.
    """
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts("1996-01-01"))
        & (F.col("o_orderdate") < ts("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supplier, (li.l_suppkey == supplier.s_suppkey)
              & (cust.c_nationkey == supplier.s_nationkey))
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(money(F.sum(disc_price())).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def segment_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregation battery per market segment: count, exact distinct,
    avg/min/max/sum (SURVEY.md §2.B aggregations [implied])."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            ratio(F.avg("o_totalprice")).alias("avg_price"),
            money(F.min("o_totalprice")).alias("min_price"),
            money(F.max("o_totalprice")).alias("max_price"),
            money(F.sum("o_totalprice")).alias("sum_price"),
        )
        .orderBy("c_mktsegment")
    )


def priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (o_orderstatus, o_orderpriority) — grouping-sets surface
    (SURVEY.md §2.B: rollup/cube/grouping sets [implied])."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            money(F.sum("o_totalprice")).alias("sum_price"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-style: pure filter→scalar-agg (the pushdown showcase —
    every predicate reaches the Parquet scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= ts("1996-01-01"))
            & (F.col("l_shipdate") < ts("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-style: conditional aggregation ratio (promo part revenue
    share per month)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", disc_price()).otherwise(0.0)
    return (
        joined.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ym"))
        .agg(
            ratio(F.sum(promo) * 100.0 / F.sum(disc_price())).alias(
                "promo_pct"
            ),
            money(F.sum(disc_price())).alias("total_revenue"),
        )
        .orderBy("ym")
    )


def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-style: orders whose total quantity exceeds a threshold
    (grouped HAVING feeding a join), deterministic top-20."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(money(F.sum("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    top = (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "o_orderkey",
            "c_custkey",
            "c_name",
            money(F.col("o_totalprice")).alias("price"),
            "sum_qty",
        )
        .orderBy(F.col("price").desc(), F.col("o_orderkey"))
        .limit(20)
    )
    w = bounded_rank_window(F.col("o_orderkey"), F.col("price").desc(), F.col("o_orderkey"))
    return top.withColumn("rnk", F.row_number().over(w))


def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-style: revenue lost to returned items per customer
    (flag 'R'), with nation name, deterministic top-20."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    top = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(money(F.sum(disc_price())).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )
    w = bounded_rank_window(F.col("c_custkey"), F.col("revenue").desc(), F.col("c_custkey"))
    return top.withColumn("rnk", F.row_number().over(w))


def brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-style: distinct supplier count per (brand, size), excluding
    one brand and suppliers with negative balances (NOT IN subquery)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


QUERIES = {
    "pricing_summary": pricing_summary,
    "top_revenue_orders": top_revenue_orders,
    "regional_revenue": regional_revenue,
    "segment_order_stats": segment_order_stats,
    "priority_rollup": priority_rollup,
    "forecast_revenue": forecast_revenue,
    "promo_revenue_ratio": promo_revenue_ratio,
    "large_orders": large_orders,
    "returned_item_customers": returned_item_customers,
    "brand_supplier_counts": brand_supplier_counts,
}

_DISC = "l_extendedprice * (1 - l_discount)"

ORACLE = {
    "pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {R("sum(l_quantity)")}                                  AS sum_qty,
               {R("sum(l_extendedprice)")}                             AS sum_base_price,
               {R(f"sum({_DISC})")}                                    AS sum_disc_price,
               {R(f"sum({_DISC} * (1 + l_tax))")}                      AS sum_charge,
               {R("avg(l_quantity)", 4)}                               AS avg_qty,
               {R("avg(l_extendedprice)", 4)}                          AS avg_price,
               {R("avg(l_discount)", 6)}                               AS avg_disc,
               count(*)                                                AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "top_revenue_orders": f"""
        WITH rev AS (
            SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
                   {R(f"sum(l.{_DISC})")} AS revenue
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
        )
        SELECT o_orderkey, o_orderdate, o_orderpriority, revenue,
               CAST(row_number() OVER (ORDER BY revenue DESC, o_orderkey) AS INT) AS rnk
        FROM rev
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "regional_revenue": f"""
        SELECT n.n_name,
               {R(f"sum(l.{_DISC})")} AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n.n_name
    """,
    "segment_order_stats": f"""
        SELECT c.c_mktsegment,
               count(*)                            AS n_orders,
               count(DISTINCT o.o_custkey)         AS n_customers,
               {R("avg(o.o_totalprice)", 4)}       AS avg_price,
               {R("min(o.o_totalprice)")}          AS min_price,
               {R("max(o.o_totalprice)")}          AS max_price,
               {R("sum(o.o_totalprice)")}          AS sum_price
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """,
    "priority_rollup": f"""
        SELECT o_orderstatus, o_orderpriority,
               count(*)                       AS n_orders,
               {R("sum(o_totalprice)")}       AS sum_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus, o_orderpriority
    """,
    "forecast_revenue": f"""
        SELECT {R("sum(l_extendedprice * l_discount)")} AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "promo_revenue_ratio": f"""
        SELECT strftime(l.l_shipdate, '%Y-%m') AS ym,
               {R(f"sum(CASE WHEN p.p_type = 'PROMO' THEN l.{_DISC} ELSE 0.0 END)"
                  f" * 100.0 / sum(l.{_DISC})", 4)} AS promo_pct,
               {R(f"sum(l.{_DISC})")} AS total_revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY strftime(l.l_shipdate, '%Y-%m')
        ORDER BY ym
    """,
    "large_orders": f"""
        WITH big AS (
            SELECT l_orderkey, {R("sum(l_quantity)")} AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING {R("sum(l_quantity)")} > 150
        ),
        top AS (
            SELECT o.o_orderkey, c.c_custkey, c.c_name,
                   {R("o.o_totalprice")} AS price, b.sum_qty
            FROM orders o
            JOIN big b ON o.o_orderkey = b.l_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            ORDER BY price DESC, o.o_orderkey
            LIMIT 20
        )
        SELECT *, CAST(row_number() OVER (ORDER BY price DESC, o_orderkey) AS INT)
                  AS rnk
        FROM top
        ORDER BY price DESC, o_orderkey
    """,
    "returned_item_customers": f"""
        WITH top AS (
            SELECT c.c_custkey, c.c_name, n.n_name,
                   {R(f"sum(l.{_DISC})")} AS revenue
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n   ON c.c_nationkey = n.n_nationkey
            WHERE l.l_returnflag = 'R'
            GROUP BY c.c_custkey, c.c_name, n.n_name
            ORDER BY revenue DESC, c.c_custkey
            LIMIT 20
        )
        SELECT *, CAST(row_number() OVER (ORDER BY revenue DESC, c_custkey) AS INT)
                  AS rnk
        FROM top
        ORDER BY revenue DESC, c_custkey
    """,
    "brand_supplier_counts": """
        SELECT p.p_brand, p.p_size,
               count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                  WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    """,
}
