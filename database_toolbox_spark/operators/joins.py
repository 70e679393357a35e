"""Join operator battery (SURVEY.md §2.B Joins — all [implied] passthrough
capability of every engine the reference wraps; none appear literally in
reference SQL, which is single-table YAML tools).

Scale notes:
- Equi-joins let Catalyst pick broadcast/shuffled-hash/sort-merge; AQE
  converts to broadcast at runtime when a side turns out small.
- The theta join keeps an equi component (partkey) so it stays a hash join
  with a residual condition — never a nested-loop over the fact table.
- Semi/anti joins are `left_semi`/`left_anti` (EXISTS / NOT EXISTS): no
  payload columns cross the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_toolbox_spark.functions import disc_price, money
from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_table


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): customers that never placed an order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")
    )


def big_spender_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS): customers with at least one order > 450k."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", money(F.col("c_acctbal")).alias("acctbal"))
        .orderBy("c_custkey")
    )


def order_item_counts_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving every order; missing lineitems count 0.

    Aggregate-then-join: the 1:N fact side is reduced to one row per order
    BEFORE the join, so the join moves |orders| rows instead of |lineitem|
    rows — the shape that survives a 100× fact-table scale-up."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("l_linenumber").alias("_n"),
        F.sum(disc_price()).alias("_rev"),
    )
    return (
        orders.join(per_order, orders.o_orderkey == per_order.l_orderkey, "left")
        .select(
            "o_orderkey",
            F.coalesce(F.col("_n"), F.lit(0)).alias("n_items"),
            money(F.coalesce(F.col("_rev"), F.lit(0.0))).alias("revenue"),
        )
        .orderBy("o_orderkey")
    )


def nation_presence_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: which nations have customers vs suppliers."""
    cn = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
        .withColumn("has_customer", F.lit(1))
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
        .withColumn("has_supplier", F.lit(1))
    )
    return (
        cn.join(sn, "nationkey", "full")
        .select(
            "nationkey",
            F.coalesce("has_customer", F.lit(0)).alias("has_customer"),
            F.coalesce("has_supplier", F.lit(0)).alias("has_supplier"),
        )
        .orderBy("nationkey")
    )


def brand_quantity_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join (equi + range residual): lineitems whose quantity exceeds
    the part's size — hash join on partkey with a non-equi filter, not a
    nested loop."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            part,
            (li.l_partkey == part.p_partkey) & (li.l_quantity > part.p_size),
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            money(F.sum("l_quantity")).alias("sum_qty"),
        )
        .orderBy("p_brand")
    )


def region_status_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join: full grid of region × order status (small × small)."""
    region = load_table(spark, sf_dir, "region").select("r_name")
    status = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return region.crossJoin(status).orderBy("r_name", "o_orderstatus")


QUERIES = {
    "customers_without_orders": customers_without_orders,
    "big_spender_customers": big_spender_customers,
    "order_item_counts_left": order_item_counts_left,
    "nation_presence_full": nation_presence_full,
    "brand_quantity_band": brand_quantity_band,
    "region_status_grid": region_status_grid,
}

ORACLE = {
    "customers_without_orders": """
        SELECT c_custkey, c_name, c_nationkey
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey
    """,
    "big_spender_customers": f"""
        SELECT c_custkey, c_name, {R("c_acctbal")} AS acctbal
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
        )
        ORDER BY c_custkey
    """,
    "order_item_counts_left": f"""
        SELECT o.o_orderkey,
               count(l.l_linenumber) AS n_items,
               {R("coalesce(sum(l.l_extendedprice * (1 - l.l_discount)), 0)")}
                   AS revenue
        FROM orders o
        LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey
        ORDER BY o.o_orderkey
    """,
    "nation_presence_full": """
        WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey, 1 AS has_customer
                    FROM customer),
             sn AS (SELECT DISTINCT s_nationkey AS nationkey, 1 AS has_supplier
                    FROM supplier)
        SELECT coalesce(cn.nationkey, sn.nationkey) AS nationkey,
               coalesce(cn.has_customer, 0) AS has_customer,
               coalesce(sn.has_supplier, 0) AS has_supplier
        FROM cn FULL JOIN sn ON cn.nationkey = sn.nationkey
        ORDER BY nationkey
    """,
    "brand_quantity_band": f"""
        SELECT p.p_brand,
               count(*) AS n_items,
               {R("sum(l.l_quantity)")} AS sum_qty
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND l.l_quantity > p.p_size
        GROUP BY p.p_brand
        ORDER BY p.p_brand
    """,
    "region_status_grid": """
        SELECT r.r_name, s.o_orderstatus
        FROM region r
        CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
        ORDER BY r.r_name, s.o_orderstatus
    """,
}
