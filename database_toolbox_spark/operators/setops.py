"""Set-operation battery (SURVEY.md §2.B Set operations — [implied]
passthrough: UNION / UNION ALL / INTERSECT / EXCEPT are standard in every
wrapped engine). Spark: union/unionByName + distinct, intersect, exceptAll.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_toolbox_spark.functions import money
from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_table


def priority_order_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL keeping duplicates, with a source tag column."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.lit("urgent").alias("src"), money(F.col("o_totalprice")).alias("price")
    )
    high = orders.filter(F.col("o_orderpriority") == "2-HIGH").select(
        "o_orderkey", F.lit("high").alias("src"), money(F.col("o_totalprice")).alias("price")
    )
    return urgent.unionByName(high).orderBy("o_orderkey", "src")


def active_nation_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): nations that have customers or suppliers."""
    cn = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    sn = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cn.union(sn).distinct().orderBy("nationkey")


def dual_presence_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations with both customers and suppliers."""
    cn = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    sn = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cn.intersect(sn).orderBy("nationkey")


def rich_non_building_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers with balance > 5000 minus the BUILDING segment."""
    cust = load_table(spark, sf_dir, "customer")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return rich.exceptAll(building).orderBy("c_custkey")


def repeat_customer_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset): each customer appears min(n_1996, n_1997)
    times — the bag semantics UNION ALL/EXCEPT ALL complete."""
    orders = load_table(spark, sf_dir, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return y96.intersectAll(y97).orderBy("o_custkey")


QUERIES = {
    "priority_order_union_all": priority_order_union_all,
    "repeat_customer_intersect_all": repeat_customer_intersect_all,
    "active_nation_union": active_nation_union,
    "dual_presence_intersect": dual_presence_intersect,
    "rich_non_building_except": rich_non_building_except,
}

ORACLE = {
    "priority_order_union_all": f"""
        SELECT o_orderkey, 'urgent' AS src, {R("o_totalprice")} AS price
        FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT o_orderkey, 'high' AS src, {R("o_totalprice")} AS price
        FROM orders WHERE o_orderpriority = '2-HIGH'
        ORDER BY o_orderkey, src
    """,
    "repeat_customer_intersect_all": """
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        ORDER BY o_custkey
    """,
    "active_nation_union": """
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey FROM supplier
        ORDER BY nationkey
    """,
    "dual_presence_intersect": """
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey FROM supplier
        ORDER BY nationkey
    """,
    "rich_non_building_except": """
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        EXCEPT ALL
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        ORDER BY c_custkey
    """,
}
