"""Subquery battery (SURVEY.md §2.B — subquery decorrelation is listed in §4
as a Catalyst-provided capability; these queries exercise it end-to-end:
scalar subqueries, correlated scalar subqueries, IN / NOT IN, EXISTS, and
HAVING).

Scale notes: Catalyst rewrites the correlated scalar subquery into an
aggregate + join (RewriteCorrelatedScalarSubquery) and IN/EXISTS into
semi/anti joins — no per-row re-execution anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_tables


def above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global average price."""
    load_tables(spark, sf_dir)
    return spark.sql(f"""
        SELECT o_orderkey, {R("o_totalprice")} AS price
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5e0 FROM orders)
        ORDER BY o_orderkey
    """)


def above_nation_avg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers richer than their nation's
    average balance (Catalyst decorrelates into agg+join)."""
    load_tables(spark, sf_dir)
    return spark.sql(f"""
        SELECT c_custkey, c_nationkey, {R("c_acctbal")} AS acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey
    """)


def urgent_order_customers_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery (→ left-semi join)."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_orderpriority = '1-URGENT')
        ORDER BY c_custkey
    """)


def no_cheap_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS (→ left-anti join): customers with orders but none under
    10k."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        SELECT c_custkey
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice < 10000)
        ORDER BY c_custkey
    """)


def busy_months_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING over a grouped aggregate."""
    load_tables(spark, sf_dir)
    return spark.sql(f"""
        SELECT date_format(o_orderdate, 'yyyy-MM') AS ym,
               count(*) AS n_orders,
               {R("sum(o_totalprice)")} AS sum_price
        FROM orders
        GROUP BY date_format(o_orderdate, 'yyyy-MM')
        HAVING count(*) > 150
        ORDER BY ym
    """)


_LATERAL_SQL = """
        SELECT n.n_name, x.c_custkey, x.c_name, x.bal
        FROM nation n, LATERAL (
            SELECT c_custkey, c_name,
                   floor(c_acctbal * 100 + 0.501e0) / 100e0 AS bal
            FROM customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 3
        ) x
        ORDER BY n.n_name, x.bal DESC, x.c_custkey
"""


def lateral_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT: top-3
    customers by balance per nation. Catalyst decorrelates the lateral into
    a ranked join (no per-row re-scan); identical SQL runs on both engines
    (SURVEY.md §2.B subqueries [implied])."""
    load_tables(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


QUERIES = {
    "above_avg_orders": above_avg_orders,
    "above_nation_avg_customers": above_nation_avg_customers,
    "urgent_order_customers_in": urgent_order_customers_in,
    "no_cheap_order_customers": no_cheap_order_customers,
    "busy_months_having": busy_months_having,
    "lateral_top_customers": lateral_top_customers,
}

ORACLE = {
    "above_avg_orders": f"""
        SELECT o_orderkey, {R("o_totalprice")} AS price
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5e0 FROM orders)
        ORDER BY o_orderkey
    """,
    "above_nation_avg_customers": f"""
        SELECT c_custkey, c_nationkey, {R("c_acctbal")} AS acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey
    """,
    "urgent_order_customers_in": """
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_orderpriority = '1-URGENT')
        ORDER BY c_custkey
    """,
    "no_cheap_order_customers": """
        SELECT c_custkey
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice < 10000)
        ORDER BY c_custkey
    """,
    "busy_months_having": f"""
        SELECT strftime(o_orderdate, '%Y-%m') AS ym,
               count(*) AS n_orders,
               {R("sum(o_totalprice)")} AS sum_price
        FROM orders
        GROUP BY strftime(o_orderdate, '%Y-%m')
        HAVING count(*) > 150
        ORDER BY ym
    """,
    # identical dialect-neutral SQL on both engines
    "lateral_top_customers": _LATERAL_SQL,
}
