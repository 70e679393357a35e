"""Multi-dimensional grouping (SURVEY.md §2.B: grouping sets / cube / rollup
[implied] — all wrapped warehouses support them) plus pivot and approximate
aggregates.

Approximate aggregates (approx_count_distinct / percentile_approx) use
engine-specific sketches whose raw outputs legitimately differ between
engines, so the oracle-checked contract is an accuracy bound: the query
emits the exact value together with a within-tolerance flag; both engines
must agree the sketch is within 2–5%."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_toolbox_spark.functions import money
from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_table, load_tables


def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping combinations."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            money(F.sum("o_totalprice")).alias("sum_price"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: by (flag, status), by flag, grand total —
    with GROUPING() markers to disambiguate NULL group keys."""
    load_tables(spark, sf_dir)
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT)  AS g_flag,
               CAST(grouping(l_linestatus) AS INT)  AS g_status,
               count(*) AS n,
               {R("sum(l_quantity)")} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY l_returnflag, l_linestatus
    """)


def pivot_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per market segment × order status. Oracle uses
    conditional aggregation (the engine-independent spelling)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0)
        .orderBy("c_mktsegment")
    )


def approx_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct vs exact: emits the exact count plus a flag
    that the HLL sketch landed within 5% (the cross-engine contract)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("exact_customers"),
            F.approx_count_distinct("o_custkey").alias("_approx"),
        )
        .select(
            "c_mktsegment",
            "exact_customers",
            (
                (
                    F.abs(F.col("_approx") - F.col("exact_customers"))
                    / F.col("exact_customers")
                )
                <= 0.05
            )
            .cast("int")
            .alias("approx_within_5pct"),
        )
        .orderBy("c_mktsegment")
    )


# Exact global rank of every order by (o_totalprice ASC, o_orderkey) WITHOUT
# a corpus-wide window: monotone price bins → per-bin counts → broadcast
# triangular offsets → PARTITIONed per-bin row_number (the ASC twin of
# windows._two_pass_rank_ctes; equal prices share a bin so the o_orderkey
# tie-break stays partition-local). Exposes `ranked(o_totalprice, rn, n)` —
# drop-in for the `row_number() OVER (ORDER BY ...)` + `count(*) OVER ()`
# spelling the oracles keep.
RANKED_ORDERS_TWO_PASS = """
        cnt AS (SELECT count(*) AS n FROM orders),
        b AS (
            SELECT o_totalprice, o_orderkey,
                   CAST(floor(o_totalprice / 25000e0) AS BIGINT) AS bin
            FROM orders
        ),
        t AS (SELECT bin, count(*) AS c FROM b GROUP BY bin),
        o AS (
            SELECT a.bin, CAST(coalesce(sum(x.c), 0) AS BIGINT) AS off
            FROM t a LEFT JOIN t x ON x.bin < a.bin GROUP BY a.bin
        ),
        ranked AS (
            SELECT b.o_totalprice,
                   o.off + row_number() OVER (PARTITION BY b.bin
                       ORDER BY b.o_totalprice, b.o_orderkey) AS rn,
                   n
            FROM b JOIN o ON b.bin = o.bin CROSS JOIN cnt
        )
"""


def approx_percentile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx vs a canon-rounded exact median computed as the
    mean of the two middle order statistics (engine-neutral definition);
    flag = sketch within 2% of exact. Exact ranks come from the two-pass
    rewrite (RANKED_ORDERS_TWO_PASS) — no corpus-wide window."""
    load_tables(spark, sf_dir)
    return spark.sql(f"""
        WITH {RANKED_ORDERS_TWO_PASS},
        exact AS (
            SELECT {R("avg(o_totalprice)")} AS exact_median
            FROM ranked
            WHERE rn IN (CAST((n + 1) / 2 AS INT), CAST((n + 2) / 2 AS INT))
        ),
        approx AS (
            SELECT approx_percentile(o_totalprice, 0.5e0) AS m FROM orders
        )
        SELECT exact.exact_median,
               CAST(abs(approx.m - exact.exact_median) / exact.exact_median
                    <= 0.02e0 AS INT) AS approx_within_2pct
        FROM exact CROSS JOIN approx
    """)


def unpivot_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT via stack(): widen order counts per segment×status, then melt
    back to long form (the pivot/unpivot round-trip)."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        WITH wide AS (
            SELECT c.c_mktsegment,
                   sum(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS f_cnt,
                   sum(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS o_cnt,
                   sum(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS p_cnt
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        )
        SELECT c_mktsegment, status, cnt
        FROM wide
        LATERAL VIEW stack(3, 'F', f_cnt, 'O', o_cnt, 'P', p_cnt) AS status, cnt
        ORDER BY c_mktsegment, status
    """)


def modal_priority_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE: most frequent order priority per segment with a
    fixed (count desc, value asc) tie-break — engine mode() functions break
    ties arbitrarily, so the portable form is count+rank."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        WITH counts AS (
            SELECT c.c_mktsegment, o.o_orderpriority, count(*) AS n
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment, o.o_orderpriority
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                        ORDER BY n DESC, o_orderpriority) AS rn
            FROM counts
        )
        SELECT c_mktsegment, o_orderpriority AS modal_priority, n
        FROM ranked WHERE rn = 1 ORDER BY c_mktsegment
    """)


def bitagg_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (bit_and / bit_or / bit_xor) per order status."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderstatus,
               bit_and(o_orderkey % 256) AS band,
               bit_or(o_orderkey % 256)  AS bor,
               bit_xor(o_orderkey % 256) AS bxor
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """)


_FILTERED_AGG_SQL = f"""
        SELECT o_orderstatus,
               any_value(o_orderstatus) AS status_again,
               count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                   AS n_urgent,
               {R("sum(o_totalprice) FILTER (WHERE year(o_orderdate) = 1997)")}
                   AS rev_1997,
               bool_and(o_totalprice > 900e0) AS all_above_900,
               bool_or(o_totalprice > 400000e0) AS any_above_400k
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
"""


def filtered_aggregate_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER (WHERE …) aggregate modifiers + bool_and/bool_or/any_value —
    the conditional-aggregation surface of every wrapped warehouse
    (SURVEY.md §2.B aggregations [implied]); one scan, each aggregate keeps
    its own predicate map-side. any_value is grouped on a functionally-
    dependent column so it stays deterministic. Identical SQL both engines."""
    load_tables(spark, sf_dir)
    return spark.sql(_FILTERED_AGG_SQL)


QUERIES = {
    "filtered_aggregate_battery": filtered_aggregate_battery,
    "cube_status_priority": cube_status_priority,
    "unpivot_segment_counts": unpivot_segment_counts,
    "modal_priority_per_segment": modal_priority_per_segment,
    "bitagg_battery": bitagg_battery,
    "grouping_sets_revenue": grouping_sets_revenue,
    "pivot_segment_status": pivot_segment_status,
    "approx_distinct_check": approx_distinct_check,
    "approx_percentile_check": approx_percentile_check,
}

ORACLE = {
    "filtered_aggregate_battery": _FILTERED_AGG_SQL,
    "unpivot_segment_counts": """
        WITH wide AS (
            SELECT c.c_mktsegment,
                   sum(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS f_cnt,
                   sum(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS o_cnt,
                   sum(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS p_cnt
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        )
        SELECT c_mktsegment, status, CAST(cnt AS BIGINT) AS cnt
        FROM wide
        UNPIVOT (cnt FOR status IN (f_cnt AS 'F', o_cnt AS 'O', p_cnt AS 'P'))
        ORDER BY c_mktsegment, status
    """,
    "modal_priority_per_segment": """
        WITH counts AS (
            SELECT c.c_mktsegment, o.o_orderpriority, count(*) AS n
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment, o.o_orderpriority
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                        ORDER BY n DESC, o_orderpriority) AS rn
            FROM counts
        )
        SELECT c_mktsegment, o_orderpriority AS modal_priority, n
        FROM ranked WHERE rn = 1 ORDER BY c_mktsegment
    """,
    "bitagg_battery": """
        SELECT o_orderstatus,
               bit_and(o_orderkey % 256) AS band,
               bit_or(o_orderkey % 256)  AS bor,
               bit_xor(o_orderkey % 256) AS bxor
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "cube_status_priority": f"""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               {R("sum(o_totalprice)")} AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus, o_orderpriority
    """,
    "grouping_sets_revenue": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT)  AS g_flag,
               CAST(grouping(l_linestatus) AS INT)  AS g_status,
               count(*) AS n,
               {R("sum(l_quantity)")} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY l_returnflag, l_linestatus
    """,
    "pivot_segment_status": """
        -- count(*) FILTER stays BIGINT; sum(CASE...) would be HUGEINT in
        -- DuckDB and hash-mismatch Spark's long counts via pandas float64
        SELECT c.c_mktsegment,
               count(*) FILTER (WHERE o.o_orderstatus = 'F') AS "F",
               count(*) FILTER (WHERE o.o_orderstatus = 'O') AS "O",
               count(*) FILTER (WHERE o.o_orderstatus = 'P') AS "P"
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """,
    "approx_distinct_check": """
        SELECT c.c_mktsegment,
               count(DISTINCT o.o_custkey) AS exact_customers,
               CAST(abs(approx_count_distinct(o.o_custkey)
                        - count(DISTINCT o.o_custkey)) * 1e0
                    / count(DISTINCT o.o_custkey) <= 0.05e0 AS INT)
                   AS approx_within_5pct
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """,
    "approx_percentile_check": f"""
        WITH ranked AS (
            SELECT o_totalprice,
                   row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
                   count(*) OVER () AS n
            FROM orders
        ),
        exact AS (
            SELECT {R("avg(o_totalprice)")} AS exact_median
            FROM ranked
            WHERE rn IN (CAST((n + 1) // 2 AS INT), CAST((n + 2) // 2 AS INT))
        ),
        approx AS (
            SELECT approx_quantile(o_totalprice, 0.5) AS m FROM orders
        )
        SELECT exact.exact_median,
               CAST(abs(approx.m - exact.exact_median) / exact.exact_median
                    <= 0.02e0 AS INT) AS approx_within_2pct
        FROM exact CROSS JOIN approx
    """,
}


_GROUP_BY_ALL_SQL = f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           {R("sum(o_totalprice)")} AS sum_price
    FROM orders
    GROUP BY ALL
    ORDER BY o_orderstatus, o_orderpriority
"""


def group_by_all_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 4 + DuckDB share the modern shorthand: every
    non-aggregate select item becomes a grouping key) — byte-identical
    SQL on both engines; the plan is the ordinary partial/final hash
    aggregate, proving the sugar changes nothing physical."""
    load_tables(spark, sf_dir)
    return spark.sql(_GROUP_BY_ALL_SQL)


QUERIES["group_by_all_battery"] = group_by_all_battery
ORACLE["group_by_all_battery"] = _GROUP_BY_ALL_SQL
