"""Incremental view maintenance (IVM) — keep a materialized analytic view
current by merging deltas instead of recomputing from scratch.

The reference's warehouses all expose materialized views refreshed
incrementally (standard capability of the wrapped engines; SURVEY.md §2.B
passthrough). On Spark the same algebra is explicit and composable:

- **Self-maintainable aggregates** (insert-only): SUM/COUNT/MIN/MAX merge by
  re-aggregating partial states; AVG is maintained as SUM/COUNT and finalized
  at read. This is exactly Spark's partial→final aggregation contract, applied
  across *batches* instead of across *partitions*.
- **Join views**: for an insert-only fact delta ΔR against a stable dimension
  S, ΔV = ΔR ⋈ S — only the delta is scanned and joined, then merged into the
  view by re-aggregation.

Each query computes base state (history) and delta (new arrivals) separately,
merges them, and the DuckDB oracle computes the view from the FULL input —
hash-equality proves the incremental path reproduces the full recompute.

Scale notes (100 TB design): the base state is read pre-aggregated (in
production: the stored view), so per-refresh cost is O(Δ) not O(history);
partial states merge per group key with one shuffle at view granularity —
the same plan Structured Streaming's incremental execution produces for a
streaming aggregation, expressed in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_toolbox_spark.functions import (
    bounded_rank_window,
    disc_price,
    money,
    ratio,
    ts,
)
from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_table

SPLIT = "1999-01-01"
_DISC = "l_extendedprice * (1 - l_discount)"


def _monthly_partial(df: DataFrame) -> DataFrame:
    """Partial aggregate state per (returnflag, ship month): the merge-able
    representation (sums + counts + min/max, no finalized averages)."""
    return df.groupBy(
        "l_returnflag", F.date_trunc("month", "l_shipdate").alias("ship_month")
    ).agg(
        F.sum(disc_price()).alias("p_revenue"),
        F.count("*").alias("p_count"),
        F.sum("l_quantity").alias("p_qty"),
        F.min("l_extendedprice").alias("p_min_price"),
        F.max("l_extendedprice").alias("p_max_price"),
    )


def ivm_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-view maintenance: history state ⊕ delta state, finalized.

    base = shipments before SPLIT (the stored view's state), delta = arrivals
    after. The merge re-aggregates partial states; AVG finalizes as SUM/COUNT.
    The oracle computes the same view from the full table — equality is the
    IVM correctness proof."""
    li = load_table(spark, sf_dir, "lineitem")
    base = _monthly_partial(li.filter(F.col("l_shipdate") < ts(SPLIT)))
    delta = _monthly_partial(li.filter(F.col("l_shipdate") >= ts(SPLIT)))
    merged = (
        base.unionByName(delta)
        .groupBy("l_returnflag", "ship_month")
        .agg(
            F.sum("p_revenue").alias("m_revenue"),
            F.sum("p_count").alias("n_items"),
            F.sum("p_qty").alias("m_qty"),
            F.min("p_min_price").alias("m_min"),
            F.max("p_max_price").alias("m_max"),
        )
    )
    return merged.select(
        "l_returnflag",
        F.col("ship_month").cast("date").alias("ship_month"),
        money(F.col("m_revenue")).alias("revenue"),
        F.col("n_items"),
        ratio(F.col("m_qty") / F.col("n_items")).alias("avg_qty"),
        money(F.col("m_min")).alias("min_price"),
        money(F.col("m_max")).alias("max_price"),
    ).orderBy("l_returnflag", "ship_month")


def ivm_join_view_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-view maintenance: V = orders ⋈ customer aggregated per segment.

    ΔV = Δorders ⋈ customer (dimension stable, fact insert-only) — only the
    delta rows are joined; merge is re-aggregation of partial (sum, count)
    states at segment granularity."""
    cust = F.broadcast(load_table(spark, sf_dir, "customer"))
    orders = load_table(spark, sf_dir, "orders")

    def view_state(o: DataFrame) -> DataFrame:
        return (
            o.join(cust, o.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.sum("o_totalprice").alias("p_total"),
                F.count("*").alias("p_n"),
            )
        )

    base = view_state(orders.filter(F.col("o_orderdate") < ts(SPLIT)))
    delta = view_state(orders.filter(F.col("o_orderdate") >= ts(SPLIT)))
    return (
        base.unionByName(delta)
        .groupBy("c_mktsegment")
        .agg(
            money(F.sum("p_total")).alias("total_price"),
            F.sum("p_n").alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


def ivm_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) is NOT self-maintainable from counts — the view keeps
    the distinct key set (here: re-aggregated per batch, merged by set
    union via re-distinct). Demonstrates the correct maintenance strategy for
    non-distributive aggregates at scale: maintain the auxiliary set,
    finalize the count."""
    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders.filter(F.col("o_orderdate") < ts(SPLIT))
        .select("o_orderpriority", "o_custkey")
        .distinct()
    )
    delta = (
        orders.filter(F.col("o_orderdate") >= ts(SPLIT))
        .select("o_orderpriority", "o_custkey")
        .distinct()
    )
    return (
        base.unionByName(delta)
        .distinct()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_distinct_customers"))
        .orderBy("o_orderpriority")
    )


TOPK_K = 10


def ivm_topk_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k view maintenance under insert-only deltas: the stored view
    keeps only the current top-K rows; on a delta batch, the new view is
    top-K of (stored top-K UNION top-K(delta)) — a 2K-row merge, never a
    base-table rescan. Sound because insert-only deltas can only push
    rows OUT of the top-K, and any new entrant must rank in the delta's
    own top-K (deletes would need the K+1.. ladder, i.e. a different
    auxiliary state — documented limit, matching the self-maintainability
    taxonomy the aggregate views above follow).

    Scale shape: each arm is a TakeOrderedAndProject (K rows cross the
    wire per partition); the merge re-ranks 2K rows. The oracle is the
    full-table top-K — equality is the maintenance-correctness proof."""
    orders = load_table(spark, sf_dir, "orders")
    key = [F.col("o_totalprice").desc(), F.col("o_orderkey")]

    def topk(df: DataFrame) -> DataFrame:
        return df.select("o_orderkey", "o_totalprice").orderBy(*key).limit(
            TOPK_K
        )

    base = topk(orders.filter(F.col("o_orderdate") < ts(SPLIT)))
    delta = topk(orders.filter(F.col("o_orderdate") >= ts(SPLIT)))
    merged = topk(base.unionByName(delta))
    w = bounded_rank_window(
        F.col("o_orderkey"), F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return merged.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "o_orderkey",
        money(F.col("o_totalprice")).alias("price"),
    ).orderBy("rank")


QUERIES = {
    "ivm_monthly_revenue": ivm_monthly_revenue,
    "ivm_topk_maintenance": ivm_topk_maintenance,
    "ivm_join_view_delta": ivm_join_view_delta,
    "ivm_distinct_merge": ivm_distinct_merge,
}

ORACLE = {
    "ivm_topk_maintenance": f"""
        SELECT CAST(row_number() OVER (
                   ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank,
               o_orderkey,
               {R("o_totalprice")} AS price
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT {TOPK_K}
    """,
    # full recompute — the incremental path must reproduce it exactly
    "ivm_monthly_revenue": f"""
        SELECT l_returnflag,
               CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
               {R(f"sum({_DISC})")} AS revenue,
               count(*) AS n_items,
               {R("sum(l_quantity) / count(*)", 4)} AS avg_qty,
               {R("min(l_extendedprice)")} AS min_price,
               {R("max(l_extendedprice)")} AS max_price
        FROM lineitem
        GROUP BY l_returnflag, CAST(date_trunc('month', l_shipdate) AS DATE)
        ORDER BY l_returnflag, ship_month
    """,
    "ivm_join_view_delta": f"""
        SELECT c.c_mktsegment,
               {R("sum(o.o_totalprice)")} AS total_price,
               count(*) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """,
    "ivm_distinct_merge": """
        SELECT o_orderpriority,
               count(DISTINCT o_custkey) AS n_distinct_customers
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
}


DEL_SPLIT = "1998-06-01"  # orders from here on are "deleted" by the delta


def ivm_counting_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT-view maintenance under DELETES via the counting algorithm
    (Gupta/Mumick/Subrahmanian, SIGMOD 1993): the stored auxiliary state
    is the multiplicity m of every (custkey, status) pair; a delete delta
    arrives as the same aggregate with NEGATIVE counts; merge = sum of
    multiplicities, and a pair stays in the view while m > 0. This is the
    delete-side capability ivm_topk_maintenance documents as needing
    different auxiliary state — counts make distinct/joins
    self-maintainable under deletion, no base rescan.

    The driver comparison IS the maintenance proof: the Spark side never
    reads the post-{DEL_SPLIT} remainder directly (it folds base state +
    negative delta), while the DuckDB oracle recomputes the view from the
    filtered base table — hash-equality means maintained == recomputed.

    Scale shape: base state and delta are map-combinable grouped counts;
    the merge shuffles only aggregate rows (pair cardinality, not row
    count); the final rollup is by status."""
    orders = load_table(spark, sf_dir, "orders")
    keys = ["o_custkey", "o_orderstatus"]
    base = orders.groupBy(*keys).agg(F.count("*").alias("m"))
    delta = (
        orders.filter(F.col("o_orderdate") >= ts(DEL_SPLIT))
        .groupBy(*keys)
        .agg((-F.count("*")).alias("m"))
    )
    maintained = (
        base.unionByName(delta)
        .groupBy(*keys)
        .agg(F.sum("m").alias("m"))
        .filter(F.col("m") > 0)
    )
    return (
        maintained.groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("m").cast("bigint").alias("n_rows"),
        )
        .orderBy("o_orderstatus")
    )


QUERIES["ivm_counting_deletes"] = ivm_counting_deletes
ORACLE["ivm_counting_deletes"] = f"""
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_pairs,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM orders
    WHERE o_orderdate < TIMESTAMP '{DEL_SPLIT} 00:00:00'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""
