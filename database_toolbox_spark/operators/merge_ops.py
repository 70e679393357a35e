"""MERGE / CDC-style upsert emulation.

The reference *denies* MERGE at the tool surface
(`/root/reference/images/snowflake-mcp/entrypoint.sh:222`), but a data
pipeline still needs upsert semantics internally. Without a lakehouse format
(no Delta/Iceberg jars in this environment — SURVEY.md sources note), MERGE
INTO is emulated the classic way: anti-join the target against the change
keys, union the surviving rows with updated + inserted rows. One shuffle on
the merge key; at scale the change set is typically broadcastable.

The change batch here is derived deterministically from the data itself
(no RNG) so the oracle can replay the same merge in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_toolbox_spark.functions import money
from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_table


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emulated MERGE INTO orders:
    - WHEN MATCHED (status 'P'): price +10%, status → 'M'
    - WHEN NOT MATCHED (synthetic new keys = pending key + 10^9): insert
    Output: the merged table, aggregated per status for a compact check."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    pending = orders.filter(F.col("o_orderstatus") == "P")
    updates = pending.select(
        "o_orderkey",
        F.lit("M").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
    )
    inserts = pending.select(
        (F.col("o_orderkey") + 1_000_000_000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        F.col("o_totalprice"),
    )
    changes = updates.unionByName(inserts)
    untouched = orders.join(changes, "o_orderkey", "left_anti")
    merged = untouched.unionByName(changes)
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            money(F.sum("o_totalprice")).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


QUERIES = {"merge_upsert_orders": merge_upsert_orders}

ORACLE = {
    "merge_upsert_orders": f"""
        WITH target AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        ),
        updates AS (
            SELECT o_orderkey, 'M' AS o_orderstatus,
                   o_totalprice * 1.1 AS o_totalprice
            FROM target WHERE o_orderstatus = 'P'
        ),
        inserts AS (
            SELECT o_orderkey + 1000000000 AS o_orderkey,
                   'N' AS o_orderstatus, o_totalprice
            FROM target WHERE o_orderstatus = 'P'
        ),
        changes AS (
            SELECT * FROM updates UNION ALL SELECT * FROM inserts
        ),
        merged AS (
            SELECT t.* FROM target t
            WHERE NOT EXISTS (SELECT 1 FROM changes c
                              WHERE c.o_orderkey = t.o_orderkey)
            UNION ALL
            SELECT * FROM changes
        )
        SELECT o_orderstatus,
               count(*) AS n_orders,
               {R("sum(o_totalprice)")} AS sum_price
        FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
}
