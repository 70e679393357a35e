"""Bucketed co-located join (SURVEY.md §2.B Joins; the 100 TB shuffle-
elimination strategy).

At scale, the fact⋈fact join (lineitem⋈orders on orderkey) is the dominant
shuffle. Bucketing both tables on the join key at write time
(`bucketBy(N, key)` + `sortBy`) lets a later sort-merge join read
co-located buckets with NO exchange on either side — the plan-quality test
asserts the absence of Exchange operators (tests/test_plans.py).

The bucketed copies are external tables written once per sf_dir under /tmp
(the source testdata is read-only); results are oracle-identical to the
plain join, which is exactly the point — bucketing changes the plan, never
the answer.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_toolbox_spark.functions import disc_price, money
from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_table

N_BUCKETS = 8


def _tag(sf_dir: str) -> str:
    return hashlib.md5(sf_dir.encode()).hexdigest()[:8]


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write lineitem/orders bucketed by the join key (once per sf_dir)."""
    tag = _tag(sf_dir)
    li_name, o_name = f"bkt_lineitem_{tag}", f"bkt_orders_{tag}"
    base = os.path.join(tempfile.gettempdir(), f"dts_buckets_{tag}")
    for name, table, key in (
        (li_name, "lineitem", "l_orderkey"),
        (o_name, "orders", "o_orderkey"),
    ):
        if not spark.catalog.tableExists(name):
            (
                load_table(spark, sf_dir, table)
                .write.bucketBy(N_BUCKETS, key)
                .sortBy(key)
                .option("path", os.path.join(base, name))
                .mode("overwrite")
                .saveAsTable(name)
            )
    return li_name, o_name


def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact join over bucketed tables: revenue per order priority.
    The merge hint forces sort-merge so bucketing (not a broadcast) carries
    the join — zero exchanges on the fact sides."""
    li_name, o_name = ensure_bucketed_tables(spark, sf_dir)
    li = spark.table(li_name)
    orders = spark.table(o_name)
    return (
        li.hint("merge")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            money(F.sum(disc_price())).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


QUERIES = {"bucketed_join_revenue": bucketed_join_revenue}

ORACLE = {
    # bucketing must not change answers: the oracle is the plain join
    "bucketed_join_revenue": f"""
        SELECT o.o_orderpriority,
               count(*) AS n_items,
               {R("sum(l.l_extendedprice * (1 - l.l_discount))")} AS revenue
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
}
