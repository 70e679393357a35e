"""Partition pruning (SURVEY.md §4: static + dynamic partition pruning —
"none (only if we partition the testdata)" — here we do partition a copy).

A Hive-partitioned copy of `orders` (partitioned by o_orderstatus) is
written once per sf_dir under /tmp. Two pruning paths:

- static: a literal filter on the partition column → the scan lists only
  matching directories (PartitionFilters in the plan, asserted in
  tests/test_plans.py).
- dynamic (DPP): the partition filter arrives through a join with a small
  filtered dimension → Spark injects a runtime `dynamicpruning` subquery so
  only the surviving partitions are read. At 100 TB this is the difference
  between scanning one date partition and scanning the table.

Both are oracle-checked against the unpartitioned table: partitioning
changes I/O, never answers.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_toolbox_spark.functions import money
from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_table

_STATUS_DIM = [("O", "open"), ("F", "finished"), ("P", "pending")]


def ensure_partitioned_orders(spark: SparkSession, sf_dir: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"dts_part_orders_{tag}")
    if not os.path.isdir(path):
        (
            load_table(spark, sf_dir, "orders")
            .write.partitionBy("o_orderstatus")
            .mode("overwrite")
            .parquet(path)
        )
    return path


def partition_pruned_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static pruning: literal partition-column filter reads one directory."""
    path = ensure_partitioned_orders(spark, sf_dir)
    orders = spark.read.parquet(path)
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            money(F.sum("o_totalprice")).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


def dynamic_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the partition filter comes from a joined
    dimension filtered on a non-partition attribute."""
    path = ensure_partitioned_orders(spark, sf_dir)
    orders = spark.read.parquet(path)
    dim = spark.createDataFrame(_STATUS_DIM, "status string, label string")
    open_dim = F.broadcast(dim.filter(F.col("label") == "open"))
    return (
        orders.join(open_dim, orders.o_orderstatus == open_dim.status)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_orders"),
            money(F.sum("o_totalprice")).alias("sum_price"),
        )
        .orderBy("label")
    )


QUERIES = {
    "partition_pruned_totals": partition_pruned_totals,
    "dynamic_pruned_join": dynamic_pruned_join,
}

ORACLE = {
    "partition_pruned_totals": f"""
        SELECT o_orderpriority,
               count(*) AS n_orders,
               {R("sum(o_totalprice)")} AS sum_price
        FROM orders
        WHERE o_orderstatus = 'O'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "dynamic_pruned_join": f"""
        WITH dim(status, label) AS (
            VALUES ('O', 'open'), ('F', 'finished'), ('P', 'pending')
        )
        SELECT d.label,
               count(*) AS n_orders,
               {R("sum(o.o_totalprice)")} AS sum_price
        FROM orders o JOIN dim d ON o.o_orderstatus = d.status
        WHERE d.label = 'open'
        GROUP BY d.label
        ORDER BY d.label
    """,
}
