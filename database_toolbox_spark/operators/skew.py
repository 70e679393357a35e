"""Skew-mitigation patterns (the 100 TB hot-key strategy): two-phase salted
aggregation, plus AQE's skew-join handling which is enabled session-wide
(session.get_spark sets spark.sql.adaptive.skewJoin.enabled).

Salting splits each hot key across N partial groups (key, salt), aggregates
the partials in parallel, then re-aggregates by key — the partial shuffle
carries N small groups per hot key instead of one giant one. The salt is
derived from an existing column (event_id % N), so the result is
deterministic and the oracle is the plain single-phase aggregation:
salting changes the shuffle, never the answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_toolbox_spark.functions import money
from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_table

N_SALTS = 8


def salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event totals via two-phase salted aggregation. user_id is
    the fixture's hottest key (few users, many events) — the local stand-in
    for a power-law key at scale."""
    ev = load_table(spark, sf_dir, "events")
    phase1 = (
        ev.withColumn("salt", (F.col("event_id") % N_SALTS).cast("int"))
        .groupBy("user_id", "salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum("value").alias("psum"),
            F.max("value").alias("pmax"),
        )
    )
    return (
        phase1.groupBy("user_id")
        .agg(
            F.sum("pn").alias("n_events"),
            money(F.sum("psum")).alias("sum_value"),
            money(F.max("pmax")).alias("max_value"),
        )
        .orderBy("user_id")
    )


QUERIES = {"salted_user_totals": salted_user_totals}

ORACLE = {
    # salting must not change answers: plain single-phase aggregation
    "salted_user_totals": f"""
        SELECT user_id,
               count(*)           AS n_events,
               {R("sum(value)")}  AS sum_value,
               {R("max(value)")}  AS max_value
        FROM events GROUP BY user_id ORDER BY user_id
    """,
}
