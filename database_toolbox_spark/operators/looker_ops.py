"""Registry queries for the Looker semantic-layer toolset (looker.py):
every saved look runs through the real query compiler and is oracle-checked
against the same compiled SQL inlined for DuckDB — so the compiler itself
(field resolution, filter binding, grouping, ordering) is under the
correctness gate, not just the individual looks."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from database_toolbox_spark import looker


def _mk(look_id: int):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return looker.run_look(spark, sf_dir, look_id)

    run.__name__ = f"look_{look_id}"
    return run


QUERIES = {
    "look_revenue_by_nation": _mk(1),
    "look_building_orders_by_year": _mk(2),
    "look_lineitem_flag_status": _mk(3),
    "look_daily_event_value": _mk(4),
}

ORACLE = {
    "look_revenue_by_nation": looker.look_oracle_sql(1),
    "look_building_orders_by_year": looker.look_oracle_sql(2),
    "look_lineitem_flag_status": looker.look_oracle_sql(3),
    "look_daily_event_value": looker.look_oracle_sql(4),
}
