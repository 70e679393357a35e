"""Catalog tools as correctness-gate queries.

`list_tables` is the reference's most-exercised tool
(`/root/reference/images/redshift/redshift.yaml:11-42`). The oracle-checked
projection is (table_name, column_name, column_position) — names and ordering
are engine-independent, whereas type-name spellings (Spark "bigint" vs DuckDB
"BIGINT") are not; the full 7-column contract shape is covered by unit tests
in tests/test_catalog.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from database_toolbox_spark.catalog import list_tables
from database_toolbox_spark.session import TABLES, load_tables


def catalog_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return list_tables(spark, table_names=",".join(TABLES)).select(
        "table_name", "column_name", "column_position"
    )


_TABLE_LIST = ", ".join(f"'{t}'" for t in TABLES)

QUERIES = {"catalog_columns": catalog_columns}

ORACLE = {
    "catalog_columns": f"""
        SELECT table_name, column_name,
               CAST(ordinal_position AS INT) AS column_position
        FROM information_schema.columns
        WHERE table_name IN ({_TABLE_LIST})
        ORDER BY table_name, column_position
    """,
}
