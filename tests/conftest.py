"""Shared fixtures: one local SparkSession per test session, a DuckDB
connection with the driver's view registration, and an oracle comparator
mimicking the driver's check (row count + schema + order-insensitive
value hash)."""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_toolbox_spark.session import TABLES, get_spark, table_path

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dts-tests", cpus="8", shuffle_partitions="8")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    """DuckDB connection with the same tables registered as views, as the
    driver does for oracle runs."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')"
        )
    yield con
    con.close()


def _canon_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # queries round explicitly; canonicalize trailing FP noise
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    """Order-insensitive canonical form: sort columns by name, stringify
    cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = ["|".join(_canon_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def compare_with_oracle(spark, ddb, query_fn, oracle: str, sf_dir: str = SF_DIR):
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = ddb.sql(oracle)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sc, dc = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
    mism = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mism, f"value mismatch ({len(mism)} rows), first: {mism[0]}"
