"""Gated SQL execution + the row-as-JSON result contract.

The reference's `execute_sql` is arbitrary-SQL passthrough
(`/root/reference/images/redshift/redshift.yaml:44-48`,
`/root/reference/tests/sqlite/sqlite.yaml:26-34`) and `run_snowflake_query`
is the same behind the statement-type gate
(`/root/reference/tests/snowflake/test_mcp.py:820-849`). Results surface as
one JSON object per row in MCP `result.content`
(`/root/reference/tests/redshift/example_usage.py:54-65`).

Here the engine is Spark SQL: gate → `spark.sql` → Catalyst/Tungsten.
Parameter binding (the reference's three modes: `$1` positional, `:name`
named, `{{sql}}` raw template — SURVEY.md §3) collapses to Spark's native
parameterized SQL `spark.sql(stmt, args=...)`.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from database_toolbox_spark.gate import check


def execute_sql(
    spark: SparkSession, sql: str, args: dict[str, Any] | list[Any] | None = None
) -> DataFrame:
    """Run a statement after the permission gate; raises StatementDenied for
    write/DDL/unknown statement classes (default-deny, SURVEY.md §2.C)."""
    check(sql)
    if args:
        return spark.sql(sql, args=args)
    return spark.sql(sql)


def rows_as_json(df: DataFrame, limit: int | None = None) -> list[str]:
    """Serialize a result as one JSON string per row — the reference's result
    contract (tests/redshift/example_usage.py:54-65: clients json.loads each
    content item). `df.toJSON()` serializes executor-side; only the final
    strings are collected. `limit` caps driver memory for interactive use."""
    if limit is not None:
        df = df.limit(limit)
    return df.toJSON().collect()


def mcp_content(df: DataFrame, limit: int | None = None) -> list[dict[str, str]]:
    """MCP `result.content` shape: a list of {"type": "text", "text": <row
    JSON>} items, one per row (tests/postgres/test_mcp.py:143-153)."""
    return [{"type": "text", "text": row} for row in rows_as_json(df, limit=limit)]


DEFAULT_MAX_TOOL_ROWS = 10_000


def max_tool_rows() -> int:
    """Row cap for the tool-call surface; SPARK_GRAFT_MAX_TOOL_ROWS
    overrides, 0 disables."""
    import os

    return int(os.environ.get("SPARK_GRAFT_MAX_TOOL_ROWS", DEFAULT_MAX_TOOL_ROWS))


def capped_mcp_content(
    df: DataFrame, max_rows: int | None = None
) -> list[dict[str, str]]:
    """`mcp_content` with driver-memory insurance: at most `max_rows` row
    items are collected (fetching max_rows+1 detects overflow without a
    count job); a trailing `{"truncated": true, "max_rows": N}` item flags
    the cut, mirroring `isError`-style signaling. The cap protects the
    driver from `SELECT * FROM lineitem` arriving over MCP — the plan
    itself stays distributed (`df.limit` executes executor-side)."""
    n = max_tool_rows() if max_rows is None else max_rows
    if n <= 0:
        return mcp_content(df)
    rows = rows_as_json(df, limit=n + 1)
    content = [{"type": "text", "text": row} for row in rows[:n]]
    if len(rows) > n:
        content.append(
            {
                "type": "text",
                "text": json.dumps({"truncated": True, "max_rows": n}),
            }
        )
    return content


def scalar(df: DataFrame) -> Any:
    """First column of the first row (for `SELECT 1 AS one`-style probes,
    tests/bigquery/test_mcp.py:175)."""
    row = df.first()
    return None if row is None else row[0]


def result_payload(df: DataFrame, limit: int | None = None) -> str:
    """Whole result as a single JSON document (convenience beyond the
    reference's per-row contract)."""
    return json.dumps([json.loads(r) for r in rows_as_json(df, limit=limit)])
