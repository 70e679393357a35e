"""Named-tool registry — the reference's YAML tool surface, natively.

A reference "tool" is name + description + parameter declarations + statement
(`/root/reference/images/redshift/redshift.yaml:11-42`,
`/root/reference/CONTRIBUTING.md:219-254`). The registry keeps the reference's
canonical tool names and signatures (`list_tables`, `execute_sql`,
`search_entries`, `run_snowflake_query`) so callers of the reference can
switch; each tool is a Python function over DataFrames rather than a SQL
template, and the single Spark engine replaces the per-engine "prebuilt"
profiles (SURVEY.md §2.A A7 — all profiles converge on this surface).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from database_toolbox_spark import catalog as _catalog
from database_toolbox_spark import executor as _executor


@dataclass(frozen=True)
class ToolParam:
    name: str
    type: str
    description: str
    required: bool = False


@dataclass(frozen=True)
class ToolSpec:
    name: str
    description: str
    fn: Callable[..., DataFrame]
    parameters: tuple[ToolParam, ...] = field(default_factory=tuple)

    def __call__(self, spark: SparkSession, **kwargs: Any) -> DataFrame:
        return self.fn(spark, **kwargs)


_REGISTRY: dict[str, ToolSpec] = {}


def register(spec: ToolSpec) -> ToolSpec:
    _REGISTRY[spec.name] = spec
    return spec


def get_tool(name: str) -> ToolSpec:
    return _REGISTRY[name]


def list_tools() -> list[ToolSpec]:
    """Registry listing — the `tools/list` surface
    (tests/postgres/test_mcp.py:74-92)."""
    return list(_REGISTRY.values())


def call_tool(spark: SparkSession, name: str, arguments: dict[str, Any] | None = None
              ) -> list[dict[str, str]]:
    """`tools/call` semantics: look up tool, bind arguments, execute, return
    MCP-shaped content (tests/postgres/test_mcp.py:121-153)."""
    df = get_tool(name)(spark, **(arguments or {}))
    return _executor.mcp_content(df)


# --- canonical toolset ------------------------------------------------------

register(
    ToolSpec(
        name="list_tables",
        description=(
            "Lists detailed schema information (schema, columns, position, "
            "type, nullability) for user tables; table_names is an optional "
            "CSV filter (images/redshift/redshift.yaml:11-42)."
        ),
        fn=lambda spark, table_names="": _catalog.list_tables(spark, table_names),
        parameters=(ToolParam("table_names", "string", "CSV of table names; empty = all"),),
    )
)

register(
    ToolSpec(
        name="list_table_names",
        description="Table names only (sqlite dialect, tests/sqlite/sqlite.yaml:7-24).",
        fn=lambda spark, table_names="": _catalog.list_table_names(spark, table_names),
        parameters=(ToolParam("table_names", "string", "CSV of table names; empty = all"),),
    )
)

register(
    ToolSpec(
        name="execute_sql",
        description=(
            "Execute an arbitrary read-only SQL statement "
            "(images/redshift/redshift.yaml:44-48) behind the statement-type "
            "permission gate."
        ),
        fn=lambda spark, sql: _executor.execute_sql(spark, sql),
        parameters=(ToolParam("sql", "string", "SQL statement", required=True),),
    )
)

register(
    ToolSpec(
        name="run_snowflake_query",
        description=(
            "Gated query execution; alias of execute_sql with the reference's "
            "snowflake statement-class gate "
            "(images/snowflake-mcp/entrypoint.sh:211-232)."
        ),
        fn=lambda spark, statement: _executor.execute_sql(spark, statement),
        parameters=(ToolParam("statement", "string", "SQL statement", required=True),),
    )
)

def _profile_tool(spark: SparkSession, table: str) -> DataFrame:
    from database_toolbox_spark.operators.profile import profile_table  # noqa: PLC0415

    return profile_table(spark, table)


register(
    ToolSpec(
        name="profile_table",
        description=(
            "Column-level data profile (rows, nulls, distincts) of any "
            "registered table — the data-quality companion to list_tables."
        ),
        fn=_profile_tool,
        parameters=(ToolParam("table", "string", "table/view name", required=True),),
    )
)

def _explain_tool(spark: SparkSession, sql: str, mode: str = "formatted") -> DataFrame:
    """EXPLAIN through the same gate as execution: the inner statement must
    itself be permitted (the reference's gate allows Explain as a class but
    never lets it smuggle a write; images/snowflake-mcp/entrypoint.sh:213)."""
    from database_toolbox_spark.gate import check  # noqa: PLC0415

    if mode not in ("simple", "extended", "formatted", "cost", "codegen"):
        raise ValueError(f"unknown explain mode {mode!r}")
    check(sql)
    return spark.sql(f"EXPLAIN {mode.upper()} {sql}")


register(
    ToolSpec(
        name="explain_query",
        description=(
            "Query-plan introspection: EXPLAIN (simple/extended/formatted/"
            "cost/codegen) of a gated statement — the warehouse EXPLAIN "
            "surface the reference exposes via passthrough."
        ),
        fn=_explain_tool,
        parameters=(
            ToolParam("sql", "string", "SQL statement to explain", required=True),
            ToolParam("mode", "string", "explain mode (default formatted)"),
        ),
    )
)

register(
    ToolSpec(
        name="search_entries",
        description=(
            "Catalog search with wildcard query and paging "
            "(dataplex_search_entries, tests/dataplex/test_mcp.py:160-189)."
        ),
        fn=lambda spark, query="*", page_size=10: _catalog.search_entries(
            spark, query, page_size
        ),
        parameters=(
            ToolParam("query", "string", "substring or * wildcard"),
            ToolParam("page_size", "int", "max entries returned"),
        ),
    )
)
