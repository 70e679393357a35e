"""MCP-style stdio JSON-RPC server loop (SURVEY.md §2.A A8).

The reference's transport is line-delimited JSON-RPC 2.0 over stdin/stdout
(`/root/reference/tests/postgres/test_mcp.py:50-117`): `initialize` →
`tools/list` → `tools/call`. This is a thin driver loop around the tool
registry — deliberately not a Spark concern; it exists so a client of the
reference can speak the same protocol to this engine.

Result contract: each row is one `{"type": "text", "text": <row JSON>}`
content item (`tests/redshift/example_usage.py:54-65`); tool errors surface
as `result.isError` (`tests/snowflake/test_mcp.py:849`).
"""

from __future__ import annotations

import json
import sys
from typing import Any, TextIO

from pyspark.sql import SparkSession

from database_toolbox_spark import registry

PROTOCOL_VERSION = "2024-11-05"
SERVER_INFO = {"name": "database-toolbox-spark", "version": "0.1.0"}


def _tool_schema(spec: registry.ToolSpec) -> dict[str, Any]:
    props = {
        p.name: {"type": p.type, "description": p.description}
        for p in spec.parameters
    }
    required = [p.name for p in spec.parameters if p.required]
    return {
        "name": spec.name,
        "description": spec.description,
        "inputSchema": {
            "type": "object",
            "properties": props,
            "required": required,
        },
    }


def handle_request(spark: SparkSession, req: dict[str, Any]) -> dict[str, Any] | None:
    """One JSON-RPC request → response dict (None for notifications)."""
    rid = req.get("id")
    method = req.get("method", "")
    if rid is None and method.startswith("notifications/"):
        return None
    base: dict[str, Any] = {"jsonrpc": "2.0", "id": rid}
    try:
        if method == "initialize":
            base["result"] = {
                "protocolVersion": PROTOCOL_VERSION,
                "capabilities": {"tools": {}},
                "serverInfo": SERVER_INFO,
            }
        elif method == "tools/list":
            base["result"] = {
                "tools": [_tool_schema(t) for t in registry.list_tools()]
            }
        elif method == "tools/call":
            params = req.get("params", {})
            name = params.get("name")
            args = params.get("arguments", {})
            try:
                content = registry.call_tool(spark, name, args)
                base["result"] = {"content": content, "isError": False}
            except Exception as exc:  # tool errors → result.isError
                base["result"] = {
                    "content": [{"type": "text", "text": str(exc)}],
                    "isError": True,
                }
        else:
            base["error"] = {"code": -32601, "message": f"unknown method {method!r}"}
    except Exception as exc:  # protocol-level failure
        base["error"] = {"code": -32603, "message": str(exc)}
    return base


def serve(spark: SparkSession, stdin: TextIO | None = None, stdout: TextIO | None = None) -> None:
    """Line-delimited JSON-RPC loop until EOF."""
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError:
            resp: dict[str, Any] | None = {
                "jsonrpc": "2.0",
                "id": None,
                "error": {"code": -32700, "message": "parse error"},
            }
        else:
            resp = handle_request(spark, req)
        if resp is not None:
            stdout.write(json.dumps(resp) + "\n")
            stdout.flush()


def main() -> None:
    from database_toolbox_spark.session import DEFAULT_SF_DIR, get_spark, load_tables

    spark = get_spark(app_name="dts-server")
    load_tables(spark, DEFAULT_SF_DIR)
    serve(spark)


if __name__ == "__main__":
    main()
