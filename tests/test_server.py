"""MCP protocol-loop tests, mirroring the reference's test shape
(tests/postgres/test_mcp.py:50-157: initialize → tools/list → tools/call;
errors as result.isError, tests/snowflake/test_mcp.py:849)."""

from __future__ import annotations

import io
import json

import pytest

from database_toolbox_spark.server import handle_request, serve
from database_toolbox_spark.session import load_tables
from tests.conftest import SF_DIR


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    load_tables(spark, SF_DIR)


def _call(spark, method, params=None, rid=1):
    return handle_request(
        spark, {"jsonrpc": "2.0", "id": rid, "method": method, "params": params or {}}
    )


def test_initialize(spark):
    resp = _call(spark, "initialize")
    assert resp["result"]["serverInfo"]["name"] == "database-toolbox-spark"
    assert "protocolVersion" in resp["result"]


def test_tools_list_required_names(spark):
    resp = _call(spark, "tools/list")
    tools = resp["result"]["tools"]
    names = {t["name"] for t in tools}
    assert {"list_tables", "execute_sql"} <= names
    exec_tool = next(t for t in tools if t["name"] == "execute_sql")
    assert exec_tool["inputSchema"]["required"] == ["sql"]


def test_tools_call_execute_sql(spark):
    resp = _call(
        spark, "tools/call",
        {"name": "execute_sql", "arguments": {"sql": "SELECT 1 AS one"}},
    )
    result = resp["result"]
    assert result["isError"] is False
    assert json.loads(result["content"][0]["text"]) == {"one": 1}


def test_tools_call_denied_statement_is_error_result(spark):
    resp = _call(
        spark, "tools/call",
        {"name": "execute_sql", "arguments": {"sql": "DROP TABLE lineitem"}},
    )
    assert resp["result"]["isError"] is True
    assert "not permitted" in resp["result"]["content"][0]["text"]


def test_tool_result_row_cap_truncates_with_flag(spark):
    """The tool surface must not collect an unbounded table to the driver:
    past max_rows it truncates and appends a {"truncated": true} item."""
    resp = _call(
        spark, "tools/call",
        {"name": "execute_sql",
         "arguments": {"sql": "SELECT l_orderkey FROM lineitem",
                       "max_rows": 7}},
    )
    content = resp["result"]["content"]
    assert len(content) == 8  # 7 rows + truncation flag
    assert json.loads(content[-1]["text"]) == {"truncated": True, "max_rows": 7}
    assert all("l_orderkey" in c["text"] for c in content[:-1])


def test_tool_result_under_cap_has_no_flag(spark):
    resp = _call(
        spark, "tools/call",
        {"name": "execute_sql",
         "arguments": {"sql": "SELECT 1 AS one", "max_rows": 7}},
    )
    content = resp["result"]["content"]
    assert len(content) == 1
    assert json.loads(content[0]["text"]) == {"one": 1}


def test_tool_row_cap_env_override(spark, monkeypatch):
    from database_toolbox_spark import registry

    monkeypatch.setenv("SPARK_GRAFT_MAX_TOOL_ROWS", "3")
    content = registry.call_tool(
        spark, "execute_sql",
        {"sql": "SELECT l_orderkey FROM lineitem"},
    )
    assert len(content) == 4
    assert json.loads(content[-1]["text"]) == {"truncated": True, "max_rows": 3}
    monkeypatch.setenv("SPARK_GRAFT_MAX_TOOL_ROWS", "0")  # 0 disables
    content = registry.call_tool(
        spark, "execute_sql", {"sql": "SELECT 1 AS one"},
    )
    assert len(content) == 1


def test_unknown_method(spark):
    resp = _call(spark, "nope/nope")
    assert resp["error"]["code"] == -32601


def test_serve_loop_line_delimited(spark):
    lines = [
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize"}),
        json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/list"}),
        "not json at all",
        json.dumps(
            {
                "jsonrpc": "2.0",
                "id": 3,
                "method": "tools/call",
                "params": {
                    "name": "list_tables",
                    "arguments": {"table_names": "region"},
                },
            }
        ),
    ]
    out = io.StringIO()
    serve(spark, stdin=io.StringIO("\n".join(lines) + "\n"), stdout=out)
    resps = [json.loads(line) for line in out.getvalue().splitlines()]
    assert len(resps) == 4
    assert resps[0]["result"]["serverInfo"]["name"] == "database-toolbox-spark"
    assert resps[2]["error"]["code"] == -32700
    rows = [json.loads(c["text"]) for c in resps[3]["result"]["content"]]
    assert [r["column_name"] for r in rows] == ["r_regionkey", "r_name"]


def test_cli_tool_mode(tmp_path):
    """--tool NAME '{json}' calls any registry tool from the shell."""
    import json
    import os
    import subprocess
    import sys

    from tests.conftest import SF_DIR

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=SF_DIR,
        SPARK_GRAFT_CPUS="4",
        PYTHONPATH=repo,
    )
    run = lambda *a: subprocess.run(  # noqa: E731
        [sys.executable, "-m", "database_toolbox_spark", *a],
        capture_output=True, text=True, env=env, cwd="/tmp",
    )
    r = run("--tool", "get_models")
    assert r.returncode == 0, r.stderr[-500:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["explore_count"] == 3
    r2 = run("--tool", "lookup_entry", '{"entry": "nation"}')
    assert r2.returncode == 0
    assert len([l for l in r2.stdout.splitlines() if l.startswith("{")]) == 3
    r3 = run("--tool", "no_such_tool")
    assert r3.returncode == 2
    r4 = run("--list-tools")
    assert r4.returncode == 0 and "run_look(look_id:string*)" in r4.stdout
    # every malformed-input class exits 2 with a clean message, no traceback
    r5 = run("--tool", "lookup_entry", "{not json")
    assert r5.returncode == 2 and "not valid JSON" in r5.stderr
    assert "Traceback" not in r5.stderr
    r6 = run("--tool", "lookup_entry", '{"bogus_arg": "x"}')
    assert r6.returncode == 2 and "bad tool arguments" in r6.stderr
    assert "Traceback" not in r6.stderr
    r7 = run("--tool", "register_jdbc_table",
             '{"view": "v", "source": "nope", "table": "T"}')
    assert r7.returncode == 2 and "unknown JDBC source" in r7.stderr
    assert "Traceback" not in r7.stderr
    r8 = run("--max-rows", "3", "SELECT l_orderkey FROM lineitem")
    assert r8.returncode == 0
    assert len([l for l in r8.stdout.splitlines() if l.startswith("{")]) == 3
    r9 = run("--max-rows", "zzz", "SELECT 1")
    assert r9.returncode == 2 and "not an integer" in r9.stderr
