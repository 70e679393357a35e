"""YAML tool-file loader tests — the reference's extension surface
(CONTRIBUTING.md:219-254; images/redshift/redshift.yaml;
tests/sqlite/sqlite.yaml) loaded against the Spark engine, covering all
three binding modes, env substitution, source validation, and the gate."""

from __future__ import annotations

import json

import pytest

from database_toolbox_spark import registry
from database_toolbox_spark.config import ConfigError
from database_toolbox_spark.gate import StatementDenied
from database_toolbox_spark.tools_file import load_tools_file

YAML_DOC = """
sources:
  star:
    kind: spark
    database: ${TOOLS_TEST_DB}

tools:
  segment_counts:
    kind: spark-sql
    source: star
    description: Customer counts per segment with optional CSV filter
    parameters:
      - name: segs
        type: string
        description: Optional comma-separated list of segments
    statement: |
      SELECT c_mktsegment, count(*) AS n
      FROM customer
      WHERE :segs IS NULL
         OR :segs = ''
         OR array_contains(split(:segs, ','), c_mktsegment)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment;

  region_lookup:
    kind: postgres-sql
    source: star
    description: Positional-binding lookup ($1 postgres style)
    parameters:
      - name: region_name
        type: string
        description: Region to look up (empty = all)
    statement: |
      SELECT r_name FROM region
      WHERE $1::text IS NULL OR $1::text = '' OR r_name = $1
      ORDER BY r_name;

  run_sql:
    kind: spark-sql
    source: star
    description: Raw template passthrough
    parameters:
      - name: sql
        type: string
        description: The SQL query to execute
    statement: "{{sql}}"

  execute_sql_custom:
    kind: spark-execute-sql
    source: star
    description: Passthrough without a statement
"""


@pytest.fixture(scope="module")
def tools(spark, tmp_path_factory):
    from database_toolbox_spark.session import load_tables
    from tests.conftest import SF_DIR

    load_tables(spark, SF_DIR)
    p = tmp_path_factory.mktemp("toolsfile") / "tools.yaml"
    p.write_text(YAML_DOC)
    return load_tools_file(str(p), env={"TOOLS_TEST_DB": "star_views"})


def _rows(spark, name, args):
    return [json.loads(c["text"])
            for c in registry.call_tool(spark, name, args)]


def test_named_binding_with_filter(spark, tools):
    rows = _rows(spark, "segment_counts", {"segs": "BUILDING,MACHINERY"})
    assert [r["c_mktsegment"] for r in rows] == ["BUILDING", "MACHINERY"]
    assert all(r["n"] > 0 for r in rows)


def test_named_binding_null_means_no_filter(spark, tools):
    # missing parameter → NULL → filter disabled (redshift.yaml:27-31
    # semantics, SURVEY.md §7 hard part 2)
    assert len(_rows(spark, "segment_counts", {})) == 5
    assert len(_rows(spark, "segment_counts", {"segs": ""})) == 5


def test_positional_binding(spark, tools):
    rows = _rows(spark, "region_lookup", {"region_name": "ASIA"})
    assert rows == [{"r_name": "ASIA"}]
    assert len(_rows(spark, "region_lookup", {})) == 5


def test_template_mode_executes_and_is_gated(spark, tools):
    rows = _rows(spark, "run_sql", {"sql": "SELECT 1 AS one"})
    assert rows == [{"one": 1}]
    with pytest.raises(StatementDenied):
        registry.call_tool(spark, "run_sql", {"sql": "DROP TABLE region"})


def test_execute_sql_kind_without_statement(spark, tools):
    rows = _rows(spark, "execute_sql_custom",
                 {"sql": "SELECT count(*) AS n FROM nation"})
    assert rows == [{"n": 25}]
    with pytest.raises(StatementDenied):
        registry.call_tool(
            spark, "execute_sql_custom", {"sql": "DELETE FROM nation"}
        )


def test_named_binding_is_injection_proof(spark, tools):
    """A SQL payload in a BOUND parameter is data, not syntax — it filters
    nothing and executes nothing (vs the raw {{sql}} template mode, which
    is passthrough by design and relies on the gate)."""
    payload = "x'),(''); DROP TABLE region; --"
    rows = _rows(spark, "segment_counts", {"segs": payload})
    assert rows == []
    assert spark.table("region").count() == 5


def test_tools_listed_in_registry(tools):
    names = {t.name for t in registry.list_tools()}
    assert {"segment_counts", "region_lookup", "run_sql"} <= names
    spec = registry.get_tool("segment_counts")
    assert spec.parameters[0].name == "segs"


def test_missing_env_fails_fast(tmp_path):
    p = tmp_path / "bad_env.yaml"
    p.write_text("sources:\n  s:\n    database: ${NOT_SET_VAR}\ntools: {}\n")
    with pytest.raises(ConfigError, match="NOT_SET_VAR"):
        load_tools_file(str(p), env={})


def test_unknown_source_fails_fast(tmp_path):
    p = tmp_path / "bad_src.yaml"
    p.write_text(
        "tools:\n  t:\n    kind: spark-sql\n    source: nope\n"
        "    statement: SELECT 1\n"
    )
    with pytest.raises(ConfigError, match="unknown source"):
        load_tools_file(str(p), env={})


def test_statement_required_unless_execute_kind(tmp_path):
    p = tmp_path / "bad_stmt.yaml"
    p.write_text("tools:\n  t:\n    kind: spark-sql\n")
    with pytest.raises(ConfigError, match="no statement"):
        load_tools_file(str(p), env={})


def test_example_tools_file_loads_and_runs(spark):
    """examples/tools.yaml (the user-facing sample) must stay loadable and
    executable across all three binding modes."""
    import os

    from database_toolbox_spark.session import load_tables
    from tests.conftest import SF_DIR

    load_tables(spark, SF_DIR)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "tools.yaml",
    )
    specs = load_tools_file(path)
    assert {"revenue_by_segment", "orders_on_day", "count_rows"} <= {
        t.name for t in specs
    }
    rows = [
        json.loads(c["text"])
        for c in registry.call_tool(
            spark, "revenue_by_segment", {"min_total": "100000"}
        )
    ]
    assert rows and all(r["revenue"] > 0 for r in rows)
    n = json.loads(
        registry.call_tool(spark, "count_rows", {"table": "region"})[0]["text"]
    )["n"]
    assert n == 5
