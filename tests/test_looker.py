"""Looker semantic-layer toolset tests: metadata tools, the query compiler's
validation/injection posture, saved looks, and tools/list exposure
(reference surface: README.md:844-880 `--prebuilt looker`)."""

from __future__ import annotations

import json

import pytest

from database_toolbox_spark import looker, registry
from tests.conftest import SF_DIR


def _rows(spark, name, args=None):
    """call_tool returns MCP content items; parse each row's JSON text."""
    return [json.loads(c["text"]) for c in registry.call_tool(spark, name, args)]


def test_metadata_tools(spark):
    assert _rows(spark, "get_models") == [
        {"model": "database_toolbox_spark", "explore_count": 3}
    ]
    explores = {r["explore"] for r in _rows(spark, "get_explores")}
    assert explores == {"orders", "lineitem", "events"}
    dims = _rows(spark, "get_dimensions", {"explore": "orders"})
    assert {d["field"] for d in dims} >= {"nation", "order_year"}
    meas = _rows(spark, "get_measures", {"explore": "orders"})
    assert all(m["kind"] == "measure" for m in meas)


def test_tools_listed():
    names = {t.name for t in registry.list_tools()}
    assert {"get_models", "get_explores", "get_dimensions", "get_measures",
            "query", "get_looks", "run_look"} <= names


def test_query_tool_end_to_end(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", SF_DIR)
    rows = _rows(
        spark,
        "query",
        {
            "explore": "orders",
            "fields": "order_status, order_count",
            "filters": '{"market_segment": "BUILDING"}',
        },
    )
    assert len(rows) >= 2
    assert set(rows[0]) == {"order_status", "order_count"}


def test_unknown_fields_rejected_not_interpolated(spark):
    """Tool arguments are names resolved against the spec, never SQL: an
    expression-shaped field or filter key must raise, and a malicious filter
    VALUE binds as a parameter (returns 0 rows, executes nothing)."""
    with pytest.raises(KeyError):
        looker.compile_query_sql("orders", ["order_count; DROP TABLE x"])
    with pytest.raises(KeyError):
        looker.compile_query_sql(
            "orders", ["order_count"], {"1=1 OR nation": "x"}
        )
    df = looker.run_query(
        spark, SF_DIR, "orders", ["nation", "order_count"],
        {"nation": "x' OR '1'='1"},
    )
    assert df.count() == 0


def test_sorts_must_reference_selected_fields():
    with pytest.raises(KeyError):
        looker.compile_query_sql(
            "orders", ["nation"], sorts=["order_count desc"]
        )
    sql, _ = looker.compile_query_sql(
        "orders", ["nation", "order_count"], sorts=["order_count desc"]
    )
    assert sql.rstrip().endswith("ORDER BY order_count desc")


def test_run_look_matches_direct_query(spark):
    via_look = looker.run_look(spark, SF_DIR, 1).collect()
    direct = looker.run_query(
        spark, SF_DIR, "orders", ["nation", "order_count", "total_revenue"]
    ).collect()
    assert via_look == direct
    with pytest.raises(KeyError):
        looker.run_look(spark, SF_DIR, 999)


def test_get_looks_lists_all(spark):
    rows = _rows(spark, "get_looks")
    assert {r["look_id"] for r in rows} == {1, 2, 3, 4}
