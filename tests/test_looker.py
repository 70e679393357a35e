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
    assert sql.rstrip().endswith("ORDER BY order_count DESC")


def test_sort_direction_any_case_and_asc():
    """Looker sort specs normalize case-insensitively with an optional
    asc/desc suffix — 'nation DESC' and 'nation asc' are legitimate."""
    for spec, suffix in [
        ("nation DESC", "ORDER BY nation DESC"),
        ("nation desc", "ORDER BY nation DESC"),
        ("nation Asc", "ORDER BY nation"),
        ("nation", "ORDER BY nation"),
    ]:
        sql, _ = looker.compile_query_sql("orders", ["nation"], sorts=[spec])
        assert sql.rstrip().endswith(suffix), (spec, sql)
    with pytest.raises(KeyError):
        looker.compile_query_sql("orders", ["nation"], sorts=["nation sideways"])
    with pytest.raises(KeyError):
        looker.compile_query_sql("orders", ["nation"], sorts=["nation; DROP x"])


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


# --- property-based compiler fuzz -------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    _EXPLORES = sorted(looker.EXPLORES)

    @st.composite
    def _query_specs(draw):
        explore = draw(st.sampled_from(_EXPLORES))
        spec = looker.EXPLORES[explore]
        fields = draw(
            st.lists(
                st.sampled_from(sorted(spec.dimensions) + sorted(spec.measures)),
                min_size=1, max_size=5, unique=True,
            )
        )
        filters = draw(
            st.dictionaries(
                st.sampled_from(sorted(spec.dimensions)),
                st.text(min_size=0, max_size=20),  # arbitrary values, incl. quotes
                max_size=2,
            )
        )
        limit = draw(st.one_of(st.none(), st.integers(0, 100)))
        return explore, fields, filters, limit

    @settings(max_examples=200, deadline=None)
    @given(_query_specs())
    def test_compiler_output_is_closed_over_spec(q):
        """For ANY field subset and ANY (hostile) filter values: the
        compiled SQL contains only spec-owned SQL fragments, every filter
        value binds as a parameter (never appears in the SQL text), and
        grouping covers exactly the selected dimensions."""
        explore, fields, filters, limit = q
        sql, args = looker.compile_query_sql(explore, fields, filters, None, limit)
        spec = looker.EXPLORES[explore]
        for v in filters.values():
            # filter VALUES never reach the SQL text (short values can
            # collide with placeholder names like :p0 by substring, so
            # check distinctive ones; quoted-splice would need the quotes)
            if len(v) >= 4 or "'" in v:
                assert v not in sql
        assert set(args.values()) == set(filters.values())
        dims = [f for f in fields if f in spec.dimensions]
        assert (" GROUP BY " in sql) == bool(dims)
        assert sql.startswith("SELECT ")
        if limit is not None:
            assert sql.endswith(f"LIMIT {limit}")

    @settings(max_examples=50, deadline=None)
    @given(st.text(min_size=1, max_size=30))
    def test_compiler_rejects_unknown_fields(name):
        """Arbitrary strings that are not spec field names always raise."""
        spec = looker.EXPLORES["orders"]
        if name in spec.dimensions or name in spec.measures:
            return
        with pytest.raises(KeyError):
            looker.compile_query_sql("orders", [name])
