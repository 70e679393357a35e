"""Permission-gate tests mirroring the reference's statement-class list
(`/root/reference/images/snowflake-mcp/entrypoint.sh:211-232`) and its
validation-failure test style (`tests/snowflake/test_mcp.py:525-554`)."""

from __future__ import annotations

import pytest

from database_toolbox_spark.executor import execute_sql, mcp_content, rows_as_json
from database_toolbox_spark.gate import StatementDenied, check, classify

ALLOWED = [
    ("SELECT 1 AS one", "Select"),
    ("  select * from lineitem", "Select"),
    ("VALUES (1, 'a')", "Select"),
    ("WITH t AS (SELECT 1 AS x) SELECT * FROM t", "Select"),
    ("SHOW TABLES", "Show"),
    ("DESCRIBE lineitem", "Describe"),
    ("DESC lineitem", "Describe"),
    ("EXPLAIN SELECT 1", "Explain"),
    ("USE default", "Use"),
    ("-- comment\nSELECT 2", "Select"),
    ("/* block */ SELECT 3", "Select"),
    ("SELECT 'DROP TABLE x' AS s", "Select"),
]

DENIED = [
    ("INSERT INTO t VALUES (1)", "Insert"),
    ("UPDATE t SET a = 1", "Update"),
    ("DELETE FROM t", "Delete"),
    ("MERGE INTO t USING s ON t.id = s.id WHEN MATCHED THEN DELETE", "Merge"),
    ("TRUNCATE TABLE t", "TruncateTable"),
    ("CREATE TABLE t (a INT)", "Create"),
    ("ALTER TABLE t ADD COLUMN b INT", "Alter"),
    ("DROP TABLE t", "Drop"),
    ("GRANT SELECT ON t TO role", "Grant"),
    ("REVOKE SELECT ON t FROM role", "Revoke"),
    ("COMMIT", "Commit"),
    ("ROLLBACK", "Rollback"),
    ("BEGIN TRANSACTION", "Transaction"),
    ("SET spark.sql.shuffle.partitions=1", "Command"),
    ("CACHE TABLE t", "Command"),
    ("REFRESH TABLE t", "Command"),
    ("WITH t AS (SELECT 1) INSERT INTO x SELECT * FROM t", "Insert"),
    ("", "Unknown"),
    ("   ", "Unknown"),
    ("garbage ramble ###", "Unknown"),
    ("SELECT 1; DROP TABLE t", "Unknown"),  # multi-statement → default-deny
]


@pytest.mark.parametrize("sql,cls", ALLOWED)
def test_allowed(sql, cls):
    c = classify(sql)
    assert (c.statement_class, c.allowed) == (cls, True)
    assert check(sql) == cls


@pytest.mark.parametrize("sql,cls", DENIED)
def test_denied(sql, cls):
    c = classify(sql)
    assert (c.statement_class, c.allowed) == (cls, False)
    with pytest.raises(StatementDenied):
        check(sql)


def test_execute_sql_allows_select(spark):
    df = execute_sql(spark, "SELECT 1 AS one")
    assert df.collect()[0].one == 1


def test_execute_sql_denies_write(spark):
    with pytest.raises(StatementDenied):
        execute_sql(spark, "DROP TABLE IF EXISTS nope")


def test_version_probe(spark):
    """`SELECT version()` smoke (tests/postgres/test_mcp.py:127 parity)."""
    out = execute_sql(spark, "SELECT version() AS v").collect()[0].v
    assert out  # non-empty engine version string


def test_global_temp_view_qualified_scan(spark):
    """Schema-qualified scan parity (analytics.table style,
    tests/redshift/example_usage.py:163): global temp views live in the
    `global_temp` namespace."""
    spark.range(3).createOrReplaceGlobalTempView("gtv_probe")
    n = execute_sql(spark, "SELECT count(*) AS n FROM global_temp.gtv_probe")
    assert n.collect()[0].n == 3


def test_row_json_contract(spark):
    """Result contract: one JSON object per row
    (tests/redshift/example_usage.py:54-65)."""
    import json

    df = execute_sql(spark, "SELECT 1 AS one, 'test' AS message")
    rows = rows_as_json(df)
    assert [json.loads(r) for r in rows] == [{"one": 1, "message": "test"}]
    content = mcp_content(df)
    assert content[0]["type"] == "text"
    assert json.loads(content[0]["text"])["message"] == "test"


def test_parameterized_sql_named_binding(spark):
    """Named binding (`:table_names` style, tests/sqlite/sqlite.yaml:19-22)
    via Spark parameterized SQL."""
    df = execute_sql(spark, "SELECT :x + 1 AS v, :s AS s", args={"x": 41, "s": "hi"})
    row = df.collect()[0]
    assert (row.v, row.s) == (42, "hi")


def test_parameterized_sql_positional_binding(spark):
    """Positional binding (`$1` style, images/redshift/redshift.yaml:27-31)
    via Spark's ? placeholders."""
    df = execute_sql(spark, "SELECT ? * 2 AS v", args=[21])
    assert df.collect()[0].v == 42


def test_parameterized_sql_still_gated(spark):
    with pytest.raises(StatementDenied):
        execute_sql(spark, "DELETE FROM t WHERE id = :x", args={"x": 1})


def test_binding_resists_injection(spark):
    """Bound parameters are typed literals, never spliced SQL: an
    injection-shaped value survives as a plain string and the statement
    stays a gated Select."""
    from database_toolbox_spark.session import load_tables
    from tests.conftest import SF_DIR

    load_tables(spark, SF_DIR)
    payload = "x'; DROP TABLE lineitem; --"
    df = execute_sql(spark, "SELECT :v AS v, length(:v) AS n", args={"v": payload})
    row = df.collect()[0]
    assert row.v == payload
    assert row.n == len(payload)
    # the table is still there
    assert execute_sql(spark, "SELECT count(*) AS c FROM lineitem").collect()[0].c > 0
