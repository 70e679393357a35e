"""database_toolbox_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of CognitionAI/database-toolbox.

The reference (read-only at /root/reference/) is MCP packaging around external
SQL engines: its own surface is catalog introspection (`list_tables`), gated
arbitrary-SQL execution (`execute_sql` / `run_snowflake_query`), catalog search
(`dataplex_search_entries`), and a row-as-JSON result contract. The SQL engine
itself is delegated to PostgreSQL/BigQuery/Snowflake/etc. Here, Spark SQL +
Catalyst *is* the engine, and the delegated SQL surface (joins, aggregation,
windows, set ops, scalar functions — SURVEY.md §2.B) is provided natively.

Layout:
    session.py      SparkSession construction + star-schema registration
    catalog.py      list_tables (redshift & sqlite dialects), search_entries
    gate.py         statement-type permission gate (default-deny)
    executor.py     gated execute_sql + row-JSON result contract
    registry.py     named-tool registry (the reference's YAML-tool surface)
    operators/      the analytic operator inventory (SURVEY.md §2.B + §7)
    streaming/      Structured Streaming variants of event-time operators
    functions/      reusable column-expression helpers
"""

__version__ = "0.1.0"

from database_toolbox_spark.session import get_spark, load_tables  # noqa: F401
