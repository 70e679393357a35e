"""Sources & sinks (SURVEY.md §2.B Scans/sources/sinks).

The reference's sources are pure connection configs to external engines;
ours are Spark readers. Parquet is the primary store (TESTDATA.md); CSV/JSON/ORC/raw-text
readers cover file interchange and raw-corpus ingestion; JDBC is gated behind availability (no driver
jars in this environment). Writes exist only for internal materialization —
the tool surface stays read-only (write statements are denied by the gate,
mirroring images/snowflake-mcp/entrypoint.sh:216-224).
"""

from database_toolbox_spark.sources.readers import (  # noqa: F401
    compact_parquet,
    jdbc_available,
    read_csv,
    read_json,
    read_jdbc,
    read_orc,
    read_parquet,
    read_text,
    write_parquet,
)
