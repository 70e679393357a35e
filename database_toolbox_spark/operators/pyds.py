"""Python Data Source API (Spark 4.0) — a user-defined table provider.

The reference's source surface is pure connection configs handed to external
engines (`/root/reference/images/redshift/redshift.yaml:1-8`,
`/root/reference/tests/sqlite/sqlite.yaml:1-4`); Spark's native extension
point for "a new kind of source" is the Python DataSource API: a
`DataSource` subclass whose reader declares **input partitions** (the unit
of parallel scan) and a per-partition `read()` generator. Registered once,
it is then a first-class `spark.read.format(...)` citizen — Catalyst plans
over it, every downstream operator is ordinary DataFrame code.

Scale design: `partitions()` is the scan's parallelism contract — each
`InputPartition` carries only its [start, end) bounds (bytes on the wire,
not rows), so 1000 executors each generate/fetch their own slice; there is
no driver-side materialization. This is exactly how a real external-system
connector (the reference's Bigtable/Firestore "custom YAML required" stubs,
README.md:143-177) would be built Spark-natively.

The generator arithmetic is pure integer modular math so the DuckDB oracle
reproduces the rows exactly — the correctness check covers the full
partition-planning → executor-read → aggregate path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from database_toolbox_spark.operators._oracle import R

N_ROWS = 2000
N_PARTS = 8

# row derivation (must match the oracle SQL below; everything < 2^53 so the
# double-precision oracle math is exact)
_A, _M1, _M2 = 2654435761, 97, 8
_B, _C, _M3 = 1103515245, 12345, 65536


def _register_synthetic_source(spark: SparkSession) -> None:
    """Define + register the data source. The classes live inside this
    function so cloudpickle ships them by value to Python workers (the
    package is never installed worker-side — FIXTURES.md determinism
    rule 5)."""
    from pyspark.sql.datasource import (  # noqa: PLC0415
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _SliceReader(DataSourceReader):
        def __init__(self, options):
            self.n_rows = int(options.get("rows", N_ROWS))
            self.n_parts = int(options.get("partitions", N_PARTS))

        def partitions(self):
            # contiguous [start, end) slices; the planner ships ONLY these
            # bounds to executors
            step = -(-self.n_rows // self.n_parts)
            return [
                InputPartition((lo, min(lo + step, self.n_rows)))
                for lo in range(0, self.n_rows, step)
            ]

        def read(self, partition):
            lo, hi = partition.value
            for i in range(lo, hi):
                yield (
                    i,
                    f"b{(i * 2654435761) % 97 % 8}",
                    float((i * 1103515245 + 12345) % 65536) / 100.0,
                )

    class SyntheticDocsSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_docs"

        def schema(self):
            return "id bigint, bucket string, score double"

        def reader(self, schema):
            return _SliceReader(self.options)

    spark.dataSource.register(SyntheticDocsSource)


def read_synthetic(
    spark: SparkSession, rows: int = N_ROWS, partitions: int = N_PARTS
) -> DataFrame:
    """`spark.read` over the registered Python data source."""
    _register_synthetic_source(spark)
    return (
        spark.read.format("synthetic_docs")
        .option("rows", str(rows))
        .option("partitions", str(partitions))
        .load()
    )


def python_datasource_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over the custom Python data source: per-bucket count,
    score sum, and id bounds. Exercises partition planning (8 parallel
    slices), the Arrow batch path from Python reader to JVM, and ordinary
    Catalyst aggregation on top."""
    df = read_synthetic(spark)
    df.createOrReplaceTempView("synthetic_docs_v")
    return spark.sql(f"""
        SELECT bucket,
               count(*)                 AS n,
               {R("sum(score)")}        AS score_sum,
               min(id)                  AS min_id,
               max(id)                  AS max_id
        FROM synthetic_docs_v
        GROUP BY bucket
        ORDER BY bucket
    """)


QUERIES = {
    "python_datasource_agg": python_datasource_agg,
}

ORACLE = {
    "python_datasource_agg": f"""
        WITH src AS (
            SELECT i AS id,
                   'b' || CAST((i * {_A}) % {_M1} % {_M2} AS VARCHAR) AS bucket,
                   CAST((i * {_B} + {_C}) % {_M3} AS DOUBLE) / 100e0 AS score
            FROM range(0, {N_ROWS}) t(i)
        )
        SELECT bucket,
               count(*)          AS n,
               {R("sum(score)")} AS score_sum,
               min(id)           AS min_id,
               max(id)           AS max_id
        FROM src
        GROUP BY bucket
        ORDER BY bucket
    """,
}


# --- streaming variant (SimpleDataSourceStreamReader) --------------------------

N_STREAM_ROWS = 600
STREAM_BATCH = 250  # rows offered per micro-batch


def register_synthetic_stream_source(spark: SparkSession) -> None:
    """Streaming twin of the batch source via Spark 4's
    SimpleDataSourceStreamReader: the OFFSET is a row position, each
    micro-batch serves [pos, min(pos+{STREAM_BATCH}, N)) with the SAME
    deterministic row derivation as the batch reader, and
    readBetweenOffsets replays any committed range exactly — the
    replayability contract that makes the source exactly-once under
    retries. A finite source: once pos reaches N_STREAM_ROWS the offset
    stops advancing and micro-batches come back empty.

    Scale design: offsets are a single integer (bytes on the wire);
    replay is pure arithmetic, so a retried batch regenerates identical
    rows with no driver-side buffering."""
    from pyspark.sql.datasource import (  # noqa: PLC0415
        DataSource,
        SimpleDataSourceStreamReader,
    )

    def _rows(lo: int, hi: int):
        for i in range(lo, hi):
            yield (
                i,
                f"b{(i * 2654435761) % 97 % 8}",
                float((i * 1103515245 + 12345) % 65536) / 100.0,
            )

    class _StreamReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            lo = start["pos"]
            hi = min(lo + STREAM_BATCH, N_STREAM_ROWS)
            # a LIST, not a generator: the engine's prefetch cache
            # copy.copy()s the iterator between read and commit
            return list(_rows(lo, hi)), {"pos": hi}

        def readBetweenOffsets(self, start, end):
            return list(_rows(start["pos"], end["pos"]))

    class SyntheticDocsStream(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_docs_stream"

        def schema(self):
            return "id bigint, bucket string, score double"

        def simpleStreamReader(self, schema):
            return _StreamReader()

    spark.dataSource.register(SyntheticDocsStream)


def read_synthetic_stream(spark: SparkSession) -> DataFrame:
    """`spark.readStream` over the registered streaming Python source."""
    register_synthetic_stream_source(spark)
    return spark.readStream.format("synthetic_docs_stream").load()
