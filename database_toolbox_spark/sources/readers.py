"""File / network source adapters.

Scale notes: always pass an explicit schema for CSV/JSON in production paths
(schema inference is a full extra pass over the data); Parquet writes
partition by a column when the downstream reads filter on it (partition
pruning), and use `maxRecordsPerFile`/`repartition` to control file sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None
                 ) -> DataFrame:
    """Columnar scan; Catalyst pushes filters/pruning into the reader."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV with explicit schema (inference = extra full pass; avoid at
    scale)."""
    reader = spark.read.options(header=str(header).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Line-delimited JSON with explicit schema."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


CORRUPT_COL = "_corrupt_record"


def read_json_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE-mode JSON ingest that QUARANTINES malformed lines
    instead of failing the job (FAILFAST) or silently dropping them
    (DROPMALFORMED) — the only mode that survives a 100 TB ingest where
    some fraction of lines is always broken.

    Returns (good, quarantined): `good` has the declared schema;
    `quarantined` carries the raw offending line in `_corrupt_record` for
    reprocessing. Spark requires the corrupt-record column to be part of
    the declared schema, so it is appended here; callers pass only their
    data schema."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)  # noqa: SLF001
    full = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = (
        spark.read.options(**options)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(full)
        .json(path)
    )
    # Spark disallows querying ONLY the corrupt-record column off a raw
    # file scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    # materialize the parsed batch once, then split it
    from database_toolbox_spark.session import materialize  # noqa: PLC0415

    parsed = materialize(raw)
    good = parsed.filter(parsed[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    quarantined = parsed.filter(parsed[CORRUPT_COL].isNotNull()).select(
        CORRUPT_COL
    )
    return good, quarantined


def read_orc(spark: SparkSession, path: str, columns: list[str] | None = None
             ) -> DataFrame:
    """ORC columnar scan — same pushdown/pruning behavior as Parquet (the
    vectorized ORC reader honors PushedFilters and ReadSchema)."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def read_text(spark: SparkSession, path: str, whole: bool = False) -> DataFrame:
    """Raw text: one row per line (or per file with whole=True) in a single
    `value` column — the raw-corpus ingestion shape for document pipelines."""
    return spark.read.text(path, wholetext=whole)


def jdbc_available(spark: SparkSession, driver_class: str) -> bool:
    """Whether a JDBC driver is on the classpath (none ship in this
    environment)."""
    try:
        spark._jvm.java.lang.Class.forName(driver_class)  # noqa: SLF001
        return True
    except Exception:
        return False


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver_class: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """Network source parity with the reference's engine connections
    (README.md per-DB env tables). Requires the driver jar on the classpath;
    raises NotImplementedError here so callers can gate on jdbc_available().

    At scale, always provide partition_column + bounds — a single-partition
    JDBC read serializes the whole table through one task."""
    if not jdbc_available(spark, driver_class):
        raise NotImplementedError(
            f"JDBC driver {driver_class!r} not on classpath; add the jar via "
            "spark.jars to use network sources"
        )
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver_class)
        .options(**options)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Internal materialization sink (the tool surface itself is read-only:
    the gate denies INSERT/CREATE/..., SURVEY.md §2.C)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compact a small-files parquet directory into ~target-sized files.

    The 100 TB operational chore: streaming sinks and over-partitioned
    writes leave thousands of KB-scale files whose per-file open/footer cost
    dominates scans. Size the output file count from the ACTUAL on-disk
    bytes (not row counts — compression varies), then rewrite with a single
    round-robin repartition. Returns the output file count."""
    import glob
    import math
    import os

    total = sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(src_dir, "**", "*.parquet"), recursive=True)
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    # repartition (not coalesce): coalesce would collapse the scan's
    # parallelism upstream; repartition keeps the read wide and only
    # narrows at the write
    df.repartition(n_files).write.mode("overwrite").parquet(dst_dir)
    return n_files
