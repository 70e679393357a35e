"""SparkSession construction and star-schema registration.

The reference holds no data — every byte lives in an external engine reached
through a connection config (`/root/reference/images/redshift/redshift.yaml:1-8`,
`/root/reference/tests/sqlite/sqlite.yaml:1-4`). Our storage is the driver's
Parquet star schema (TESTDATA.md); "connecting" = registering the Parquet files
as temp views so `spark.sql` and the catalog tools see them as tables.

Scale notes (100 TB design):
- Everything is declarative `spark.read.parquet` → Catalyst gets predicate
  pushdown, column pruning, and partition pruning for free on every operator.
- AQE is on: runtime shuffle-partition coalescing + skew-join splitting, which
  is what makes a fixed `spark.sql.shuffle.partitions` safe across 1000×
  data-size range.
- Session timezone pinned to UTC for deterministic timestamp semantics
  (FIXTURES.md determinism rules).
"""

from __future__ import annotations

import os
import sys
from functools import lru_cache as _lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The ten driver tables (TESTDATA.md + FIXTURES.md). region/nation/supplier
# are broadcast-sized dimensions at every scale factor.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at any sf (FIXTURES.md join graph).
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "database-toolbox-spark",
    cpus: str | int | None = None,
    shuffle_partitions: str | int | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession configured for analytics.

    On a real cluster only master/memory change; the SQL configs below are
    the scale-relevant ones and apply unchanged.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = str(shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Local scan-split sizing: test files are MB-scale, so the 128m
        # default would scan single-threaded on 32 cores. On a real cluster
        # (TB-scale inputs) raise SPARK_GRAFT_MAX_PARTITION_BYTES back to
        # 128m — the env knob IS the scale dial.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"),
        )
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", "512k"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Opt-in durable docstore writes (see document_store.py): when this env var
# names a scratch directory and a persisted copy of a table exists there,
# load_table reads the persisted copy INSTEAD of the fixture parquet — that
# is what makes a docstore write survive a fresh load_tables()/session. The
# fixture dir itself is never written (document_store refuses testdata
# paths), so unsetting the variable restores pristine reads.
DOCSTORE_PERSIST_ENV = "SPARK_GRAFT_DOCSTORE_PERSIST"


_shadow_warned: set[str] = set()


def persisted_table_path(name: str) -> str | None:
    d = os.environ.get(DOCSTORE_PERSIST_ENV, "").strip()
    if d:
        p = os.path.join(d, f"{name}.parquet")
        if os.path.exists(p):
            # Loud once per (table, persist dir): the persisted copy
            # shadows the fixture Spark-side ONLY, so a stale scratch dir
            # would otherwise surface as unexplained oracle mismatches
            # (round-10 ADVICE item 3).
            if p not in _shadow_warned:
                _shadow_warned.add(p)
                print(
                    f"[database_toolbox_spark] NOTE: table {name!r} reads "
                    f"the persisted docstore copy {p} (set by "
                    f"{DOCSTORE_PERSIST_ENV}), shadowing the fixture "
                    f"parquet — unset the variable or clear the scratch "
                    f"dir for pristine reads",
                    file=sys.stderr,
                )
            return p
    return None


def _dataset_file_key(path: str) -> str:
    """Cache key for per-dataset footer-derived facts: directory datasets
    (the docstore persist path) resolve to ONE part file FIRST and the
    caches key on that part file's path — Spark writes fresh randomized
    part names on every overwrite, so a rewritten persisted dataset never
    returns stale footer info (round-10 ADVICE item 5); fixture files are
    immutable, so caching by path is sound."""
    if os.path.isdir(path):
        parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
        if not parts:
            return path
        return os.path.join(path, sorted(parts)[0])
    return path


def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects ([PARQUET_TYPE_ILLEGAL]). Detected from the footer only;
    cached per resolved part file (see _dataset_file_key)."""
    key = _dataset_file_key(path)
    if os.path.isdir(key):  # directory with no part files yet
        return ()
    return _nanos_ts_columns_cached(key)


@_lru_cache(maxsize=256)
def _nanos_ts_columns_cached(path: str) -> tuple[str, ...]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    return tuple(
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    )


def _view_registry(spark: SparkSession) -> dict[str, tuple[DataFrame, str]]:
    """Per-session map of temp views THIS module registered →
    (the DataFrame we registered, the parquet path it reads). Lets
    load_table distinguish its own registrations (safe to hand out fresh
    reads — fresh expression IDs avoid ambiguous self-join errors when
    operators recombine tables) from caller-substituted views (must be
    left alone so operators compose — see test_scale_stress replication).
    The recorded path is what detects a mid-session source switch (a new
    sf_dir, or a docstore persisted copy appearing/disappearing) and
    forces a real re-registration."""
    reg = getattr(spark, "_dts_views", None)
    if reg is None:
        reg = {}
        spark._dts_views = reg
    return reg


# Parquet schema per resolved data file (see _dataset_file_key): the
# first read of a dataset infers the schema JVM-side (~85 ms of file
# listing + footer work); every later read passes it explicitly (~14 ms).
# Keyed on the part FILE path, so a rewritten docstore dataset (fresh
# randomized part names per overwrite) can never hit a stale entry.
_schema_cache: dict[str, object] = {}


def _fresh_read(spark: SparkSession, path: str) -> DataFrame:
    """A fresh DataFrame over ``path`` (fresh expression IDs per call)
    with schema inference paid once per dataset per process."""
    key = _dataset_file_key(path)
    schema = _schema_cache.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _schema_cache[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, replace: bool = False
) -> DataFrame:
    """Read one table and register it as a temp view under its bare name.

    Composability contract: if the CURRENT view under `name` is a caller's
    substitution (its plan differs from what we registered — detected via
    ``sameSemantics``, which canonicalizes expression IDs), it is preserved
    and returned as-is, so operators run against the caller's data. Our own
    registrations are refreshed with a fresh parquet read each call — fresh
    expression IDs, so recombining the same table twice never trips Spark's
    ambiguous-self-join check. ``replace=True`` forces re-registration from
    parquet (restoring the real table after a test swapped in a view).

    TIMESTAMP(NANOS) columns (e.g. events.ts) are read as nanos-since-epoch
    longs (`spark.sql.legacy.parquet.nanosAsLong`) and cast back to
    microsecond timestamps scan-side — a codegen'd projection, no UDF.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_session_confs(spark)
    reg = _view_registry(spark)
    path = persisted_table_path(name) or table_path(sf_dir, name)
    if not replace and spark.catalog.tableExists(name):
        cur = spark.table(name)
        entry = reg.get(name)
        if entry is None or not cur.sameSemantics(entry[0]):
            # caller-registered (or caller-overwritten) view: leave it
            return cur
        if entry[1] == path:
            # the view is our own registration over the SAME source: the
            # registration stands — just hand out a fresh read (fresh
            # expression IDs per call; the schema cache makes this ~6x
            # cheaper than the inferring read, and skipping the ~40 ms
            # createOrReplaceTempView round trip per table is what makes
            # per-query-build table loading cheap — the bench now times
            # construction, and re-registering 10 unchanged views was
            # ~0.8 s of every build)
            return _read_with_nanos_cast(spark, path)
        # our registration but the source path changed (new sf_dir or a
        # docstore persisted copy appeared/vanished): fall through and
        # re-register from the new path
    df = _read_with_nanos_cast(spark, path)
    df.createOrReplaceTempView(name)
    reg[name] = (df, path)
    return df


def _read_with_nanos_cast(spark: SparkSession, path: str) -> DataFrame:
    """Fresh read of ``path`` with TIMESTAMP(NANOS) columns read as
    nanos-since-epoch longs (the legacy conf MUST be set before the read
    or inference rejects the file) and cast back to microsecond
    timestamps scan-side — a codegen'd projection, no UDF — preserving
    the original column order."""
    nanos_cols = _nanos_ts_columns(path)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = _fresh_read(spark, path)
    if not nanos_cols:
        return df
    for c in nanos_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df.select(*[f.name for f in df.schema])  # original column order


def report_sort(df: DataFrame, *cols) -> DataFrame:
    """Total-order a SMALL report relation without the global-sort tax.

    A trailing ``ORDER BY`` compiles to a range exchange whose partitioner
    SAMPLES the child plan — and when the subtree below the sort is
    broadcast-join- or map-heavy (no intervening shuffle), that sampling
    job re-executes the entire expensive pipeline once per action
    (measured: jaccard_prefix_filter_pairs 3.6 s -> 2.2 s,
    image_jpeg_stats 2.1 s -> 0.8 s at sf0.1). Hash-shuffling to one
    partition does not sample, so the pipeline runs exactly once and the
    bounded report (pair lists above a threshold, per-cell summaries,
    per-doc stats at test scale) sorts locally.

    Only for outputs that are small by construction — a single-partition
    sort of an UNBOUNDED relation would be the classic scale-killer. For
    genuinely large ordered outputs keep ORDER BY and pay the sampler, or
    range-partition upstream of the heavy stage (see png_payloads)."""
    return df.repartition(1).sortWithinPartitions(*cols)


def strip_order_by(sql: str, suffix: str) -> str:
    """Drop the trailing ORDER BY clause that report_sort replaces with a
    local sort. Raises when ``suffix`` is not the statement's tail: a
    silent ``removesuffix`` no-op would leave the range-exchange ORDER BY
    under report_sort — results stay correct but the range-sampler
    re-execution the conversion exists to remove comes back with no
    signal (round-12 ADVICE item 1)."""
    body = sql.rstrip()
    if not body.endswith(suffix):
        raise ValueError(
            f"strip_order_by: expected trailing {suffix!r}; the shared "
            "SQL tail drifted — update the report_sort site"
        )
    return body.removesuffix(suffix)


def materialize(df: DataFrame) -> DataFrame:
    """Compute a multiply-referenced intermediate exactly once and cut its
    lineage (Catalyst inlines CTEs/views, so an expensive stage referenced
    N times otherwise re-runs N times).

    Mode via SPARK_GRAFT_MATERIALIZE:
    - ``local_checkpoint`` (default): eager ``localCheckpoint`` — partitions
      land in executor block storage with no InMemoryRelation columnar
      rebuild, measurably faster than ``cache()`` for skinny exploded
      intermediates (MinHash shingles: ~3x at sf0.1). Executor-local, so an
      executor loss forces a job retry — fine single-node and for batch
      jobs that simply rerun.
    - ``persist``: MEMORY_AND_DISK persist with recomputable lineage — the
      resilient choice on large shared clusters with dynamic allocation /
      spot executors; same results, slightly slower locally.
    """
    if os.environ.get("SPARK_GRAFT_MATERIALIZE", "local_checkpoint") == "persist":
        from pyspark import StorageLevel  # noqa: PLC0415

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        df.count()  # JVM-side action: populate the cache before reuse
        return df
    return df.localCheckpoint(eager=True)


def release_materialized(spark: SparkSession, blocking: bool = False) -> int:
    """Unpersist every RDD pinned in this SparkContext's block storage and
    return how many were released.

    ``materialize()`` pins each checkpointed intermediate in executor
    storage for the SESSION lifetime — nothing in Spark scopes a
    localCheckpoint to a query. A long-lived session serving many queries
    (the bench's 173x6 samples, driver_check's 470-query sweep, the MCP
    server) therefore accretes every materialized subtree; the sf5 growth
    study OOMed at 8 GB exactly this way (round-12 verdict item 2). Call
    this BETWEEN queries, after the previous query's result is fully
    consumed: a released localCheckpoint cannot be recomputed (lineage is
    truncated), so any still-live DataFrame from the previous build will
    fail loudly rather than silently rerun.

    This releases ALL persistent RDDs in the context. Inside this engine
    that is exactly the materialize() set (the only persist caller —
    tests/test_window_gate.py-style audit: grep '\\.persist(|\\.cache('),
    so engine-owned sessions lose nothing else; callers who persist their
    own DataFrames should unpersist those themselves before relying on
    this sweep."""
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        n = 0
        for jrdd in jmap.values():
            jrdd.unpersist(blocking)
            n += 1
        return n
    except Exception:  # noqa: BLE001 — best-effort cleanup, never fatal
        return 0


def ensure_session_confs(spark: SparkSession) -> None:
    """Runtime-settable confs the engine's semantics depend on, applied
    defensively for externally-built sessions (e.g. the round driver's):
    UTC timestamps (FIXTURES.md determinism) and AQE."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def load_tables(
    spark: SparkSession, sf_dir: str, replace: bool = False
) -> dict[str, DataFrame]:
    """Register the full star schema as temp views; return name → DataFrame.
    Register-if-absent (see load_table); ``replace=True`` forces parquet
    re-registration of every table.

    Mirrors the reference's "source" concept (a connection makes the engine's
    tables visible; `/root/reference/images/redshift/redshift.yaml:1-8`): after
    this call, `spark.sql` and the catalog tools can see every table.
    """
    ensure_session_confs(spark)
    return {name: load_table(spark, sf_dir, name, replace=replace) for name in TABLES}
