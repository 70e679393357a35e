"""As-of join (SURVEY.md §2.B Joins: "as-of / interval (events enrichment)"
— the one join kind Spark lacks natively; listed there as a custom composite
op).

Semantics: for each purchase event, attach the most recent click by the same
user at or before the purchase time (the classic trades⋈quotes enrichment).

Spark implementation — the scalable union+window pattern, not a per-row
subquery: tag both streams, union, and take `last(click, ignorenulls)` over a
per-user time-ordered window. One shuffle on user_id; state per partition is
a single running value, so it survives any data size (vs. a range join that
explodes, or `merge_asof` in Pandas which needs per-group materialization).

Oracle: DuckDB has native ASOF JOIN — an independent implementation that
validates ours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_toolbox_spark.functions import money
from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_table


def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts"),
        F.lit(0).alias("is_purchase"),
        F.lit(None).cast("long").alias("event_id"),
        F.struct(
            F.col("ts").alias("click_ts"), F.col("value").alias("click_value")
        ).alias("click"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts"),
        F.lit(1).alias("is_purchase"),
        F.col("event_id"),
        F.lit(None)
        .cast("struct<click_ts:timestamp,click_value:double>")
        .alias("click"),
    )
    # clicks sort before purchases at equal ts → "at or before" semantics,
    # matching ASOF's c.ts <= p.ts.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "last_click", F.last("click", ignorenulls=True).over(w)
    )
    return (
        merged.filter(F.col("is_purchase") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("last_click.click_ts").alias("last_click_ts"),
            money(F.col("last_click.click_value")).alias("last_click_value"),
        )
        .orderBy("event_id")
    )


def interval_join_error_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: count clicks inside each error event's
    5-minute follow-up window.

    Scale shape: a naive range join is a nested loop. Bucketizing both
    sides to 5-minute epochs turns it into an equi-join on the bucket (each
    error probes its own and the next bucket) with the exact range predicate
    as a residual filter — shuffle on bucket keys, no cross product.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = lambda c: F.floor(F.unix_timestamp(c) / 300).cast("long")  # noqa: E731
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
        bucket(F.col("ts")).alias("b"),
    )
    # each error probes its own bucket and the following one
    errors2 = errors.withColumn(
        "probe_b", F.explode(F.array(F.col("b"), F.col("b") + 1))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("click_ts"), bucket(F.col("ts")).alias("cb")
    )
    in_range = (
        (F.col("click_ts") > F.col("error_ts"))
        & (F.col("click_ts") <= F.col("error_ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    # conditional count, not filter-after-join: a left-join row whose clicks
    # all fail the range predicate must still report 0, not vanish
    return (
        errors2.join(clicks, errors2.probe_b == clicks.cb, "left")
        .groupBy("error_id", "error_ts")
        .agg(
            F.sum(F.when(in_range, 1).otherwise(0)).alias("n_clicks_5min")
        )
        .orderBy("error_id")
    )


def asof_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for each click, the next error by the same user
    STRICTLY after the click, plus seconds-to-error and a within-30-minutes
    conversion flag — the time-to-failure / bounded-conversion twin of
    asof_last_click (which looks backward).

    Same scalable union+window pattern, mirrored: tag both streams, union,
    take `first(error, ignorenulls)` over a per-user FOLLOWING frame.
    Strictness comes from the sort key, not a filter: errors order BEFORE
    clicks at equal ts (kind 0 < 1), so an equal-ts error falls outside the
    click's following frame. One shuffle on user_id, single running value
    per partition. Oracle: DuckDB native ASOF LEFT JOIN with `e.ts > c.ts`
    — an independent implementation."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        "event_id",
        F.struct(F.col("ts").alias("error_ts")).alias("err"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        "event_id",
        F.lit(None).cast("struct<error_ts:timestamp>").alias("err"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    merged = errors.unionByName(clicks).withColumn(
        "next_err", F.first("err", ignorenulls=True).over(w)
    )
    nxt = F.col("next_err.error_ts")
    return (
        merged.filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("click_ts"),
            nxt.alias("next_error_ts"),
            (F.unix_timestamp(nxt) - F.unix_timestamp("ts")).alias(
                "secs_to_error"
            ),
            F.when(
                nxt <= F.col("ts") + F.expr("INTERVAL 30 MINUTES"), 1
            )
            .otherwise(0)
            .alias("within_30min"),
        )
        .orderBy("event_id")
    )




ASOF_TOL_MIN = 60  # tolerance: matches older than this many minutes drop


def asof_last_click_tolerance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """As-of join with a tolerance band (pandas merge_asof(tolerance=...)
    / kdb wj semantics): each purchase takes its most recent click at or
    before the purchase time ONLY if it is within ASOF_TOL_MIN minutes;
    staler matches are nulled out and flagged. The tolerance is the
    state-retention contract a streaming enrichment would enforce with a
    watermark — measured here in batch (see lateness_profile for the
    sizing measurement).

    Scale shape: identical to asof_last_click — one union + per-user
    running-last window; the tolerance is a post-hoc projection, so no
    extra shuffle."""
    base = asof_last_click(spark, sf_dir)
    gap_ok = (
        F.col("last_click_ts").isNotNull()
        & (
            F.unix_micros(F.col("purchase_ts").cast("timestamp"))
            - F.unix_micros(F.col("last_click_ts").cast("timestamp"))
            <= ASOF_TOL_MIN * 60 * 1_000_000
        )
    )
    return base.select(
        "event_id",
        "user_id",
        "purchase_ts",
        F.when(gap_ok, F.col("last_click_ts")).alias("click_ts_within_tol"),
        F.when(gap_ok, F.col("last_click_value")).alias("click_value"),
        F.when(gap_ok, 1).otherwise(0).cast("int").alias("matched"),
    ).orderBy("event_id")


QUERIES = {
    "asof_last_click": asof_last_click,
    "asof_last_click_tolerance": asof_last_click_tolerance,
    "asof_next_error": asof_next_error,
    "interval_join_error_clicks": interval_join_error_clicks,
}

ORACLE = {
    "asof_last_click_tolerance": """
        WITH clicks AS (
            SELECT user_id, ts, value FROM events WHERE event_type = 'click'
        ),
        purchases AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        ),
        m AS (
            SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
                   c.ts AS click_ts, c.value AS click_value,
                   CASE WHEN c.ts IS NOT NULL
                             AND epoch_us(p.ts) - epoch_us(c.ts)
                                 <= {tol} THEN 1 ELSE 0 END AS matched
            FROM purchases p
            ASOF LEFT JOIN clicks c
              ON p.user_id = c.user_id AND c.ts <= p.ts
        )
        SELECT event_id, user_id, purchase_ts,
               CASE WHEN matched = 1 THEN click_ts END
                   AS click_ts_within_tol,
               CASE WHEN matched = 1 THEN {val} END AS click_value,
               CAST(matched AS INT) AS matched
        FROM m ORDER BY event_id
    """.format(tol=ASOF_TOL_MIN * 60 * 1_000_000, val=R("click_value")),
    "asof_last_click": f"""
        WITH clicks AS (
            SELECT user_id, ts, value FROM events WHERE event_type = 'click'
        ),
        purchases AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        )
        SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
               c.ts AS last_click_ts,
               {R("c.value")} AS last_click_value
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND c.ts <= p.ts
        ORDER BY p.event_id
    """,
    "asof_next_error": """
        WITH clicks AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'click'
        ),
        errors AS (
            SELECT user_id, ts FROM events WHERE event_type = 'error'
        )
        SELECT c.event_id, c.user_id, c.ts AS click_ts,
               e.ts AS next_error_ts,
               date_diff('second', c.ts, e.ts) AS secs_to_error,
               CASE WHEN e.ts <= c.ts + INTERVAL 30 MINUTE THEN 1
                    ELSE 0 END AS within_30min
        FROM clicks c
        ASOF LEFT JOIN errors e
          ON c.user_id = e.user_id AND e.ts > c.ts
        ORDER BY c.event_id
    """,
    # plain range predicate — the bucketized Spark plan must match it exactly
    "interval_join_error_clicks": """
        SELECT e.event_id AS error_id, e.ts AS error_ts,
               count(c.ts) AS n_clicks_5min
        FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') e
        LEFT JOIN (SELECT ts FROM events WHERE event_type = 'click') c
          ON c.ts > e.ts AND c.ts <= e.ts + INTERVAL 5 MINUTE
        GROUP BY e.event_id, e.ts
        ORDER BY e.event_id
    """,
}


# --- point-in-time SCD2 dimension join ----------------------------------------------
# The temporal-warehouse staple: facts must join the dimension VERSION
# that was valid at the fact's event time, not the current one (Kimball
# type-2 semantics). The SCD2 history is synthesized deterministically
# from the customer dimension — each customer has two versions split at
# an md5-derived epoch-day, v2 carrying a migrated segment label — and
# every order picks its valid version by a [from, to) interval test on
# the integer epoch-day grid (identical comparisons in both dialects; no
# date arithmetic to diverge on).
PIT_EPOCH = "DATE '1992-01-01'"
PIT_SPAN = 2000  # split-day range in epoch-days


def _pit_sql(od: str, split_hash: str) -> str:
    return f"""
        WITH dim AS (
            SELECT c_custkey AS custkey, c_mktsegment AS segment,
                   {split_hash} % {PIT_SPAN} AS split_day
            FROM customer
        ),
        versions AS (
            SELECT custkey, 1 AS version, segment,
                   0 AS valid_from, split_day AS valid_to
            FROM dim
            UNION ALL
            SELECT custkey, 2 AS version,
                   concat('MIGRATED-', segment) AS segment,
                   split_day AS valid_from, 1000000 AS valid_to
            FROM dim
        ),
        fact AS (
            SELECT o_custkey AS custkey, {od} AS od,
                   CAST(floor(o_totalprice * 100e0 + 0.5e0) AS BIGINT)
                       AS cents
            FROM orders
        )
        SELECT v.version, v.segment,
               CAST(count(*) AS BIGINT) AS n_orders,
               {R("sum(f.cents) / 100e0", 2)} AS revenue
        FROM fact f
        JOIN versions v ON v.custkey = f.custkey
                       AND f.od >= v.valid_from AND f.od < v.valid_to
        GROUP BY v.version, v.segment
        ORDER BY v.version, v.segment
    """


def point_in_time_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders joined to the SCD2 customer version valid at order date
    (see _pit_sql), rolled up per (version, segment) — the
    point-in-time join every temporal warehouse query needs; the
    version-2 'MIGRATED-' labels make a wrong-version join visible as a
    row-level mismatch, not just a count drift.

    Scale shape: the interval test rides the custkey EQUI-join (hash
    join on the key; the [from, to) predicate is a residual filter —
    never a range-only join), and each key has exactly 2 versions, so
    the join fan-out is bounded. One fact scan, one grouped rollup."""
    load_table(spark, sf_dir, "orders")
    load_table(spark, sf_dir, "customer")
    return spark.sql(_pit_sql(
        f"datediff(o_orderdate, {PIT_EPOCH})",
        "CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 1, 6),"
        " 16, 10) AS BIGINT)",
    ))


QUERIES["point_in_time_dim_join"] = point_in_time_dim_join
ORACLE["point_in_time_dim_join"] = _pit_sql(
    f"datediff('day', {PIT_EPOCH}, o_orderdate)",
    "CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 6))"
    " AS BIGINT)",
)
