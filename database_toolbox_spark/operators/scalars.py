"""Scalar-function battery (SURVEY.md §2.B Scalar functions).

[exercised] in the reference: concat `||` (tests/sqlite/sqlite.yaml:22),
string_to_array/split (images/redshift/redshift.yaml:30), LIKE
(tests/sqlite/sqlite.yaml:22), COALESCE (CONTRIBUTING.md:235), casts
`$1::text` (images/redshift/redshift.yaml:27-30), current_date/timestamp
(tests/redshift/test_mcp.py:221, tests/snowflake/test_mcp.py:826 — smoke only,
excluded here for determinism per FIXTURES.md).
[implied] passthrough: lower/upper/trim/substr/replace/regexp, date
extract/trunc/add/diff/format, arithmetic/round/abs/pow/log, CASE WHEN.

All expressions are built-in `pyspark.sql.functions` — JVM codegen, no UDFs.
Each engine writes its own dialect spelling (instr vs strpos, date_format vs
strftime); aliases line up so the driver's column-sorted value hash matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_toolbox_spark.functions import canon_round
from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_table, load_tables


def string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions over customer names/segments."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select(
            "c_custkey",
            F.lower("c_name").alias("lower_name"),
            F.upper("c_mktsegment").alias("upper_seg"),
            F.length("c_name").alias("name_len"),
            F.substring("c_name", 1, 8).alias("name_prefix"),
            F.concat(F.col("c_mktsegment"), F.lit("/"), F.col("c_name")).alias(
                "seg_name"
            ),
            F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
                "short_name"
            ),
            F.trim(F.lit("  pad  ")).alias("trimmed"),
            F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
            F.reverse(F.col("c_mktsegment")).alias("rev_seg"),
            F.instr(F.col("c_name"), "#").cast("int").alias("hash_pos"),
            F.col("c_name").like("Customer#%").cast("int").alias("is_customer"),
            F.regexp_extract(F.col("c_name"), r"#(\d+)", 1).cast("long").alias(
                "name_num"
            ),
            F.split(F.col("c_name"), "#").getItem(0).alias("split_head"),
            F.contains(F.col("c_mktsegment"), F.lit("ING")).cast("int").alias(
                "has_ing"
            ),
        )
        .orderBy("c_custkey")
    )


def date_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions over order dates."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
            F.month("o_orderdate").alias("mon"),
            F.dayofmonth("o_orderdate").alias("dom"),
            F.to_date(F.date_trunc("month", "o_orderdate")).alias("month_start"),
            F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
            F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
            .cast("int")
            .alias("days_since_epoch"),
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            (F.unix_timestamp("o_orderdate")).alias("epoch_sec"),
        )
        .orderBy("o_orderkey")
    )


def math_conditional_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic / math / CASE / COALESCE / NULLIF / GREATEST / LEAST."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            canon_round(price * (1 - F.col("l_discount"))).alias("net"),
            F.abs(price - 1000.0).alias("abs_diff"),
            F.ceil(price).cast("long").alias("ceil_price"),
            F.floor(price).cast("long").alias("floor_price"),
            canon_round(F.sqrt(price), 6).alias("sqrt_price"),
            canon_round(F.log(price), 6).alias("ln_price"),
            canon_round(F.log10(price), 6).alias("log10_price"),
            canon_round(F.pow(F.col("l_discount"), 2), 6).alias("disc_sq"),
            (F.col("l_orderkey") % 7).alias("key_mod7"),
            F.signum(F.col("l_quantity") - 25.0).cast("int").alias("qty_sign"),
            F.when(F.col("l_quantity") < 10, "low")
            .when(F.col("l_quantity") < 40, "mid")
            .otherwise("high")
            .alias("qty_band"),
            F.coalesce(
                F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")
            ).alias("flag_or_none"),
            F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias(
                "greatest_v"
            ),
            F.least(F.col("l_tax"), F.col("l_discount")).alias("least_v"),
            F.col("l_quantity").cast("int").alias("qty_int"),
            F.col("l_linenumber").cast("string").alias("line_str"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def csv_membership_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exercised CSV-membership idiom, canonically:
    `table_name = ANY(string_to_array($1, ','))` with NULL/empty meaning
    no filter (images/redshift/redshift.yaml:27-31) — applied to segments."""
    param = "BUILDING,MACHINERY"  # bound parameter, as the tool would bind it
    cust = load_table(spark, sf_dir, "customer")
    p = F.lit(param)
    keep = (
        p.isNull()
        | (p == "")
        | F.array_contains(F.split(p, ","), F.col("c_mktsegment"))
    )
    return (
        cust.filter(keep)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .orderBy("c_mktsegment")
    )


def null_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: null-safe equality, IS DISTINCT FROM, NULL-aware
    counts/aggregates, IFNULL/NVL — nulls manufactured via nullif since the
    fixture columns are dense."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        WITH t AS (
            SELECT o_orderkey,
                   nullif(o_orderstatus, 'P') AS maybe_status,
                   nullif(o_totalprice, 0.0)  AS price
            FROM orders
        )
        SELECT count(*)                                     AS n_rows,
               count(maybe_status)                          AS n_nonnull,
               count(*) - count(maybe_status)               AS n_null,
               sum(CAST(maybe_status <=> NULL AS INT))      AS n_nullsafe_eq_null,
               sum(CAST(maybe_status IS DISTINCT FROM 'O' AS INT))
                                                            AS n_distinct_from_o,
               count(ifnull(maybe_status, 'missing'))       AS n_filled
        FROM t
    """)


def safe_arithmetic_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic: division by zero yields NULL (try_divide),
    never a job failure — the defensive form pipelines need."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        WITH t AS (
            SELECT l_orderkey, l_linenumber, l_extendedprice,
                   CAST(l_quantity AS INT) % 5 AS divisor
            FROM lineitem
        )
        SELECT l_orderkey, l_linenumber,
               try_divide(l_extendedprice, divisor) IS NULL AS div_was_null,
               floor(coalesce(try_divide(l_extendedprice, divisor), -1) * 100
                     + 0.501e0) / 100e0 AS safe_ratio
        FROM t ORDER BY l_orderkey, l_linenumber
    """)


def decimal_money_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL aggregation: cast DOUBLE money to DECIMAL(15,2) and
    sum — decimal arithmetic is exact, so this oracle needs NO rounding
    canonicalization at all (the one aggregate family where both engines
    agree bit-for-bit by construction). Emitted as fixed-scale STRINGs:
    the driver's pandas path would otherwise narrow DuckDB decimals to
    float64 ('…314.0') while Spark keeps Decimal('…314.00')."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderstatus,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(15, 2)))
                    AS DECIMAL(18, 2)) AS STRING) AS total_dec,
               CAST(CAST(avg(CAST(o_totalprice AS DECIMAL(15, 2)))
                    AS DECIMAL(18, 4)) AS STRING) AS avg_dec,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """)


def interval_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/calendar arithmetic: day and month offsets, month ends,
    quarter starts."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) + 45              AS plus_45d,
               add_months(CAST(o_orderdate AS DATE), 3)    AS plus_3m,
               last_day(CAST(o_orderdate AS DATE))         AS month_end,
               CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start
        FROM orders ORDER BY o_orderkey
    """)


def collation_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison and grouping (Spark 4 `COLLATE`).

    Case-insensitive equality, grouping, and MIN/MAX under UTF8_LCASE —
    resolved natively by collation-aware physical comparators (hash/sort
    keys carry the collation, so grouping stays a one-shuffle hash agg;
    no lower() projection materializes a second string column). The
    wrapped warehouses all expose collations in their SQL surface
    (reference passthrough commitment,
    /root/reference/images/redshift/redshift.yaml:44-48)."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        WITH mixed AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                        ELSE c_mktsegment END AS seg
            FROM customer
        )
        SELECT min(lower(seg))                                  AS seg_norm,
               count(*)                                         AS n,
               sum(CASE WHEN seg COLLATE UTF8_LCASE = 'building'
                        THEN 1 ELSE 0 END)                      AS eq_building,
               -- every member is collation-equal, so min = max under the
               -- collated comparator: flags the comparator itself
               CAST(min(seg COLLATE UTF8_LCASE) = max(seg COLLATE UTF8_LCASE)
                    AS INT)                                     AS minmax_collapse
        FROM mixed
        GROUP BY seg COLLATE UTF8_LCASE
        ORDER BY seg_norm
    """)


def encoding_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary/encoding functions over customer names: base64 and hex
    encode + decode round-trips, SHA-256 and MD5 digests — the interchange
    surface every wrapped warehouse exposes. All JVM built-ins, zero-shuffle
    projection; the only shuffle is the final sort."""
    cust = load_table(spark, sf_dir, "customer")
    name_bin = F.encode(F.col("c_name"), "UTF-8")
    return (
        cust.select(
            "c_custkey",
            F.base64(name_bin).alias("b64"),
            F.decode(F.unbase64(F.base64(name_bin)), "UTF-8").alias("b64_rt"),
            F.lower(F.hex(name_bin)).alias("hx"),
            F.decode(F.unhex(F.hex(name_bin)), "UTF-8").alias("hx_rt"),
            F.sha2(name_bin, 256).alias("sha256_hex"),
            F.md5(name_bin).alias("md5_hex"),
            F.length(name_bin).cast("long").alias("n_bytes"),
        )
        .orderBy("c_custkey")
    )


_TZ_SQL = """
        WITH localized AS (
            SELECT event_type,
                   {ny} AS ny_ts,
                   {tokyo} AS tokyo_ts
            FROM events
        )
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CASE WHEN hour(ny_ts) BETWEEN 9 AND 16
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_ny_business_hours,
               count(DISTINCT CAST(tokyo_ts AS DATE)) AS n_tokyo_days,
               min(ny_ts) AS first_ny_ts,
               max(ny_ts) AS last_ny_ts
        FROM localized
        GROUP BY event_type
        ORDER BY event_type
"""


def timezone_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion surface (every wrapped warehouse converts
    between zones; session TZ here is pinned UTC): event timestamps
    localized to America/New_York and Asia/Tokyo — business-hours
    bucketing, local-calendar-day distinct counts, local min/max. DST is
    in play (the fixture spans months), so both engines must agree
    through the same IANA tzdata rules, not a fixed offset.

    Per-row projection + one grouped aggregate; the distinct count groups
    on (type, local day) — bounded domain."""
    load_tables(spark, sf_dir)
    return spark.sql(_TZ_SQL.format(
        ny="convert_timezone('UTC', 'America/New_York', ts)",
        tokyo="convert_timezone('UTC', 'Asia/Tokyo', ts)",
    ))


QUERIES = {
    "timezone_battery": timezone_battery,
    "collation_battery": collation_battery,
    "encoding_battery": encoding_battery,
    "string_battery": string_battery,
    "null_semantics_battery": null_semantics_battery,
    "safe_arithmetic_battery": safe_arithmetic_battery,
    "decimal_money_totals": decimal_money_totals,
    "interval_battery": interval_battery,
    "date_battery": date_battery,
    "math_conditional_battery": math_conditional_battery,
    "csv_membership_filter": csv_membership_filter,
}

ORACLE = {
    "timezone_battery": _TZ_SQL.format(
        ny="(ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York')",
        tokyo="(ts AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo')",
    ),
    "encoding_battery": """
        SELECT c_custkey,
               base64(encode(c_name))                       AS b64,
               decode(from_base64(base64(encode(c_name))))  AS b64_rt,
               lower(hex(encode(c_name)))                   AS hx,
               decode(from_hex(hex(encode(c_name))))        AS hx_rt,
               sha256(c_name)                               AS sha256_hex,
               md5(c_name)                                  AS md5_hex,
               CAST(octet_length(encode(c_name)) AS BIGINT) AS n_bytes
        FROM customer ORDER BY c_custkey
    """,
    # DuckDB has no UTF8_LCASE collation: lower() emulates the comparator.
    "collation_battery": """
        WITH mixed AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                        ELSE c_mktsegment END AS seg
            FROM customer
        )
        SELECT min(lower(seg))                                    AS seg_norm,
               count(*)                                           AS n,
               count(*) FILTER (WHERE lower(seg) = 'building')    AS eq_building,
               CAST(min(lower(seg)) = max(lower(seg)) AS INT)     AS minmax_collapse
        FROM mixed
        GROUP BY lower(seg)
        ORDER BY seg_norm
    """,
    "null_semantics_battery": """
        WITH t AS (
            SELECT o_orderkey,
                   nullif(o_orderstatus, 'P') AS maybe_status,
                   nullif(o_totalprice, 0.0)  AS price
            FROM orders
        )
        SELECT count(*)                                     AS n_rows,
               count(maybe_status)                          AS n_nonnull,
               count(*) - count(maybe_status)               AS n_null,
               count(*) FILTER (WHERE maybe_status IS NOT DISTINCT FROM NULL)
                                                            AS n_nullsafe_eq_null,
               count(*) FILTER (WHERE maybe_status IS DISTINCT FROM 'O')
                                                            AS n_distinct_from_o,
               count(ifnull(maybe_status, 'missing'))       AS n_filled
        FROM t
    """,
    "safe_arithmetic_battery": """
        WITH t AS (
            SELECT l_orderkey, l_linenumber, l_extendedprice,
                   CAST(trunc(l_quantity) AS INT) % 5 AS divisor
            FROM lineitem
        )
        SELECT l_orderkey, l_linenumber,
               divisor = 0 AS div_was_null,
               floor(coalesce(CASE WHEN divisor = 0 THEN NULL
                              ELSE l_extendedprice / divisor END, -1) * 100
                     + 0.501e0) / 100e0 AS safe_ratio
        FROM t ORDER BY l_orderkey, l_linenumber
    """,
    "decimal_money_totals": """
        SELECT o_orderstatus,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(15, 2)))
                    AS DECIMAL(18, 2)) AS VARCHAR) AS total_dec,
               CAST(CAST(avg(CAST(o_totalprice AS DECIMAL(15, 2)))
                    AS DECIMAL(18, 4)) AS VARCHAR) AS avg_dec,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "interval_battery": """
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) + 45                   AS plus_45d,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
                                                                AS plus_3m,
               last_day(CAST(o_orderdate AS DATE))              AS month_end,
               CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start
        FROM orders ORDER BY o_orderkey
    """,
    "string_battery": """
        SELECT c_custkey,
               lower(c_name)                         AS lower_name,
               upper(c_mktsegment)                   AS upper_seg,
               CAST(length(c_name) AS INT)           AS name_len,
               substr(c_name, 1, 8)                  AS name_prefix,
               c_mktsegment || '/' || c_name         AS seg_name,
               replace(c_name, 'Customer', 'Cust')   AS short_name,
               trim('  pad  ')                       AS trimmed,
               lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
               reverse(c_mktsegment)                 AS rev_seg,
               CAST(strpos(c_name, '#') AS INT)      AS hash_pos,
               CAST(c_name LIKE 'Customer#%' AS INT) AS is_customer,
               CAST(regexp_extract(c_name, '#(\\d+)', 1) AS BIGINT) AS name_num,
               string_split(c_name, '#')[1]          AS split_head,
               CAST(contains(c_mktsegment, 'ING') AS INT) AS has_ing
        FROM customer ORDER BY c_custkey
    """,
    "date_battery": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT)     AS yr,
               CAST(quarter(o_orderdate) AS INT)  AS qtr,
               CAST(month(o_orderdate) AS INT)    AS mon,
               CAST(day(o_orderdate) AS INT)      AS dom,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               CAST(o_orderdate AS DATE) + 30     AS due_date,
               CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                    AS INT)                       AS days_since_epoch,
               strftime(o_orderdate, '%Y-%m')     AS ym,
               CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec
        FROM orders ORDER BY o_orderkey
    """,
    "math_conditional_battery": f"""
        SELECT l_orderkey, l_linenumber,
               {R("l_extendedprice * (1 - l_discount)")}      AS net,
               abs(l_extendedprice - 1000.0)                  AS abs_diff,
               CAST(ceil(l_extendedprice) AS BIGINT)          AS ceil_price,
               CAST(floor(l_extendedprice) AS BIGINT)         AS floor_price,
               {R("sqrt(l_extendedprice)", 6)}                AS sqrt_price,
               {R("ln(l_extendedprice)", 6)}                  AS ln_price,
               {R("log10(l_extendedprice)", 6)}               AS log10_price,
               {R("pow(l_discount, 2)", 6)}                   AS disc_sq,
               l_orderkey % 7                                 AS key_mod7,
               CAST(sign(l_quantity - 25.0) AS INT)           AS qty_sign,
               CASE WHEN l_quantity < 10 THEN 'low'
                    WHEN l_quantity < 40 THEN 'mid'
                    ELSE 'high' END                           AS qty_band,
               coalesce(nullif(l_returnflag, 'N'), 'none')    AS flag_or_none,
               greatest(l_quantity, l_discount * 100)         AS greatest_v,
               least(l_tax, l_discount)                       AS least_v,
               CAST(trunc(l_quantity) AS INT)                 AS qty_int,
               CAST(l_linenumber AS VARCHAR)                  AS line_str
        FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    "csv_membership_filter": """
        WITH p AS (SELECT 'BUILDING,MACHINERY' AS v)
        SELECT c_mktsegment, count(*) AS n
        FROM customer, p
        WHERE p.v IS NULL OR p.v = ''
           OR list_contains(string_split(p.v, ','), c_mktsegment)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
}


_TRY_SQL = """
    SELECT count(*) AS n,
           CAST(sum(CASE WHEN {div} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_div_by_zero,
           CAST(sum(CASE WHEN {badcast} IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_bad_casts,
           CAST(sum(CASE WHEN {overflow} IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_overflows,
           CAST(sum(CASE WHEN {elem} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bad_indexes,
           {avg_ok} AS avg_valid_quotient
    FROM orders
"""


def try_arithmetic_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression battery (`try_divide` / `try_cast` /
    `try_add` / `try_element_at`): under Spark 4's default ANSI mode a
    bad row ABORTS the job, so the try_* family is how a 100 TB batch
    survives dirty data — one poison row must not kill a 6-hour job.
    Counts each failure class (division by zero, unparseable cast,
    BIGINT overflow, out-of-range index) as NULL outcomes.

    The DuckDB oracle states the same semantics in its own dialect
    (plain `/` yields NULL on zero there; `try_cast` matches;
    list[out-of-range] is NULL; the overflow branch is the CASE its
    operand range implies). One streaming aggregate, no shuffle."""
    load_tables(spark, sf_dir)
    return spark.sql(_TRY_SQL.format(
        div="try_divide(o_totalprice, CAST(o_custkey % 3 AS DOUBLE))",
        badcast="try_cast(o_orderpriority AS INT)",
        overflow="try_add(o_orderkey, 9223372036854775800)",
        elem="try_element_at(split(o_orderpriority, '-'), 5)",
        avg_ok=R("avg(try_divide(o_totalprice,"
                 " CAST(o_custkey % 3 AS DOUBLE)))", 2),
    ))


QUERIES["try_arithmetic_battery"] = try_arithmetic_battery
ORACLE["try_arithmetic_battery"] = _TRY_SQL.format(
    div="(o_totalprice / CAST(o_custkey % 3 AS DOUBLE))",
    badcast="try_cast(o_orderpriority AS INT)",
    # all o_orderkey >= 1; adding 2^63-8 overflows exactly when key > 7
    overflow="(CASE WHEN o_orderkey > 7 THEN NULL ELSE o_orderkey END)",
    elem="string_split(o_orderpriority, '-')[5]",
    avg_ok=R("avg(o_totalprice / CAST(o_custkey % 3 AS DOUBLE))", 2),
)


# --- business-day shipping latency ----------------------------------------------
# Monday anchor strictly before the data's first date, so day counts stay
# non-negative and DIV/% agree across engines.
BUSDAY_ANCHOR = "1991-12-30"


def _busday_sql(days, intdiv: str, pctl: str) -> str:
    """Business-day (Mon-Fri) shipping latency per order priority, with
    the weekday count done in pure epoch-day arithmetic instead of any
    engine weekday function (Spark dayofweek() is 1=Sunday, DuckDB
    dayofweek() is 0=Sunday — a classic cross-engine trap; days-since-a-
    known-Monday dodges it entirely). B(d) = 5*(n/7) + min(n mod 7, 5)
    counts weekdays in [anchor, d); latency = B(ship) - B(order)."""
    b_order = (f"(5 * ({days('o.o_orderdate')} {intdiv} 7)"
               f" + least({days('o.o_orderdate')} % 7, 5))")
    b_ship = (f"(5 * ({days('l.l_shipdate')} {intdiv} 7)"
              f" + least({days('l.l_shipdate')} % 7, 5))")
    return f"""
        WITH lat AS (
            SELECT o.o_orderpriority,
                   {b_ship} - {b_order} AS busdays
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        )
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_lineitems,
               CAST(min(busdays) AS BIGINT) AS min_busdays,
               {R("avg(busdays * 1e0)", 4)} AS avg_busdays,
               {R(f"{pctl}(busdays * 1e0, 0.9e0)", 4)} AS p90_busdays,
               CAST(max(busdays) AS BIGINT) AS max_busdays
        FROM lat
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """


def business_days_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency in BUSINESS days per order priority (see
    _busday_sql) — the SLA metric operations actually reports, next to
    the calendar-day latencies elsewhere in the suite.

    Scale shape: the weekday count is closed-form row-local arithmetic
    (no calendar table, no per-day explode), then one grouped agg."""
    load_tables(spark, sf_dir)
    return spark.sql(_busday_sql(
        lambda c: f"datediff({c}, DATE '{BUSDAY_ANCHOR}')",
        "DIV",
        "percentile",
    ))


QUERIES["business_days_latency"] = business_days_latency
ORACLE["business_days_latency"] = _busday_sql(
    lambda c: f"datediff('day', DATE '{BUSDAY_ANCHOR}', {c})",
    "//",
    "quantile_cont",
)
