"""Semi-structured text extraction: URL parsing and XML parsing.

Reference parity: the wrapped warehouses all ship URL/XML extraction in their
SQL surface (BigQuery `NET.HOST`, Snowflake `PARSE_URL` / `PARSE_XML`,
Redshift `SPLIT_PART`-based idioms) and the reference commits to that surface
via arbitrary-SQL passthrough (`/root/reference/images/redshift/redshift.yaml:44-48`,
`/root/reference/README.md:1715-1716`). A web-corpus training pipeline needs
both: URL host/path/param extraction for source attribution and domain-level
dedup blocking, and XML/HTML-ish field extraction for markup-heavy crawls.

Spark-first: `F.parse_url` and `F.from_xml` are built-in JVM expressions
(Spark 4) — no UDFs, whole-stage codegen keeps the scan→project pipeline in
one stage. At 100 TB both are embarrassingly parallel per-row projections with
zero shuffle; the only shuffle in each query below is the final small groupBy.

Oracle strategy: the inputs are synthesized deterministically from table
columns, so DuckDB reconstructs the expected *outputs* directly from the same
base columns — the oracle checks the parse round-trip without needing a URL/XML
parser in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from database_toolbox_spark.session import load_table


def _doc_urls(docs: DataFrame) -> DataFrame:
    """Deterministic per-document URL: https://{source}.example.com/{lang}/doc/{id}?len={n_chars}&lang={lang}"""
    return docs.withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/"),
            F.col("lang"),
            F.lit("/doc/"),
            F.col("doc_id").cast("string"),
            F.lit("?len="),
            F.col("n_chars").cast("string"),
            F.lit("&lang="),
            F.col("lang"),
        ),
    )


def url_parse_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse host / path / query / single query-param out of synthesized URLs,
    then aggregate per host: doc count, distinct languages seen in the path,
    and the max `len` query parameter — the domain-level rollup a crawl
    pipeline runs before per-domain sampling."""
    docs = _doc_urls(load_table(spark, sf_dir, "documents"))
    parsed = docs.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("len")).cast("long").alias("len_param"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
    )
    return (
        parsed.groupBy("host", "proto")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang_param").alias("n_langs"),
            F.max("len_param").alias("max_len"),
            F.min(F.length("path")).cast("long").alias("min_path_len"),
            F.sum(F.length("query")).cast("long").alias("query_chars"),
        )
        .orderBy("host")
    )


_ORDER_XML_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("priority", T.StringType()),
    ]
)


def xml_order_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip orders through an XML document column and extract typed
    fields with `from_xml`, then aggregate — the markup-extraction path a
    crawl pipeline applies to XML/HTML payloads. The struct carries an
    attribute (`_id`) and three element fields with different types."""
    orders = load_table(spark, sf_dir, "orders")
    with_xml = orders.select(
        "o_orderkey",
        F.concat(
            F.lit('<order id="'),
            F.col("o_orderkey").cast("string"),
            F.lit('"><status>'),
            F.col("o_orderstatus"),
            F.lit("</status><total>"),
            F.format_number(F.col("o_totalprice"), 2),
            F.lit("</total><priority>"),
            F.col("o_orderpriority"),
            F.lit("</priority></order>"),
        ).alias("xml"),
    )
    parsed = with_xml.select(
        "o_orderkey",
        F.from_xml("xml", _ORDER_XML_SCHEMA).alias("doc"),
    ).select(
        "o_orderkey",
        F.col("doc._id").alias("xml_id"),
        F.col("doc.status").alias("status"),
        # format_number emits thousands separators; strip before cast back
        F.col("doc.priority").alias("priority"),
    )
    return (
        parsed.groupBy("status", "priority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("xml_id") == F.col("o_orderkey"), 1).otherwise(0))
            .cast("long")
            .alias("id_roundtrip_ok"),
        )
        .orderBy("status", "priority")
    )


QUERIES = {
    "url_parse_battery": url_parse_battery,
    "xml_order_battery": xml_order_battery,
}

ORACLE = {
    # Reconstruct expected parse outputs directly from base columns.
    "url_parse_battery": """
        WITH parsed AS (
            SELECT doc_id,
                   source || '.example.com'                       AS host,
                   '/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS path,
                   'len=' || CAST(n_chars AS VARCHAR) || '&lang=' || lang AS query,
                   n_chars                                        AS len_param,
                   lang                                           AS lang_param,
                   'https'                                        AS proto
            FROM documents
        )
        SELECT host, proto,
               count(*)                                  AS n_docs,
               count(DISTINCT lang_param)                AS n_langs,
               max(len_param)                            AS max_len,
               CAST(min(length(path)) AS BIGINT)         AS min_path_len,
               CAST(sum(length(query)) AS BIGINT)        AS query_chars
        FROM parsed
        GROUP BY host, proto
        ORDER BY host
    """,
    "xml_order_battery": """
        SELECT o_orderstatus                  AS status,
               o_orderpriority                AS priority,
               count(*)                       AS n,
               CAST(count(*) AS BIGINT)       AS id_roundtrip_ok
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
        ORDER BY status, priority
    """,
}


# --- URL canonicalization + dedup ------------------------------------------------
#
# The crawl-pipeline URL dedup pass: the same page is fetched under many
# spellings (host case, utm_* tracking params, trailing slash, fragments);
# canonicalization must collapse them before content fetch/dedup. Five
# docs share each logical page (doc_id DIV 5) and each doc's URL carries a
# deterministic doc_id%4 noise variant, so every group of 5 docs collapses
# to ONE canonical URL — but only if the utm strip is replace-ALL: the
# variant-3 URL carries TWO utm params ('?utm_campaign=x&utm_medium=y'),
# so a first-match-only regexp_replace leaves '&utm_medium=y' behind and
# breaks the collapse. Spark's regexp_replace is always replace-all;
# DuckDB's is first-match-only unless given the 'g' flag — hence the
# per-dialect `flags` argument below ('' for Spark, ", 'g'" for DuckDB).
# Normalization: lowercase, strip fragment, strip utm_* params, collapse
# a dangling '?'/'&', strip one trailing slash.

from database_toolbox_spark.operators._oracle import R as _R  # noqa: E402


def _url_dedup_sql(idiv: str, flags: str = "") -> str:
    return f"""
        WITH raw AS (
            SELECT doc_id, source,
                   concat(
                       'https://',
                       CASE WHEN doc_id % 4 = 1 THEN upper(source)
                            ELSE source END,
                       '.example.com/', lang, '/page/',
                       CAST({idiv} AS STRING),
                       CASE doc_id % 4
                           WHEN 1 THEN '?utm_source=feed'
                           WHEN 2 THEN '/#top'
                           WHEN 3 THEN '?utm_campaign=x&utm_medium=y'
                           ELSE '' END
                   ) AS url
            FROM documents
        ),
        canon AS (
            SELECT doc_id, source, url,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(
                               regexp_replace(lower(url), '#.*$', ''{flags}),
                               '[?&]utm_[a-z]+=[^&#]*', ''{flags}),
                           '[?&]$', ''{flags}),
                       '/$', ''{flags}) AS curl
            FROM raw
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_urls,
               CAST(count(DISTINCT url) AS BIGINT) AS n_raw_distinct,
               CAST(count(DISTINCT curl) AS BIGINT) AS n_canonical,
               {_R("1e0 - count(DISTINCT curl) * 1e0 / count(*)", 4)}
                   AS dup_rate
        FROM canon
        GROUP BY source ORDER BY source
    """


def url_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source URL dedup after canonicalization: raw-distinct vs
    canonical-distinct counts and the duplicate rate removed by
    normalization alone.

    Scale shape: per-row regexp projection + grouped distinct-counts —
    at scale the count(DISTINCT) pair becomes two partial-agg passes on
    the (source, url-hash) grain; no joins, no windows."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_url_dedup_sql("doc_id DIV 5"))


QUERIES["url_normalized_dedup"] = url_normalized_dedup
ORACLE["url_normalized_dedup"] = _url_dedup_sql("doc_id // 5", ", 'g'")
