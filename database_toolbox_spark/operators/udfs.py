"""UDF tier (SURVEY.md §2.B UDF/UDAF/UDTF surface; §7 step 6).

The reference's only extension point is YAML SQL templates (a macro
facility, CONTRIBUTING.md:219-254); genuine function extensibility is
provided here the Spark way:
- scalar: `@pandas_udf` (Arrow-vectorized), registered SQL-callable via
  `spark.udf.register`
- UDAF: pandas_udf GROUPED_AGG
- UDTF-style: `applyInPandas` grouped map

All UDF bodies are defined inside the query functions so cloudpickle ships
them by value (workers never import this package). Oracles recompute the
same math in SQL — an independent check that the Arrow path is lossless.

Scale notes: pandas UDFs move Arrow batches, not rows; grouped-map shuffles
once on the group key and holds one group per task.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from database_toolbox_spark.functions import canon_round
from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_table, load_tables


def scalar_pandas_udf_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF, registered SQL-callable: a price score
    ln(1+price)*2 computed in Arrow batches."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def price_score(price: pd.Series) -> pd.Series:
        return np.log1p(price) * 2.0

    spark.udf.register("price_score", price_score)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            canon_round(F.expr("price_score(o_totalprice)"), 6).alias("score"),
        )
        .orderBy("o_orderkey")
    )


def grouped_agg_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF via pandas_udf GROUPED_AGG: geometric mean of order price per
    market segment."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def geo_mean(price: pd.Series) -> float:  # Series -> scalar = grouped agg
        return float(np.exp(np.log(price).mean()))

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(canon_round(geo_mean("o_totalprice"), 4).alias("geo_mean_price"))
        .orderBy("c_mktsegment")
    )


def grouped_map_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-style grouped map via applyInPandas: per-nation z-score of
    customer balances (whole group in, whole group out)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["c_acctbal"].mean()
        sd = pdf["c_acctbal"].std(ddof=1)
        return pd.DataFrame(
            {
                "c_nationkey": pdf["c_nationkey"],
                "c_custkey": pdf["c_custkey"],
                "z": (pdf["c_acctbal"] - mu) / sd,
            }
        )

    cust = load_table(spark, sf_dir, "customer")
    out = cust.groupBy("c_nationkey").applyInPandas(
        zscore, schema="c_nationkey int, c_custkey long, z double"
    )
    return out.select(
        "c_nationkey", "c_custkey", canon_round(F.col("z"), 4).alias("z")
    ).orderBy("c_custkey")


def udtf_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 user-defined TABLE function) applied laterally:
    split each document into fixed 10-token chunks, one output row per
    chunk. The UDTF class is defined in-function so cloudpickle ships it by
    value (workers import no package). UDTFs are the row-expanding Python
    extension point — the per-row fan-out twin of mapInPandas; keep them
    off the hot path (Arrow-batched pandas UDFs beat them) but they
    complete the UDF/UDAF/UDTF surface (SURVEY.md §2.B)."""
    from pyspark.sql.functions import udtf  # noqa: PLC0415

    @udtf(returnType="chunk_idx: int, n_tokens: int")
    class ChunkStats:
        def eval(self, text: str):
            toks = text.split(" ")  # single-space split, matching the SQL twin
            for i in range(0, len(toks), 10):
                yield (i // 10, len(toks[i : i + 10]))

    spark.udtf.register("chunk_stats_udtf", ChunkStats)
    load_table(spark, sf_dir, "documents")
    return spark.sql("""
        SELECT d.doc_id, c.chunk_idx, c.n_tokens
        FROM documents d, LATERAL chunk_stats_udtf(d.text) c
        ORDER BY d.doc_id, c.chunk_idx
    """)


def sql_udf_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UDF (CREATE FUNCTION ... RETURN <expr>, Spark 4.0): the
    warehouse-style scalar macro. Unlike Python UDFs, the body is inlined
    into the Catalyst plan at analysis time — full codegen, predicate
    pushdown THROUGH the function, zero serialization cost. This is the
    true analog of the reference's YAML `statement` templates
    (reference CONTRIBUTING.md:219-254): named, reusable SQL fragments."""
    load_tables(spark, sf_dir)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION net_revenue(
            ep DOUBLE, disc DOUBLE, tax DOUBLE)
        RETURNS DOUBLE
        RETURN ep * (1e0 - disc) * (1e0 + tax)
    """)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION discount_band(d DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN d < 0.03e0 THEN 'low'
                    WHEN d < 0.07e0 THEN 'mid'
                    ELSE 'high' END
    """)
    return spark.sql(f"""
        SELECT discount_band(l_discount) AS band,
               count(*) AS n_items,
               {R("sum(net_revenue(l_extendedprice, l_discount, l_tax))")}
                   AS net_rev
        FROM lineitem
        WHERE l_shipdate >= DATE '1995-01-01'
        GROUP BY discount_band(l_discount)
        ORDER BY band
    """)


QUERIES = {
    "sql_udf_margin": sql_udf_margin,
    "scalar_pandas_udf_scores": scalar_pandas_udf_scores,
    "grouped_agg_pandas_udf": grouped_agg_pandas_udf,
    "grouped_map_zscores": grouped_map_zscores,
    "udtf_chunk_stats": udtf_chunk_stats,
}

ORACLE = {
    "sql_udf_margin": f"""
        SELECT CASE WHEN l_discount < 0.03e0 THEN 'low'
                    WHEN l_discount < 0.07e0 THEN 'mid'
                    ELSE 'high' END AS band,
               count(*) AS n_items,
               {R("sum(l_extendedprice * (1e0 - l_discount)"
                  " * (1e0 + l_tax))")} AS net_rev
        FROM lineitem
        WHERE l_shipdate >= DATE '1995-01-01'
        GROUP BY 1
        ORDER BY band
    """,
    "udtf_chunk_stats": """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        )
        SELECT doc_id,
               CAST(u.i AS INT) AS chunk_idx,
               CAST(least(10, len(toks) - u.i * 10) AS INT) AS n_tokens
        FROM t, unnest(range(0, CAST(ceil(len(toks) / 10e0) AS BIGINT)))
                AS u(i)
        ORDER BY doc_id, chunk_idx
    """,
    "scalar_pandas_udf_scores": f"""
        SELECT o_orderkey, {R("ln(1 + o_totalprice) * 2", 6)} AS score
        FROM orders ORDER BY o_orderkey
    """,
    "grouped_agg_pandas_udf": f"""
        SELECT c.c_mktsegment,
               {R("exp(avg(ln(o.o_totalprice)))", 4)} AS geo_mean_price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
    "grouped_map_zscores": f"""
        WITH s AS (
            SELECT c_nationkey,
                   avg(c_acctbal) AS mu,
                   stddev_samp(c_acctbal) AS sd
            FROM customer GROUP BY c_nationkey
        )
        SELECT c.c_nationkey, c.c_custkey,
               {R("(c.c_acctbal - s.mu) / s.sd", 4)} AS z
        FROM customer c JOIN s ON c.c_nationkey = s.c_nationkey
        ORDER BY c.c_custkey
    """,
}
