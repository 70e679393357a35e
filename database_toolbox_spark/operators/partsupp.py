"""Derived `partsupp` + the TPC-H classics that need it (Q2/Q9/Q11/Q20
analogs).

The driver schema has no partsupp table, so we derive one DETERMINISTICALLY
from part × supplier-count — 4 suppliers per part (TPC-H's fan-out), with
availqty/supplycost drawn from md5 slices of the (partkey, suppkey) pair so
Spark and the DuckDB oracle materialize bit-identical values (md5 is the one
cross-engine hash — FIXTURES.md determinism rules). That completes the
standard-SQL surface the reference commits to via `execute_sql` passthrough
(SURVEY.md §2.B [implied]; `images/redshift/redshift.yaml:44-48`).

Scale notes (100 TB design):
- partsupp is derived, never materialized: 4·|part| rows stream out of the
  part scan with two md5 calls per row, all JVM-side codegen (no UDFs). At
  TPC-H proportions (|part| ≈ |lineitem|/30) that is the cheap side of every
  join it appears in.
- The supplier-count scalar is a broadcast 1-row cross join, not a driver
  collect — the plan stays fully distributed and re-optimizes under AQE.
- Q2's per-part minimum is aggregate-then-self-join on (partkey, min_cost);
  Q9/Q20 join lineitem→partsupp on the composite (partkey, suppkey) key —
  both sides hash-partition on the same key, one shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_toolbox_spark.functions import bounded_rank_window, disc_price, money, ts
from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_table

SUPPLIERS_PER_PART = 4
_DISC = "l_extendedprice * (1 - l_discount)"


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost), derived:

    - ps_suppkey: (p_partkey·7 + i·stride) mod n_supp for i in 0..3, with
      stride = 1 + n_supp div 4 → 4 distinct, deterministic suppliers/part
      (keys are 0-based in this dataset).
    - ps_availqty  = 1 + md5[0:6]  mod 9999          (1..9999)
    - ps_supplycost = (100 + md5[6:12] mod 90000)/100 (1.00..900.99)
    """
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    n_supp = load_table(spark, sf_dir, "supplier").agg(
        F.count("*").alias("n_supp")
    )
    quad = spark.range(SUPPLIERS_PER_PART).select(F.col("id").alias("i"))
    stride = 1 + F.floor(F.col("n_supp") / F.lit(4.0)).cast("long")
    sk = (F.col("p_partkey") * 7 + F.col("i") * stride) % F.col("n_supp")
    key = F.concat(F.col("p_partkey").cast("string"), F.lit(":"), sk.cast("string"))
    h = F.md5(key)
    h1 = F.conv(F.substring(h, 1, 6), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 7, 6), 16, 10).cast("long")
    return (
        part.crossJoin(F.broadcast(quad))
        .crossJoin(F.broadcast(n_supp))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            sk.alias("ps_suppkey"),
            (1 + h1 % 9999).cast("int").alias("ps_availqty"),
            ((100 + h2 % 90000) / F.lit(100.0)).alias("ps_supplycost"),
        )
    )


_PARTSUPP_CTE = """
        ns AS (SELECT count(*) AS n_supp FROM supplier),
        ps_raw AS (
            SELECT p_partkey AS ps_partkey,
                   (p_partkey * 7 + t.i *
                    (1 + CAST(floor(n_supp / 4e0) AS BIGINT))) % n_supp
                   AS ps_suppkey
            FROM part, (VALUES (0), (1), (2), (3)) t(i), ns
        ),
        partsupp AS (
            SELECT ps_partkey, ps_suppkey,
                   CAST(1 + CAST(concat('0x', substr(md5(k), 1, 6)) AS BIGINT)
                            % 9999 AS INT) AS ps_availqty,
                   (100 + CAST(concat('0x', substr(md5(k), 7, 6)) AS BIGINT)
                          % 90000) / 100e0 AS ps_supplycost
            FROM (SELECT ps_partkey, ps_suppkey,
                         concat(CAST(ps_partkey AS VARCHAR), ':',
                                CAST(ps_suppkey AS VARCHAR)) AS k
                  FROM ps_raw)
        )
"""


def partsupp_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum of the derived table itself — proves both engines derive the
    identical partsupp before any query builds on it."""
    ps = derived_partsupp(spark, sf_dir)
    return ps.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("ps_suppkey").alias("n_suppliers"),
        F.sum("ps_availqty").alias("sum_avail"),
        money(F.sum("ps_supplycost")).alias("sum_cost"),
        F.sum(F.col("ps_partkey") * F.col("ps_suppkey")).alias("key_dot"),
    )


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 analog: for STANDARD parts of size ≥ 25, the EUROPE supplier with
    the minimum supply cost — aggregate-then-join (min per part), top-20."""
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") >= 25)
    )
    ps = derived_partsupp(spark, sf_dir)
    eu = (
        ps.join(supplier, ps.ps_suppkey == supplier.s_suppkey)
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
    )
    best = eu.groupBy(F.col("ps_partkey").alias("b_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    full = (
        eu.join(
            best,
            (eu.ps_partkey == best.b_partkey)
            & (eu.ps_supplycost == best.min_cost),
        )
        .join(part, eu.ps_partkey == part.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            money(F.col("ps_supplycost")).alias("supply_cost"),
        )
    )
    top = full.orderBy(
        F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
    ).limit(20)
    w = bounded_rank_window(F.col("p_partkey"), F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
    return top.withColumn("rnk", F.row_number().over(w))


def nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 analog: per supplier-nation, per order-year profit on 'bolt' parts
    = revenue − supply cost · quantity; lineitem⋈partsupp on the composite
    (partkey, suppkey) key."""
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    )
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ps = derived_partsupp(spark, sf_dir)
    amount = disc_price() - F.col("ps_supplycost") * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(money(F.sum(amount)).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 analog: EUROPE-held stock value per part, keeping parts above
    0.1% of the total — scalar threshold via broadcast 1-row cross join."""
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    ps = derived_partsupp(spark, sf_dir)
    eu = (
        ps.join(supplier, ps.ps_suppkey == supplier.s_suppkey)
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("ps_partkey", (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"))
    )
    per_part = eu.groupBy("ps_partkey").agg(F.sum("v").alias("value_raw"))
    total = eu.agg((F.sum("v") * 0.001).alias("threshold"))
    filtered = (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_raw") > F.col("threshold"))
        .select("ps_partkey", money(F.col("value_raw")).alias("value"))
    )
    w = bounded_rank_window(F.col("ps_partkey"), F.col("value").desc(), "ps_partkey")
    return (
        filtered.orderBy(F.col("value").desc(), "ps_partkey")
        .withColumn("rnk", F.row_number().over(w))
    )


def excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 analog: suppliers holding excess stock of a 'red' part —
    ps_availqty > 50× the 1996-97 shipped quantity of that (part, supplier)
    — grouped-lineitem join then left_semi onto supplier."""
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts("1996-01-01"))
        & (F.col("l_shipdate") < ts("1998-01-01"))
    )
    ps = derived_partsupp(spark, sf_dir)
    shipped = li.groupBy(
        F.col("l_partkey").alias("q_partkey"), F.col("l_suppkey").alias("q_suppkey")
    ).agg(F.sum("l_quantity").alias("qty_shipped"))
    excess = (
        ps.join(part, ps.ps_partkey == part.p_partkey)
        .join(
            shipped,
            (ps.ps_partkey == F.col("q_partkey"))
            & (ps.ps_suppkey == F.col("q_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.lit(50.0) * F.col("qty_shipped"))
        .select("ps_suppkey")
    )
    return (
        supplier.join(excess, supplier.s_suppkey == excess.ps_suppkey, "left_semi")
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .select("s_name", money(F.col("s_acctbal")).alias("acctbal"), "n_name")
        .orderBy("s_name")
    )


QUERIES = {
    "partsupp_digest": partsupp_digest,
    "min_cost_supplier": min_cost_supplier,
    "nation_profit": nation_profit,
    "important_stock": important_stock,
    "excess_stock_suppliers": excess_stock_suppliers,
}

ORACLE = {
    "partsupp_digest": f"""
        WITH {_PARTSUPP_CTE}
        SELECT count(*) AS n_rows,
               count(DISTINCT ps_suppkey) AS n_suppliers,
               -- CASTs: DuckDB SUM over integers is HUGEINT → pandas
               -- float64, breaking the driver hash vs Spark's BIGINT
               CAST(sum(ps_availqty) AS BIGINT) AS sum_avail,
               {R("sum(ps_supplycost)")} AS sum_cost,
               CAST(sum(ps_partkey * ps_suppkey) AS BIGINT) AS key_dot
        FROM partsupp
    """,
    "min_cost_supplier": f"""
        WITH {_PARTSUPP_CTE},
        eu AS (
            SELECT ps.*, s.s_acctbal, s.s_name, n.n_name
            FROM partsupp ps
            JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            JOIN region r   ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'EUROPE'
        ),
        best AS (
            SELECT ps_partkey AS b_partkey, min(ps_supplycost) AS min_cost
            FROM eu GROUP BY ps_partkey
        ),
        top AS (
            SELECT eu.s_acctbal, eu.s_name, eu.n_name, p.p_partkey,
                   {R("eu.ps_supplycost")} AS supply_cost
            FROM eu
            JOIN best ON eu.ps_partkey = best.b_partkey
                     AND eu.ps_supplycost = best.min_cost
            JOIN part p ON eu.ps_partkey = p.p_partkey
            WHERE p.p_type = 'STANDARD' AND p.p_size >= 25
            ORDER BY eu.s_acctbal DESC, eu.n_name, eu.s_name, p.p_partkey
            LIMIT 20
        )
        SELECT *, CAST(row_number() OVER (ORDER BY s_acctbal DESC, n_name,
                       s_name, p_partkey) AS INT) AS rnk
        FROM top
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    """,
    "nation_profit": f"""
        WITH {_PARTSUPP_CTE}
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS INT) AS o_year,
               {R(f"sum(l.{_DISC} - ps.ps_supplycost * l.l_quantity)")}
               AS sum_profit
        FROM lineitem l
        JOIN part p     ON l.l_partkey = p.p_partkey
        JOIN partsupp ps ON l.l_partkey = ps.ps_partkey
                        AND l.l_suppkey = ps.ps_suppkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%bolt%'
        GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INT)
        ORDER BY nation, o_year DESC
    """,
    "important_stock": f"""
        WITH {_PARTSUPP_CTE},
        eu AS (
            SELECT ps.ps_partkey, ps.ps_supplycost * ps.ps_availqty AS v
            FROM partsupp ps
            JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            JOIN region r   ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'EUROPE'
        ),
        per_part AS (
            SELECT ps_partkey, sum(v) AS value_raw FROM eu GROUP BY ps_partkey
        )
        SELECT ps_partkey, {R("value_raw")} AS value,
               CAST(row_number() OVER (ORDER BY {R("value_raw")} DESC,
                    ps_partkey) AS INT) AS rnk
        FROM per_part
        WHERE value_raw > (SELECT sum(v) * 0.001e0 FROM eu)
        ORDER BY value DESC, ps_partkey
    """,
    "excess_stock_suppliers": f"""
        WITH {_PARTSUPP_CTE},
        shipped AS (
            SELECT l_partkey AS q_partkey, l_suppkey AS q_suppkey,
                   sum(l_quantity) AS qty_shipped
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l_partkey, l_suppkey
        )
        SELECT s.s_name, {R("s.s_acctbal")} AS acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE s.s_suppkey IN (
            SELECT ps.ps_suppkey
            FROM partsupp ps
            JOIN part p ON ps.ps_partkey = p.p_partkey
            JOIN shipped q ON ps.ps_partkey = q.q_partkey
                          AND ps.ps_suppkey = q.q_suppkey
            WHERE p.p_name LIKE '%red%'
              AND ps.ps_availqty > 50e0 * q.qty_shipped
        )
        ORDER BY s.s_name
    """,
}
