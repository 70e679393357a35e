"""Retail-analytics operators: market-basket association rules and the
Pareto-frontier (skyline) query.

Reference parity: the reference's warehouse targets all express these as
plain SQL over the fact tables (association rules are the canonical
"customers who bought X also bought Y" report; skyline is the classic
price/quality catalog query — Börzsönyi et al., "The Skyline Operator",
ICDE 2001). Both are single-scan + small-relation shapes here, no
dedicated operator needed in either engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_tables

# --- market-basket association rules -----------------------------------------
#
# Baskets = orders; items = the DISTINCT part brands in each order (brand
# granularity keeps the rule space interpretable: 25 brands -> <=300 rules).
# Standard a-priori measures (Agrawal/Imieliński/Swami SIGMOD'93):
#   support(A,B) = n(A,B)/N     confidence(A->B) = n(A,B)/n(A)
#   lift(A,B)    = N*n(A,B)/(n(A)*n(B))
# Emitted per UNORDERED pair (b1 < b2) with both directed confidences, so
# the row count stays at C(25,2) while preserving the asymmetric measure.
MIN_PAIR_SUPPORT = 50

_BASKET_SQL = f"""
    WITH items AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    nb AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM items),
    brand_n AS (
        SELECT p_brand, count(*) AS n FROM items GROUP BY p_brand
    ),
    pair_n AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               count(*) AS n_ab
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY a.p_brand, b.p_brand
    )
    SELECT p.brand_a, p.brand_b,
           CAST(p.n_ab AS BIGINT) AS n_ab,
           {R("p.n_ab * 1e0 / nb.n_baskets", 6)} AS support,
           {R("p.n_ab * 1e0 / ba.n", 6)} AS conf_a_to_b,
           {R("p.n_ab * 1e0 / bb.n", 6)} AS conf_b_to_a,
           {R("p.n_ab * 1e0 * nb.n_baskets / (ba.n * bb.n)", 6)} AS lift
    FROM pair_n p
    JOIN brand_n ba ON ba.p_brand = p.brand_a
    JOIN brand_n bb ON bb.p_brand = p.brand_b
    CROSS JOIN nb
    WHERE p.n_ab >= {MIN_PAIR_SUPPORT}
    ORDER BY {R("p.n_ab * 1e0 * nb.n_baskets / (ba.n * bb.n)", 6)} DESC,
             p.brand_a, p.brand_b
    LIMIT 15
"""


def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 brand-pair association rules by lift (min pair support 50),
    with support and both directed confidences.

    Scale shape: the pair explosion is bounded by (distinct brands per
    basket choose 2) per order — a per-key quadratic on a SMALL per-basket
    set (max 11 brands here), i.e. O(N * k^2) total, the standard a-priori
    pair-counting pass. brand_n is a 25-row broadcast; the final rollup is
    at most |brands|^2/2 rows regardless of corpus size. Ties in lift
    are broken on the rounded value then (brand_a, brand_b), so the top-15
    is engine-stable."""
    load_tables(spark, sf_dir)
    return spark.sql(_BASKET_SQL)


# --- Pareto frontier (skyline) ------------------------------------------------
#
# Skyline of the part catalog: minimize p_retailprice, maximize p_size.
# x dominates y iff x.price <= y.price AND x.size >= y.size with at least
# one strict. Instead of the O(n^2) NOT EXISTS self-join, the sort-scan
# formulation (Börzsönyi ICDE'01 §3's sorted-list argument): group rows by
# price, take each price's max size, then a row survives iff its size
# equals its price-group max AND strictly exceeds every max size at any
# strictly lower price (a running max over the price-grouped relation).
_PARETO_SQL = """
    WITH by_price AS (
        SELECT p_retailprice, max(p_size) AS pmax
        FROM part GROUP BY p_retailprice
    ),
    w AS (
        -- hash%1 partition: constant — by_price is bounded by the price
        -- grid; declares the single partition intentional
        SELECT p_retailprice, pmax,
               max(pmax) OVER (
                   PARTITION BY (hash(p_retailprice) % 1)
                   ORDER BY p_retailprice
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS best_cheaper
        FROM by_price
    )
    SELECT p.p_partkey, p.p_brand, p.p_retailprice,
           CAST(p.p_size AS BIGINT) AS p_size
    FROM part p
    JOIN w ON p.p_retailprice = w.p_retailprice
    WHERE p.p_size = w.pmax
      AND (w.best_cheaper IS NULL OR w.pmax > w.best_cheaper)
    ORDER BY p.p_retailprice, p.p_partkey
"""


def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-optimal) parts: no other part is both cheaper-or-
    equal and larger-or-equal with one strict. Equal (price, size)
    duplicates do not dominate each other, so all survive — the window
    compares against OTHER price groups and the price-group max only.

    Scale shape: one grouped agg to |distinct prices| rows, one running-max
    window over that (small) relation, then a broadcast-sized join back to
    the base scan. No self-join on the fact table; the window relation is
    bounded by the price grid, not the row count."""
    load_tables(spark, sf_dir)
    return spark.sql(_PARETO_SQL)


QUERIES = {
    "basket_association_rules": basket_association_rules,
    "pareto_frontier_parts": pareto_frontier_parts,
}
ORACLE = {
    "basket_association_rules": _BASKET_SQL,
    "pareto_frontier_parts": _PARETO_SQL,
}


# --- segment affinity index -----------------------------------------------------
AFFINITY_TOP = 3
AFFINITY_MIN_N = 50

_AFFINITY_SQL = f"""
    WITH sb AS (
        SELECT c.c_mktsegment AS seg, p.p_brand AS brand,
               count(*) AS n
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY c.c_mktsegment, p.p_brand
    ),
    seg_tot AS (SELECT seg, sum(n) AS ns FROM sb GROUP BY seg),
    brand_tot AS (SELECT brand, sum(n) AS nb FROM sb GROUP BY brand),
    tot AS (SELECT sum(n) AS nt FROM sb),
    scored AS (
        SELECT sb.seg, sb.brand, sb.n,
               (sb.n * 1e0 / st.ns) / (bt.nb * 1e0 / t.nt) AS affinity,
               row_number() OVER (
                   PARTITION BY sb.seg
                   ORDER BY floor((sb.n * 1e0 / st.ns)
                                  / (bt.nb * 1e0 / t.nt)
                                  * 1000000e0 + 0.501e0) DESC, sb.brand
               ) AS rk
        FROM sb
        JOIN seg_tot st ON st.seg = sb.seg
        JOIN brand_tot bt ON bt.brand = sb.brand
        CROSS JOIN tot t
        WHERE sb.n >= {AFFINITY_MIN_N}
    )
    SELECT seg AS c_mktsegment, CAST(rk AS BIGINT) AS rank, brand,
           CAST(n AS BIGINT) AS n_lineitems,
           {R("affinity", 6)} AS affinity_index
    FROM scored
    WHERE rk <= {AFFINITY_TOP}
    ORDER BY seg, rk
"""


def segment_affinity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retail affinity index (the classic BI "index score"): for each
    market segment, the top-{AFFINITY_TOP} brands by (brand share within
    segment) / (brand share overall) — >1 means the segment
    over-consumes the brand relative to the population; the
    "Fightin' Words"/distinctive-terms idea on the retail star schema
    with a plain ratio instead of the Dirichlet z.

    Scale shape: one fact-scan grouped agg to |segments|x|brands| rows;
    the marginals are small broadcast relations and the rank window
    partitions by segment over the bounded score grid (ranked on the
    canon-floored score with brand tie-break — engine-stable)."""
    load_tables(spark, sf_dir)
    return spark.sql(_AFFINITY_SQL)


QUERIES["segment_affinity_index"] = segment_affinity_index
ORACLE["segment_affinity_index"] = _AFFINITY_SQL
