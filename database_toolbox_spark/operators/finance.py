"""Financial / trend analytics over the order history: volume-weighted
average price, max drawdown, least-squares trend (regr_* battery), and an
offline single-changepoint detector.

Reference parity: the reference's warehouse targets answer these as plain
SQL over fact tables (README.md's execute_sql surface); the operators here
are the canonical finance/trend shapes every OLAP engine is asked for —
VWAP (sum(p*q)/sum(q) per bucket), running-peak drawdown, the SQL-standard
REGR_* aggregate family, and the binary-segmentation changepoint step
(Scott & Knott / Killick PELT's single-split cost), each expressed as
windows + grouped aggregates so Catalyst keeps them whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_tables

# A hash(<column>) % 1 PARTITION BY declares the single-partition window
# intentional (daily series are calendar-bounded: ~2.4k rows at any SF).
# It must hash a COLUMN: hash of a literal is constant-folded away and the
# window reverts to an empty partition spec (WindowExec then logs the
# "No Partition Defined" warning the bench hygiene gate greps for).
_ONE = "(hash(d) % 1)"

# --- monthly VWAP by brand ----------------------------------------------------
#
# VWAP = sum(extendedprice) / sum(quantity): the volume-weighted unit price
# per (ship-month, brand), versus the all-brand monthly VWAP — the standard
# "did this brand trade rich or cheap this month" report.


def _vwap_sql(month: str) -> str:
    return f"""
        WITH li AS (
            SELECT {month} AS m, p.p_brand,
                   l.l_extendedprice AS px, l.l_quantity AS qty
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        brand_m AS (
            SELECT m, p_brand,
                   sum(px) AS notional, sum(qty) AS volume
            FROM li GROUP BY m, p_brand
        ),
        all_m AS (
            SELECT m, sum(notional) / sum(volume) AS vwap_all
            FROM brand_m GROUP BY m
        )
        SELECT b.m AS ship_month, b.p_brand,
               CAST(b.volume AS BIGINT) AS volume,
               {R("b.notional / b.volume", 4)} AS vwap,
               {R("a.vwap_all", 4)} AS vwap_all,
               {R("(b.notional / b.volume) / a.vwap_all - 1e0", 6)}
                   AS rel_premium
        FROM brand_m b JOIN all_m a ON b.m = a.m
        WHERE b.volume >= 50
        ORDER BY ship_month, p_brand
    """


def vwap_monthly_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly VWAP per brand vs the all-brand monthly VWAP, with the
    relative premium. Volume floor keeps thin brand-months out.

    Scale shape: one join (part is broadcast-sized), one grouped agg to
    |months|x|brands| rows, then a join on the tiny monthly relation —
    no windows over the fact table, fully partial-aggregatable."""
    load_tables(spark, sf_dir)
    return spark.sql(
        _vwap_sql("CAST(date_trunc('month', l.l_shipdate) AS DATE)")
    )


# --- max drawdown of the cumulative demeaned revenue curve --------------------
#
# The daily-revenue equity curve (cumulative sum of demeaned daily revenue)
# is the CUSUM curve; its maximum drawdown (running peak minus current
# value) measures the deepest sustained below-trend stretch — the standard
# max-drawdown definition applied to the demand series. The trough is the
# FIRST day attaining the max drawdown (rounded to the cent grid so ulp-
# level sum reorderings cannot flip the argmax); the peak day is the first
# day the running peak was set; recovery is the first later day back at or
# above that peak (NULL while still under water).


def _drawdown_sql(dd_days: str) -> str:
    return f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS rev
            FROM orders GROUP BY CAST(o_orderdate AS DATE)
        ),
        mu AS (SELECT avg(rev) AS mu FROM daily),
        curve AS (
            SELECT d,
                   sum(rev - mu) OVER (PARTITION BY {_ONE} ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
            FROM daily CROSS JOIN mu
        ),
        w AS (
            SELECT d, cum,
                   max(cum) OVER (PARTITION BY {_ONE} ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS peak
            FROM curve
        ),
        trough AS (
            SELECT d AS trough_day, cum, peak
            FROM (
                SELECT d, cum, peak,
                       CAST(row_number() OVER (PARTITION BY {_ONE}
                           ORDER BY floor((peak - cum) * 1e2 + 0.501e0) DESC,
                                    d) AS BIGINT) AS rn
                FROM w
            ) x WHERE rn = 1
        ),
        peak_day AS (
            SELECT min(w.d) AS peak_day
            FROM w CROSS JOIN trough t
            WHERE floor(w.cum * 1e2 + 0.501e0)
                  = floor(t.peak * 1e2 + 0.501e0)
              AND w.d <= t.trough_day
        ),
        recovery AS (
            SELECT min(w.d) AS recovery_day
            FROM w CROSS JOIN trough t
            WHERE w.d > t.trough_day
              AND floor(w.cum * 1e2 + 0.501e0)
                  >= floor(t.peak * 1e2 + 0.501e0)
        )
        SELECT {R("t.peak - t.cum", 2)} AS max_drawdown,
               p.peak_day, t.trough_day, r.recovery_day,
               CAST({dd_days} AS BIGINT) AS underwater_days
        FROM trough t CROSS JOIN peak_day p CROSS JOIN recovery r
    """


def max_drawdown_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max drawdown of the cumulative demeaned daily-revenue curve: depth,
    peak/trough/recovery days, and days underwater (peak to trough).

    Scale shape: the windows run on the DAILY relation (calendar-bounded,
    ~2.4k rows regardless of SF) after one grouped agg over orders; the
    constant partition key declares that intentionally. The argmax is a
    deterministic row_number over the cent-rounded drawdown."""
    load_tables(spark, sf_dir)
    return spark.sql(_drawdown_sql("datediff(t.trough_day, p.peak_day)"))


# --- single changepoint in daily revenue --------------------------------------
#
# The first step of binary segmentation (the classical AMOC / CUSUM-SSE
# changepoint): choose the split minimizing SSE(left) + SSE(right), both in
# closed form from prefix sums — SSE(a..b) = Q - S^2/n. Guard bands keep
# >= MIN_SEG days on each side.

MIN_SEG = 30


def _changepoint_sql() -> str:
    return f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS rev
            FROM orders GROUP BY CAST(o_orderdate AS DATE)
        ),
        pre AS (
            SELECT d,
                   CAST(row_number() OVER (PARTITION BY {_ONE} ORDER BY d)
                        AS BIGINT) AS i,
                   sum(rev) OVER (PARTITION BY {_ONE} ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS s1,
                   sum(rev * rev) OVER (PARTITION BY {_ONE} ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS q1
            FROM daily
        ),
        tot AS (
            SELECT max(i) AS n, max(s1) AS s, max(q1) AS q FROM pre
        ),
        cost AS (
            SELECT p.d, p.i,
                   (p.q1 - p.s1 * p.s1 / p.i)
                   + ((t.q - p.q1)
                      - (t.s - p.s1) * (t.s - p.s1) / (t.n - p.i))
                       AS sse_split,
                   p.s1 / p.i AS left_mean,
                   (t.s - p.s1) / (t.n - p.i) AS right_mean,
                   t.q - t.s * t.s / t.n AS sse_total
            FROM pre p CROSS JOIN tot t
            WHERE p.i >= {MIN_SEG} AND p.i <= t.n - {MIN_SEG}
        )
        SELECT d AS split_day,
               {R("left_mean", 2)} AS left_mean,
               {R("right_mean", 2)} AS right_mean,
               {R("right_mean - left_mean", 2)} AS mean_shift,
               {R("1e0 - sse_split / sse_total", 6)} AS var_explained
        FROM (
            SELECT c.*,
                   CAST(row_number() OVER (PARTITION BY {_ONE}
                       ORDER BY floor(sse_split * 1e-3 + 0.501e0), d)
                       AS BIGINT) AS rn
            FROM cost c
        ) x WHERE rn = 1
    """


def changepoint_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single changepoint of daily revenue by two-segment SSE (AMOC):
    split day (last day of the left segment), segment means, shift, and
    variance explained by the split.

    Scale shape: prefix sums + one window pass on the calendar-bounded
    daily relation; every SSE is closed-form from (n, S, Q) — no per-split
    rescan, no self-join. The argmin rounds SSE onto a 1e3 grid before
    ordering so float merge order cannot flip the winner."""
    load_tables(spark, sf_dir)
    return spark.sql(_changepoint_sql())


# --- per-segment linear trend (REGR_* battery) --------------------------------
#
# The SQL-standard bivariate regression aggregates, exercised end-to-end:
# per market segment, regress daily segment revenue on the day index.


def _trend_sql(day_idx: str) -> str:
    return f"""
        WITH daily AS (
            SELECT c.c_mktsegment AS segment,
                   {day_idx} AS x,
                   sum(o.o_totalprice) AS y
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment, {day_idx}
        )
        SELECT segment,
               CAST(regr_count(y, x) AS BIGINT) AS n_days,
               {R("regr_slope(y, x)", 4)} AS slope_per_day,
               {R("regr_intercept(y, x)", 2)} AS intercept,
               {R("regr_r2(y, x)", 6)} AS r2,
               {R("corr(y, x)", 6)} AS pearson_r,
               {R("regr_avgx(y, x)", 4)} AS mean_x,
               {R("regr_avgy(y, x)", 2)} AS mean_y
        FROM daily
        GROUP BY segment ORDER BY segment
    """


def linear_trend_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares trend of daily revenue per market segment via the
    SQL-standard REGR_* aggregate family (+ corr), y = daily segment
    revenue, x = days since 1992-01-01.

    Scale shape: join + grouped agg to |segments|x|days| rows, then the
    regression aggregates (single-pass, partial-aggregatable sufficient
    statistics) roll that up to 5 rows. No windows, no sort."""
    load_tables(spark, sf_dir)
    return spark.sql(
        _trend_sql("datediff(CAST(o.o_orderdate AS DATE), DATE '1992-01-01')")
    )


QUERIES = {
    "vwap_monthly_brand": vwap_monthly_brand,
    "max_drawdown_revenue": max_drawdown_revenue,
    "changepoint_daily_revenue": changepoint_daily_revenue,
    "linear_trend_by_segment": linear_trend_by_segment,
}
ORACLE = {
    "vwap_monthly_brand": _vwap_sql(
        "CAST(date_trunc('month', l.l_shipdate) AS DATE)"
    ),
    "max_drawdown_revenue": _drawdown_sql(
        "datediff('day', p.peak_day, t.trough_day)"
    ),
    "changepoint_daily_revenue": _changepoint_sql(),
    "linear_trend_by_segment": _trend_sql(
        "datediff('day', DATE '1992-01-01', CAST(o.o_orderdate AS DATE))"
    ),
}


# --- extreme-value (Gumbel) return levels -----------------------------------------
#
# Block-maxima extreme-value analysis: monthly maxima of daily revenue
# fitted to a Gumbel distribution by the method of moments
# (beta = s*sqrt(6)/pi, mu = xbar - gamma*beta, Euler-Mascheroni gamma),
# then the T-block return levels mu - beta*ln(-ln(1 - 1/T)) — "the daily
# revenue spike exceeded once every T months". The capacity-planning
# question asked of every metrics warehouse.

_EULER_GAMMA = 0.57721566490153286
_EV_SQL = f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               sum(o_totalprice) AS rev
        FROM orders GROUP BY CAST(o_orderdate AS DATE),
                             CAST(date_trunc('month', o_orderdate) AS DATE)
    ),
    blocks AS (SELECT m, max(rev) AS mx FROM daily GROUP BY m),
    fit AS (
        SELECT count(*) AS n_blocks,
               avg(mx) AS xbar,
               stddev_samp(mx) AS s,
               max(mx) AS observed_max
        FROM blocks
    ),
    params AS (
        SELECT n_blocks, observed_max,
               s * sqrt(6e0) / pi() AS beta,
               avg_mu.mu
        FROM fit,
             LATERAL (SELECT xbar - {_EULER_GAMMA}e0 * s * sqrt(6e0) / pi()
                          AS mu) avg_mu
    )
    SELECT CAST(n_blocks AS BIGINT) AS n_blocks,
           {{mu}} AS gumbel_mu,
           {{beta}} AS gumbel_beta,
           {{rl12}} AS return_level_12mo,
           {{rl60}} AS return_level_60mo,
           {{rl120}} AS return_level_120mo,
           {{omax}} AS observed_max
    FROM params
"""


def _rl(t: int) -> str:
    return f"mu - beta * ln(-ln(1e0 - 1e0 / {t}e0))"


def extreme_value_return_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel method-of-moments fit on monthly maxima of daily revenue,
    with 12/60/120-month return levels and the observed maximum.

    Scale shape: daily rollup -> calendar-bounded monthly block maxima ->
    a 1-row moment fit; everything past the first agg is fixed-size."""
    load_tables(spark, sf_dir)
    return spark.sql(_EV_SQL.format(
        mu=R("mu", 2), beta=R("beta", 2),
        rl12=R(_rl(12), 2), rl60=R(_rl(60), 2), rl120=R(_rl(120), 2),
        omax=R("observed_max", 2),
    ))


QUERIES["extreme_value_return_levels"] = extreme_value_return_levels
ORACLE["extreme_value_return_levels"] = _EV_SQL.format(
    mu=R("mu", 2), beta=R("beta", 2),
    rl12=R(_rl(12), 2), rl60=R(_rl(60), 2), rl120=R(_rl(120), 2),
    omax=R("observed_max", 2),
)


# --- Hurst exponent (rescaled-range analysis) ---------------------------------------
#
# Hurst (1951) / Mandelbrot-Wallis R/S analysis of daily revenue:
# partition the day-indexed series into complete blocks of m in
# {8, 16, 32, 64}; per block, R = range of the within-block cumulative
# deviations from the block mean and S = the block's population stddev;
# H = slope of ln(mean R/S) on ln(m). H ~ 0.5 is a memoryless series,
# H > 0.5 long-range persistent — the fractal companion to the ACF.

HURST_SIZES = (8, 16, 32, 64)


def _hurst_sql() -> str:
    sizes = " UNION ALL ".join(f"SELECT {m} AS m" for m in HURST_SIZES)
    return f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS rev
            FROM orders GROUP BY CAST(o_orderdate AS DATE)
        ),
        idx AS (
            SELECT d, rev,
                   -- bounded window: one row per calendar day
                   CAST(row_number() OVER (PARTITION BY (hash(d) % 1)
                        ORDER BY d) AS BIGINT) - 1 AS i
            FROM daily
        ),
        sizes AS ({sizes}),
        blocked AS (
            SELECT s.m, CAST(floor(i * 1e0 / s.m) AS BIGINT) AS blk,
                   i, rev,
                   count(*) OVER (PARTITION BY s.m,
                       CAST(floor(i * 1e0 / s.m) AS BIGINT)) AS blk_n
            FROM idx CROSS JOIN sizes s
        ),
        complete AS (SELECT * FROM blocked WHERE blk_n = m),
        bstats AS (
            SELECT m, blk, avg(rev) AS mu, stddev_pop(rev) AS s
            FROM complete GROUP BY m, blk
        ),
        cums AS (
            SELECT c.m, c.blk, b.s,
                   sum(c.rev - b.mu) OVER (PARTITION BY c.m, c.blk
                       ORDER BY c.i
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cdev
            FROM complete c JOIN bstats b ON b.m = c.m AND b.blk = c.blk
        ),
        rs AS (
            SELECT m, blk,
                   (max(cdev) - min(cdev)) / max(s) AS rs
            FROM cums WHERE s > 0 GROUP BY m, blk
        ),
        pts AS (
            SELECT m, ln(avg(rs)) AS y, ln(m * 1e0) AS x,
                   count(*) AS n_blocks
            FROM rs GROUP BY m
        )
        SELECT {R("regr_slope(y, x)", 4)} AS hurst_exponent,
               {R("regr_r2(y, x)", 4)} AS fit_r2,
               CAST(sum(n_blocks) AS BIGINT) AS n_blocks_total,
               CAST(count(*) AS BIGINT) AS n_scales
        FROM pts
    """


def hurst_exponent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of daily revenue by R/S analysis over block sizes
    {HURST_SIZES}, with the log-log fit quality.

    Scale shape: the series is the calendar-bounded daily relation; the
    4x size explode, per-block windows, and the 4-point regression are
    all bounded by |days| x |scales| regardless of order volume."""
    load_tables(spark, sf_dir)
    return spark.sql(_hurst_sql())


QUERIES["hurst_exponent_revenue"] = hurst_exponent_revenue
ORACLE["hurst_exponent_revenue"] = _hurst_sql()


# --- price elasticity by brand --------------------------------------------------------
#
# Log-log demand regression per brand across ship-months:
# elasticity = d ln(quantity) / d ln(unit price) via REGR_SLOPE — the
# classic own-price elasticity estimate off observational panel data.

_ELASTICITY_SQL = f"""
    WITH bm AS (
        SELECT p.p_brand,
               CAST(date_trunc('month', l.l_shipdate) AS DATE) AS m,
               sum(l.l_quantity) AS qty,
               sum(l.l_extendedprice) / sum(l.l_quantity) AS unit_px
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand, CAST(date_trunc('month', l.l_shipdate) AS DATE)
        HAVING sum(l.l_quantity) >= 50
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_months,
           {R("regr_slope(ln(qty), ln(unit_px))", 4)} AS elasticity,
           {R("regr_r2(ln(qty), ln(unit_px))", 4)} AS fit_r2,
           {R("avg(unit_px)", 2)} AS mean_unit_price
    FROM bm
    GROUP BY p_brand
    ORDER BY p_brand
"""


def price_elasticity_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Own-price elasticity per brand: REGR_SLOPE of ln(monthly quantity)
    on ln(monthly volume-weighted unit price), with fit quality.

    Scale shape: one join + grouped agg to the (brand, month) panel, then
    single-pass regression aggregates per brand — no windows."""
    load_tables(spark, sf_dir)
    return spark.sql(_ELASTICITY_SQL)


QUERIES["price_elasticity_by_brand"] = price_elasticity_by_brand
ORACLE["price_elasticity_by_brand"] = _ELASTICITY_SQL
