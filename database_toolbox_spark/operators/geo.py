"""Geospatial operators: grid-cell aggregation, nearest-hub assignment, and
the grid-partitioned distance self-join (the scalable spatial join).

The fixtures carry no coordinates, so each entity gets a DETERMINISTIC
synthetic position derived from md5(id) — a pure function of the key,
identical in both dialects, stable under reshuffles (the same device the
hash-split / shuffle-order curation ops use). Latitudes stay in [-60, 60]
so a 5-degree longitude cell is always >= 277 km wide — wider than the
150 km join radius, which makes same-or-adjacent-cell candidate generation
exhaustive (no missed pairs at the cell boundary).

Reference parity: the reference's warehouse targets ship geo SQL surfaces
(BigQuery GIS / Snowflake GEOGRAPHY); the operators here are the portable
core those surfaces compile to — haversine great-circle distance, grid
binning, and the cell-bucketed neighbor join (the classic "put points in
cells, probe the 9 neighbors" plan that bounds candidates by local density
instead of n^2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_tables

EARTH_KM = 6371.0088
CELL_DEG = 5
RADIUS_KM = 150.0


def _h16(expr: str, offset: int, spark_side: bool) -> str:
    """16-bit integer from md5 hex chars [offset, offset+4) — dialect pair."""
    if spark_side:
        return (
            f"CAST(conv(substring(md5(CAST({expr} AS STRING)), "
            f"{offset}, 4), 16, 10) AS INT)"
        )
    return (
        f"CAST(concat('0x', substr(md5(CAST({expr} AS VARCHAR)), "
        f"{offset}, 4)) AS INTEGER)"
    )


def _points_cte(spark_side: bool) -> str:
    """Customers with deterministic (lat, lon): lat in [-60, 60], lon in
    [-180, 180), from independent md5 nibble ranges."""
    lat_h = _h16("c_custkey", 1, spark_side)
    lon_h = _h16("c_custkey", 5, spark_side)
    return f"""
        SELECT c_custkey, c_nationkey, c_acctbal,
               {lat_h} * 120e0 / 65536e0 - 60e0 AS lat,
               {lon_h} * 360e0 / 65536e0 - 180e0 AS lon
        FROM customer
    """


def _haversine(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Great-circle distance in km (shared spelling — radians/sin/cos/asin
    are identical in both dialects)."""
    return (
        f"2e0 * {EARTH_KM} * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2e0), 2) "
        f"+ cos(radians({lat1})) * cos(radians({lat2})) "
        f"* pow(sin(radians(({lon2}) - ({lon1})) / 2e0), 2)))"
    )


# --- grid-cell aggregation ----------------------------------------------------


def _cell_sql(spark_side: bool) -> str:
    return f"""
        WITH pts AS ({_points_cte(spark_side)})
        SELECT CAST(floor(lat / {CELL_DEG}) AS BIGINT) AS cell_lat,
               CAST(floor(lon / {CELL_DEG}) AS BIGINT) AS cell_lon,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
               {R("avg(c_acctbal)", 2)} AS avg_balance
        FROM pts
        GROUP BY floor(lat / {CELL_DEG}), floor(lon / {CELL_DEG})
        HAVING count(*) >= 3
        ORDER BY n_customers DESC, cell_lat, cell_lon
        LIMIT 25
    """


def geo_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 densest 5-degree grid cells: customer count, nations present,
    mean balance. The grid-binning pass every spatial rollup starts from.

    Scale shape: one projection (md5 + floor per row) into a grouped agg on
    the cell key — partial-aggregatable, output bounded by the fixed
    24x72 cell grid regardless of row count."""
    load_tables(spark, sf_dir)
    return spark.sql(_cell_sql(True))


# --- nearest hub (small-dimension distance argmin) ----------------------------


def _hub_sql(spark_side: bool) -> str:
    hub_lat = _h16("n_nationkey", 1, spark_side)
    hub_lon = _h16("n_nationkey", 5, spark_side)
    d = _haversine("p.lat", "p.lon", "h.hub_lat", "h.hub_lon")
    return f"""
        WITH pts AS ({_points_cte(spark_side)}),
        hubs AS (
            SELECT n_nationkey AS hub_id, n_name AS hub_name,
                   {hub_lat} * 120e0 / 65536e0 - 60e0 AS hub_lat,
                   {hub_lon} * 360e0 / 65536e0 - 180e0 AS hub_lon
            FROM nation
        ),
        assigned AS (
            SELECT * FROM (
                SELECT p.c_custkey, h.hub_id, h.hub_name,
                       {d} AS km,
                       CAST(row_number() OVER (PARTITION BY p.c_custkey
                           ORDER BY floor(({d}) * 1e6) / 1e6, h.hub_id)
                           AS BIGINT) AS rn
                FROM pts p CROSS JOIN hubs h
            ) x WHERE rn = 1
        )
        SELECT hub_id, hub_name,
               CAST(count(*) AS BIGINT) AS n_assigned,
               {R("avg(km)", 2)} AS avg_km,
               {R("max(km)", 2)} AS max_km
        FROM assigned
        GROUP BY hub_id, hub_name
        ORDER BY hub_id
    """


def geo_nearest_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every customer to its nearest of 25 nation hubs by haversine
    distance; report per-hub membership count and distance profile — the
    Voronoi-cell rollup (facility assignment) over a broadcast hub list.

    Scale shape: the hub relation is 25 rows (broadcast); the cross join is
    a per-row projection over 25 candidates followed by a row_number argmin
    partitioned by customer — no shuffle of the fact side beyond the final
    25-row rollup. Argmin ties break on the 1e-6-km-floored distance then
    hub_id, so assignment is engine-stable."""
    load_tables(spark, sf_dir)
    return spark.sql(_hub_sql(True))


# --- grid-partitioned neighbor self-join --------------------------------------


def _pairs_sql(spark_side: bool, offsets: str) -> str:
    d = _haversine("a.lat", "a.lon", "b.lat", "b.lon")
    return f"""
        WITH pts AS ({_points_cte(spark_side)}),
        cells AS (
            SELECT c_custkey, c_nationkey, lat, lon,
                   CAST(floor(lat / {CELL_DEG}) AS BIGINT) AS cl,
                   CAST(floor(lon / {CELL_DEG}) AS BIGINT) AS cn
            FROM pts
        ),
        probes AS (
            SELECT c.*, c.cl + o.di AS pl,
                   ((c.cn + o.dj + 108) % 72) - 36 AS pj
            FROM cells c CROSS JOIN ({offsets}) o
        ),
        hits AS (
            SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
                   a.cl AS cell_lat, a.cn AS cell_lon,
                   {d} AS km
            FROM probes a JOIN cells b
              ON a.pl = b.cl AND a.pj = b.cn
             AND a.c_custkey < b.c_custkey
            WHERE {d} <= {RADIUS_KM}
        )
        SELECT cell_lat, cell_lon,
               CAST(count(*) AS BIGINT) AS n_pairs,
               {R("avg(km)", 2)} AS avg_km,
               {R("min(km)", 2)} AS min_km
        FROM hits
        GROUP BY cell_lat, cell_lon
        ORDER BY n_pairs DESC, cell_lat, cell_lon
        LIMIT 20
    """


_SPARK_OFFSETS = (
    "SELECT di, dj FROM VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),"
    "(1,-1),(1,0),(1,1) AS t(di, dj)"
)
_DUCK_OFFSETS = (
    "SELECT di, dj FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),"
    "(1,-1),(1,0),(1,1)) t(di, dj)"
)


def geo_grid_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer pairs within 150 km via the grid-bucketed spatial self-join:
    each point probes its own and the 8 adjacent 5-degree cells, pairs are
    verified by exact haversine, and the report is the top-20 cells by
    within-radius pair count (pair attributed to the lower-key member's
    cell; each unordered pair matches exactly one probe offset, so no
    DISTINCT is needed).

    Scale shape: the join key is the cell id — candidates are bounded by
    9x the local cell population, never all-pairs; the 5-degree cell is
    provably wider than the radius at every latitude in range, and the
    longitude probe wraps mod 72 at the antimeridian (cells -36 and 35 are
    adjacent), so the neighborhood probe is exhaustive. This is the standard distributed
    spatial-join plan (bin-then-verify)."""
    load_tables(spark, sf_dir)
    return spark.sql(_pairs_sql(True, _SPARK_OFFSETS))


QUERIES = {
    "geo_cell_counts": geo_cell_counts,
    "geo_nearest_hub": geo_nearest_hub,
    "geo_grid_neighbor_pairs": geo_grid_neighbor_pairs,
}
ORACLE = {
    "geo_cell_counts": _cell_sql(False),
    "geo_nearest_hub": _hub_sql(False),
    "geo_grid_neighbor_pairs": _pairs_sql(False, _DUCK_OFFSETS),
}
