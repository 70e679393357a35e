"""Round-7 operator tests: semantic invariants + external anchors (oracle
parity is covered by the driver sweep; these prove each op computes the
right THING)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------- geo wrap


def test_geo_grid_join_wraps_antimeridian(spark):
    """Custkeys 1717 and 201518 hash to lon -179.994 / +179.934 at lat ~5.3
    — 9.09 km apart ACROSS lon=+-180, in cells -36 and 35. The round-6
    probe (cn + dj, no mod-72 wrap) could never pair them; the wrapped
    probe must. Brute-force distance verified with hashlib.md5 + haversine
    independently of any SQL."""
    import hashlib
    import math

    from database_toolbox_spark.operators.geo import (
        _SPARK_OFFSETS,
        RADIUS_KM,
        _pairs_sql,
    )

    def pt(k):
        h = hashlib.md5(str(k).encode()).hexdigest()
        return (
            int(h[0:4], 16) * 120.0 / 65536.0 - 60.0,
            int(h[4:8], 16) * 360.0 / 65536.0 - 180.0,
        )

    a, b = pt(1717), pt(201518)
    assert math.floor(a[1] / 5) == -36 and math.floor(b[1] / 5) == 35
    dlat = math.radians(b[0] - a[0])
    dlon = math.radians(b[1] - a[1])
    s = (
        math.sin(dlat / 2) ** 2
        + math.cos(math.radians(a[0]))
        * math.cos(math.radians(b[0]))
        * math.sin(dlon / 2) ** 2
    )
    km = 2 * 6371.0088 * math.asin(math.sqrt(s))
    assert km <= RADIUS_KM  # the fixture pair really is within radius

    # Synthetic customer relation: just the straddling pair + two far-away
    # fillers (keys 1 and 2 hash elsewhere), shadowing the parquet view.
    spark.sql(
        "SELECT * FROM VALUES (1717, 0, 0.0), (201518, 1, 0.0), "
        "(1, 2, 0.0), (2, 3, 0.0) AS t(c_custkey, c_nationkey, c_acctbal)"
    ).createOrReplaceTempView("customer")
    try:
        rows = spark.sql(_pairs_sql(True, _SPARK_OFFSETS)).collect()
        got = {(r.cell_lat, r.cell_lon): r.n_pairs for r in rows}
        # pair attributed to the lower-key member's (1717) cell: lat 5.3 -> 1
        assert got.get((1, -36)) == 1, got
    finally:
        spark.catalog.dropTempView("customer")


def test_geo_grid_wrap_oracle_parity(spark):
    """Spark and DuckDB spellings of the wrapped probe agree on the
    straddling fixture (both use (cn+dj+108)%72-36; dividend is always
    positive so engine modulo-sign rules cannot diverge). Opens a PRIVATE
    duckdb connection (not the session ddb fixture) because the test
    shadows the customer view."""
    import duckdb

    from database_toolbox_spark.operators.geo import (
        _DUCK_OFFSETS,
        _SPARK_OFFSETS,
        _pairs_sql,
    )

    spark.sql(
        "SELECT * FROM VALUES (1717, 0, 0.0), (201518, 1, 0.0), "
        "(1, 2, 0.0), (2, 3, 0.0) AS t(c_custkey, c_nationkey, c_acctbal)"
    ).createOrReplaceTempView("customer")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM (VALUES (1717, 0, 0.0), "
        "(201518, 1, 0.0), (1, 2, 0.0), (2, 3, 0.0)) "
        "t(c_custkey, c_nationkey, c_acctbal)"
    )
    try:
        s_rows = sorted(
            (r.cell_lat, r.cell_lon, r.n_pairs, r.avg_km)
            for r in spark.sql(_pairs_sql(True, _SPARK_OFFSETS)).collect()
        )
        d_rows = sorted(
            (r[0], r[1], r[2], r[3])
            for r in con.execute(_pairs_sql(False, _DUCK_OFFSETS)).fetchall()
        )
        assert s_rows == d_rows and len(s_rows) == 1, (s_rows, d_rows)
    finally:
        spark.catalog.dropTempView("customer")
        con.close()
