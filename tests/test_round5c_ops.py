"""Round-5 tranche F semantic-invariant tests (each new op gets an anchor
independent of the DuckDB oracle: pandas/numpy recomputation or a
brute-force restatement of the definition).

Covers: basket_association_rules, pareto_frontier_parts,
concurrent_sessions_peak, hbos_outlier_scores.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR, table_path


# ------------------------------------------------- basket association rules


def test_basket_rules_match_pandas_recount(spark):
    """Support / both confidences / lift for EVERY returned pair recomputed
    from raw pandas basket sets; ordering is by rounded lift desc."""
    from database_toolbox_spark.operators.market import (
        MIN_PAIR_SUPPORT,
        basket_association_rules,
    )

    got = basket_association_rules(spark, SF_DIR).collect()
    li = pd.read_parquet(table_path(SF_DIR, "lineitem"))
    part = pd.read_parquet(table_path(SF_DIR, "part"))
    items = li.merge(part, left_on="l_partkey", right_on="p_partkey")[
        ["l_orderkey", "p_brand"]
    ].drop_duplicates()
    n_baskets = items["l_orderkey"].nunique()
    brand_n = items.groupby("p_brand").size()
    pair_n = {}
    for _, basket in items.groupby("l_orderkey")["p_brand"]:
        brands = sorted(basket)
        for i, a in enumerate(brands):
            for b in brands[i + 1:]:
                pair_n[(a, b)] = pair_n.get((a, b), 0) + 1

    def r6(x):
        return np.floor(x * 1e6 + 0.501) / 1e6

    assert len(got) == 15
    lifts = []
    for row in got:
        n_ab = pair_n[(row.brand_a, row.brand_b)]
        assert row.n_ab == n_ab and n_ab >= MIN_PAIR_SUPPORT
        assert row.support == r6(n_ab / n_baskets)
        assert row.conf_a_to_b == r6(n_ab / brand_n[row.brand_a])
        assert row.conf_b_to_a == r6(n_ab / brand_n[row.brand_b])
        lift = r6(n_ab * n_baskets / (brand_n[row.brand_a] * brand_n[row.brand_b]))
        assert row.lift == lift
        lifts.append(lift)
    assert lifts == sorted(lifts, reverse=True)
    # the returned 15 really are the global top-15 by (lift, brands)
    all_lifts = sorted(
        (
            r6(n * n_baskets / (brand_n[a] * brand_n[b]))
            for (a, b), n in pair_n.items()
            if n >= MIN_PAIR_SUPPORT
        ),
        reverse=True,
    )
    assert lifts[-1] >= all_lifts[14] or lifts == all_lifts[:15]


# ------------------------------------------------------------ Pareto skyline


def test_pareto_frontier_matches_brute_force(spark):
    """The window formulation must equal the O(n^2) dominance definition:
    keep x iff no y has price<=, size>= with one strict."""
    from database_toolbox_spark.operators.market import pareto_frontier_parts

    got = {
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in pareto_frontier_parts(spark, SF_DIR).collect()
    }
    part = pd.read_parquet(table_path(SF_DIR, "part"))
    price = part["p_retailprice"].to_numpy()
    size = part["p_size"].to_numpy()
    keep = []
    for i in range(len(part)):
        dominated = np.any(
            (price <= price[i])
            & (size >= size[i])
            & ((price < price[i]) | (size > size[i]))
        )
        if not dominated:
            keep.append(
                (part["p_partkey"].iat[i], price[i], size[i])
            )
    assert got == set(keep) and len(got) >= 1


# --------------------------------------------------- concurrent sessions


def test_concurrent_sessions_peak_matches_sweep_replay(spark):
    """Pandas replay: 10-min-gap sessionization, day clipping, sweep line
    with (t, delta desc) ordering — every output column exact."""
    from database_toolbox_spark.operators.events import concurrent_sessions_peak

    got = {r.day: r for r in concurrent_sessions_peak(spark, SF_DIR).collect()}
    ev = pd.read_parquet(table_path(SF_DIR, "events")).sort_values(
        ["user_id", "ts", "event_id"]
    )
    spans = []
    for _, g in ev.groupby("user_id"):
        ts = g["ts"].astype("datetime64[us]").astype("int64")  # -> us
        new = (ts.diff().isna()) | (ts.diff() > 600_000_000)
        sid = new.cumsum()
        for _, s in pd.DataFrame({"t": ts, "sid": sid}).groupby("sid"):
            spans.append((int(s["t"].min()), int(s["t"].max())))
    # clip to days
    US_DAY = 86_400_000_000
    points = {}  # day -> list[(t, delta)]
    active = {}
    for s_us, e_us in spans:
        d = s_us // US_DAY
        while d <= e_us // US_DAY:
            lo = max(s_us, d * US_DAY)
            hi = min(e_us, d * US_DAY + US_DAY - 1)
            points.setdefault(d, []).append((lo, 1))
            points[d].append((hi, -1))
            active[d] = active.get(d, 0) + 1
            d += 1
    for d, pts in points.items():
        pts.sort(key=lambda p: (p[0], -p[1]))
        conc = np.cumsum([p[1] for p in pts])
        peak = int(conc.max())
        first_peak = min(
            t for (t, _), c in zip(pts, conc) if c == peak
        )
        day = pd.Timestamp(d * US_DAY * 1000).date()
        row = got[day]
        assert row.n_active_sessions == active[d]
        assert row.peak_concurrent == peak
        assert row.first_peak_us == first_peak
    assert len(got) == len(points)


# --------------------------------------------------------------- HBOS


def test_hbos_matches_numpy_recount(spark):
    """Full-corpus numpy HBOS (equi-width bins, sum of log density
    ratios); the returned rows must be the global top-20 on the rounded
    score with vec_id tie-break."""
    from database_toolbox_spark.operators.clustering import (
        HBOS_BINS,
        hbos_outlier_scores,
    )

    got = [(r.vec_id, r.hbos_score) for r in hbos_outlier_scores(spark, SF_DIR).collect()]
    emb = pd.read_parquet(table_path(SF_DIR, "embeddings"))
    X = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    vec_ids = emb["vec_id"].to_numpy()
    n, d = X.shape
    scores = np.zeros(n)
    for j in range(d):
        col = X[:, j]
        lo, hi = col.min(), col.max()
        bins = np.minimum(
            np.floor((col - lo) * HBOS_BINS / (hi - lo)).astype(int),
            HBOS_BINS - 1,
        )
        counts = np.bincount(bins, minlength=HBOS_BINS)
        scores += np.log(counts.max() / counts[bins])
    r6 = np.floor(scores * 1e6 + 0.501) / 1e6
    order = sorted(zip(r6, vec_ids), key=lambda t: (-t[0], t[1]))[:20]
    expect = [(int(v), s) for s, v in order]
    assert got == expect
