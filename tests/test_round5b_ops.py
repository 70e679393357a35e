"""Round-5 tranche E semantic-invariant tests (parity alone cannot show an
operator computes the right THING — each new op gets an independent anchor:
numpy/pandas recomputation, a planted synthetic input, or a conservation
law).

Covers: acf_daily_revenue, spearman_daily_rank_corr,
mann_whitney_doc_lengths, dau_wau_stickiness, interarrival_burstiness,
label_propagation_communities, cross_doc_span_coverage.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR, table_path


def _daily(col: str) -> pd.DataFrame:
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    orders["day"] = orders["o_orderdate"].dt.date
    g = orders.groupby("day").agg(
        rev=("o_totalprice", "sum"), n_orders=("o_totalprice", "size")
    )
    return g.sort_index()


# ---------------------------------------------------------------- ACF


def test_acf_matches_numpy_recount(spark):
    from database_toolbox_spark.operators.stats import acf_daily_revenue

    got = {r.lag: r for r in acf_daily_revenue(spark, SF_DIR).collect()}
    rev = np.floor(_daily("rev")["rev"].to_numpy() * 100 + 0.501) / 100
    mu = rev.mean()
    ss = ((rev - mu) ** 2).sum()
    for k in (1, 5, 10):
        want = ((rev[:-k] - mu) * (rev[k:] - mu)).sum() / ss
        assert abs(got[k].acf - want) < 1e-4, (k, got[k].acf, want)
        assert got[k].n_pairs == len(rev) - k
    band = 1.96 / np.sqrt(len(rev))
    assert abs(got[1].white_noise_band - band) < 1e-4


def test_acf_of_periodic_series_peaks_at_period(spark):
    """A synthetic strict period-2 series must give acf(2) ~ +1 and
    acf(1) ~ -1 (the estimator's sign behavior, end-to-end through the
    SQL against a temp orders view)."""
    from database_toolbox_spark.operators.stats import _ACF_SQL

    rows = [
        (f"2020-01-{d:02d}", 100.0 if d % 2 == 0 else 200.0)
        for d in range(1, 29)
    ]
    from database_toolbox_spark.session import load_table

    spark.createDataFrame(
        [(pd.Timestamp(d).to_pydatetime(), v) for d, v in rows],
        "o_orderdate timestamp, o_totalprice double",
    ).createOrReplaceTempView("orders")
    try:
        got = {r.lag: r.acf for r in spark.sql(_ACF_SQL).collect()}
    finally:
        # load_tables is register-if-absent — restore the parquet view
        load_table(spark, SF_DIR, "orders", replace=True)
    n = len(rows)
    for k in (1, 2, 3, 4):
        # biased estimator: |acf(k)| = 1 - k/n exactly for a strict
        # alternating series (n-k numerator terms over n denominator terms)
        want = (1 - k / n) * (1 if k % 2 == 0 else -1)
        assert abs(got[k] - want) < 1e-3, (k, got[k], want)


# ---------------------------------------------------------------- Spearman


def test_spearman_matches_pandas(spark):
    from database_toolbox_spark.operators.stats import (
        spearman_daily_rank_corr,
    )

    row = spearman_daily_rank_corr(spark, SF_DIR).collect()[0]
    d = _daily("rev")
    d["rev"] = np.floor(d["rev"] * 100 + 0.501) / 100
    # mid-ranks + Pearson (pandas' method="spearman" needs scipy,
    # absent here; rank(method="average") is exactly the mid-rank)
    want = d["rev"].rank(method="average").corr(
        d["n_orders"].rank(method="average")
    )
    assert abs(row.spearman_rho - want) < 1e-4, (row.spearman_rho, want)
    assert row.n_days == len(d)
    # the d^2 shortcut assumes no ties; at sf0.001 the order-count column
    # is almost all ties (n_ties_y ~ n_days), so only bound it loosely —
    # the tie-exact mid-rank rho above is the real anchor
    assert abs(row.rho_d2_formula - want) < 0.15


# ---------------------------------------------------------------- MWU


def test_mann_whitney_matches_brute_force(spark):
    from database_toolbox_spark.operators.stats import (
        MW_SRC_A,
        MW_SRC_B,
        mann_whitney_doc_lengths,
    )

    row = mann_whitney_doc_lengths(spark, SF_DIR).collect()[0]
    docs = pd.read_parquet(table_path(SF_DIR, "documents"))
    a = docs.loc[docs.source == MW_SRC_A, "n_chars"].to_numpy()
    b = docs.loc[docs.source == MW_SRC_B, "n_chars"].to_numpy()
    u = float(
        (a[:, None] > b[None, :]).sum()
        + 0.5 * (a[:, None] == b[None, :]).sum()
    )
    assert abs(row.u_statistic - u) < 1e-9, (row.u_statistic, u)
    assert abs(row.u_mean - len(a) * len(b) / 2) < 1e-9
    # z sign must match the direction of the mean-rank difference
    if u > len(a) * len(b) / 2:
        assert row.z_score > 0
    elif u < len(a) * len(b) / 2:
        assert row.z_score < 0


# ---------------------------------------------------------------- DAU/WAU


def test_dau_wau_matches_pandas_recount(spark):
    from database_toolbox_spark.operators.events import dau_wau_stickiness

    got = dau_wau_stickiness(spark, SF_DIR).collect()
    ev = pd.read_parquet(table_path(SF_DIR, "events"))
    ev["day"] = ev["ts"].dt.date
    ud = ev[["day", "user_id"]].drop_duplicates()
    days = sorted(ud["day"].unique())
    dau = ud.groupby("day")["user_id"].nunique()
    assert [r.day for r in got] == days
    for r in got:
        lo = r.day - pd.Timedelta(days=6)  # date - timedelta -> date
        wau = ud.loc[(ud.day >= lo) & (ud.day <= r.day), "user_id"].nunique()
        assert r.dau == dau[r.day], r
        assert r.wau == wau, (r, wau)
        assert 0 < r.stickiness <= 1.0
        assert r.wau >= r.dau


# ---------------------------------------------------------------- burstiness


def test_burstiness_matches_pandas_replay(spark):
    from database_toolbox_spark.operators.events import (
        interarrival_burstiness,
    )

    got = {r.event_type: r for r in
           interarrival_burstiness(spark, SF_DIR).collect()}
    ev = pd.read_parquet(table_path(SF_DIR, "events"))
    ev = ev.sort_values(["user_id", "event_type", "ts", "event_id"])
    # pin the epoch unit: pandas may load parquet micros as datetime64[us]
    ev["us"] = ev["ts"].astype("datetime64[ns]").astype("int64") // 1000
    gaps = (
        ev.groupby(["user_id", "event_type"])["us"].diff().dropna() / 1e6
    )
    by_type = gaps.groupby(
        ev.loc[gaps.index, "event_type"]
    ).agg(["count", "mean", "std"])
    for t, r in got.items():
        want = by_type.loc[t]
        assert r.n_gaps == want["count"], (t, r.n_gaps, want["count"])
        assert abs(r.mean_gap_s - want["mean"]) < 0.01
        assert abs(r.sd_gap_s - want["std"]) < 0.01
        # B in (-1, 1); CV near 1 for near-Poisson arrivals
        assert -1 < r.burstiness < 1
        assert abs(
            r.burstiness
            - (want["std"] - want["mean"]) / (want["std"] + want["mean"])
        ) < 1e-3


# ---------------------------------------------------------------- LPA


def test_lpa_two_cliques_converge_to_min_labels(spark):
    """Two disjoint triangles: every node must adopt its triangle's min
    node id; the community histogram is exactly {3: 2 communities}."""
    from database_toolbox_spark.operators.graph import lpa_labels_from_edges

    edges = spark.createDataFrame(
        [("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
         ("b1", "b2"), ("b2", "b3"), ("b1", "b3")],
        "src string, dst string",
    )
    labels = {r.node: r.label for r in
              lpa_labels_from_edges(edges, rounds=4).collect()}
    assert {labels[n] for n in ("a1", "a2", "a3")} == {"a1"}
    assert {labels[n] for n in ("b1", "b2", "b3")} == {"b1"}


def test_lpa_histogram_conserves_nodes(spark):
    from database_toolbox_spark.operators.graph import (
        _KCORE_EDGE_SQL,
        label_propagation_communities,
    )
    from database_toolbox_spark.session import load_tables

    load_tables(spark, SF_DIR)
    edges = spark.sql(_KCORE_EDGE_SQL)
    n_nodes = (
        edges.selectExpr("src AS n").union(edges.selectExpr("dst AS n"))
        .distinct().count()
    )
    hist = label_propagation_communities(spark, SF_DIR).collect()
    assert sum(r.community_size * r.n_communities for r in hist) == n_nodes


# ---------------------------------------------------------------- spans


def test_span_coverage_planted_duplicates(spark):
    """Two identical docs are fully covered (every 3-gram occurs in the
    other doc); a vocabulary-disjoint third doc has zero coverage."""
    from database_toolbox_spark.operators.fingerprints import (
        _span_coverage_sql,
        _SPARK_POS_SHINGLES,
    )

    text = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, text, "en", "dup", len(text)),
        (2, text, "en", "dup", len(text)),
        (3, "zx1 zx2 zx3 zx4 zx5 zx6", "en", "uniq", 23),
    ]
    from database_toolbox_spark.session import load_table

    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).createOrReplaceTempView("documents")
    try:
        got = {r.source: r for r in
               spark.sql(_span_coverage_sql(_SPARK_POS_SHINGLES)).collect()}
    finally:
        load_table(spark, SF_DIR, "documents", replace=True)
    assert got["dup"].mean_coverage == 1.0
    assert got["dup"].n_mostly_dup == 2
    assert got["uniq"].mean_coverage == 0.0
    assert got["uniq"].n_mostly_dup == 0
    # position conservation: each doc contributes n_tokens - 2 positions
    assert got["dup"].n_positions == 2 * (9 - 2)
    assert got["uniq"].n_positions == 6 - 2


# ---------------------------------------------------------------- t-closeness


def test_t_closeness_matches_pandas_emd(spark):
    from database_toolbox_spark.operators.profile import t_closeness_audit

    row = t_closeness_audit(spark, SF_DIR).collect()[0]
    cust = pd.read_parquet(table_path(SF_DIR, "customer"))
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    j = orders.merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )[["c_nationkey", "c_mktsegment", "o_orderpriority"]]
    dom = sorted(j["o_orderpriority"].unique())
    q = j["o_orderpriority"].value_counts(normalize=True).reindex(dom)
    ts = []
    for _, g in j.groupby(["c_nationkey", "c_mktsegment"]):
        p = g["o_orderpriority"].value_counts(normalize=True).reindex(
            dom
        ).fillna(0)
        cum = (p - q).cumsum()
        ts.append(cum.abs().sum() / (len(dom) - 1))
    assert abs(row.t_closeness - max(ts)) < 1e-5, (row.t_closeness, max(ts))
    assert abs(row.avg_t - np.mean(ts)) < 1e-5
    assert row.n_classes == len(ts)
    assert row.n_flagged_classes == sum(t * 5 > 1 for t in ts)


# ---------------------------------------------------------------- NDCG


def test_ndcg_consistent_with_recall(spark):
    """NDCG's n_relevant must equal recall@10's n_hits per query (same
    truth set, same probe set), ndcg in [0, 1], and ndcg == 0 iff no
    relevant item was retrieved."""
    from database_toolbox_spark.operators.similarity import (
        ann_recall_eval,
        ndcg_ann_eval,
    )

    ndcg = {r.qid: r for r in ndcg_ann_eval(spark, SF_DIR).collect()}
    rec = {r.qid: r for r in ann_recall_eval(spark, SF_DIR).collect()}
    assert set(ndcg) == set(rec)
    for qid, r in ndcg.items():
        assert r.n_relevant == rec[qid].n_hits, (qid, r, rec[qid])
        assert 0.0 <= r.ndcg_at_10 <= 1.0
        assert (r.ndcg_at_10 == 0.0) == (r.n_relevant == 0)
        assert r.n_retrieved <= 10


def test_ndcg_ideal_constant():
    import math

    from database_toolbox_spark.operators.similarity import (
        _NDCG_IDEAL,
        _RECALL_K,
    )

    want = sum(
        (_RECALL_K + 1 - i) / math.log2(i + 1)
        for i in range(1, _RECALL_K + 1)
    )
    assert _NDCG_IDEAL == want


# ---------------------------------------------------------------- Holt-Winters


def test_holt_winters_matches_python_recursion(spark):
    from database_toolbox_spark.operators.stats import (
        HW_P,
        holt_winters_weekly_forecast,
    )

    got = {r.horizon_days: r for r in
           holt_winters_weekly_forecast(spark, SF_DIR).collect()}
    rev = np.floor(_daily("rev")["rev"].to_numpy() * 100 + 0.501) / 100
    a, b_, g = 0.3, 0.1, 0.3
    lvl = rev[:HW_P].sum() / HW_P
    trend = 0.0
    season = list(rev[:HW_P] - lvl)
    for y in rev[HW_P:]:
        s0 = season.pop(0)
        new_l = a * (y - s0) + (1 - a) * (lvl + trend)
        trend = b_ * (new_l - lvl) + (1 - b_) * trend
        lvl = new_l
        season.append(g * (y - lvl) + (1 - g) * s0)
    for h in range(1, HW_P + 1):
        want = lvl + h * trend + season[h - 1]
        assert abs(got[h].forecast - want) < 0.02, (h, got[h].forecast, want)
        assert abs(got[h].seasonal - season[h - 1]) < 0.02
    assert abs(got[1].level - lvl) < 0.02
    assert abs(got[1].trend - trend) < 0.001


# ---------------------------------------------------------------- drift


def test_centroid_drift_matches_pandas(spark):
    import hashlib

    from database_toolbox_spark.operators.similarity import (
        embedding_centroid_drift,
    )

    got = {r.label: r for r in
           embedding_centroid_drift(spark, SF_DIR).collect()}
    emb = pd.read_parquet(table_path(SF_DIR, "embeddings"))
    emb["half"] = emb["vec_id"].map(
        lambda k: int(hashlib.md5(str(k).encode()).hexdigest()[:4], 16) % 2
    )
    for label, g in emb.groupby("label"):
        ca = np.stack(g.loc[g.half == 0, "embedding"]).astype(
            np.float64
        ).mean(axis=0)
        cb = np.stack(g.loc[g.half == 1, "embedding"]).astype(
            np.float64
        ).mean(axis=0)
        r = got[str(label)]
        cos = ca @ cb / np.sqrt((ca @ ca) * (cb @ cb))
        assert abs(r.centroid_cosine - cos) < 1e-4, (label, r, cos)
        assert abs(r.l2_shift - np.linalg.norm(ca - cb)) < 1e-4
        assert r.n_half_a == (g.half == 0).sum()
        assert r.n_half_b == (g.half == 1).sum()


# ---------------------------------------------------------------- power law


def test_powerlaw_matches_numpy_polyfit(spark):
    from database_toolbox_spark.operators.events import (
        user_activity_powerlaw,
    )

    row = user_activity_powerlaw(spark, SF_DIR).collect()[0]
    ev = pd.read_parquet(table_path(SF_DIR, "events"))
    per_user = ev.groupby("user_id").size()
    hist = per_user.value_counts().sort_index()
    x = np.log(hist.index.to_numpy(dtype=float))
    y = np.log(hist.to_numpy(dtype=float))
    slope, icept = np.polyfit(x, y, 1)
    assert abs(row.alpha - (-slope)) < 1e-3, (row.alpha, -slope)
    assert abs(row.log_intercept - icept) < 1e-3
    assert row.n_points == len(hist)
    assert row.n_users == per_user.size
    assert row.max_activity == per_user.max()
    assert 0.0 <= row.r_squared <= 1.0


# ---------------------------------------------------------------- HITS


def test_hits_two_stars_hub_and_authority_structure(spark):
    """Two disjoint stars (sA -> c1..c4, sB -> c5..c6, unit weights):
    within each component HITS keeps all leaf authorities equal, and the
    bigger star's hub/authority scores dominate (its lambda1 is larger)."""
    from database_toolbox_spark.operators.graph import hits_scores_from_edges

    edges = spark.createDataFrame(
        [("sA", f"c{i}", 1.0) for i in range(1, 5)]
        + [("sB", f"c{i}", 1.0) for i in range(5, 7)],
        "src string, dst string, w double",
    )
    auth, hubs = hits_scores_from_edges(edges, iters=4)
    a = {r.dst: r.a for r in auth.collect()}
    h = {r.src: r.h for r in hubs.collect()}
    assert len({a[f"c{i}"] for i in range(1, 5)}) == 1
    assert len({a[f"c{i}"] for i in range(5, 7)}) == 1
    assert a["c1"] > a["c5"]
    assert h["sA"] > h["sB"]


def test_hits_matches_numpy_power_iteration(spark):
    """Fixture-graph anchor: the operator's normalized authority scores
    must match an independent numpy replay of 4 un-normalized rounds."""
    import numpy as np

    from database_toolbox_spark.operators.graph import (
        HITS_ITERS,
        hits_hub_authority,
    )
    from database_toolbox_spark.session import load_tables

    load_tables(spark, SF_DIR)
    got = {(r.role, r.node): r.score
           for r in hits_hub_authority(spark, SF_DIR).collect()}
    edges = spark.sql("""
        SELECT CAST(l.l_suppkey AS STRING) AS src,
               CAST(o.o_custkey AS STRING) AS dst,
               CAST(count(*) AS DOUBLE) AS w
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    """).toPandas()
    srcs = sorted(edges["src"].unique())
    dsts = sorted(edges["dst"].unique())
    si = {s: i for i, s in enumerate(srcs)}
    di = {d: i for i, d in enumerate(dsts)}
    W = np.zeros((len(srcs), len(dsts)))
    for r in edges.itertuples():
        W[si[r.src], di[r.dst]] = r.w
    h = np.ones(len(srcs))
    for _ in range(HITS_ITERS):
        a = W.T @ h
        h = W @ a
    a_n = a / a.sum()
    h_n = h / h.sum()
    for (role, node), score in got.items():
        want = a_n[di[node]] if role == "authority" else h_n[si[node]]
        assert abs(score - want) < 1e-5, (role, node, score, want)


# ---------------------------------------------------------------- IVM top-k


def test_ivm_topk_matches_full_recompute(spark):
    from database_toolbox_spark.operators.ivm import (
        TOPK_K,
        ivm_topk_maintenance,
    )

    got = ivm_topk_maintenance(spark, SF_DIR).collect()
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    want = orders.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).head(TOPK_K)
    assert [r.o_orderkey for r in got] == want["o_orderkey"].tolist()
    assert [r.rank for r in got] == list(range(1, TOPK_K + 1))
    for r, (_, w) in zip(got, want.iterrows()):
        assert abs(r.price - w["o_totalprice"]) < 0.005


def test_ivm_topk_planted_delta_entrant(spark):
    """A delta row above the stored top-1 must enter at rank 1 — the
    merge path, not just the steady state."""
    from database_toolbox_spark.operators.ivm import (
        SPLIT,
        ivm_topk_maintenance,
    )
    from database_toolbox_spark.session import load_table

    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    top_price = orders["o_totalprice"].max()
    planted = pd.DataFrame([{
        "o_orderkey": 999_999_999,
        "o_custkey": 1,
        "o_orderstatus": "O",
        "o_totalprice": top_price + 1000.0,
        # after SPLIT -> lands in the delta arm
        "o_orderdate": pd.Timestamp(SPLIT) + pd.Timedelta(days=1),
        "o_orderpriority": "1-URGENT",
    }])
    aug = pd.concat([orders, planted], ignore_index=True)
    spark.createDataFrame(aug).createOrReplaceTempView("orders")
    try:
        got = ivm_topk_maintenance(spark, SF_DIR).collect()
    finally:
        load_table(spark, SF_DIR, "orders", replace=True)
    assert got[0].o_orderkey == 999_999_999
    assert got[0].rank == 1


# ---------------------------------------------------------------- spectrogram


def test_spectrogram_matches_numpy_fft(spark):
    """The framed SQL spectrogram's (frame, dominant bin) histogram and
    mean frame energy must match a numpy FFT replay over every doc."""
    from collections import defaultdict

    from database_toolbox_spark.operators.multimodal import (
        AUDIO_BIAS,
        DFT_BINS,
        DFT_N,
        SPEC_FRAMES,
        audio_spectrogram_profile,
    )

    got = {(r.frame, r.dominant_bin): r
           for r in audio_spectrogram_profile(spark, SF_DIR).collect()}
    docs = pd.read_parquet(table_path(SF_DIR, "documents"))
    counts: dict = defaultdict(int)
    energy: dict = defaultdict(float)
    for _, d in docs.iterrows():
        data = d.text.encode()
        for f in range(SPEC_FRAMES):
            dev = np.zeros(DFT_N)
            chunk = data[f * DFT_N:(f + 1) * DFT_N]
            if chunk:
                dev[: len(chunk)] = np.frombuffer(
                    chunk, np.uint8
                ).astype(float) - AUDIO_BIAS
            p = np.round(np.abs(np.fft.fft(dev)[:DFT_BINS]) ** 2, 2)
            k = int(np.argmin(np.where(p == p.max(), np.arange(DFT_BINS),
                                       DFT_BINS)))
            counts[(f, k)] += 1
            energy[(f, k)] += p.sum()
    assert set(got) == set(counts)
    for key, r in got.items():
        assert r.n_docs == counts[key], (key, r.n_docs, counts[key])
        assert abs(r.avg_frame_energy - energy[key] / counts[key]) < 0.5


# ---------------------------------------------------------------- PSI


def test_psi_matches_numpy_recount(spark):
    from database_toolbox_spark.operators.stats import (
        PSI_SPLIT,
        psi_price_drift,
    )

    row = psi_price_drift(spark, SF_DIR).collect()[0]
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    split = pd.Timestamp(PSI_SPLIT)
    ref = orders.loc[orders.o_orderdate < split, "o_totalprice"].to_numpy()
    cur = orders.loc[orders.o_orderdate >= split, "o_totalprice"].to_numpy()
    cuts = np.percentile(ref, np.arange(10, 100, 10), method="linear")
    rb = np.searchsorted(cuts, ref, side="left")
    cb = np.searchsorted(cuts, cur, side="left")
    eps = 1e-6
    p = np.bincount(rb, minlength=10) / len(ref) + eps
    q = np.bincount(cb, minlength=10) / len(cur) + eps
    psi = ((q - p) * np.log(q / p)).sum()
    assert abs(row.psi - psi) < 1e-4, (row.psi, psi)
    assert abs(row.max_bucket_shift - np.abs(q - p).max()) < 1e-4
    assert row.n_buckets == 10
    want_band = 1 if psi > 0.2 else (2 if psi > 0.1 else 0)
    assert row.drift_band == want_band


# ---------------------------------------------------------------- FD audit


def test_fd_audit_schema_fd_holds_and_g3_matches(spark):
    from database_toolbox_spark.operators.profile import (
        functional_dependency_audit,
    )

    got = {r.fd: r for r in
           functional_dependency_audit(spark, SF_DIR).collect()}
    # the schema's real FD must be violation-free
    fd = got["n_nationkey -> n_regionkey"]
    assert fd.n_violating_lhs == 0 and fd.n_violation_rows == 0
    # g3 recount for the orders candidate
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    g = orders.groupby(["o_custkey", "o_orderpriority"]).size()
    per_lhs = g.groupby(level=0).agg(["count", "sum", "max"])
    want_viol_lhs = (per_lhs["count"] > 1).sum()
    want_viol_rows = int(
        (per_lhs.loc[per_lhs["count"] > 1, "sum"]
         - per_lhs.loc[per_lhs["count"] > 1, "max"]).sum()
    )
    fd3 = got["o_custkey -> o_orderpriority"]
    assert fd3.n_violating_lhs == want_viol_lhs
    assert fd3.n_violation_rows == want_viol_rows
    assert fd3.n_lhs_values == orders["o_custkey"].nunique()


# ---------------------------------------------------------------- bot flags


def test_bot_flags_match_pandas_and_planted_metronome(spark):
    from database_toolbox_spark.operators.events import (
        BOT_MIN_EVENTS,
        bot_user_flags,
    )
    from database_toolbox_spark.session import load_table

    row = bot_user_flags(spark, SF_DIR).collect()[0]
    ev = pd.read_parquet(table_path(SF_DIR, "events"))

    def recount(frame):
        frame = frame.sort_values(["user_id", "ts", "event_id"])
        us = frame["ts"].astype("datetime64[ns]").astype("int64") // 1000
        gaps = us.groupby(frame["user_id"]).diff().dropna() / 1e6
        st = gaps.groupby(frame.loc[gaps.index, "user_id"]).agg(
            ["count", "mean", "std"]
        )
        judge = st["count"] >= BOT_MIN_EVENTS
        flag = judge & (st["std"] * 4 < st["mean"] * 1)
        return len(st), int(judge.sum()), int(flag.sum())

    n_users, n_judge, n_flag = recount(ev)
    assert row.n_users == n_users
    assert row.n_judgeable == n_judge
    assert row.n_flagged == n_flag
    # plant a metronome: 30 events exactly 60 s apart must be flagged
    bot = pd.DataFrame({
        "event_id": range(10_000_000, 10_000_030),
        "ts": pd.date_range("2024-01-10", periods=30, freq="60s"),
        "user_id": 999_999,
        "event_type": "click",
        "value": 1.0,
        "props": "{}",
    })
    aug = pd.concat([ev, bot], ignore_index=True)
    spark.createDataFrame(aug).createOrReplaceTempView("events")
    try:
        row2 = bot_user_flags(spark, SF_DIR).collect()[0]
    finally:
        load_table(spark, SF_DIR, "events", replace=True)
    assert row2.n_flagged == n_flag + 1
    assert row2.n_users == n_users + 1


# ---------------------------------------------------------------- decontam


def test_split_decontamination_conserves_and_cleans(spark):
    import hashlib

    from database_toolbox_spark.operators.dedup import minhash_near_dup_pairs
    from database_toolbox_spark.operators.fingerprints import (
        split_decontaminated_counts,
    )

    got = {r.split_name: r for r in
           split_decontaminated_counts(spark, SF_DIR).collect()}
    total_before = sum(r.n_before for r in got.values())
    total_after = sum(r.n_after for r in got.values())
    assert total_before == total_after  # moving, not dropping
    moved = sum(r.n_moved_to_train for r in got.values())
    assert got["train"].n_moved_to_train == 0
    assert got["train"].n_after == got["train"].n_before + moved
    # after reassignment no train<->eval near-dup pair may remain
    pairs = minhash_near_dup_pairs(spark, SF_DIR).select(
        "doc_a", "doc_b"
    ).collect()

    def bucket(doc_id):
        return int(
            hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16
        ) % 100

    def split(doc_id):
        b = bucket(doc_id)
        return "train" if b < 90 else ("valid" if b < 95 else "test")

    contaminated = set()
    for p in pairs:
        sa, sb = split(p.doc_a), split(p.doc_b)
        if sa == "train" and sb != "train":
            contaminated.add(p.doc_b)
        elif sb == "train" and sa != "train":
            contaminated.add(p.doc_a)
    assert moved == len(contaminated)
    new_split = {d: "train" for d in contaminated}
    for p in pairs:
        sa = new_split.get(p.doc_a, split(p.doc_a))
        sb = new_split.get(p.doc_b, split(p.doc_b))
        assert not (sa == "train") ^ (sb == "train"), (p, sa, sb)


# ---------------------------------------------------------------- PQ distortion


def test_pq_distortion_matches_numpy(spark):
    from database_toolbox_spark.operators.similarity import (
        PQ_CENTROIDS,
        PQ_SUBDIM,
        PQ_SUBSPACES,
        pq_distortion_eval,
    )

    got = {r.subspace: r for r in
           pq_distortion_eval(spark, SF_DIR).collect()}
    emb = pd.read_parquet(table_path(SF_DIR, "embeddings"))
    emb = emb.sort_values("vec_id")
    X = np.stack(emb["embedding"]).astype(np.float64)
    cb_ids = emb["vec_id"].to_numpy() < PQ_CENTROIDS
    for s in range(PQ_SUBSPACES):
        seg = slice(s * PQ_SUBDIM, (s + 1) * PQ_SUBDIM)
        V = X[:, seg]
        C = X[cb_ids][:, seg]
        d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        # the operator assigns on the 1e-6-floored grid with cid ties ->
        # replicate so knife-edge codewords agree
        d2g = np.floor(d2 * 1e6) / 1e6
        assign = d2g.argmin(axis=1)  # argmin takes first (lowest cid) tie
        mse = d2[np.arange(len(V)), assign].mean()
        energy = (V ** 2).sum(axis=1).mean()
        r = got[s]
        assert r.n_vectors == len(V)
        assert abs(r.mse - mse) < 1e-4, (s, r.mse, mse)
        assert abs(r.mean_energy - energy) < 1e-4
        assert abs(r.distortion_ratio - mse / energy) < 1e-4
        assert 0 <= r.distortion_ratio < 1  # sampled codebooks still help


# ---------------------------------------------------------------- lateness


def test_lateness_profile_matches_pandas(spark):
    from database_toolbox_spark.operators.events import lateness_profile

    got = {r.event_type: r for r in
           lateness_profile(spark, SF_DIR).collect()}
    ev = pd.read_parquet(table_path(SF_DIR, "events"))
    ev = ev.sort_values("event_id")
    ev["us"] = ev["ts"].astype("datetime64[ns]").astype("int64") // 1000
    for t, g in ev.groupby("event_type"):
        late = (g["us"].cummax() - g["us"]) / 1e6
        r = got[t]
        assert r.n_events == len(g)
        assert r.n_out_of_order == int((late > 0).sum())
        assert abs(r.p95_lateness_s
                   - np.percentile(late, 95, method="linear")) < 0.5
        assert abs(r.max_lateness_s - late.max()) < 0.01
        # percentile ladder must be monotone
        assert r.p50_lateness_s <= r.p95_lateness_s <= r.p99_lateness_s
        assert r.p99_lateness_s <= r.max_lateness_s


# ---------------------------------------------------------------- blocking RR/PC


def test_blocking_eval_matches_brute_force(spark):
    import hashlib

    from database_toolbox_spark.operators.dedup import (
        BLOCKEVAL_PCT,
        SNM_WINDOW,
        blocking_quality_eval,
    )

    try:
        import Levenshtein  # noqa: F401
        have_lev = True
    except ImportError:
        have_lev = False

    row = blocking_quality_eval(spark, SF_DIR).collect()[0]
    part = pd.read_parquet(table_path(SF_DIR, "part"))
    samp = part[part["p_partkey"].map(
        lambda k: int(hashlib.md5(str(k).encode()).hexdigest()[:4], 16)
        % 100 < BLOCKEVAL_PCT
    )][["p_partkey", "p_name"]]
    n = len(samp)
    assert row.n_sample == n
    assert row.n_all_pairs == n * (n - 1) // 2
    # SNM candidate count recount (blocking is string-sort based)
    samp = samp.assign(blk=samp["p_name"].str[0]).sort_values(
        ["blk", "p_name", "p_partkey"]
    )
    n_cand = 0
    cand_pairs = set()
    for _, g in samp.groupby("blk", sort=False):
        keys = g["p_partkey"].tolist()
        for i in range(len(keys)):
            for j in range(i + 1, min(i + SNM_WINDOW + 1, len(keys))):
                n_cand += 1
                cand_pairs.add((min(keys[i], keys[j]),
                                max(keys[i], keys[j])))
    assert row.n_candidates == n_cand
    assert abs(row.reduction_ratio
               - (1 - n_cand / (n * (n - 1) / 2))) < 1e-5
    # structural bounds always hold; exact PC recount needs a
    # levenshtein lib (absent here) so verify consistency instead
    assert 0 <= row.n_found <= row.n_true_matches
    assert 0.0 <= row.pairs_completeness <= 1.0
    if row.n_true_matches:
        assert abs(row.pairs_completeness
                   - row.n_found / row.n_true_matches) < 1e-5


# ---------------------------------------------------------------- burstiness


def test_term_burstiness_matches_pandas(spark):
    from database_toolbox_spark.operators.text import (
        BURST_MIN_DF,
        term_burstiness_topk,
    )

    got = term_burstiness_topk(spark, SF_DIR).collect()
    docs = pd.read_parquet(table_path(SF_DIR, "documents"))
    rows = []
    for _, d in docs.iterrows():
        for t in d.text.split(" "):
            if t:
                rows.append((d.doc_id, t))
    tf = pd.DataFrame(rows, columns=["doc_id", "term"]).groupby(
        ["term", "doc_id"]
    ).size()
    st = tf.groupby(level=0).agg(["count", "sum", "max"])
    st = st[st["count"] >= BURST_MIN_DF]
    st["b"] = np.floor(st["sum"] / st["count"] * 1e4 + 0.501) / 1e4
    want = st.sort_values(
        ["b"], ascending=False, kind="stable"
    )
    # verify the top rows agree on (df, cf, burstiness)
    for r in got:
        w = st.loc[r.term]
        assert r.df == w["count"], r.term
        assert r.cf == w["sum"], r.term
        assert abs(r.burstiness - w["sum"] / w["count"]) < 1e-3
        assert r.max_tf == w["max"]
    # the reported max burstiness is the corpus max
    assert abs(got[0].burstiness - want["b"].max()) < 1e-9


# ---------------------------------------------------------------- CBO evals


def test_independence_eval_matches_pandas(spark):
    from database_toolbox_spark.operators.profile import (
        independence_assumption_eval,
    )

    got = {r.pair: r for r in
           independence_assumption_eval(spark, SF_DIR).collect()}
    o = pd.read_parquet(table_path(SF_DIR, "orders"))
    p1 = o["o_orderpriority"] == "1-URGENT"
    p2 = o["o_orderstatus"] == "F"
    p3 = o["o_totalprice"] > 150000
    n = len(o)
    for name, (a, b) in {
        "priority_x_status": (p1, p2),
        "priority_x_price": (p1, p3),
        "status_x_price": (p2, p3),
    }.items():
        est = a.sum() * b.sum() / n
        act = int((a & b).sum())
        r = got[name]
        assert abs(r.est_rows - est) < 0.01, name
        assert r.actual_rows == act, name
        if act and est:
            q = max(est / act, act / est)
            assert abs(r.q_error - q) < 1e-3, name


def test_stale_stats_eval_matches_pandas(spark):
    from database_toolbox_spark.operators.profile import (
        _STALE_PREDS,
        STALE_SPLIT,
        stale_stats_selectivity_eval,
    )

    got = {r.price_cutoff: r for r in
           stale_stats_selectivity_eval(spark, SF_DIR).collect()}
    o = pd.read_parquet(table_path(SF_DIR, "orders"))
    split = pd.Timestamp(STALE_SPLIT)
    ref = o.loc[o.o_orderdate < split, "o_totalprice"].to_numpy()
    cur = o.loc[o.o_orderdate >= split, "o_totalprice"].to_numpy()
    cuts = np.percentile(ref, np.arange(10, 100, 10), method="linear")
    for x in _STALE_PREDS:
        est = ((cuts <= x).sum() + 0.5) / 10 * len(cur)
        act = int((cur <= x).sum())
        r = got[x]
        assert abs(r.est_rows - est) < 0.01, x
        assert r.actual_rows == act, x


# ---------------------------------------------------------------- Chan merge


def test_parallel_moments_merge_identity_and_anchor(spark):
    from database_toolbox_spark.operators.stats import (
        parallel_moments_merge,
    )

    row = parallel_moments_merge(spark, SF_DIR).collect()[0]
    assert row.max_abs_diff == 0.0  # the merge identity, after rounding
    assert row.merged_n == row.direct_n
    o = pd.read_parquet(table_path(SF_DIR, "orders"))["o_totalprice"]
    assert row.merged_n == len(o)
    assert abs(row.merged_mean - o.mean()) < 0.02
    assert abs(row.merged_sd - o.std(ddof=1)) < 0.01


# ---------------------------------------------------------------- asof tol


def test_asof_tolerance_consistent_with_plain_asof(spark):
    from database_toolbox_spark.operators.asof import (
        ASOF_TOL_MIN,
        asof_last_click,
        asof_last_click_tolerance,
    )

    plain = {r.event_id: r for r in
             asof_last_click(spark, SF_DIR).collect()}
    tol = {r.event_id: r for r in
           asof_last_click_tolerance(spark, SF_DIR).collect()}
    assert set(plain) == set(tol)
    n_dropped = 0
    for eid, t in tol.items():
        p = plain[eid]
        if t.matched:
            assert t.click_ts_within_tol == p.last_click_ts
            gap = (p.purchase_ts - p.last_click_ts).total_seconds()
            assert 0 <= gap <= ASOF_TOL_MIN * 60
        else:
            assert t.click_ts_within_tol is None
            if p.last_click_ts is not None:
                gap = (p.purchase_ts - p.last_click_ts).total_seconds()
                assert gap > ASOF_TOL_MIN * 60
                n_dropped += 1
    # the tolerance must actually bite on this fixture
    assert n_dropped > 0


# ---------------------------------------------------------------- bridge


def test_revenue_bridge_exact_decomposition(spark):
    from database_toolbox_spark.operators.stats import (
        BRIDGE_SPLIT,
        revenue_bridge_by_segment,
    )

    got = {r.c_mktsegment: r for r in
           revenue_bridge_by_segment(spark, SF_DIR).collect()}
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    cust = pd.read_parquet(table_path(SF_DIR, "customer"))
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["period"] = (j["o_orderdate"] >= pd.Timestamp(BRIDGE_SPLIT)).astype(int)
    for seg, r in got.items():
        g = j[j.c_mktsegment == seg]
        r0 = g[g.period == 0]["o_totalprice"]
        r1 = g[g.period == 1]["o_totalprice"]
        assert r.n_orders_before == len(r0)
        assert r.n_orders_after == len(r1)
        assert abs(r.revenue_change - (r1.sum() - r0.sum())) < 0.05
        # exact decomposition: effects re-sum to the delta
        assert r.residual == 0.0, (seg, r.residual)
        assert abs(
            r.volume_effect + r.price_effect + r.interaction_effect
            - r.revenue_change
        ) < 0.05


# ---------------------------------------------------------------- hashing


def test_feature_hashing_matches_pandas(spark):
    import hashlib

    from database_toolbox_spark.operators.pipeline import (
        FHASH_BITS,
        feature_hashing_collisions,
    )

    row = feature_hashing_collisions(spark, SF_DIR).collect()[0]
    docs = pd.read_parquet(table_path(SF_DIR, "documents"))
    from collections import Counter
    cf = Counter(t for txt in docs["text"] for t in txt.split(" ") if t)
    buckets = Counter()
    mass = Counter()
    for term, c in cf.items():
        b = int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % (
            1 << FHASH_BITS
        )
        buckets[b] += 1
        mass[b] += c
    n_terms = len(cf)
    colliding = {b for b, k in buckets.items() if k > 1}
    assert row.n_terms == n_terms
    assert row.n_buckets_used == len(buckets)
    assert row.n_colliding_buckets == len(colliding)
    want_ct = sum(buckets[b] for b in colliding)
    assert row.n_colliding_terms == want_ct
    assert abs(row.term_collision_rate - want_ct / n_terms) < 1e-5
    want_mass = sum(mass[b] for b in colliding) / sum(mass.values())
    assert abs(row.mass_collision_rate - want_mass) < 1e-5
