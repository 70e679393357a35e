"""Round-10 operator tests: external anchors (numpy / pure-Python
replays) for the new tranche — parity alone can't prove shared math, so
each operator's core computation is recomputed outside both engines."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from tests.conftest import SF_DIR


def _fetch(sql: str):
    con = duckdb.connect()
    for t in ("documents", "embeddings", "orders", "lineitem",
              "events", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    out = con.execute(sql).fetchall()
    con.close()
    return out


def r6(x):
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.501) / 1e6


# ------------------------------------------------- IVF + binary composite ANN


def test_ivf_bq_ann_matches_numpy(spark):
    """Replay the whole ladder in numpy: L2 cell assignment, asymmetric
    sign-code scoring of the query's cell, adaptive shortlist, exact
    cosine rerank."""
    from database_toolbox_spark.operators.similarity import (
        BQ_RERANK,
        BQ_RERANK_FRACTION,
        N_IVF_CELLS,
        QUERY_VEC_ID,
        TOP_K,
        ivf_bq_ann_topk,
    )

    t = _fetch("SELECT vec_id, label, embedding FROM embeddings "
               "ORDER BY vec_id")
    ids = np.array([r[0] for r in t])
    labels = {r[0]: r[1] for r in t}
    V = np.array([r[2] for r in t], dtype=np.float64)

    cents = V[ids < N_IVF_CELLS]
    cent_ids = ids[ids < N_IVF_CELLS]
    d2 = ((V[:, None, :] - cents[None, :, :]) ** 2).sum(2)
    d2g = np.floor(d2 * 1e6) / 1e6
    # ORDER BY grid-floored d2, cell — numpy argmin with the same tiebreak
    cell = np.array([
        cent_ids[min(range(len(cent_ids)),
                     key=lambda c: (d2g[i, c], cent_ids[c]))]
        for i in range(len(ids))
    ])

    qpos = int(np.nonzero(ids == QUERY_VEC_ID)[0][0])
    qv = V[qpos]
    probe = [i for i in range(len(ids))
             if cell[i] == cell[qpos] and ids[i] != QUERY_VEC_ID]
    signs = np.where(V > 0, 1.0, -1.0)
    s = r6(signs[probe] @ qv)
    width = max(BQ_RERANK, len(probe) // BQ_RERANK_FRACTION)
    short = sorted(range(len(probe)),
                   key=lambda j: (-s[j], ids[probe[j]]))[:width]
    cos = r6((V[[probe[j] for j in short]] @ qv)
             / (np.linalg.norm(V[[probe[j] for j in short]], axis=1)
                * np.linalg.norm(qv)))
    order = sorted(range(len(short)),
                   key=lambda j: (-cos[j], ids[probe[short[j]]]))[:TOP_K]
    expected = [
        (int(ids[probe[short[j]]]), labels[ids[probe[short[j]]]],
         float(r6([s[short[j]]])[0]), float(cos[j]))
        for j in order
    ]

    got = [(r.vec_id, r.label, r.asym_score, r.cos_sim)
           for r in ivf_bq_ann_topk(spark, SF_DIR).collect()]
    assert got == expected


# ------------------------------------------------------------------- Croston


def test_croston_matches_python_replay(spark):
    from database_toolbox_spark.operators.stats import (
        CROSTON_MIN_EVENTS,
        croston_intermittent_demand,
    )

    rows = _fetch("""
        SELECT l_partkey, datediff('day', DATE '1992-01-01', l_shipdate),
               sum(CAST(floor(l_quantity + 0.5e0) AS BIGINT))
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
    """)
    series: dict[int, list[tuple[int, int]]] = {}
    for pk, dd, dem in rows:
        series.setdefault(pk, []).append((dd, dem))

    def croston(ev):
        z = p = prev = 0.0
        n = 0
        for dd, dem in ev:
            if n == 0:
                z, prev, n = float(dem), float(dd), 1
            elif n == 1:
                z = 0.1 * dem + 0.9 * z
                p, prev, n = dd - prev, float(dd), 2
            else:
                z = 0.1 * dem + 0.9 * z
                p = 0.1 * (dd - prev) + 0.9 * p
                prev, n = float(dd), n + 1
        return z, p

    def r4(x):
        return math.floor(x * 1e4 + 0.501) / 1e4

    cands = []
    for pk, ev in series.items():
        if len(ev) < CROSTON_MIN_EVENTS:
            continue
        z, p = croston(ev)
        if p > 0:
            cands.append((pk, len(ev), r4(z), r4(p),
                          r4(z / p), r4(0.95 * z / p)))
    expected = sorted(cands, key=lambda c: (-c[3], c[0]))[:20]

    got = [(r.partkey, r.n_demand_days, r.smoothed_size,
            r.smoothed_interval, r.croston_forecast, r.sba_forecast)
           for r in croston_intermittent_demand(spark, SF_DIR).collect()]
    assert got == expected


# ----------------------------------------------------------------- OBF monitor


def test_obf_boundary_shape(spark):
    """The boundary must equal C/sqrt(t) from the emitted info fraction,
    decrease monotonically look over look, and end near C at t = 1. On
    the A/A split the final look must not reject."""
    from database_toolbox_spark.operators.stats import (
        obrien_fleming_monitor,
    )

    rows = obrien_fleming_monitor(spark, SF_DIR).collect()
    assert len(rows) > 10
    prev_b = float("inf")
    for r in rows:
        want = math.floor(2.24 / math.sqrt(r.info_fraction) * 1e4
                          + 0.501) / 1e4
        # the emitted info_fraction is 6-dp rounded; propagate that
        # grid error through d(C/sqrt(t))/dt = boundary/(2t)
        tol = 2e-4 + r.obf_boundary / (2 * r.info_fraction) * 5e-7
        assert abs(r.obf_boundary - want) < tol, r
        assert r.obf_boundary <= prev_b + 1e-9
        prev_b = r.obf_boundary
        assert r.rejected == int(abs(r.z) > r.obf_boundary)
    last = rows[-1]
    assert abs(last.info_fraction - 1.0) < 1e-9
    assert last.rejected == 0  # A/A: the nominal-level final look holds


# ------------------------------------------------------------- mel filterbank


def test_mel_energies_match_numpy(spark):
    from database_toolbox_spark.operators.multimodal import (
        AUDIO_BIAS,
        DFT_BINS,
        DFT_N,
        N_MEL,
        _mel_weights,
        audio_mel_energies,
    )

    docs = _fetch("SELECT doc_id, text FROM documents "
                  "ORDER BY doc_id LIMIT 40")
    W = np.array(_mel_weights())
    assert W.shape == (N_MEL, DFT_BINS)
    assert (W >= 0).all() and W.sum() > 0

    got = {}
    for r in audio_mel_energies(spark, SF_DIR).collect():
        got[(r.doc_id, r.mel_band)] = (r.mel_energy, r.log_mel_energy)

    for doc_id, text in docs:
        dev = np.zeros(DFT_N)
        for i in range(min(DFT_N, len(text))):
            dev[i] = ord(text[i]) - AUDIO_BIAS
        ks = np.arange(DFT_N)
        pw = []
        for k in range(DFT_BINS):
            re = (dev * np.cos(2 * np.pi * k * ks / DFT_N)).sum()
            im = (dev * np.sin(2 * np.pi * k * ks / DFT_N)).sum()
            pw.append(math.floor((re * re + im * im) * 100 + 0.501) / 100)
        for b in range(N_MEL):
            e = float(np.dot(pw, W[b]))
            want_e = math.floor(e * 100 + 0.501) / 100
            ge, gl = got[(doc_id, b)]
            assert abs(ge - want_e) < 0.02, (doc_id, b, ge, want_e)
            assert abs(gl - math.log(1 + e)) < 1e-3


# ----------------------------------------------------------- count-min sketch


def test_cms_overestimates_and_python_replay(spark):
    import hashlib
    from collections import Counter

    from database_toolbox_spark.operators.sketches import (
        CMS_D,
        CMS_TOP,
        CMS_W,
        count_min_sketch_accuracy,
    )

    docs = _fetch("SELECT text FROM documents")
    tf = Counter()
    for (text,) in docs:
        tf.update(text.split(" "))

    def bucket(term, r):
        h = int(hashlib.md5(f"{term}#{r}".encode()).hexdigest()[:8], 16)
        return abs(h) % CMS_W

    cms = [[0] * CMS_W for _ in range(CMS_D)]
    for term, c in tf.items():
        for r in range(CMS_D):
            cms[r][bucket(term, r)] += c

    top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_TOP]
    expected = {
        t: (c, min(cms[r][bucket(t, r)] for r in range(CMS_D)))
        for t, c in top
    }

    rows = count_min_sketch_accuracy(spark, SF_DIR).collect()
    assert len(rows) == CMS_TOP
    for r in rows:
        want_c, want_est = expected[r.term]
        assert (r.true_count, r.cms_estimate) == (want_c, want_est), r.term
        assert r.overestimate >= 0


# ------------------------------------------------------------------ PPR anchor


def test_personalized_pagerank_matches_numpy(spark):
    from database_toolbox_spark.operators.graph import (
        DAMPING,
        ITERATIONS,
        personalized_pagerank,
    )

    rows = _fetch("""
        SELECT concat('s', CAST(l.l_suppkey AS VARCHAR)),
               concat('c', CAST(o.o_custkey AS VARCHAR)),
               CAST(count(*) AS DOUBLE)
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    """)
    edges = {}
    for s, c, w in rows:
        edges[(s, c)] = edges.get((s, c), 0.0) + w
        edges[(c, s)] = edges.get((c, s), 0.0) + w
    nodes = sorted({a for a, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    P = np.zeros((len(nodes), len(nodes)))
    out = {}
    for (a, _), w in edges.items():
        out[a] = out.get(a, 0.0) + w
    for (a, b), w in edges.items():
        P[idx[a], idx[b]] = w / out[a]
    s0 = min(nodes)
    r = np.zeros(len(nodes))
    r[idx[s0]] = 1.0
    e = np.zeros(len(nodes))
    e[idx[s0]] = 1.0
    for _ in range(ITERATIONS):
        r = (1 - DAMPING) * e + DAMPING * (P.T @ r)
    rg = np.floor(r * 1e6 + 0.501) / 1e6
    order = sorted(range(len(nodes)),
                   key=lambda i: (-rg[i], nodes[i]))[:20]
    expected = [(nodes[i], float(rg[i])) for i in order]

    got = [(row.node, row.ppr)
           for row in personalized_pagerank(spark, SF_DIR).collect()]
    assert got == expected


# --------------------------------------------------------------------- Benford


def test_benford_chi2_matches_python(spark):
    from database_toolbox_spark.operators.profile import (
        benford_price_audit,
    )

    prices = _fetch("SELECT floor(o_totalprice) FROM orders "
                    "WHERE o_totalprice >= 1")
    counts = {d: 0 for d in range(1, 10)}
    for (p,) in prices:
        counts[int(str(int(p))[0])] += 1
    n = sum(counts.values())
    chi2 = sum(
        (counts[d] - n * math.log10(1 + 1 / d)) ** 2
        / (n * math.log10(1 + 1 / d))
        for d in range(1, 10)
    )

    rows = benford_price_audit(spark, SF_DIR).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    for r in rows:
        assert r.n_orders == counts[r.digit]
        assert abs(r.chi2_total - chi2) < 0.01
        assert r.flagged == int(chi2 > 15.507)
    assert abs(sum(r.observed_frac for r in rows) - 1.0) < 1e-3


# ------------------------------------------------------------------ Good-Turing


def test_good_turing_matches_counter(spark):
    from collections import Counter

    from database_toolbox_spark.operators.text import (
        GT_MAX_R,
        good_turing_discounts,
    )

    docs = _fetch("SELECT text FROM documents")
    tf = Counter()
    for (text,) in docs:
        tf.update(text.split(" "))
    nr = Counter(tf.values())
    n_tokens = sum(tf.values())

    rows = good_turing_discounts(spark, SF_DIR).collect()
    assert [r.r for r in rows] == list(range(1, GT_MAX_R + 1))
    for r in rows:
        assert r.n_r == nr.get(r.r, 0)
        assert r.n_r_plus_1 == nr.get(r.r + 1, 0)
        if r.n_r:
            want = (r.r + 1) * nr.get(r.r + 1, 0) / r.n_r
            assert abs(r.r_star - want) < 1e-3
        assert abs(r.unseen_mass_p0 - nr.get(1, 0) / n_tokens) < 1e-5
        assert r.n_types == len(tf)


# ------------------------------------------------------------------------ KWIC


def test_kwic_snippets_replay(spark):
    from database_toolbox_spark.operators.text import (
        KWIC_RADIUS,
        KWIC_TERM,
        KWIC_TOP,
        kwic_snippets,
    )

    docs = _fetch("SELECT doc_id, source, text FROM documents")
    hits = []
    for doc_id, source, text in docs:
        pos = text.find(KWIC_TERM) + 1
        if pos <= 0:
            continue
        n = text.count(KWIC_TERM)
        start = max(1, pos - KWIC_RADIUS)
        width = min(pos - start, KWIC_RADIUS) + len(KWIC_TERM) + KWIC_RADIUS
        hits.append((doc_id, source, n, pos,
                     text[start - 1:start - 1 + width]))
    expected = sorted(hits, key=lambda h: (-h[2], h[0]))[:KWIC_TOP]

    got = [(r.doc_id, r.source, r.n_matches, r.first_pos, r.snippet)
           for r in kwic_snippets(spark, SF_DIR).collect()]
    assert got == expected


# -------------------------------------------------------- Shapley attribution


def test_shapley_matches_python(spark):
    from database_toolbox_spark.operators.events import (
        shapley_channel_attribution,
    )

    rows = _fetch("SELECT user_id, event_type FROM events")
    touched: dict[int, set] = {}
    conv: dict[int, int] = {}
    for uid, et in rows:
        touched.setdefault(uid, set())
        conv.setdefault(uid, 0)
        if et in ("click", "view", "signup"):
            touched[uid].add(et)
        if et == "purchase":
            conv[uid] = 1
    bits = {"click": 1, "view": 2, "signup": 4}
    agg: dict[int, list] = {}
    for uid in touched:
        m = sum(bits[c] for c in touched[uid])
        n, c = agg.get(m, (0, 0))
        agg[m] = (n + 1, c + conv[uid])
    v = {m: c / n for m, (n, c) in agg.items()}

    from math import factorial
    phi = {}
    for ch, bit in bits.items():
        others = [b for c2, b in bits.items() if c2 != ch]
        total = 0.0
        for m in range(4):
            s = sum(others[j] for j in range(2) if m >> j & 1)
            k = bin(m).count("1")
            w = factorial(k) * factorial(1 - k + 1) / factorial(3)
            total += w * (v.get(s + bit, 0.0) - v.get(s, 0.0))
        phi[ch] = total
    tot = sum(phi.values())

    got = {r.channel: r for r in
           shapley_channel_attribution(spark, SF_DIR).collect()}
    for ch in bits:
        assert abs(got[ch].shapley_value - phi[ch]) < 1e-5, ch
        assert abs(got[ch].credit_share - phi[ch] / tot) < 1e-5, ch


# ----------------------------------------------------------------- Qini levels


def test_qini_levels_match_python(spark):
    import hashlib

    from database_toolbox_spark.operators.events import (
        QINI_MAX_LEVEL,
        qini_uplift_levels,
    )

    rows = _fetch("SELECT user_id, event_type FROM events")
    clicks: dict[int, int] = {}
    conv: dict[int, int] = {}
    for uid, et in rows:
        clicks.setdefault(uid, 0)
        conv.setdefault(uid, 0)
        if et == "click":
            clicks[uid] += 1
        if et == "purchase":
            conv[uid] = 1
    lv: dict[int, list] = {}
    for uid in clicks:
        arm = int(hashlib.md5(str(uid).encode()).hexdigest()[:4], 16) % 2
        level = min(clicks[uid], QINI_MAX_LEVEL)
        cur = lv.setdefault(level, [0, 0, 0, 0])
        cur[arm] += 1
        cur[2 + arm] += conv[uid]

    got = {r.engagement_level: r
           for r in qini_uplift_levels(spark, SF_DIR).collect()}
    assert set(got) == set(lv)
    cn_t = cn_c = cy_t = cy_c = 0
    for level in sorted(lv, reverse=True):
        n_c, n_t, y_c, y_t = lv[level]
        cn_t, cn_c, cy_t, cy_c = (cn_t + n_t, cn_c + n_c,
                                  cy_t + y_t, cy_c + y_c)
        r = got[level]
        assert (r.n_treated, r.n_control) == (n_t, n_c)
        qini = cy_t - cy_c * cn_t / max(cn_c, 1)
        assert abs(r.qini_value - qini) < 1e-3, level


# ------------------------------------------------------------------ Bayes A/B


def test_bayes_ab_matches_closed_form(spark):
    import hashlib

    from database_toolbox_spark.operators.stats import bayes_ab_conversion

    rows = _fetch("SELECT user_id, max(CASE WHEN event_type = 'purchase'"
                  " THEN 1 ELSE 0 END) FROM events GROUP BY user_id")
    n = [0, 0]
    c = [0, 0]
    for uid, conv in rows:
        arm = int(hashlib.md5(str(uid).encode()).hexdigest()[:4], 16) % 2
        n[arm] += 1
        c[arm] += conv
    aa, ba = 1 + c[0], 1 + n[0] - c[0]
    ab, bb = 1 + c[1], 1 + n[1] - c[1]
    mu = [aa / (aa + ba), ab / (ab + bb)]
    var = [aa * ba / ((aa + ba) ** 2 * (aa + ba + 1)),
           ab * bb / ((ab + bb) ** 2 * (ab + bb + 1))]
    t = (mu[1] - mu[0]) / math.sqrt(var[0] + var[1])
    p = math.erfc(-t / math.sqrt(2)) / 2

    r = bayes_ab_conversion(spark, SF_DIR).collect()[0]
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (n[0], c[0], n[1], c[1])
    assert abs(r.posterior_mean_a - mu[0]) < 1e-5
    assert abs(r.posterior_mean_b - mu[1]) < 1e-5
    assert abs(r.prob_b_beats_a - p) < 1e-5  # A&S poly |err| < 7.5e-8
    assert r.lift_ci_lo <= r.lift_estimate <= r.lift_ci_hi


# ------------------------------------------------------------------- PIT join


def test_pit_join_matches_python(spark):
    import hashlib

    from database_toolbox_spark.operators.asof import (
        PIT_SPAN,
        point_in_time_dim_join,
    )

    custs = _fetch("SELECT c_custkey, c_mktsegment FROM customer")
    orders = _fetch(
        "SELECT o_custkey, datediff('day', DATE '1992-01-01', o_orderdate),"
        " CAST(floor(o_totalprice * 100e0 + 0.5e0) AS BIGINT) FROM orders"
    )
    split = {}
    seg = {}
    for ck, s in custs:
        split[ck] = int(
            hashlib.md5(str(ck).encode()).hexdigest()[:6], 16
        ) % PIT_SPAN
        seg[ck] = s
    agg: dict[tuple, list] = {}
    for ck, od, cents in orders:
        if ck not in split:
            continue
        if od < split[ck]:
            key = (1, seg[ck])
        else:
            key = (2, "MIGRATED-" + seg[ck])
        cur = agg.setdefault(key, [0, 0])
        cur[0] += 1
        cur[1] += cents
    got = {(r.version, r.segment): (r.n_orders, r.revenue)
           for r in point_in_time_dim_join(spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for k, (nn, cents) in agg.items():
        assert got[k][0] == nn, k
        assert abs(got[k][1] - cents / 100) < 0.02, k
    # every order lands in exactly one version
    assert sum(v[0] for v in agg.values()) == len(orders)


# ------------------------------------------------------------- ABC-XYZ matrix


def test_abc_xyz_consistent_with_abc_classes(spark):
    """The matrix's per-letter marginals must equal abc_inventory_classes
    exactly (same cut, same rounding), every part must land in exactly
    one cell, and XYZ must replay from integer weekly moments."""
    from database_toolbox_spark.operators.market import (
        XYZ_X_CV,
        XYZ_Y_CV,
        abc_inventory_classes,
        abc_xyz_matrix,
    )

    cells = abc_xyz_matrix(spark, SF_DIR).collect()
    abc = {r.abc_class: r for r in
           abc_inventory_classes(spark, SF_DIR).collect()}
    marg: dict[str, list] = {}
    for c in cells:
        m = marg.setdefault(c.abc_class, [0, 0.0])
        m[0] += c.n_parts
        m[1] += c.cell_revenue
    assert set(marg) <= set(abc)
    for letter, (n, rev) in marg.items():
        assert n == abc[letter].n_parts, letter
        assert abs(rev - abc[letter].class_revenue) < 0.05, letter

    # XYZ replay from integer weekly demand moments
    import math
    rows = _fetch("""
        SELECT l_partkey,
               floor(datediff('day', DATE '1992-01-01', l_shipdate) / 7),
               sum(CAST(floor(l_quantity + 0.5e0) AS BIGINT))
        FROM lineitem GROUP BY 1, 2
    """)
    mom: dict[int, list] = {}
    for pk, _, q in rows:
        m = mom.setdefault(pk, [0, 0, 0])
        m[0] += 1
        m[1] += q
        m[2] += q * q
    xyz_count = {"X": 0, "Y": 0, "Z": 0}
    for n, s, ss in mom.values():
        if n < 2 or s == 0:
            xyz_count["Z"] += 1
            continue
        cv = math.sqrt(max(ss - s * s / n, 0.0) / (n - 1)) / (s / n)
        xyz_count["X" if cv <= XYZ_X_CV else
                  "Y" if cv <= XYZ_Y_CV else "Z"] += 1
    got_xyz = {"X": 0, "Y": 0, "Z": 0}
    for c in cells:
        got_xyz[c.xyz_class] += c.n_parts
    assert got_xyz == xyz_count


# ----------------------------------------------------------- forecast scorecard


def test_forecast_scorecard_matches_python(spark):
    from database_toolbox_spark.operators.stats import (
        FC_SEASON,
        FC_TEST_DAYS,
        forecast_scorecard_mase,
    )

    rows = _fetch("""
        SELECT o_orderdate,
               sum(CAST(floor(o_totalprice * 100e0 + 0.5e0) AS BIGINT))
        FROM orders GROUP BY 1 ORDER BY 1
    """)
    y = [v for _, v in rows]
    n = len(y)
    split = n - FC_TEST_DAYS
    train = y[:split]
    naive_abs = sum(abs(train[i] - train[i - 1])
                    for i in range(1, len(train)))
    n_naive = len(train) - 1
    f_mean = math.floor(sum(train) / len(train) + 0.5)

    def score(fs):
        pairs = [(y[i], f) for i, f in fs if f is not None]
        ae = sum(abs(a - f) for a, f in pairs)
        sm = sum(math.floor(2 * abs(a - f) / max(a + f, 1) * 1e9 + 0.5)
                 for a, f in pairs)
        r = lambda x, d: math.floor(x * 10**d + 0.501) / 10**d  # noqa: E731
        return (r(ae / (100 * FC_TEST_DAYS), 2),
                r(sm / (1e9 * FC_TEST_DAYS), 6),
                r(ae * n_naive / (FC_TEST_DAYS * naive_abs), 4))

    expected = {
        "naive": score([(i, y[i - 1]) for i in range(split, n)]),
        "seasonal_naive": score(
            [(i, y[i - FC_SEASON] if i >= FC_SEASON else None)
             for i in range(split, n)]),
        "train_mean": score([(i, f_mean) for i in range(split, n)]),
    }
    got = {r.method: (r.mae, r.smape, r.mase)
           for r in forecast_scorecard_mase(spark, SF_DIR).collect()}
    assert got == expected
    for r in forecast_scorecard_mase(spark, SF_DIR).collect():
        assert r.n_test_days == FC_TEST_DAYS
