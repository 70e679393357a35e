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


# ------------------------------------------------ dim truncation recall


def test_dim_truncation_recall_matches_numpy(spark):
    from database_toolbox_spark.operators.similarity import (
        _RECALL_K,
        N_KNN_QUERIES,
        TRUNC_DIMS,
        dim_truncation_recall,
    )

    got = {
        (r.trunc_dim, r.qid): (r.n_hits, r.recall_at_10)
        for r in dim_truncation_recall(spark, SF_DIR).collect()
    }
    emb = pd.read_parquet(table_path(SF_DIR, "embeddings"))
    X = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()

    def topk(qrow, k_dims):
        q = X[qrow][:k_dims]
        M = X[:, :k_dims]
        cos = (M @ q) / (np.sqrt((M * M).sum(1)) * np.sqrt(q @ q))
        cos = np.floor(cos * 1e6 + 0.501) / 1e6
        order = sorted(
            ((c, v) for c, v in zip(cos, ids) if v != ids[qrow]),
            key=lambda t: (-t[0], t[1]),
        )
        return [v for _, v in order[:_RECALL_K]]

    for qid in range(N_KNN_QUERIES):
        qrow = int(np.where(ids == qid)[0][0])
        truth = set(topk(qrow, X.shape[1]))
        for k in TRUNC_DIMS:
            hits = len(truth & set(topk(qrow, k)))
            assert got[(k, qid)] == (
                hits,
                np.floor(hits / _RECALL_K * 1e4 + 0.501) / 1e4,
            ), (k, qid)


# ------------------------------------------------ Kneser-Ney held-out LM


def test_kneser_ney_matches_python_replay(spark):
    """Exact KN probability replay (continuation counts, 0.75 discount,
    +1/(B+V) floored Pcont) over the md5 90/5/5 split."""
    import hashlib
    from collections import Counter, defaultdict

    from database_toolbox_spark.operators.text import (
        kneser_ney_heldout_perplexity,
    )

    got = {r.source: r for r in
           kneser_ney_heldout_perplexity(spark, SF_DIR).collect()}
    docs = pd.read_parquet(table_path(SF_DIR, "documents"))
    bc = Counter()
    held = []
    for _, row in docs.iterrows():
        toks = row["text"].split(" ")
        bucket = int(hashlib.md5(str(row["doc_id"]).encode())
                     .hexdigest()[:4], 16) % 100
        bigs = list(zip(toks, toks[1:]))
        if bucket < 90:
            bc.update(bigs)
        else:
            held.extend((row["source"], b) for b in bigs)
    c1 = Counter()
    n1r = Counter()
    n1l = Counter()
    for (w1, w2), c in bc.items():
        c1[w1] += c
        n1r[w1] += 1
        n1l[w2] += 1
    B = len(bc)
    V = len({w2 for _, w2 in bc})
    per_src = defaultdict(list)
    oov = Counter()
    for src, (w1, w2) in held:
        pcont = (n1l.get(w2, 0) + 1.0) / (B + V)
        if w1 not in c1:
            p = pcont
        else:
            p = (max(bc.get((w1, w2), 0) - 0.75, 0.0) / c1[w1]
                 + 0.75 * n1r[w1] / c1[w1] * pcont)
        per_src[src].append(p)
        if (w1, w2) not in bc:
            oov[src] += 1
    for src, ps in per_src.items():
        row = got[src]
        assert row.n_scored == len(ps)
        bits = np.mean([-np.log(p) for p in ps]) / np.log(2.0)
        assert row.cross_entropy_bits == np.floor(bits * 1e4 + 0.501) / 1e4
        assert row.oov_bigram_rate == np.floor(
            oov[src] / len(ps) * 1e4 + 0.501) / 1e4
    assert set(got) == set(per_src)


# ------------------------------------------------ local clustering coeff


def test_lcc_matches_brute_force(spark):
    from database_toolbox_spark.operators.graph import (
        LCC_CAP,
        LCC_MIN_DEG,
        LCC_MIN_SHARED,
        LCC_TOP,
        local_clustering_coefficient,
    )

    got = [(r.custkey, r.degree, r.n_triangles, r.clustering_coeff)
           for r in local_clustering_coefficient(spark, SF_DIR).collect()]
    li = pd.read_parquet(table_path(SF_DIR, "lineitem"))
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    cp = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")[
        ["o_custkey", "l_partkey"]
    ].drop_duplicates()
    shared = Counter = {}
    for _, g in cp.groupby("l_partkey")["o_custkey"]:
        # capped projection: per part only the LCC_CAP smallest custkeys
        cs = sorted(g)[:LCC_CAP]
        for i, a in enumerate(cs):
            for b in cs[i + 1:]:
                shared[(a, b)] = shared.get((a, b), 0) + 1
    adj = {}
    for (a, b), n in shared.items():
        if n >= LCC_MIN_SHARED:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    rows = []
    for v, nb in adj.items():
        d = len(nb)
        if d < LCC_MIN_DEG:
            continue
        tri = sum(len(adj[u] & nb) for u in nb) // 2
        cc = np.floor(2.0 * tri / (d * (d - 1)) * 1e6 + 0.501) / 1e6
        rows.append((v, d, tri, cc))
    rows.sort(key=lambda t: (-t[3], t[0]))
    assert got == rows[:LCC_TOP]


# ------------------------------------------------ calibration bins


def test_calibration_bins_conserve_gopher_passes(spark):
    """Cross-operator conservation: sum over bins of n_docs equals the
    corpus, and sum of n_docs*frac_rule_pass equals gopher_quality_flags'
    total n_pass; Brier total recomputed from per-doc pandas replay."""
    from database_toolbox_spark.operators.curation import (
        classifier_calibration_bins,
        gopher_quality_flags,
    )

    bins = classifier_calibration_bins(spark, SF_DIR).collect()
    gopher = gopher_quality_flags(spark, SF_DIR).collect()
    docs = pd.read_parquet(table_path(SF_DIR, "documents"))
    assert sum(b.n_docs for b in bins) == len(docs)
    n_pass_bins = round(sum(b.n_docs * b.frac_rule_pass for b in bins))
    assert n_pass_bins == sum(g.n_pass for g in gopher)
    # reliability-diagram sanity: predicted means sit inside their bin
    for b in bins:
        assert b.bin / 10 <= b.mean_predicted < (b.bin + 1) / 10 + 1e-9
        assert b.calibration_gap == np.floor(
            abs(b.mean_predicted - b.frac_rule_pass) * 1e6 + 0.5011) / 1e6 \
            or abs(b.calibration_gap
                   - abs(b.mean_predicted - b.frac_rule_pass)) < 2e-6


# ------------------------------------------------ water-filling


def test_waterfill_meets_budget_and_fairness(spark):
    from database_toolbox_spark.operators.pipeline import (
        token_budget_waterfill,
    )

    rows = token_budget_waterfill(spark, SF_DIR).collect()
    total = sum(r.tokens for r in rows)
    budget = np.floor(total * 0.5)
    assert abs(sum(r.allocation for r in rows) - budget) < 1e-2 * len(rows)
    partial = [r for r in rows if not r.fully_taken]
    full = [r for r in rows if r.fully_taken]
    assert partial, "budget < corpus, someone must be clipped"
    levels = {r.allocation for r in partial}
    assert len(levels) == 1, levels  # max-min fairness: one common level
    level = levels.pop()
    for r in full:
        assert r.allocation == r.tokens and r.tokens <= level + 1e-6
    for r in partial:
        assert r.tokens > level - 1e-6 and r.fill_frac < 1


# ------------------------------------------------ KMV + bottom-k


def test_kmv_estimate_matches_hash_replay(spark):
    """Exact replay of the estimator: md5-32bit hashes per distinct user,
    (k-1)/h_(k) estimate, small-group exact fallback."""
    import hashlib

    from database_toolbox_spark.operators.sketches import (
        KMV_K,
        kmv_distinct_estimate,
    )

    got = {r.event_type: r for r in kmv_distinct_estimate(spark, SF_DIR).collect()}
    ev = pd.read_parquet(table_path(SF_DIR, "events"))
    for etype, g in ev.groupby("event_type"):
        users = g["user_id"].unique()
        hashes = sorted({
            int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) + 1
            for u in users
        })
        n = len(users)
        est = ((KMV_K - 1) * 4294967296.0 / hashes[KMV_K - 1]
               if len(hashes) >= KMV_K else float(n))
        row = got[etype]
        assert row.exact_distinct == n
        assert row.kmv_estimate == np.floor(est * 100 + 0.501) / 100
        assert row.within_bound in (0, 1)


def test_bottomk_sample_is_min_hashes(spark):
    import hashlib

    from database_toolbox_spark.operators.sketches import (
        BOTTOMK_K,
        bottomk_user_sample,
    )

    rows = bottomk_user_sample(spark, SF_DIR).collect()
    ev = pd.read_parquet(table_path(SF_DIR, "events"))
    for etype, g in ev.groupby("event_type"):
        pairs = sorted(
            (int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) + 1, u)
            for u in g["user_id"].unique()
        )[:BOTTOMK_K]
        mine = [(r.hash_val, r.user_id, r.rank) for r in rows
                if r.event_type == etype]
        assert [(h, u) for h, u, _ in mine] == pairs
        assert [k for _, _, k in mine] == list(range(1, len(pairs) + 1))


# ------------------------------------------------ weighted median


def test_weighted_median_matches_pandas(spark):
    """Lower weighted median recomputed by explicit cumulative weights."""
    from database_toolbox_spark.operators.stats import weighted_median_price

    got = {r.l_returnflag: r for r in
           weighted_median_price(spark, SF_DIR).collect()}
    li = pd.read_parquet(table_path(SF_DIR, "lineitem"))
    for f, g in li.groupby("l_returnflag"):
        pw = g.groupby("l_extendedprice")["l_quantity"].sum().sort_index()
        tw = pw.sum()
        cum = pw.cumsum()
        wmed = cum.index[(cum >= tw / 2).argmax()]
        row = got[f]
        assert row.total_weight == np.floor(tw * 100 + 0.501) / 100
        assert row.weighted_median_price == np.floor(wmed * 100 + 0.501) / 100


# ------------------------------------------------ char entropy


def test_char_entropy_matches_python(spark):
    from collections import Counter

    from database_toolbox_spark.operators.text import char_entropy_scores

    got = {r.doc_id: r for r in char_entropy_scores(spark, SF_DIR).collect()}
    docs = pd.read_parquet(table_path(SF_DIR, "documents"))
    assert len(got) == len(docs)
    for _, d in docs.head(50).iterrows():
        counts = Counter(d["text"])
        n = sum(counts.values())
        ent = -sum(c / n * np.log2(c / n) for c in counts.values())
        row = got[d["doc_id"]]
        assert row.n_chars == n and row.distinct_chars == len(counts)
        assert row.char_entropy_bits == np.floor(ent * 1e4 + 0.501) / 1e4


# ------------------------------------------------ link prediction


def test_link_prediction_matches_brute_force(spark):
    from database_toolbox_spark.operators.graph import (
        LCC_CAP,
        LCC_MIN_SHARED,
        LINKPRED_TOP,
        link_prediction_scores,
    )

    got = [
        (r.custkey_a, r.custkey_b, r.common_neighbors, r.jaccard,
         r.adamic_adar)
        for r in link_prediction_scores(spark, SF_DIR).collect()
    ]
    li = pd.read_parquet(table_path(SF_DIR, "lineitem"))
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    cp = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")[
        ["o_custkey", "l_partkey"]
    ].drop_duplicates()
    shared = {}
    for _, g in cp.groupby("l_partkey")["o_custkey"]:
        # capped projection: per part only the LCC_CAP smallest custkeys
        cs = sorted(g)[:LCC_CAP]
        for i, a in enumerate(cs):
            for b in cs[i + 1:]:
                shared[(a, b)] = shared.get((a, b), 0) + 1
    adj = {}
    for (a, b), n in shared.items():
        if n >= LCC_MIN_SHARED:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    r6 = lambda x: np.floor(x * 1e6 + 0.501) / 1e6  # noqa: E731
    cands = []
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for w in nodes[i + 1:]:
            if w in adj[u]:
                continue
            common = adj[u] & adj[w]
            if not common:
                continue
            aa = sum(1.0 / np.log(len(adj[v])) for v in common)
            jac = len(common) / (len(adj[u]) + len(adj[w]) - len(common))
            cands.append((u, w, len(common), r6(jac), r6(aa)))
    cands.sort(key=lambda t: (-t[4], t[0], t[1]))
    assert got == cands[:LINKPRED_TOP]


# ------------------------------------------------ LSH candidate budget


def test_lsh_budget_matches_hash_replay(spark):
    """Exact pandas replay of shingles -> 8 minhashes -> 4 bands ->
    bucket histogram -> sum n(n-1)/2, plus the ALL row = sum of bands."""
    import hashlib
    from collections import Counter

    from database_toolbox_spark.operators.dedup import (
        N_BANDS,
        lsh_candidate_budget,
    )

    got = {r.band: r for r in lsh_candidate_budget(spark, SF_DIR).collect()}
    docs = pd.read_parquet(table_path(SF_DIR, "documents"))
    buckets = [Counter() for _ in range(N_BANDS)]
    for _, row in docs.iterrows():
        w = row["text"].split(" ")
        if len(w) < 3:
            continue
        sh = {"_".join(w[i:i + 3]) for i in range(len(w) - 2)}
        mins = []
        for k in range(8):
            seed, off = k // 4, k % 4
            mins.append(min(
                hashlib.md5(f"{seed}|{s}".encode()).hexdigest()
                [8 * off:8 * off + 8]
                for s in sh
            ))
        for b in range(N_BANDS):
            buckets[b][mins[2 * b] + mins[2 * b + 1]] += 1
    total = 0
    for b in range(N_BANDS):
        pairs = sum(n * (n - 1) // 2 for n in buckets[b].values())
        row = got[b]
        assert row.n_buckets == len(buckets[b])
        assert row.max_bucket == max(buckets[b].values())
        assert row.candidate_pairs == pairs
        total += pairs
    assert got[-1].candidate_pairs == total


# ------------------------------------------------ SCD2 integrity audit


def test_scd2_audit_matches_pandas_replay(spark):
    from database_toolbox_spark.operators.merge_ops import (
        scd2_integrity_audit,
    )

    row = scd2_integrity_audit(spark, SF_DIR).collect()[0]
    ev = pd.read_parquet(table_path(SF_DIR, "events")).sort_values(
        ["user_id", "ts", "event_id"]
    )
    n_versions = n_gaps = n_over = n_cont = 0
    gaps = []
    covered = lifespan = 0
    n_keys = 0
    for _, g in ev.groupby("user_id"):
        n_keys += 1
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        types = g["event_type"].to_numpy()
        runs = []
        start = 0
        for i in range(1, len(g) + 1):
            if i == len(g) or types[i] != types[i - 1]:
                runs.append((int(us[start:i].min()), int(us[start:i].max())))
                start = i
        runs.sort()
        n_versions += len(runs)
        covered += sum(e - s for s, e in runs)
        lifespan += max(e for _, e in runs) - min(s for s, _ in runs)
        for (s0, e0), (s1, e1) in zip(runs, runs[1:]):
            if s1 > e0:
                n_gaps += 1
                gaps.append((s1 - e0) / 1e6)
            elif s1 == e0:
                n_cont += 1
            else:
                n_over += 1
    assert row.n_keys == n_keys and row.n_versions == n_versions
    assert (row.n_gaps, row.n_contiguous, row.n_overlaps) == (
        n_gaps, n_cont, n_over)
    assert row.avg_gap_s == np.floor(np.mean(gaps) * 1e4 + 0.501) / 1e4
    assert row.max_gap_s == np.floor(max(gaps) * 1e4 + 0.501) / 1e4
    assert row.coverage_pct == np.floor(
        covered * 100 / lifespan * 1e4 + 0.501) / 1e4


# ------------------------------------------------ diff-in-diff


def test_did_matches_pandas_recount(spark):
    from database_toolbox_spark.operators.stats import (
        DID_SPLIT,
        DID_TREATED,
        diff_in_diff_revenue,
    )

    row = diff_in_diff_revenue(spark, SF_DIR).collect()[0]
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    cust = pd.read_parquet(table_path(SF_DIR, "customer"))
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["treated"] = (j["c_mktsegment"] == DID_TREATED).astype(int)
    j["post"] = (j["o_orderdate"] >= pd.Timestamp(DID_SPLIT)).astype(int)
    cells = j.groupby(["treated", "post"])["o_totalprice"]
    mu = cells.mean()
    did = (mu[(1, 1)] - mu[(1, 0)]) - (mu[(0, 1)] - mu[(0, 0)])
    assert row.did_estimate == np.floor(did * 1e4 + 0.501) / 1e4
    ss = sum(v * (n - 1) for v, n in zip(cells.var(ddof=1), cells.size()))
    se = np.sqrt(ss / (len(j) - 4) * sum(1.0 / n for n in cells.size()))
    assert row.did_se == np.floor(se * 1e4 + 0.501) / 1e4
    assert row.significant_95 == int(abs(did) > 1.96 * se)
    assert row.n_orders == len(j)


# ------------------------------------------------ counting IVM deletes


def test_ivm_counting_deletes_equals_recompute(spark):
    from database_toolbox_spark.operators.ivm import (
        DEL_SPLIT,
        ivm_counting_deletes,
    )

    got = {r.o_orderstatus: (r.n_pairs, r.n_rows)
           for r in ivm_counting_deletes(spark, SF_DIR).collect()}
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    kept = orders[orders["o_orderdate"] < pd.Timestamp(DEL_SPLIT)]
    want = {
        s: (g["o_custkey"].nunique(), len(g))
        for s, g in kept.groupby("o_orderstatus")
    }
    assert got == want


# ------------------------------------------------ overdispersion


def test_overdispersion_matches_pandas(spark):
    from database_toolbox_spark.operators.stats import overdispersion_index

    got = {r.event_type: r for r in
           overdispersion_index(spark, SF_DIR).collect()}
    ev = pd.read_parquet(table_path(SF_DIR, "events"))
    for etype, g in ev.groupby("event_type"):
        n = g.groupby("user_id").size()
        mu, v = n.mean(), n.var(ddof=1)
        row = got[etype]
        assert row.n_users == len(n)
        assert row.dispersion_index == np.floor(v / mu * 1e4 + 0.501) / 1e4
        if v > mu:
            assert row.nb_r_moments == np.floor(
                mu * mu / (v - mu) * 1e4 + 0.501) / 1e4
        else:
            assert row.nb_r_moments is None
        assert row.poisson_plausible == int(
            abs(v / mu - 1) <= 3 * np.sqrt(2 / (len(n) - 1)))


# ------------------------------------------------ layout pruning


def test_layout_pruning_sim_matches_pandas(spark):
    import hashlib

    from database_toolbox_spark.operators.partitioning import (
        PRUNE_FILES,
        PRUNE_HI,
        PRUNE_LO,
        layout_pruning_simulation,
    )

    got = {r.layout: r for r in
           layout_pruning_simulation(spark, SF_DIR).collect()}
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    d = (orders["o_orderdate"] - pd.Timestamp("1992-01-01")).dt.days
    lo, hi = d.min(), d.max()
    f_clu = np.minimum(
        np.floor((d - lo) * PRUNE_FILES / (hi - lo + 1)).astype(int),
        PRUNE_FILES - 1,
    )
    f_rnd = orders["o_orderkey"].map(
        lambda k: int(hashlib.md5(str(k).encode()).hexdigest()[:4], 16)
        % PRUNE_FILES
    )
    plo, phi = pd.Timestamp(PRUNE_LO), pd.Timestamp(PRUNE_HI)
    for name, f in (("clustered", f_clu), ("random", f_rnd)):
        z = orders.groupby(f)["o_orderdate"].agg(["min", "max", "size"])
        hit = (z["min"] < phi) & (z["max"] >= plo)
        row = got[name]
        assert row.n_files == len(z)
        assert row.files_hit == int(hit.sum())
        assert row.rows_scanned == int(z.loc[hit, "size"].sum())
    # the whole point: clustering must actually skip, random must not
    assert got["clustered"].skip_pct > 80 > got["random"].skip_pct


# ------------------------------------------------ business days


def test_busday_formula_matches_numpy(spark):
    """numpy busday_count is the independent calendar authority."""
    from database_toolbox_spark.operators.scalars import (
        business_days_latency,
    )

    got = {r.o_orderpriority: r for r in
           business_days_latency(spark, SF_DIR).collect()}
    li = pd.read_parquet(table_path(SF_DIR, "lineitem"))
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    od = j["o_orderdate"].to_numpy().astype("datetime64[D]")
    sd = j["l_shipdate"].to_numpy().astype("datetime64[D]")
    # the operator's convention is signed weekdays in [order, ship);
    # numpy's reversed-argument call flips WHICH endpoint is excluded, so
    # anchor the reversed case explicitly as -busday_count(ship, order)
    lat = np.where(
        sd >= od, np.busday_count(od, sd), -np.busday_count(sd, od)
    )
    j = j.assign(busdays=lat)
    for prio, g in j.groupby("o_orderpriority"):
        row = got[prio]
        assert row.n_lineitems == len(g)
        assert row.min_busdays == g["busdays"].min()
        assert row.max_busdays == g["busdays"].max()
        assert row.avg_busdays == np.floor(
            g["busdays"].mean() * 1e4 + 0.501) / 1e4


# ------------------------------------------------ RAKE


def test_rake_matches_python_replay(spark):
    """Exact RAKE replay: stopword-split runs, deg/freq word scores,
    phrase score with multiplicity; grouped by identical text."""
    from collections import Counter, defaultdict

    from database_toolbox_spark.operators.text import (
        RAKE_TOP,
        STOPWORDS,
        rake_keyword_scores,
    )

    got = [(r.phrase, r.n_occurrences, r.n_words, r.rake_score)
           for r in rake_keyword_scores(spark, SF_DIR).collect()]
    docs = pd.read_parquet(table_path(SF_DIR, "documents"))
    sw = set(STOPWORDS)
    phrases = []
    for text in docs["text"]:
        run = []
        for w in text.split(" ") + [None]:
            if w is None or w in sw or w == "":
                if run:
                    phrases.append(tuple(run))
                    run = []
            else:
                run.append(w)
    freq = Counter()
    deg = Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    agg = defaultdict(lambda: [0, 0, 0.0])
    for p in phrases:
        if len(p) < 2:
            continue
        text = " ".join(p)
        agg[text][0] += 1
        agg[text][1] = len(p)
        agg[text][2] = sum(deg[w] / freq[w] for w in p)
    r4 = lambda x: np.floor(x * 1e4 + 0.501) / 1e4  # noqa: E731
    rows = sorted(
        ((t, n, ln, r4(s)) for t, (n, ln, s) in agg.items()),
        key=lambda r: (-r[3], r[0]),
    )[:RAKE_TOP]
    assert got == rows


# ------------------------------------------------ CCF


def test_ccf_matches_numpy_and_leads(spark):
    from database_toolbox_spark.operators.stats import (
        CCF_MAX_LAG,
        ccf_revenue_orders,
    )

    got = {r.lag: r.ccf for r in ccf_revenue_orders(spark, SF_DIR).collect()}
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    orders["day"] = orders["o_orderdate"].dt.date
    g = (orders.groupby("day")
         .agg(rev=("o_totalprice", "sum"), n_orders=("o_totalprice", "size"))
         .sort_index())
    x = np.floor(g["rev"].to_numpy() * 100 + 0.501) / 100
    y = g["n_orders"].to_numpy().astype(float)
    dx, dy = x - x.mean(), y - y.mean()
    den = np.sqrt((dx * dx).sum() * (dy * dy).sum())
    for k in range(-CCF_MAX_LAG, CCF_MAX_LAG + 1):
        if k >= 0:
            sp = (dx[: len(x) - k] * dy[k:]).sum()
        else:
            sp = (dx[-k:] * dy[: len(x) + k]).sum()
        assert got[k] == np.floor(sp / den * 1e6 + 0.501) / 1e6, k
    assert len(got) == 2 * CCF_MAX_LAG + 1
    # same-day correlation of revenue with its own order count must be
    # strongly positive — the sanity check on sign conventions
    assert got[0] > 0.5


# ------------------------------------------------ Cohen's kappa


def test_kappa_matches_sklearn_free_formula(spark):
    from database_toolbox_spark.operators.curation import (
        filter_agreement_kappa,
    )

    row = filter_agreement_kappa(spark, SF_DIR).collect()[0]
    n = row.n_docs
    kk, dd = row.both_keep, row.both_drop
    kd, dk = row.clf_only_keep, row.rules_only_keep
    assert kk + dd + kd + dk == n
    po = (kk + dd) / n
    pe = ((kk + kd) * (kk + dk) + (dk + dd) * (kd + dd)) / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert row.cohens_kappa == np.floor(kappa * 1e4 + 0.501) / 1e4
    assert -1 <= row.cohens_kappa <= 1


# ------------------------------------------------ histogram SSE


def test_histogram_sse_matches_numpy(spark):
    from database_toolbox_spark.operators.profile import (
        HSSE_BUCKETS,
        histogram_sse_comparison,
    )

    got = {r.htype: r for r in
           histogram_sse_comparison(spark, SF_DIR).collect()}
    x = pd.read_parquet(table_path(SF_DIR, "orders"))["o_totalprice"]
    x = x.to_numpy()

    def sse_of(bins):
        tot = worst = 0.0
        nmax = 0
        nb = 0
        for b in np.unique(bins):
            v = x[bins == b]
            s = v.var() * len(v)
            tot += s
            worst = max(worst, s)
            nmax = max(nmax, len(v))
            nb += 1
        return nb, nmax, tot, worst

    lo, hi = x.min(), x.max()
    ew = np.minimum(np.floor((x - lo) * HSSE_BUCKETS / (hi - lo)).astype(int),
                    HSSE_BUCKETS - 1)
    cuts = np.quantile(x, [i / HSSE_BUCKETS for i in range(1, HSSE_BUCKETS)],
                       method="linear")
    ed = np.searchsorted(cuts, x, side="left")
    for name, bins in (("equi_width", ew), ("equi_depth", ed)):
        nb, nmax, tot, worst = sse_of(bins)
        row = got[name]
        assert row.n_buckets == nb and row.max_bucket_rows == nmax
        assert abs(row.total_sse - tot) < 1e-4 * tot
        assert abs(row.worst_bucket_sse - worst) < 1e-4 * worst


# ------------------------------------------------ IVF nprobe curve


def test_nprobe_recall_monotone_and_matches_numpy(spark):
    """Candidate sets are nested in nprobe, so recall must be monotone
    non-decreasing per query; values recomputed exactly in numpy."""
    from database_toolbox_spark.operators.similarity import (
        _RECALL_K,
        N_IVF_CELLS,
        N_KNN_QUERIES,
        NPROBE_LEVELS,
        ivf_nprobe_recall_curve,
    )

    got = {
        (r.n_probes, r.qid): r.n_hits
        for r in ivf_nprobe_recall_curve(spark, SF_DIR).collect()
    }
    emb = pd.read_parquet(table_path(SF_DIR, "embeddings"))
    X = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    cents = X[np.argsort(ids)[:N_IVF_CELLS]]
    cent_ids = np.sort(ids)[:N_IVF_CELLS]
    # corpus assignment: rounded L2^2, cell-id tie-break
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(2)
    d2r = np.floor(d2 * 1e6) / 1e6
    # cents columns are already in ascending cell-id order, and argmin
    # returns the FIRST minimum — the (distance, cell-id) tie-break
    assign = cent_ids[np.argmin(d2r, axis=1)]
    norms = np.sqrt((X * X).sum(1))
    for qid in range(N_KNN_QUERIES):
        qrow = int(np.where(ids == qid)[0][0])
        cos = (X @ X[qrow]) / (norms * norms[qrow])
        cosr = np.floor(cos * 1e6 + 0.501) / 1e6
        order = sorted(
            ((c, v) for c, v in zip(cosr, ids) if v != qid),
            key=lambda t: (-t[0], t[1]),
        )
        truth = {v for _, v in order[:_RECALL_K]}
        qcells = cent_ids[np.lexsort((cent_ids, d2r[qrow]))]
        prev = -1
        for p in NPROBE_LEVELS:
            probed = set(qcells[:p])
            cand = [
                (c, v) for c, v in zip(cosr, ids)
                if v != qid and assign[np.where(ids == v)[0][0]] in probed
            ]
            cand.sort(key=lambda t: (-t[0], t[1]))
            hits = len(truth & {v for _, v in cand[:_RECALL_K]})
            assert got[(p, qid)] == hits, (p, qid)
            assert hits >= prev
            prev = hits


# ------------------------------------------------ segment affinity index


def test_affinity_index_matches_pandas(spark):
    from database_toolbox_spark.operators.market import (
        AFFINITY_MIN_N,
        AFFINITY_TOP,
        segment_affinity_index,
    )

    got = [(r.c_mktsegment, r.rank, r.brand, r.n_lineitems,
            r.affinity_index)
           for r in segment_affinity_index(spark, SF_DIR).collect()]
    li = pd.read_parquet(table_path(SF_DIR, "lineitem"))
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    cust = pd.read_parquet(table_path(SF_DIR, "customer"))
    part = pd.read_parquet(table_path(SF_DIR, "part"))
    j = (li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
           .merge(cust, left_on="o_custkey", right_on="c_custkey")
           .merge(part, left_on="l_partkey", right_on="p_partkey"))
    sb = j.groupby(["c_mktsegment", "p_brand"]).size()
    ns = sb.groupby(level=0).sum()
    nb = sb.groupby(level=1).sum()
    nt = sb.sum()
    rows = []
    for (seg, brand), n in sb.items():
        if n < AFFINITY_MIN_N:
            continue
        aff = (n / ns[seg]) / (nb[brand] / nt)
        rows.append((seg, brand, int(n),
                     np.floor(aff * 1e6 + 0.501) / 1e6))
    expect = []
    for seg in sorted({r[0] for r in rows}):
        top = sorted([r for r in rows if r[0] == seg],
                     key=lambda r: (-r[3], r[1]))[:AFFINITY_TOP]
        expect.extend((seg, i + 1, b, n, a)
                      for i, (_, b, n, a) in enumerate(top))
    assert got == expect


# ------------------------------------------------ percentile rollup fallacy


def test_percentile_rollup_matches_numpy(spark):
    from database_toolbox_spark.operators.stats import (
        percentile_rollup_fallacy,
    )

    row = percentile_rollup_fallacy(spark, SF_DIR).collect()[0]
    ev = pd.read_parquet(table_path(SF_DIR, "events"))
    ev["day"] = ev["ts"].dt.date
    daily = ev.groupby("day")["value"].agg(
        p95=lambda v: np.quantile(v, 0.95, method="linear"),
        n="size",
    )
    true95 = np.quantile(ev["value"], 0.95, method="linear")
    r4 = lambda x: np.floor(x * 1e4 + 0.501) / 1e4  # noqa: E731
    assert row.n_days == len(daily)
    assert row.p95_true == r4(true95)
    assert row.avg_daily_p95 == r4(daily["p95"].mean())
    assert row.weighted_avg_daily_p95 == r4(
        (daily["p95"] * daily["n"]).sum() / daily["n"].sum())
    assert row.rollup_gap_pct == r4(
        abs(daily["p95"].mean() - true95) * 100 / true95)


# ------------------------------------------------ graph edge churn


def test_edge_churn_matches_pandas(spark):
    from database_toolbox_spark.operators.graph import graph_edge_churn

    got = {r.month: (r.edges_added, r.edges_removed, r.edges_retained)
           for r in graph_edge_churn(spark, SF_DIR).collect()}
    li = pd.read_parquet(table_path(SF_DIR, "lineitem"))
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    j["m"] = j["o_orderdate"].dt.to_period("M")
    em = {m: set(zip(g["l_suppkey"], g["o_custkey"]))
          for m, g in j.groupby("m")}
    months = sorted(em)
    for i, m in enumerate(months):
        prev = em[months[i - 1]] if i else set()
        cur = em[m]
        key = m.start_time.date()
        assert got[key] == (
            len(cur - prev), len(prev - cur), len(cur & prev)
        ), m
    assert len(got) == len(months)


# ------------------------------------------------ ABC classes


def test_abc_classes_match_pandas(spark):
    from database_toolbox_spark.operators.market import (
        ABC_A_PCT,
        ABC_B_PCT,
        abc_inventory_classes,
    )

    got = {r.abc_class: r for r in
           abc_inventory_classes(spark, SF_DIR).collect()}
    li = pd.read_parquet(table_path(SF_DIR, "lineitem"))
    li["rev"] = li["l_extendedprice"] * (1 - li["l_discount"])
    pr = li.groupby("l_partkey")["rev"].sum()
    pr = np.floor(pr * 100 + 0.501) / 100
    pr = pr.sort_values(ascending=False)
    # tie order: revenue desc then partkey asc
    pr = pr.reset_index().sort_values(
        ["rev", "l_partkey"], ascending=[False, True])
    cum = pr["rev"].cumsum() * 100 / pr["rev"].sum()
    cls = np.where(cum <= ABC_A_PCT, "A",
                   np.where(cum <= ABC_B_PCT, "B", "C"))
    for c in ("A", "B", "C"):
        sel = pr["rev"][cls == c]
        assert got[c].n_parts == len(sel)
        assert abs(got[c].class_revenue
                   - np.floor(sel.sum() * 100 + 0.501) / 100) < 0.02
    # no heavy-head assumption: the synthetic revenue is near-uniform, so
    # class A legitimately holds most parts; the recount above is the anchor
    assert set(got) == {"A", "B", "C"}


# ------------------------------------------------ popularity baseline


def test_popularity_baseline_matches_pandas(spark):
    from database_toolbox_spark.operators.market import (
        POPREC_K,
        popularity_baseline_hitrate,
    )

    row = popularity_baseline_hitrate(spark, SF_DIR).collect()[0]
    li = pd.read_parquet(table_path(SF_DIR, "lineitem"))
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    part = pd.read_parquet(table_path(SF_DIR, "part"))
    j = (li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
           .merge(part, left_on="l_partkey", right_on="p_partkey"))
    ob = j[["o_custkey", "o_orderkey", "o_orderdate", "p_brand"]
           ].drop_duplicates()
    last = ob.groupby("o_custkey")["o_orderdate"].max()
    ob = ob.assign(last=ob["o_custkey"].map(last))
    test = ob[ob["o_orderdate"] == ob["last"]][
        ["o_custkey", "p_brand"]].drop_duplicates()
    train = ob[ob["o_orderdate"] < ob["last"]]
    pop = (train.groupby("p_brand").size()
           .reset_index(name="n")
           .sort_values(["n", "p_brand"], ascending=[False, True]))
    topk = set(pop["p_brand"].head(POPREC_K))
    per = test.assign(hit=test["p_brand"].isin(topk)).groupby("o_custkey")
    recall = per["hit"].mean()
    assert row.n_users == test["o_custkey"].nunique()
    assert row.n_test_brands == len(test)
    assert row.mean_recall_at_k == np.floor(
        recall.mean() * 1e6 + 0.501) / 1e6
    assert row.hit_rate_pct == np.floor(
        (per["hit"].max().mean()) * 100 * 1e4 + 0.501) / 1e4


# ------------------------------------------------ image dup clusters


def test_image_dup_clusters_union_find(spark):
    """The clustering step must equal a union-find over the (already
    brute-force-tested) dHash pair relation, and conserve node mass."""
    from database_toolbox_spark.operators.multimodal import (
        image_dhash_near_dup_pairs,
        image_dup_clusters,
    )

    pairs = [(r.doc_a, r.doc_b) for r in
             image_dhash_near_dup_pairs(spark, SF_DIR).collect()]
    got = [(r.component, r.cluster_size, r.keep_doc, r.n_dropped)
           for r in image_dup_clusters(spark, SF_DIR).collect()]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    expect = sorted(
        (min(ms), len(ms), min(ms), len(ms) - 1)
        for ms in comps.values()
    )
    assert got == expect
    assert sum(c[1] for c in got) == len(parent)


# ------------------------------------------------ k-anon ladder


def test_kgen_ladder_matches_pandas_and_is_monotone(spark):
    from database_toolbox_spark.operators.profile import (
        KGEN_TARGET,
        KGEN_WIDTHS,
        k_anon_generalization_ladder,
    )

    got = {r.level: r for r in
           k_anon_generalization_ladder(spark, SF_DIR).collect()}
    cust = pd.read_parquet(table_path(SF_DIR, "customer"))
    ks = []
    chosen = None
    for lvl, w in enumerate(KGEN_WIDTHS):
        if w == 0:
            g = np.floor(cust["c_acctbal"]).astype(int)
        elif w == -1:
            g = np.zeros(len(cust), dtype=int)
        else:
            g = np.floor(cust["c_acctbal"] / w).astype(int)
        sizes = cust.assign(g=g).groupby(["c_nationkey", "g"]).size()
        row = got[lvl]
        assert row.n_classes == len(sizes)
        assert row.k_achieved == sizes.min()
        assert row.rows_below_k == sizes[sizes < KGEN_TARGET].sum()
        ks.append(sizes.min())
        if chosen is None and sizes.min() >= KGEN_TARGET:
            chosen = lvl
    assert [got[i].chosen for i in range(len(KGEN_WIDTHS))] == [
        int(i == chosen) for i in range(len(KGEN_WIDTHS))
    ]
    # nested ladder => min class size is non-decreasing
    assert all(a <= b for a, b in zip(ks, ks[1:]))


# ------------------------------------------------ RLE encodability


def test_rle_audit_matches_pandas(spark):
    from database_toolbox_spark.operators.partitioning import (
        PRUNE_FILES,
        rle_encodability_audit,
    )

    got = {r.col: r for r in rle_encodability_audit(spark, SF_DIR).collect()}
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    d = (orders["o_orderdate"] - pd.Timestamp("1992-01-01")).dt.days
    lo, hi = d.min(), d.max()
    orders = orders.assign(f=np.minimum(
        np.floor((d - lo) * PRUNE_FILES / (hi - lo + 1)).astype(int),
        PRUNE_FILES - 1,
    ))
    for col in ("o_orderstatus", "o_orderpriority"):
        runs = rows = 0
        worst = 0.0
        for _, g in orders.groupby("f"):
            v = g.sort_values(["o_orderdate", "o_orderkey"])[col]
            r = int((v != v.shift()).sum())
            runs += r
            rows += len(v)
            worst = max(worst, r / len(v))
        row = got[col]
        assert (row.n_rows, row.n_runs) == (rows, runs)
        assert row.rle_ratio == np.floor(rows / runs * 1e4 + 0.501) / 1e4
        assert row.worst_file_run_density == np.floor(
            worst * 1e6 + 0.501) / 1e6


# ------------------------------------------------ bloom join reduction


def test_bloom_join_reduction_matches_hash_replay(spark):
    """No false negatives (bloom_pass >= exact, every true match passes),
    and the pass set recomputed from md5 positions exactly."""
    import hashlib

    from database_toolbox_spark.operators.sketches import (
        BJ_SEGMENT,
        BLOOM_BITS,
        BLOOM_K,
        bloom_join_reduction,
    )

    row = bloom_join_reduction(spark, SF_DIR).collect()[0]
    cust = pd.read_parquet(table_path(SF_DIR, "customer"))
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    build = set(cust.loc[cust["c_mktsegment"] == BJ_SEGMENT, "c_custkey"])

    def positions(k):
        return {
            int(hashlib.md5(f"{k}#{s}".encode()).hexdigest()[:8], 16)
            % BLOOM_BITS
            for s in range(BLOOM_K)
        }

    bits = set()
    for k in build:
        bits |= positions(k)
    npass = nexact = 0
    for ck in orders["o_custkey"]:
        if positions(ck) <= bits:
            npass += 1
        if ck in build:
            nexact += 1
            assert positions(ck) <= bits  # one-sided error
    assert row.probe_rows == len(orders)
    assert row.exact_matches == nexact
    assert row.bloom_pass == npass
    assert row.false_positives == npass - nexact
    assert row.bloom_pass >= row.exact_matches


# ------------------------------------------------ conditional entropy


def test_conditional_entropy_matches_python(spark):
    from collections import Counter

    from database_toolbox_spark.operators.events import (
        event_conditional_entropy,
    )

    row = event_conditional_entropy(spark, SF_DIR).collect()[0]
    ev = pd.read_parquet(table_path(SF_DIR, "events")).sort_values(
        ["user_id", "ts", "event_id"]
    )
    tc = Counter()
    for _, g in ev.groupby("user_id"):
        ts_ = g["event_type"].tolist()
        tc.update(zip(ts_, ts_[1:]))
    nt = sum(tc.values())
    rowtot = Counter()
    margin = Counter()
    for (p, nx), n in tc.items():
        rowtot[p] += n
        margin[nx] += n
    h_cond = sum(n / nt * -np.log2(n / rowtot[p]) for (p, _), n in tc.items())
    h_next = sum(n / nt * -np.log2(n / nt) for n in margin.values())
    r6 = lambda x: np.floor(x * 1e6 + 0.501) / 1e6  # noqa: E731
    assert row.n_transitions == nt
    assert row.h_next_bits == r6(h_next)
    assert row.h_next_given_cur_bits == r6(h_cond)
    assert row.information_gain_bits == r6(h_next - h_cond)
    assert row.conditioning_never_hurts == 1


# ------------------------------------------------ nearest centroid


def test_nearest_centroid_matches_numpy(spark):
    from database_toolbox_spark.operators.clustering import (
        nearest_centroid_accuracy,
    )

    got = {r.label: (r.n_vectors, r.n_correct) for r in
           nearest_centroid_accuracy(spark, SF_DIR).collect()}
    emb = pd.read_parquet(table_path(SF_DIR, "embeddings"))
    X = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    y = emb["label"].to_numpy()
    labels = np.sort(np.unique(y))
    cents = np.vstack([X[y == l].mean(0) for l in labels])
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(2)
    d2r = np.floor(d2 * 1e6) / 1e6
    pred = labels[np.argmin(d2r, axis=1)]  # first min = label tie-break
    for l in labels:
        sel = y == l
        assert got[int(l)] == (int(sel.sum()), int((pred[sel] == l).sum()))


# ------------------------------------------------ z-order pruning tradeoff


def test_zorder_tradeoff_matches_pandas(spark):
    """All 9 (layout, predicate) cells replayed in pandas, plus the
    structural claims: each single-axis sort hits EVERY file on the
    other axis's predicate, and z-order beats both on the conjunction."""
    from database_toolbox_spark.operators.partitioning import (
        zorder_pruning_tradeoff,
    )

    got = {(r.layout, r.predicate): (r.files_hit, r.rows_scanned)
           for r in zorder_pruning_tradeoff(spark, SF_DIR).collect()}
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    ck = orders["o_custkey"].to_numpy()
    d = (orders["o_orderdate"].dt.normalize()
         - pd.Timestamp("1995-01-01")).dt.days.to_numpy()
    cmin, cmax = ck.min(), ck.max()
    dmin, dmax = d.min(), d.max()
    x = np.floor((ck - cmin) * 256 / (cmax - cmin + 1)).astype(int)
    y = np.floor((d - dmin) * 256 / (dmax - dmin + 1)).astype(int)
    z = np.zeros(len(x), dtype=int)
    for i in range(8):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    files = {"date_sorted": y >> 2, "cust_sorted": x >> 2, "zorder": z >> 10}
    plo_d = dmin + int(np.floor((dmax - dmin) * 0.40))
    phi_d = dmin + int(np.floor((dmax - dmin) * 0.483))
    plo_c = cmin + int(np.floor((cmax - cmin) * 0.40))
    phi_c = cmin + int(np.floor((cmax - cmin) * 0.50))
    for layout, f in files.items():
        df = pd.DataFrame({"f": f, "d": d, "ck": ck})
        zones = df.groupby("f").agg(
            dlo=("d", "min"), dhi=("d", "max"),
            clo=("ck", "min"), chi=("ck", "max"), n=("d", "size"),
        )
        hit_d = (zones["dlo"] < phi_d) & (zones["dhi"] >= plo_d)
        hit_c = (zones["clo"] < phi_c) & (zones["chi"] >= plo_c)
        for pred, mask in (("date_month", hit_d), ("cust_decile", hit_c),
                           ("both", hit_d & hit_c)):
            assert got[(layout, pred)] == (
                int(mask.sum()), int(zones.loc[mask, "n"].sum())
            ), (layout, pred)
    assert got[("date_sorted", "cust_decile")][0] == 64
    assert got[("cust_sorted", "date_month")][0] == 64
    assert got[("zorder", "both")][0] <= min(
        got[("date_sorted", "both")][0], got[("cust_sorted", "both")][0])
