"""Semantic invariants for the round-3 additions (EWMA smoothing, CDC
compaction, event paths, BPE merge candidates) — properties the DuckDB
parity check cannot see on its own: the fold really IS the recursive EWMA
definition (vs pandas), CDC last-writer-wins conservation, and the shape
contracts of the path / merge-pair reports."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_toolbox_spark.operators.events import event_path_topk
from database_toolbox_spark.operators.merge_ops import cdc_net_changes
from database_toolbox_spark.operators.stats import ewma_daily_revenue
from database_toolbox_spark.operators.text import bpe_merge_candidates
from database_toolbox_spark.session import load_table
from tests.conftest import SF_DIR


def test_ewma_matches_pandas_recursive_definition(spark):
    """For the first 20 days (where the 20-row frame holds the FULL
    history), the truncated fold must equal pandas' exact recursive EWMA
    (ewm(alpha=0.2, adjust=False)) on the same canon-rounded inputs."""
    pdf = (
        ewma_daily_revenue(spark, SF_DIR)
        .orderBy("day")
        .limit(20)
        .toPandas()
    )
    assert len(pdf) == 20
    expected = (
        pdf["day_revenue"].ewm(alpha=0.2, adjust=False).mean().round(2)
    )
    assert (pdf["ewma20"] - expected).abs().max() < 0.02


def test_ewma_converges_toward_series_scale(spark):
    """The smoothed series stays within the min/max envelope of its own
    trailing inputs (EWMA is a convex combination)."""
    pdf = ewma_daily_revenue(spark, SF_DIR).toPandas()
    lo = pdf["day_revenue"].rolling(20, min_periods=1).min()
    hi = pdf["day_revenue"].rolling(20, min_periods=1).max()
    assert bool(((pdf["ewma20"] >= lo - 0.01) & (pdf["ewma20"] <= hi + 0.01)).all())


def test_rolling_median_matches_pandas(spark):
    """The windowed interpolated median equals pandas' rolling median on
    the same canon-rounded daily inputs (same linear interpolation)."""
    from database_toolbox_spark.operators.stats import rolling_median_revenue

    pdf = rolling_median_revenue(spark, SF_DIR).toPandas()
    expected = (
        pdf["day_revenue"].rolling(7, min_periods=1).median().round(2)
    )
    assert (pdf["median7"] - expected).abs().max() < 0.02
    spikes = pdf[pdf.is_spike == 1]
    assert (spikes.day_revenue > 1.5 * spikes.median7).all()


def test_cdc_compaction_conservation(spark):
    """Last-writer-wins conservation: surviving row count equals the
    orders whose key is NOT in the delete set (o_orderkey % 10 == 0), and
    every formerly-pending surviving row carries the update's status."""
    out = cdc_net_changes(spark, SF_DIR).toPandas()
    orders = load_table(spark, SF_DIR, "orders")
    survivors = orders.filter(F.col("o_orderkey") % 10 != 0)
    n_expected = survivors.count()
    assert int(out["n_rows"].sum()) == n_expected
    n_m = survivors.filter(F.col("o_orderstatus") == "P").count()
    got_m = out.loc[out["o_orderstatus"] == "M", "n_rows"]
    assert (0 if got_m.empty else int(got_m.iloc[0])) == n_m
    assert "P" not in set(out["o_orderstatus"])  # every P was rewritten


def test_linear_attribution_conserves_credit(spark):
    """Credit is conserved: summed over all days it equals the number of
    purchases that had at least one qualifying click (each purchase hands
    out exactly one unit, split across its clicks)."""
    from database_toolbox_spark.operators.events import (
        linear_attribution_by_day,
    )

    pdf = linear_attribution_by_day(spark, SF_DIR).toPandas()
    ev = load_table(spark, SF_DIR, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), "event_id"
    )
    n_attributed = (
        purch.join(
            clicks,
            (F.col("user_id") == F.col("cu"))
            & (F.col("cts") <= F.col("pts"))
            & (F.col("cts") > F.col("pts") - F.expr("INTERVAL 7 DAYS")),
            "left_semi",
        )
        .count()
    )
    assert abs(pdf["total_credit"].sum() - n_attributed) < 0.05
    assert (pdf["total_credit"] > 0).all()


def test_event_path_topk_contract(spark):
    """≤10 rows, counts non-increasing, each path has 1..5 stages drawn
    from the event-type domain."""
    ev = load_table(spark, SF_DIR, "events")
    types = {r[0] for r in ev.select("event_type").distinct().collect()}
    pdf = event_path_topk(spark, SF_DIR).toPandas()
    assert 0 < len(pdf) <= 10
    counts = pdf["n_users"].tolist()
    assert counts == sorted(counts, reverse=True)
    for path in pdf["path"]:
        stages = path.split(">")
        assert 1 <= len(stages) <= 5
        assert set(stages) <= types


def test_asof_next_error_strict_forward(spark):
    """Every matched error is STRICTLY after its click, is the same
    user's earliest such error (checked by pandas recount), and the flag
    is consistent with the delta."""
    from database_toolbox_spark.operators.asof import asof_next_error

    pdf = asof_next_error(spark, SF_DIR).toPandas()
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_type", "ts")
        .toPandas()
    )
    errors = ev[ev.event_type == "error"]
    matched = pdf[pdf.next_error_ts.notna()]
    assert (matched.next_error_ts > matched.click_ts).all()
    assert (
        (pdf.within_30min == 1)
        == (
            pdf.next_error_ts.notna()
            & (pdf.secs_to_error.fillna(10**9) <= 1800)
            # flag uses full-precision ts; secs are truncated — allow edge
        )
    ).mean() > 0.99
    sample = matched.head(50)
    for r in sample.itertuples():
        user_errors = errors[
            (errors.user_id == r.user_id) & (errors.ts > r.click_ts)
        ]
        assert r.next_error_ts == user_errors.ts.min()


def test_session_entry_report_conserves_sessions(spark):
    """Total sessions across entry types equals the sessionizer's session
    count (same 10-minute-gap definition), and bounce math is internally
    consistent."""
    from database_toolbox_spark.operators.arrays import sessionize_lag_method
    from database_toolbox_spark.operators.events import session_entry_report

    pdf = session_entry_report(spark, SF_DIR).toPandas()
    n_sessions_truth = sessionize_lag_method(spark, SF_DIR).count()
    assert int(pdf["n_sessions"].sum()) == n_sessions_truth
    assert (pdf["n_bounces"] <= pdf["n_sessions"]).all()
    expect_rate = (pdf["n_bounces"] * 100 / pdf["n_sessions"]).round(3)
    assert (pdf["bounce_rate_pct"] - expect_rate).abs().max() < 0.01
    assert (pdf["avg_session_events"] >= 1).all()


def test_k_anonymity_audit_matches_direct_recount(spark):
    """The reported k equals the true smallest equivalence-class size, and
    at-risk accounting is internally consistent."""
    from database_toolbox_spark.operators.profile import k_anonymity_audit

    row = k_anonymity_audit(spark, SF_DIR).collect()[0]
    cust = load_table(spark, SF_DIR, "customer")
    classes = (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .count()
        .toPandas()["count"]
    )
    assert row.k_anonymity == classes.min()
    assert row.n_classes == len(classes)
    assert row.n_rows_at_risk == int(classes[classes < 10].sum())
    assert 0.0 <= row.pct_rows_at_risk <= 100.0


def test_label_separation_scores_anova_bounds(spark):
    """Fisher ratio is a non-negative F statistic; eta² is a variance
    share in [0, 1]; one row per embedding dimension."""
    from database_toolbox_spark.operators.profile import (
        label_separation_scores,
    )

    pdf = label_separation_scores(spark, SF_DIR).toPandas()
    assert len(pdf) == 64
    assert (pdf["fisher_ratio"] >= 0).all()
    assert ((pdf["eta_sq"] >= 0) & (pdf["eta_sq"] <= 1)).all()


def test_jl_projection_preserves_norms_on_average(spark):
    """JL guarantee: the 16-d Rademacher projection preserves norms in
    expectation — per-vector ratios concentrate near 1 and the mean sits
    within a few percent."""
    from database_toolbox_spark.operators.similarity import (
        jl_projection_stats,
    )

    pdf = jl_projection_stats(spark, SF_DIR).toPandas()
    assert len(pdf) == 500
    assert 0.9 < pdf["norm_ratio"].mean() < 1.1
    # k=16 gives ratio std ~ sqrt(2/k) ≈ 0.35: individual vectors can
    # land deep in the tails; the envelope only rules out collapse/blowup
    assert (pdf["norm_ratio"] > 0.1).all()
    assert (pdf["norm_ratio"] < 2.5).all()
    assert (pdf["norm_ratio"] - 1).abs().median() < 0.35


def test_benford_frequencies_sum_to_one(spark):
    """Observed and expected digit frequencies are both (approximately)
    probability distributions over digits 1-9."""
    from database_toolbox_spark.operators.profile import benford_first_digit

    pdf = benford_first_digit(spark, SF_DIR).toPandas()
    assert set(pdf["d"]) <= set(range(1, 10))
    assert abs(pdf["obs_freq"].sum() - 1.0) < 0.001
    assert abs(pdf["benford_freq"].sum() - 1.0) < 0.001
    assert abs(
        pdf.loc[pdf.d == 1, "benford_freq"].iloc[0] - 0.30103
    ) < 1e-4


def test_iqr_outliers_match_pandas_fences(spark):
    """Outlier counts per segment equal a pandas recount with the same
    interpolated quartiles and Tukey fences."""
    from database_toolbox_spark.operators.stats import iqr_outlier_counts

    pdf = iqr_outlier_counts(spark, SF_DIR).toPandas().set_index(
        "c_mktsegment"
    )
    cust = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice"
    )
    j = orders.join(cust, "o_custkey").toPandas()
    for seg, grp in j.groupby("c_mktsegment"):
        q1, q3 = grp.o_totalprice.quantile([0.25, 0.75])
        iqr = q3 - q1
        assert pdf.loc[seg, "n_high_outliers"] == int(
            (grp.o_totalprice > q3 + 1.5 * iqr).sum()
        )
        assert pdf.loc[seg, "n_low_outliers"] == int(
            (grp.o_totalprice < q1 - 1.5 * iqr).sum()
        )
        assert abs(pdf.loc[seg, "q1"] - round(q1, 4)) < 0.001


def test_train_bpe_matches_reference_implementation(spark):
    """The distributed BPE trainer learns the SAME merge sequence (pairs,
    order, and counts) as an independent pure-Python implementation of
    classic BPE on the same corpus."""
    import re
    from collections import Counter

    from database_toolbox_spark.operators.pipeline import train_bpe

    got = [
        (r.rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in train_bpe(spark, SF_DIR, n_merges=8)
        .orderBy("rank")
        .collect()
    ]

    texts = (
        load_table(spark, SF_DIR, "documents").select("text").toPandas()
    )["text"]
    freq = Counter()
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if len(w) >= 2:
                freq[w] += 1
    vocab = {tuple(w): f for w, f in freq.items()}
    want = []
    for rank in range(8):
        pairs = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        want.append((rank, a, b, a + b, n))
        new_vocab: dict = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    assert got == want


def test_apply_bpe_roundtrip_and_compression(spark):
    """Encoding with learned merges is lossless (pieces concatenate back
    to the word) and monotone (more merges never yields more pieces)."""
    from database_toolbox_spark.operators.pipeline import (
        apply_bpe,
        train_bpe,
    )

    merges8 = train_bpe(spark, SF_DIR, n_merges=8)
    enc8 = apply_bpe(spark, SF_DIR, merges8).toPandas()
    assert (enc8.apply(lambda r: "".join(r.pieces) == r.word, axis=1)).all()
    assert (enc8.n_pieces >= 1).all()
    enc0 = apply_bpe(spark, SF_DIR, merges8.limit(0)).toPandas()
    m8 = enc8.set_index("word")["n_pieces"]
    m0 = enc0.set_index("word")["n_pieces"]
    assert (m8 <= m0[m8.index]).all()  # merges only ever compress
    assert m8.sum() < m0.sum()  # and strictly compress overall
    assert (enc0.n_pieces == enc0.word.str.len()).all()  # 0 merges = chars


def test_bpe_merge_candidates_contract(spark):
    """Exactly the top-20 adjacent pairs: every pair is two lowercase
    letters, counts non-increasing, and the winner matches a direct
    recount done in pandas over the same corpus."""
    pdf = bpe_merge_candidates(spark, SF_DIR).toPandas()
    assert len(pdf) == 20
    counts = pdf["merge_count"].tolist()
    assert counts == sorted(counts, reverse=True)
    assert all(
        len(p) == 2 and p.islower() and p.isalpha() for p in pdf["pair"]
    )
    # independent recount (pandas, not SQL on either engine)
    import re
    from collections import Counter

    docs = load_table(spark, SF_DIR, "documents").select("text").toPandas()
    freq = Counter()
    for t in docs["text"]:
        for w in re.split(r"[^a-z]+", t.lower()):
            if len(w) >= 2:
                freq[w] += 1
    pairs = Counter()
    for w, n in freq.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += n
    best_pair, best_n = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
    # ties broken by pair asc in SQL, by max() lexicographic here — compare counts
    assert int(pdf["merge_count"].iloc[0]) == best_n


def test_embedding_covariance_diagonal_is_variance(spark):
    """The (i, i) covariance cells must equal the per-dimension sample
    variance (stddev² from embedding_dim_stats' source definition) and
    carry corr == 1.0 — the sanity anchor that the five algebraic sums
    reconstruct the right moments."""
    import math

    from database_toolbox_spark.operators.profile import embedding_covariance

    rows = embedding_covariance(spark, SF_DIR).collect()
    diag = {r.i: r for r in rows if r.i == r.j}
    assert len(diag) == 64
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .selectExpr("posexplode(embedding) AS (dim, v)")
        .groupBy("dim")
        .agg(F.var_samp(F.col("v").cast("double")).alias("var"))
        .collect()
    )
    for e in emb:
        assert math.isclose(diag[e.dim].cov, e.var, abs_tol=2e-6)
        assert math.isclose(diag[e.dim].corr, 1.0, abs_tol=2e-6)
    off = [r for r in rows if r.i != r.j]
    assert all(abs(r.corr) <= 1.0 + 1e-9 for r in off)


def test_join_explosion_and_skew_invariants(spark):
    """Σc² ≥ Σc (self-join never shrinks), max key ≤ total rows,
    skew_factor ≥ 1; entropy-derived effective keys never exceeds the
    real key count and top10_share is a valid fraction."""
    from database_toolbox_spark.operators.profile import (
        join_explosion_audit,
        shuffle_skew_profile,
    )

    for r in join_explosion_audit(spark, SF_DIR).collect():
        assert r.self_join_rows >= r.n_rows >= r.max_key_rows >= 1
        assert r.skew_factor >= 1.0 - 1e-9
    for r in shuffle_skew_profile(spark, SF_DIR).collect():
        assert 1 <= r.effective_keys <= r.n_keys
        assert 0.0 < r.top10_share <= 1.0
        assert r.entropy_nats >= 0.0
        assert r.salt_recommended in (0, 1)


def test_bm25_scores_positive_and_sorted(spark):
    """BM25 scores for a conjunctive query over in-corpus terms must be
    positive and the report sorted by (rounded score desc, doc_id)."""
    from database_toolbox_spark.operators.text import bm25_top_terms

    rows = bm25_top_terms(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    assert all(r.bm25 > 0 for r in rows)
    assert [(-(r.bm25), r.doc_id) for r in rows] == sorted(
        (-(r.bm25), r.doc_id) for r in rows
    )


def test_semdedup_keeps_at_least_one_per_cell(spark):
    """Keep-first semantics: the lowest-id vector of every cell can never
    be a drop candidate, so each cell keeps ≥ 1 vector; cell sizes sum
    to the corpus size."""
    from database_toolbox_spark.operators.dedup import (
        semdedup_drop_candidates,
    )

    rows = semdedup_drop_candidates(spark, SF_DIR).collect()
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert sum(r.n_vectors for r in rows) == n_vecs
    for r in rows:
        assert 0 <= r.n_drop_candidates < r.n_vectors
        assert 0.0 < r.keep_rate <= 1.0


def test_theil_sen_robust_to_one_outlier(spark):
    """The defining property vs OLS: corrupting ONE day by 1000× must
    leave the Theil-Sen slope (median of pairwise slopes) essentially
    unchanged on the same daily series."""
    import numpy as np

    from database_toolbox_spark.operators.stats import theil_sen_trend

    base = theil_sen_trend(spark, SF_DIR).collect()[0]
    daily = (
        load_table(spark, SF_DIR, "orders")
        .filter("o_orderdate >= DATE '1998-01-01'")
        .groupBy(F.expr("datediff(CAST(o_orderdate AS DATE), "
                        "DATE '1992-01-01')").alias("x"))
        .agg(F.sum("o_totalprice").alias("rev"))
        .toPandas()
        .sort_values("x")
    )
    xs, rv = daily.x.to_numpy(), daily.rev.to_numpy().copy()
    rv[len(rv) // 2] *= 1000.0  # one corrupted day
    slopes = [
        (rv[j] - rv[i]) / (xs[j] - xs[i])
        for i in range(len(xs)) for j in range(i + 1, len(xs))
    ]
    corrupted = float(np.median(slopes))
    scale = max(abs(base.slope_per_day), 1.0)
    # median-of-slopes moves a little (one day touches n-1 pairs) but
    # stays the same order of magnitude; OLS would move ~1000x
    assert abs(corrupted - base.slope_per_day) < 60 * scale


def test_equidepth_buckets_hold_quarter_each(spark):
    """Equi-depth means equi-depth: each of the 4 quartile buckets must
    hold 25% ± 2% of the rows, and bucket ranges must be disjoint and
    ordered."""
    from database_toolbox_spark.operators.profile import (
        equidepth_price_buckets,
    )

    rows = sorted(equidepth_price_buckets(spark, SF_DIR).collect(),
                  key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == [0, 1, 2, 3]
    total = sum(r.n for r in rows)
    for r in rows:
        assert abs(r.n / total - 0.25) < 0.02
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo


def test_pca_eigenvalue_dominates_every_dimension(spark):
    """λ₁ must be ≥ the largest single-dimension variance (Rayleigh
    maximality over basis vectors) AND within 2% of numpy's exact
    eigvalsh on the same covariance — the external-reference anchor
    that caught a 19% under-converged 3-step iteration (fixed by the
    matrix-squaring A^64 rewrite)."""
    import numpy as np

    from database_toolbox_spark.operators.profile import (
        embedding_covariance,
        pca_top_component,
    )

    pca = pca_top_component(spark, SF_DIR).collect()[0]
    assert pca.n_dims == 64
    max_var = max(
        r.cov for r in embedding_covariance(spark, SF_DIR).collect()
        if r.i == r.j
    )
    assert pca.top_eigenvalue >= max_var - 1e-6
    assert 0.0 < pca.explained_var_share <= 1.0
    X = np.array(
        [np.array(r.embedding, dtype=np.float64) for r in
         spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
         .select("embedding").collect()]
    )
    lam1 = float(np.linalg.eigvalsh(np.cov(X, rowvar=False))[-1])
    assert abs(pca.top_eigenvalue - lam1) / lam1 < 0.02


def test_mutual_info_bounds(spark):
    """MI ≥ 0 (Gibbs) and NMI ∈ [0, 1]; independence of the synthetic
    segment×priority assignment keeps NMI near zero (sanity that the
    statistic measures dependence, not margins)."""
    from database_toolbox_spark.operators.stats import (
        segment_priority_mutual_info,
    )

    r = segment_priority_mutual_info(spark, SF_DIR).collect()[0]
    assert r.mi_nats >= -1e-9
    assert -1e-9 <= r.normalized_mi <= 1.0
    assert r.n_cells > 0


def test_mad_outliers_subset_of_rows(spark):
    """MAD census sanity: mad ≥ 0, outliers < n, and the robust center
    matches the exact median reported by price_quantiles' machinery."""
    from database_toolbox_spark.operators.stats import mad_outlier_counts

    for r in mad_outlier_counts(spark, SF_DIR).collect():
        assert r.mad >= 0
        assert 0 <= r.n_outliers < r.n_orders
        assert r.median_price > 0


def test_sorted_neighborhood_pairs_invariants(spark):
    """SNM contract: every emitted pair is levenshtein ≤ 2, shares the
    sort block (first character), and never pairs a record with
    itself."""
    from database_toolbox_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    rows = sorted_neighborhood_pairs(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.dist <= 2
        assert r.name_a[0] == r.name_b[0]
        assert r.key_a != r.key_b


def test_trimmed_means_inside_tail_bounds(spark):
    """Trimmed and winsorized means must land inside [p05, p95]; the
    plain mean can be anywhere (that's the point of robustifying)."""
    from database_toolbox_spark.operators.stats import trimmed_mean_prices

    rows = trimmed_mean_prices(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.p05 <= r.trimmed_mean <= r.p95
        assert r.p05 <= r.winsorized_mean <= r.p95
        assert r.n_orders > 0 and r.mean_price > 0


def test_hybrid_rrf_fuses_both_rankers(spark):
    """RRF sanity: scores bounded by 2/(k+1); every fused row carries at
    least one real rank; the fused list draws from BOTH rankers (it is
    a fusion, not a passthrough)."""
    from database_toolbox_spark.operators.similarity import (
        RRF_K,
        hybrid_rrf_search,
    )

    rows = hybrid_rrf_search(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert 0 < r.rrf_score <= 2.0 / (RRF_K + 1) + 1e-9
        assert r.bm25_rank > 0 or r.cos_rank > 0
    assert any(r.bm25_rank > 0 for r in rows)
    assert any(r.cos_rank > 0 for r in rows)


def test_attribution_models_conserve_credit(spark):
    """Both attribution models split exactly ONE unit of credit per
    purchase-with-qualifying-clicks, so their day-rolled totals must
    agree (the weights differ; the conserved mass doesn't)."""
    from database_toolbox_spark.operators.events import (
        linear_attribution_by_day,
        time_decay_attribution,
    )

    lin = sum(r.total_credit for r in
              linear_attribution_by_day(spark, SF_DIR).collect())
    dec = sum(r.total_credit for r in
              time_decay_attribution(spark, SF_DIR).collect())
    assert abs(lin - dec) < 0.05
    assert lin > 0


def test_deletion_impact_cascade_monotone(spark):
    """The FK cascade audit must satisfy the obvious containment facts:
    ~5% of customers selected; affected orders/lineitems are nonzero
    and bounded by their table sizes."""
    from database_toolbox_spark.operators.profile import (
        deletion_impact_audit,
    )

    rows = {r.table_name: r for r in
            deletion_impact_audit(spark, SF_DIR).collect()}
    assert set(rows) == {"customer", "orders", "lineitem"}
    c = rows["customer"]
    assert 0 < c.n_affected < c.n_rows
    assert 0.005 < c.n_affected / c.n_rows < 0.15
    for t in ("orders", "lineitem"):
        assert 0 <= rows[t].n_affected < rows[t].n_rows


def test_kaplan_meier_monotone_and_bounded(spark):
    """KM survival must be non-increasing in time, within (0, 1], with
    at_risk non-increasing and deaths ≤ at_risk — plus the censoring
    sanity: at_risk at the first step equals the full user count."""
    from database_toolbox_spark.operators.events import (
        kaplan_meier_purchase,
    )

    rows = sorted(kaplan_meier_purchase(spark, SF_DIR).collect(),
                  key=lambda r: r.day_offset)
    assert rows
    n_users = (
        load_table(spark, SF_DIR, "events")
        .select("user_id").distinct().count()
    )
    assert rows[0].at_risk <= n_users
    prev_s, prev_risk = 1.0 + 1e-9, n_users + 1
    for r in rows:
        # survival may reach (rounded) 0 only on a terminal
        # all-deaths step — the operator's documented epsilon case
        if r.deaths < r.at_risk:
            assert 0.0 < r.survival <= prev_s + 1e-9
        else:
            assert 0.0 <= r.survival <= prev_s + 1e-9
        assert 0 < r.deaths <= r.at_risk < prev_risk + 1
        prev_s, prev_risk = r.survival, r.at_risk


def test_try_battery_counts_consistent(spark):
    """The error-safe battery's failure counts obey the data's own
    arithmetic: bad casts and bad indexes hit every row; div-by-zero
    hits exactly the custkey%3==0 rows."""
    from database_toolbox_spark.operators.scalars import (
        try_arithmetic_battery,
    )

    r = try_arithmetic_battery(spark, SF_DIR).collect()[0]
    assert r.n_bad_casts == r.n == r.n_bad_indexes
    assert 0 < r.n_div_by_zero < r.n
    assert r.avg_valid_quotient > 0


def test_funnel_latency_consistent_with_funnel(spark):
    """Stage latencies must be positive with sane ordering statistics,
    and the user counts must shrink down the funnel (every
    click→purchase user passed view→click first)."""
    from database_toolbox_spark.operators.events import (
        funnel_latency_percentiles,
    )

    rows = {r.stage: r for r in
            funnel_latency_percentiles(spark, SF_DIR).collect()}
    assert set(rows) == {"view_to_click", "click_to_purchase"}
    for r in rows.values():
        assert 0 < r.p50_minutes <= r.p90_minutes <= r.max_minutes
    assert (rows["click_to_purchase"].n_users
            <= rows["view_to_click"].n_users)


def test_bootstrap_ci_brackets_mean(spark):
    """The 95% Poisson-bootstrap CI must bracket the point estimate,
    have positive width, use (nearly) all resamples — a handful may
    draw all-zero weights — and stay within a plausible multiple of
    the naive standard error."""
    from database_toolbox_spark.operators.stats import (
        N_BOOTSTRAP,
        bootstrap_ci_daily_revenue,
    )

    r = bootstrap_ci_daily_revenue(spark, SF_DIR).collect()[0]
    assert N_BOOTSTRAP * 0.97 <= r.n_resamples <= N_BOOTSTRAP
    assert r.ci_lo_95 < r.grand_mean < r.ci_hi_95
    width = r.ci_hi_95 - r.ci_lo_95
    assert 0 < width < r.grand_mean  # not absurdly wide


def test_threshold_curve_consistent_with_pair_detector(spark):
    """The cumulative column at band 5 (Jaccard ≥ 0.5) must equal the
    exact pair detector's output count — two operators, one truth —
    and the cumulative must be monotone non-increasing in the band."""
    from database_toolbox_spark.operators.dedup import (
        near_dup_threshold_curve,
        ngram_jaccard_pairs,
    )

    rows = sorted(near_dup_threshold_curve(spark, SF_DIR).collect(),
                  key=lambda r: r.band)
    at_or_above = {r.band: r.pairs_at_or_above for r in rows}
    n_pairs_05 = ngram_jaccard_pairs(spark, SF_DIR).count()
    expected = sum(r.n_pairs for r in rows if r.band >= 5)
    assert expected == n_pairs_05
    if 5 in at_or_above:
        assert at_or_above[5] == n_pairs_05
    cums = [r.pairs_at_or_above for r in rows]
    assert cums == sorted(cums, reverse=True)


def test_backtest_scores_positive_for_both_models(spark):
    """Both baseline models must be scored on the same holdout with
    positive errors (zero error would mean leakage)."""
    from database_toolbox_spark.operators.stats import (
        seasonal_naive_backtest,
    )

    rows = {r.model: r for r in
            seasonal_naive_backtest(spark, SF_DIR).collect()}
    assert set(rows) == {"naive_lag1", "seasonal_lag7"}
    n = {r.n_days for r in rows.values()}
    assert len(n) == 1 and n.pop() > 20
    for r in rows.values():
        assert r.mae > 0 and r.mape_pct > 0


def test_markov_stationary_matches_numpy_eigenvector(spark):
    """π from P^64 must match numpy's left eigenvector of the same
    transition matrix (eigenvalue 1) — the external anchor pattern for
    iterative operators that claim a limit; also π must be a proper
    distribution."""
    import numpy as np

    from database_toolbox_spark.operators.events import (
        _MARKOV_P0_SQL,
        markov_stationary_distribution,
    )
    from database_toolbox_spark.session import load_table

    pi = {r.event_type: r.stationary_prob for r in
          markov_stationary_distribution(spark, SF_DIR).collect()}
    assert abs(sum(pi.values()) - 1.0) < 1e-4

    load_table(spark, SF_DIR, "events")
    rows = spark.sql(_MARKOV_P0_SQL).collect()
    types = sorted(pi)
    idx = {t: k for k, t in enumerate(types)}
    P = np.zeros((len(types), len(types)))
    for r in rows:
        P[idx[r.i], idx[r.j]] = r.v
    w, v = np.linalg.eig(P.T)
    k = int(np.argmin(abs(w - 1.0)))
    ref = np.real(v[:, k])
    ref = ref / ref.sum()
    for t in types:
        assert abs(pi[t] - ref[idx[t]]) < 1e-4


def test_gini_matches_direct_computation(spark):
    """The two-pass-rank Gini must equal the direct sorted-formula value
    computed in numpy on the same canon-rounded revenues (external
    anchor), and lie in [0, 1)."""
    import numpy as np

    from database_toolbox_spark.operators.windows import (
        gini_customer_revenue,
    )
    from database_toolbox_spark.session import load_tables

    r = gini_customer_revenue(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.gini < 1.0
    load_tables(spark, SF_DIR)
    rev = np.sort(np.array([
        row.revenue for row in spark.sql(
            "SELECT floor(sum(o_totalprice) * 100 + 0.501e0) / 100e0"
            " AS revenue FROM orders GROUP BY o_custkey"
        ).collect()
    ]))
    n = len(rev)
    ref = 2.0 * np.sum(np.arange(1, n + 1) * rev) / (n * rev.sum()) \
        - (n + 1.0) / n
    assert abs(r.gini - ref) < 1e-5


def test_hhi_bounds_and_agreement_with_gini_direction(spark):
    """HHI ∈ (1/n, 1]; normalized HHI ∈ [0, 1]; near-uniform synthetic
    customers keep both concentration measures small."""
    from database_toolbox_spark.operators.stats import segment_revenue_hhi

    rows = segment_revenue_hhi(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 1.0 / r.n_customers <= r.hhi <= 1.0 + 1e-9
        assert -1e-9 <= r.hhi_normalized <= 1.0


def test_lorenz_curve_convex_and_complete(spark):
    """Lorenz sanity: shares sum to 1, cumulative share is increasing
    and CONVEX (each richer decile holds at least the previous one's
    share), and the top decile dominates the bottom."""
    from database_toolbox_spark.operators.windows import (
        lorenz_decile_shares,
    )

    rows = sorted(lorenz_decile_shares(spark, SF_DIR).collect(),
                  key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 1e-4
    assert abs(rows[-1].cum_share - 1.0) < 1e-4
    shares = [r.revenue_share for r in rows]
    for a, b in zip(shares, shares[1:]):
        assert b >= a - 1e-9  # sorted-by-revenue deciles ⇒ convexity
    assert shares[-1] >= shares[0]
