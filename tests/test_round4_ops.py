"""Round-4 invariants: the batched-exact BPE trainer must (a) learn the
IDENTICAL merge sequence to classic sequential BPE at a real merge count
and (b) do it in an order of magnitude fewer Spark rounds — the round-3
verdict's one remaining scale-killer (one driver round-trip per merge
would mean ~100k sequential jobs for a 100k-merge tokenizer)."""

from __future__ import annotations

import re
from collections import Counter

from database_toolbox_spark.operators.pipeline import train_bpe
from database_toolbox_spark.session import load_table
from tests.conftest import SF_DIR


def _python_bpe(texts, n_merges):
    """Independent pure-Python classic BPE (Sennrich et al. 2016): count
    adjacent symbol pairs over the frequency-weighted word table, merge
    the (count DESC, pair ASC) argmax, repeat. The oracle the distributed
    trainer must reproduce merge-for-merge."""
    freq: Counter = Counter()
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if len(w) >= 2:
                freq[w] += 1
    vocab = {tuple(w): f for w, f in freq.items()}
    want = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
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
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return want


def test_train_bpe_batched_200_merges_exact_and_fewer_rounds(spark):
    """At 200 merges the batched trainer's sequence is byte-identical to
    sequential BPE AND uses >= 5x fewer Spark rounds than merges learned
    (the round-3 verdict's done-criterion). The 8-merge equivalence test
    in test_round3_ops covers the short head; this is the long tail where
    batching actually pays."""
    stats: dict = {}
    got = [
        (r.rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in train_bpe(spark, SF_DIR, n_merges=200, stats=stats)
        .orderBy("rank")
        .collect()
    ]
    texts = (
        load_table(spark, SF_DIR, "documents").select("text").toPandas()
    )["text"]
    want = _python_bpe(texts, 200)
    assert got == want
    # the sf0.001 corpus exhausts (every word fully fused) before 200 —
    # both implementations must stop at the SAME point
    assert stats["merges"] == len(got) >= 80
    assert stats["rounds"] * 5 <= stats["merges"], (
        f"batching too weak: {stats['rounds']} rounds for "
        f"{stats['merges']} merges"
    )


def test_holt_matches_pandas_recursive_definition(spark):
    """For the first 28 days (where the frame holds the FULL history) the
    truncated Holt fold must equal an explicit pandas recursion with the
    same seeds (l1 = y1, b1 = y2 - y1) on the same canon-rounded
    inputs."""
    from database_toolbox_spark.operators.stats import (
        holt_linear_daily_revenue,
    )

    pdf = (
        holt_linear_daily_revenue(spark, SF_DIR)
        .orderBy("day")
        .limit(26)  # day 3 .. day 28: frames are complete prefixes
        .toPandas()
    )
    assert len(pdf) == 26
    ys = list(pdf["day_revenue"])
    # reconstruct the full series: day_revenue column starts at day 3,
    # so fetch the first two days from the raw aggregate
    from pyspark.sql import functions as F

    first2 = (
        load_table(spark, SF_DIR, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.expr(
                "floor(sum(o_totalprice) * 100 + 0.501e0) / 100e0"
            ).alias("rev")
        )
        .orderBy("day")
        .limit(2)
        .toPandas()["rev"]
        .tolist()
    )
    series = first2 + ys
    lvl, trd = series[0], series[1] - series[0]
    for i, y in enumerate(series[2:]):
        new_lvl = 0.3 * y + 0.7 * (lvl + trd)
        trd = 0.1 * (new_lvl - lvl) + 0.9 * trd
        lvl = new_lvl
        assert abs(pdf["level"][i] - round(lvl, 2)) < 0.02, i
        assert abs(pdf["trend"][i] - round(trd, 4)) < 0.002, i


def test_containment_superset_of_jaccard_and_asymmetric(spark):
    """Every Jaccard >= 0.5 near-dup pair is also a containment >= 0.8
    hit OR has containment below threshold by the J-to-C inequality;
    directly: for each reported containment pair, recompute shingle sets
    in Python and confirm the exact ratio and the n_a <= n_b
    orientation."""
    from database_toolbox_spark.operators.dedup import (
        containment_dup_pairs,
    )

    rows = containment_dup_pairs(spark, SF_DIR).collect()
    assert rows, "fixture should contain contained near-dups"
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_DIR, "documents").collect()
    }

    def shingles(t):
        w = t.split(" ")
        return {
            "_".join(w[i : i + 3]) for i in range(len(w) - 2)
        } if len(w) >= 3 else set()

    for r in rows:
        sa, sb = shingles(docs[r.doc_a]), shingles(docs[r.doc_b])
        assert r.n_a == len(sa) and r.n_b == len(sb)
        assert r.n_a <= r.n_b
        c = len(sa & sb) / len(sa)
        assert 5 * len(sa & sb) >= 4 * len(sa)
        assert abs(r.containment - round(c, 6)) < 1e-9


def test_pq_adc_ranking_tracks_exact_l2(spark):
    """PQ with sampled codebooks is deliberately lossy, and the fixture's
    neighbors are near-equidistant (exact top-10 spans ~1.33-1.46, a
    ~10% margin quantization error swamps) — so the honest guarantees
    are: ADC distances well-formed, the selected 10 concentrate in the
    best exact-distance QUARTILE, and the exact top-10 is partially
    recovered."""
    import numpy as np

    from database_toolbox_spark.operators.similarity import (
        QUERY_VEC_ID,
        pq_ann_topk,
    )

    pdf = pq_ann_topk(spark, SF_DIR).toPandas()
    assert (pdf["adc_dist"] >= 0).all()
    assert list(pdf["adc_dist"]) == sorted(pdf["adc_dist"])
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }
    q = emb[QUERY_VEC_ID]
    d2 = {
        vid: float(np.sum((v - q) ** 2))
        for vid, v in emb.items()
        if vid != QUERY_VEC_ID
    }
    exact_ids = {vid for vid in sorted(d2, key=lambda v: (d2[v], v))[:10]}
    assert len(exact_ids & set(pdf["vec_id"])) >= 2
    q25 = np.percentile(list(d2.values()), 25)
    in_quartile = sum(d2[v] <= q25 for v in pdf["vec_id"])
    assert in_quartile >= 6, (in_quartile, q25)


def test_conformal_coverage_near_nominal(spark):
    """Split-conformal guarantee: empirical coverage on held-out days
    should sit near the nominal 90% (the fixture series is long, so the
    finite-sample band is tight-ish; assert a generous [0.8, 1.0])."""
    from database_toolbox_spark.operators.stats import (
        conformal_interval_coverage,
    )

    row = conformal_interval_coverage(spark, SF_DIR).collect()[0]
    assert row.n_cal > 100 and row.n_eval > 100
    assert 0.8 <= row.coverage <= 1.0
    assert row.q90_resid > 0


def test_cusum_closed_form_equals_recursion(spark):
    """The two-window closed form S+_t = cum_t - min(0, min cum_j) must
    equal the textbook recursion S+_t = max(0, S+_{t-1} + z_t - k)
    replayed in Python over the same canon-rounded z series."""
    from database_toolbox_spark.operators.stats import (
        cusum_shift_detection,
    )

    pdf = (
        cusum_shift_detection(spark, SF_DIR).orderBy("day").toPandas()
    )
    assert len(pdf) > 100
    # reconstruct z from the operator's own inputs: calibration on
    # pre-1997 daily revenue, z canon-rounded at 6
    from pyspark.sql import functions as F

    daily = (
        load_table(spark, SF_DIR, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.expr(
                "floor(sum(o_totalprice) * 100 + 0.501e0) / 100e0"
            ).alias("rev")
        )
        .orderBy("day")
        .toPandas()
    )
    import pandas as pd

    cal = daily[daily.day < pd.Timestamp("1997-01-01").date()]["rev"]
    mu, sd = cal.mean(), cal.std(ddof=1)
    z = ((daily["rev"] - mu) / sd).round(6)
    sp = sn = 0.0
    expect = {}
    for day, zi in zip(daily["day"], z):
        sp = max(0.0, sp + zi - 0.5)
        sn = max(0.0, sn - zi - 0.5)
        expect[day] = (sp, sn)
    got = pdf.set_index("day")
    for day in got.index:
        esp, esn = expect[day]
        assert abs(got.loc[day, "cusum_pos"] - round(esp, 4)) < 2e-4, day
        assert abs(got.loc[day, "cusum_neg"] - round(esn, 4)) < 2e-4, day


def test_welch_aa_split_is_insignificant(spark):
    """An md5 A/A split of one homogeneous population must produce a
    small |t| (no signal planted), near-equal halves, and a df of the
    same magnitude as the sample size."""
    from database_toolbox_spark.operators.stats import welch_ab_test

    row = welch_ab_test(spark, SF_DIR).collect()[0]
    n = row.n_a + row.n_b
    assert abs(row.n_a - row.n_b) < 0.1 * n
    assert row.significant == 0
    assert abs(row.t_stat) < 1.96
    assert 0.5 * n < row.welch_df < 1.1 * n


def test_vocab_coverage_monotone_and_consistent(spark):
    """Coverage is monotone in k, bounded by 1, and matches a direct
    pandas recount of the token-frequency head."""
    from collections import Counter

    from database_toolbox_spark.operators.pipeline import (
        vocab_coverage_curve,
    )

    pdf = vocab_coverage_curve(spark, SF_DIR).toPandas()
    assert list(pdf["k"]) == [100, 1000, 10000]
    assert list(pdf["coverage"]) == sorted(pdf["coverage"])
    assert (pdf["coverage"] <= 1.0).all()
    texts = (
        load_table(spark, SF_DIR, "documents").select("text").toPandas()
    )["text"]
    tf = Counter()
    for t in texts:
        tf.update(t.split(" "))
    total = sum(tf.values())
    counts = sorted(tf.values(), reverse=True)
    for _, r in pdf.iterrows():
        want = sum(counts[: int(r.k)]) / total
        assert abs(r.coverage - round(want, 6)) < 1e-9
        assert r.total_tokens == total
        assert r.vocab_size == len(tf)


def test_dhash_identical_texts_share_hash(spark):
    """Byte-identical documents must hash identically (dHash is a pure
    function of pixels), and the numpy grid must equal a direct Python
    recomputation from the text bytes for a sample of docs."""
    from database_toolbox_spark.operators.multimodal import (
        IMG_WIDTH,
        image_dhash_fingerprints,
    )

    pdf = image_dhash_fingerprints(spark, SF_DIR).toPandas()
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .toPandas()
    )
    merged = pdf.merge(docs, on="doc_id")
    by_text = merged.groupby("text")
    for _, grp in list(by_text)[:50]:
        assert grp["dhash_hi"].nunique() == 1
        assert grp["dhash_lo"].nunique() == 1
    # direct recomputation for the first 20 docs
    for _, r in merged.head(20).iterrows():
        data = r.text.encode()
        n = len(data)
        h = max(1, -(-n // IMG_WIDTH))

        def px(y, x):
            i = y * IMG_WIDTH + x
            return data[i] if i < n else 0

        bits = []
        for gy in range(8):
            row = [px(gy * h // 8, gx * IMG_WIDTH // 9) for gx in range(9)]
            bits.extend(int(row[gx] > row[gx + 1]) for gx in range(8))
        lo = sum(b << i for i, b in enumerate(bits[:32]))
        hi = sum(b << i for i, b in enumerate(bits[32:]))
        assert (r.dhash_hi, r.dhash_lo) == (hi, lo), r.doc_id


def test_dft_power_matches_numpy_fft(spark):
    """The SQL DFT must agree with numpy's FFT on the same bias-centered
    16-sample frames (|FFT[k]|^2, first 8 bins) within rounding."""
    import numpy as np

    from database_toolbox_spark.operators.multimodal import (
        AUDIO_BIAS,
        DFT_N,
        audio_dft_power,
    )

    pdf = audio_dft_power(spark, SF_DIR).toPandas()
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .toPandas()
        .head(25)
    )
    for _, d in docs.iterrows():
        data = d.text.encode()[:DFT_N]
        dev = np.zeros(DFT_N)
        dev[: len(data)] = np.frombuffer(data, np.uint8).astype(
            float
        ) - AUDIO_BIAS
        want = np.abs(np.fft.fft(dev)[:8]) ** 2
        got = pdf[pdf.doc_id == d.doc_id].sort_values("bin")["power"]
        assert np.allclose(got, np.round(want, 2), atol=0.02), d.doc_id


def test_ivfpq_probe_subset_of_cell_and_quality(spark):
    """IVFPQ results must all come from the query's IVF cell (the probe
    bound), and the composite's selections should be no worse than the
    global PQ scan's concentration (same codebooks, pruned candidates)."""
    from database_toolbox_spark.operators.similarity import (
        QUERY_VEC_ID,
        ivf_cell_assignments,
        ivfpq_ann_topk,
    )

    got = ivfpq_ann_topk(spark, SF_DIR).toPandas()
    assert len(got) == 10
    assert list(got["adc_dist"]) == sorted(got["adc_dist"])
    # recompute the assignment and confirm every hit shares the query cell
    ivf_cell_assignments(spark, SF_DIR)  # warms the same machinery
    from database_toolbox_spark.operators.similarity import N_IVF_CELLS
    from database_toolbox_spark.session import load_table

    import numpy as np

    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }

    def cell(v):
        dists = [
            (round(float(np.sum((emb[c] - v) ** 2)), 6), c)
            for c in range(N_IVF_CELLS)
        ]
        return min(dists)[1]

    qcell = cell(emb[QUERY_VEC_ID])
    for vid in got["vec_id"]:
        assert cell(emb[vid]) == qcell, vid


def test_token_runs_match_python_recount(spark):
    """max_run / n_runs_ge3 / n_runs equal a direct Python scan of each
    document's token stream."""
    from database_toolbox_spark.operators.text import token_run_lengths

    pdf = (
        token_run_lengths(spark, SF_DIR).toPandas().set_index("doc_id")
    )
    docs = load_table(spark, SF_DIR, "documents").collect()
    for d in docs[:100]:
        toks = d.text.split(" ")
        runs, cur = [], 1
        for a, b in zip(toks, toks[1:]):
            if a == b:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        row = pdf.loc[d.doc_id]
        assert row.max_run == max(runs)
        assert row.n_runs == len(runs)
        assert row.n_runs_ge3 == sum(r >= 3 for r in runs)


def test_boilerplate_pairs_share_edge_but_not_body(spark):
    """Every reported pair shares the exact 64-char boundary on the named
    edge and has different full text."""
    from database_toolbox_spark.operators.dedup import (
        boilerplate_boundary_pairs,
    )

    rows = boilerplate_boundary_pairs(spark, SF_DIR).collect()
    assert rows, "fixture should contain shared-boundary near-dups"
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    for r in rows:
        ta, tb = docs[r.doc_a], docs[r.doc_b]
        assert ta != tb
        if r.boundary == "head":
            assert ta[:64] == tb[:64]
        else:
            assert ta[-64:] == tb[-64:]


def test_silhouette_bounds_and_own_is_nearest(spark):
    """Silhouette values live in (-1, 1]; with own = nearest centroid by
    construction, (b - a) >= 0 so every cell mean is non-negative."""
    from database_toolbox_spark.operators.clustering import (
        kmeans_silhouette_lite,
    )

    pdf = kmeans_silhouette_lite(spark, SF_DIR).toPandas()
    assert len(pdf) > 0
    assert (pdf["mean_silhouette"] >= 0).all()
    assert (pdf["mean_silhouette"] <= 1).all()
    assert (pdf["mean_own_dist"] > 0).all()


def test_label_agreement_purity_consistent(spark):
    """Purity = majority/total per cell, in (0, 1]; totals sum to the
    corpus size."""
    from database_toolbox_spark.operators.clustering import (
        label_cluster_agreement,
    )
    n_emb = load_table(spark, SF_DIR, "embeddings").count()
    pdf = label_cluster_agreement(spark, SF_DIR).toPandas()
    assert pdf["n_vectors"].sum() == n_emb
    assert ((pdf["n_majority"] <= pdf["n_vectors"])
            & (pdf["n_majority"] >= 1)).all()
    import numpy as np
    assert np.allclose(
        pdf["purity"], (pdf["n_majority"] / pdf["n_vectors"]).round(6)
    )


def test_calibration_quartiles_balanced_and_monotone(spark):
    """Within each source the four buckets are roughly balanced (exact
    quartiles up to ties) and mean quality is strictly increasing in
    bucket id."""
    from database_toolbox_spark.operators.curation import (
        source_quality_calibration,
    )

    pdf = source_quality_calibration(spark, SF_DIR).toPandas()
    for src, grp in pdf.groupby("source"):
        grp = grp.sort_values("bucket")
        assert list(grp["mean_q"]) == sorted(grp["mean_q"])
        total = grp["n_docs"].sum()
        assert (grp["n_docs"] >= 0.10 * total).all(), src
        assert (grp["n_docs"] <= 0.40 * total).all(), src


# ---- property tests for the batched-BPE driver-side math (no Spark) ----


def _pair_counts(vocab):
    c = Counter()
    for syms, f in vocab.items():
        for i in range(len(syms) - 1):
            c[f"{syms[i]} {syms[i + 1]}"] += f
    return c


def _tri_counts(vocab):
    c = Counter()
    for syms, f in vocab.items():
        for i in range(len(syms) - 2):
            c[f"{syms[i]} {syms[i + 1]} {syms[i + 2]}"] += f
    return c


def _apply_merge(vocab, a, b, ab):
    out = {}
    for syms, f in vocab.items():
        fused, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                fused.append(ab)
                i += 2
            else:
                fused.append(syms[i])
                i += 1
        k = tuple(fused)
        out[k] = out.get(k, 0) + f
    return out


def _step_deltas(vocab, batch):
    """Pure-python mirror of _bpe_step_deltas' per-word fold."""
    deltas = {}
    for syms0, f in vocab.items():
        syms = list(syms0)
        for step, (a, b, ab, _n) in enumerate(batch):
            if not any(
                syms[i] == a and syms[i + 1] == b
                for i in range(len(syms) - 1)
            ):
                continue
            before = Counter(zip(syms, syms[1:]))
            fused, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    fused.append(ab)
                    i += 2
                else:
                    fused.append(syms[i])
                    i += 1
            syms = fused
            after = Counter(zip(syms, syms[1:]))
            for p in set(before) | set(after):
                d = after[p] - before[p]
                if d:
                    deltas.setdefault(step, {})
                    key = f"{p[0]} {p[1]}"
                    deltas[step][key] = deltas[step].get(key, 0) + d * f
    return deltas


def _sequential_bpe(vocab, n):
    merges = []
    for _ in range(n):
        pc = _pair_counts(vocab)
        if not pc:
            break
        p, c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        a, b = p.split(" ")
        merges.append((a, b, a + b, c))
        vocab = _apply_merge(vocab, a, b, a + b)
    return merges


def _rand_vocab(draw):
    from hypothesis import strategies as st

    alphabet = "abcd"
    n_words = draw(st.integers(2, 8))
    vocab = {}
    for _ in range(n_words):
        length = draw(st.integers(2, 7))
        w = tuple(
            draw(st.sampled_from(alphabet)) for _ in range(length)
        )
        vocab[w] = vocab.get(w, 0) + draw(st.integers(1, 9))
    return vocab


def test_bpe_verify_is_sound_on_random_vocabs():
    """SOUNDNESS of the batched-exact machinery: for random tiny corpora
    (adversarial for batching — aaaa chains, ties everywhere), whatever
    prefix _bpe_verify_prefix accepts from _bpe_guess's speculative
    sequence must be EXACTLY the sequence classic sequential BPE
    produces, in both whole-table and truncated-top-K modes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from database_toolbox_spark.operators.pipeline import (
        _bpe_guess,
        _bpe_verify_prefix,
    )

    @settings(max_examples=300, deadline=None)
    @given(st.data())
    def inner(data):
        vocab = _rand_vocab(data.draw)
        pc = _pair_counts(vocab)
        if not pc:
            return
        cands_all = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0])
        )
        tris = sorted(
            _tri_counts(vocab).items(), key=lambda kv: (-kv[1], kv[0])
        )
        want = _sequential_bpe(vocab, 10)
        for K in (len(cands_all), 3):  # whole table AND truncated
            cands = cands_all[:K]
            whole = len(cands_all) <= K
            floor = 0 if whole else cands_all[K][1] if len(
                cands_all
            ) > K else 0
            guess = _bpe_guess(cands, tris, cap=10)
            if len(guess) <= 1:
                accepted = guess
            else:
                accepted = _bpe_verify_prefix(
                    cands, floor, whole, guess,
                    _step_deltas(vocab, guess),
                )
            assert accepted == want[: len(accepted)], (
                vocab, K, accepted, want
            )
            assert len(accepted) >= 1

    inner()


def test_source_datasheet_consistent_with_components(spark):
    """Datasheet columns agree with their drill-down operators: per-source
    doc counts sum to the corpus, rates live in [0, 1], entropy >= 0."""
    from database_toolbox_spark.operators.curation import source_datasheet

    pdf = source_datasheet(spark, SF_DIR).toPandas()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert pdf["n_docs"].sum() == n_docs
    for col in ("exact_dup_rate", "hapax_share"):
        assert ((pdf[col] >= 0) & (pdf[col] <= 1)).all(), col
    assert (pdf["lang_entropy"] >= 0).all()
    assert (pdf["mean_quality"] > 0).all()
    assert (pdf["n_tokens"] > 0).all()


def test_hard_negatives_cross_label_and_sorted(spark):
    """Every mined pair crosses labels and the list is cosine-descending."""
    from database_toolbox_spark.operators.similarity import (
        hard_negative_pairs,
    )

    pdf = hard_negative_pairs(spark, SF_DIR).toPandas()
    assert len(pdf) == 20
    assert (pdf["label_a"] != pdf["label_b"]).all()
    assert list(pdf["cos_sim"]) == sorted(pdf["cos_sim"], reverse=True)


def test_effective_mass_discounts_only_dup_sources(spark):
    """effective_docs <= n_docs everywhere; total discounted mass equals
    n_docs - sum(cluster_size - 1) (each cluster contributes exactly one
    document's worth of weight)."""
    from database_toolbox_spark.operators.dedup import (
        cluster_weighted_sample_mass,
        dup_clusters,
    )

    pdf = cluster_weighted_sample_mass(spark, SF_DIR).toPandas()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert pdf["n_docs"].sum() == n_docs
    assert (pdf["effective_docs"] <= pdf["n_docs"] + 1e-9).all()
    clusters = dup_clusters(spark, SF_DIR).toPandas()
    dropped_mass = (clusters["cluster_size"] - 1).sum()
    # each member weighs 1/size, so a cluster's total weight is 1:
    # corpus effective mass = n_docs - sum(size - 1)
    assert abs(pdf["effective_docs"].sum() - (n_docs - dropped_mass)) < 0.01
