"""Round-8 tests: the char_entropy_scores shuffle-free rewrite (plan shape +
external numpy/Counter anchor) and the url_normalized_dedup DuckDB 'g'-flag
fix (a fixture where a collapse group CONTAINS a variant-3 two-utm URL, the
case the first-match-only oracle used to canonicalize differently)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR


# ------------------------------------------------- char entropy rewrite


def test_char_entropy_plan_is_shuffle_free(spark):
    """The round-8 rewrite's whole point: no hash-partitioned exchange
    anywhere (the old spelling shuffled an exploded per-char stream);
    the only exchange is the display-sort rangepartitioning, and the
    text-nonnull filter reaches the parquet scan."""
    from database_toolbox_spark.operators.text import char_entropy_scores

    plan = (
        char_entropy_scores(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning" not in plan, plan
    assert "HashAggregate" not in plan and "SortAggregate" not in plan, plan
    assert "PushedFilters: [IsNotNull(text)]" in plan, plan


def test_char_entropy_batch_matches_counter():
    """External anchor for the vectorized batch kernel: collections.Counter
    entropy per doc, including non-ASCII (the utf-32 codepoint view) and a
    supplementary-plane char, an empty batch, and a 1-char doc."""
    import math
    from collections import Counter

    import pandas as pd

    from database_toolbox_spark.operators.text import _char_entropy_batch

    docs = [
        "hello world",
        "aaaa",
        "z",
        "naïve café — ünïcödé",
        "mixed \U0001f600 emoji \U0001f600\U0001f600 text",
        "abcdefghij" * 50,
    ]
    out = _char_entropy_batch(pd.Series(docs))
    assert list(out.columns) == [
        "n_chars", "distinct_chars", "char_entropy_bits",
    ]
    for i, s in enumerate(docs):
        c = Counter(s)
        n = len(s)
        ent = -sum(v / n * math.log2(v / n) for v in c.values())
        ent = math.floor(ent * 1e4 + 0.501) / 1e4
        assert out["n_chars"][i] == n
        assert out["distinct_chars"][i] == len(c)
        assert out["char_entropy_bits"][i] == ent, (s, ent)

    empty = _char_entropy_batch(pd.Series([], dtype=object))
    assert len(empty) == 0


# ------------------------------------------------- url dedup 'g' flag


def test_url_dedup_variant3_group_parity(spark):
    """A collapse group (doc_id DIV 5 == 3: ids 15..19) that CONTAINS a
    variant-3 URL (15 % 4 == 3 carries '?utm_campaign=x&utm_medium=y').
    Before round 8 the DuckDB oracle's first-match-only regexp_replace
    left '&utm_medium=y' on that URL, so the group collapsed 5:2 there
    but 5:1 in Spark — latent because no sf fixture group contained a
    variant-3. Assert both engines now agree AND the collapse really is
    5:1 (n_canonical == 1)."""
    import duckdb

    from database_toolbox_spark.operators.semistructured import (
        _url_dedup_sql,
    )

    fixture = (
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, 'websrc', 'en', 100)" for i in range(15, 20)
        )
        + ") t(doc_id, source, lang, n_chars)"
    )
    spark.sql(fixture).createOrReplaceTempView("documents")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS {fixture}")
    try:
        s_rows = sorted(
            tuple(r)
            for r in spark.sql(_url_dedup_sql("doc_id DIV 5")).collect()
        )
        d_rows = sorted(
            tuple(r)
            for r in con.execute(
                _url_dedup_sql("doc_id // 5", ", 'g'")
            ).fetchall()
        )
        assert s_rows == d_rows, (s_rows, d_rows)
        assert len(s_rows) == 1
        src, n_urls, n_raw, n_canon, dup_rate = s_rows[0]
        assert (n_urls, n_canon) == (5, 1), s_rows[0]
    finally:
        spark.catalog.dropTempView("documents")
        con.close()


# ------------------------------------------------- MMR diversity re-rank


def test_mmr_matches_numpy_greedy(spark):
    """External anchor: an independent numpy replay of the MMR greedy
    (integer micro-unit scores, 7/3 weights, smaller-position tie-break)
    must equal the SQL fold's picks exactly — parity alone can't prove the
    fold implements Carbonell-Goldstein; this does."""
    import duckdb
    import numpy as np

    from database_toolbox_spark.operators.similarity import (
        MMR_CAND,
        MMR_K,
        QUERY_VEC_ID,
        mmr_diverse_topk,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    t = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = np.array([r[0] for r in t])
    V = np.array([r[1] for r in t], dtype=np.float64)
    q = V[ids == QUERY_VEC_ID][0]
    cos = (V @ q) / (
        np.sqrt((V**2).sum(1)) * np.sqrt((q**2).sum())
    )
    rel6 = np.floor(cos * 1e6 + 0.501).astype(np.int64)
    order = sorted(
        [i for i in range(len(ids)) if ids[i] != QUERY_VEC_ID],
        key=lambda i: (-rel6[i], ids[i]),
    )[:MMR_CAND]
    C = V[order]
    cid = ids[order]
    crel = rel6[order]
    nrm = np.sqrt((C**2).sum(1))
    sim6 = np.floor((C @ C.T) / np.outer(nrm, nrm) * 1e6 + 0.501).astype(
        np.int64
    )
    sel = [0]
    while len(sel) < MMR_K:
        best = None
        for p in range(len(order)):
            if p in sel:
                continue
            sc = 7 * crel[p] - 3 * max(sim6[p][s] for s in sel)
            key = (sc, -p)
            if best is None or key > best[0]:
                best = (key, p)
        sel.append(best[1])
    expected = [
        (r + 1, int(cid[p]), int(crel[p])) for r, p in enumerate(sel)
    ]

    got = [
        (r.mmr_rank, r.vec_id, r.relevance_micros)
        for r in mmr_diverse_topk(spark, SF_DIR).collect()
    ]
    assert got == expected

    # diversity sanity: MMR must NOT equal plain relevance order (the
    # fixture's top-30 contains near-duplicates the re-ranker demotes)
    plain = [int(cid[p]) for p in range(MMR_K)]
    assert [v for _, v, _ in got] != plain


def test_mmr_degenerate_candidate_counts(spark, tmp_path):
    """Round-9 ADVICE guard: with 0 or 1 candidates the greedy fold must
    emit exactly that many rows — Spark's sequence(2, m) auto-reverses
    for m < 2, so the unguarded fold appended NULL picks on tiny corpora."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_toolbox_spark.operators.similarity import (
        QUERY_VEC_ID,
        mmr_diverse_topk,
    )

    def make_dir(n_candidates):
        d = tmp_path / f"sf_mmr_{n_candidates}"
        d.mkdir()
        for f in os.listdir(SF_DIR):
            if f != "embeddings.parquet":
                shutil.copyfile(os.path.join(SF_DIR, f), d / f)
        rows = [(QUERY_VEC_ID, [1.0, 0.0, 0.5, 0.25], 0)]
        for i in range(n_candidates):
            rows.append((1000 + i, [0.9, 0.1 * i, 0.4, 0.3], 1))
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                    "embedding": pa.array(
                        [r[1] for r in rows], pa.list_(pa.float32())
                    ),
                    "label": pa.array([r[2] for r in rows], pa.int32()),
                }
            ),
            d / "embeddings.parquet",
        )
        return str(d)

    got0 = mmr_diverse_topk(spark, make_dir(0)).collect()
    assert got0 == []
    got1 = mmr_diverse_topk(spark, make_dir(1)).collect()
    assert len(got1) == 1
    assert (got1[0].mmr_rank, got1[0].vec_id) == (1, 1000)
    assert got1[0].relevance_micros is not None


# -------------------------------------------- capped co-purchase projection


def test_copurchase_capped_matches_python_recount(spark):
    """External anchor: recompute the capped projection in pure Python
    (group part -> sorted custkeys, truncate at CAP, count pair overlaps)
    and assert the operator's top rows match exactly — proving both the
    cap semantics (smallest-key sample) and the pair counting, not just
    cross-engine parity."""
    from collections import Counter
    from itertools import combinations

    import duckdb

    from database_toolbox_spark.operators.graph import (
        COPURCHASE_CAP,
        COPURCHASE_MIN_SHARED,
        COPURCHASE_TOP,
        copurchase_capped_pairs,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT DISTINCT l.l_partkey, o.o_custkey "
        f"FROM read_parquet('{SF_DIR}/lineitem.parquet') l "
        f"JOIN read_parquet('{SF_DIR}/orders.parquet') o "
        f"ON l.l_orderkey = o.o_orderkey"
    ).fetchall()
    con.close()
    by_part: dict = {}
    for p, c in rows:
        by_part.setdefault(p, []).append(c)
    counts: Counter = Counter()
    for cs in by_part.values():
        for a, b in combinations(sorted(cs)[:COPURCHASE_CAP], 2):
            counts[(a, b)] += 1
    expected = sorted(
        ((a, b, n) for (a, b), n in counts.items()
         if n >= COPURCHASE_MIN_SHARED),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:COPURCHASE_TOP]

    got = [
        (r.c1, r.c2, r.shared_parts)
        for r in copurchase_capped_pairs(spark, SF_DIR).collect()
    ]
    assert got == expected
    # the bound the operator exists for: no pair count can exceed the
    # number of parts, and no part contributed more than CAP members
    assert all(n <= len(by_part) for _, _, n in got)


# -------------------------------------------- isotonic calibration (PAVA)


def test_isotonic_matches_pava(spark):
    """External anchor: a classic sequential pool-adjacent-violators
    implementation must reproduce the SQL minimax fit exactly (the two are
    provably equal; this checks the SQL spelled the identity right), plus
    the isotonic invariants: monotone non-decreasing and weighted-mean
    preserving."""
    from database_toolbox_spark.operators.curation import (
        isotonic_calibration_curve,
    )

    rows = isotonic_calibration_curve(spark, SF_DIR).collect()
    assert len(rows) >= 2
    w = [r.n_docs for r in rows]
    y = [r.raw_rate for r in rows]

    # sequential weighted PAVA over the same (rounded) inputs
    pools = []  # [weight, weighted_sum, n_bins]
    for wi, yi in zip(w, y):
        pools.append([float(wi), float(wi) * yi, 1])
        while len(pools) > 1 and (
            pools[-2][1] / pools[-2][0] > pools[-1][1] / pools[-1][0]
        ):
            b = pools.pop()
            pools[-1][0] += b[0]
            pools[-1][1] += b[1]
            pools[-1][2] += b[2]
    fitted = []
    for pw, ps, nb in pools:
        fitted.extend([ps / pw] * nb)

    import math

    got = [r.iso_rate for r in rows]
    exp = [math.floor(v * 1e6 + 0.501) / 1e6 for v in fitted]
    # the SQL fits on UNROUNDED rates; raw_rate is rounded at 1e-6, so
    # allow one grid step of slack between the two derivations
    assert all(abs(g - e) <= 2e-6 for g, e in zip(got, exp)), (got, exp)
    # invariants on the emitted curve itself
    assert all(got[i] <= got[i + 1] + 1e-9 for i in range(len(got) - 1))
    tw = sum(w)
    assert abs(
        sum(wi * gi for wi, gi in zip(w, got)) / tw
        - sum(wi * yi for wi, yi in zip(w, y)) / tw
    ) < 5e-6
